import pyspark.sql.functions as F

from cngi_prototype_spark.operators import flags as OF


def test_apply_flags_nulls_data(vis_df):
    out = OF.apply_flags(vis_df)
    assert out.filter(F.col("flag") & F.col("data_re").isNotNull()).count() == 0
    # unflagged data preserved
    n_unflagged = vis_df.filter(~F.col("flag") & F.col("data_re").isNotNull()).count()
    assert out.filter(F.col("data_re").isNotNull()).count() == n_unflagged


def test_apply_flags_drop(vis_df):
    out = OF.apply_flags(vis_df, drop=True)
    assert out.filter(F.col("flag")).count() == 0
    assert out.count() == vis_df.filter(~F.col("flag")).count()


def test_auto_clip(vis_df):
    out = OF.auto_clip(vis_df, clip_min=0.5, clip_max=1.05)
    amp = F.sqrt(F.col("data_re") ** 2 + F.col("data_im") ** 2)
    should = vis_df.filter(F.col("flag") | (amp < 0.5) | (amp > 1.05)).count()
    assert out.filter(F.col("flag")).count() == should


def test_manual_flag_unflag_roundtrip(vis_df):
    pred = F.col("chan") == 0
    flagged = OF.manual_flag(vis_df, pred)
    assert flagged.filter((F.col("chan") == 0) & ~F.col("flag")).count() == 0
    cleared = OF.manual_unflag(flagged, None)
    assert cleared.filter(F.col("flag")).count() == 0


def test_flag_manager(vis_df):
    saved = OF.manager_add(vis_df, "backup")
    assert OF.manager_list(saved) == ["FLAG_backup"]
    mutated = OF.manual_flag(saved, F.lit(True))
    restored = OF.manager_apply(mutated, "backup")
    assert (
        restored.filter(F.col("flag") != F.col("FLAG_backup")).count() == 0
    )
    assert OF.manager_list(OF.manager_remove(restored, "backup")) == []


def test_parse_sel_cmd_and_flagcmds(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from cngi_prototype_spark.operators.flags import (
        manual_flag,
        parse_sel_cmd,
        read_flagcmds,
    )
    from cngi_prototype_spark.schema import VisSchema

    vs = VisSchema(time="time", baseline="bl", chan="chan", pol="pol",
                   data_cols=(("data_re", "data_im"),), weight="w", flag="flag")
    pdf = pd.DataFrame({
        "time": pd.to_datetime("2017-07-20") + pd.to_timedelta(range(20), unit="min"),
        "ant1": [i % 4 for i in range(20)],
        "ant2": [(i + 1) % 4 for i in range(20)],
        "bl": range(20), "chan": [i % 5 for i in range(20)],
        "pol": [i % 2 for i in range(20)],
        "data_re": 1.0, "data_im": 0.0, "w": 1.0, "flag": False,
    })
    df = spark.createDataFrame(pdf)

    names = {"ea01": 0, "ea02": 1, "ea03": 2, "ea04": 3}
    sel = parse_sel_cmd({"antenna": "ea02", "chan": [0, 1]},
                        antenna_names=names, vs=vs)
    out = manual_flag(df, sel, vs=vs).toPandas()
    exp = ((pdf.ant1 == 1) | (pdf.ant2 == 1)) & pdf.chan.isin([0, 1])
    assert (out.sort_values("bl").flag.to_numpy()
            == exp.to_numpy()).all()

    # time-range predicate from a flagonline.txt line
    p = tmp_path / "x.flagonline.txt"
    p.write_text("antenna='ea01&ea02' timerange='2017/07/20/00:05:00~2017/07/20/00:10:00' reason='test'\n")
    cmds = read_flagcmds(str(p))
    assert cmds == [{"antenna": "ea01",
                     "time": ("2017-07-20T00:05:00", "2017-07-20T00:10:00")}]
    sel2 = parse_sel_cmd(cmds[0], antenna_names=names, vs=vs)
    out2 = manual_flag(df, sel2, vs=vs).toPandas().sort_values("bl")
    in_t = (pdf.time >= pd.Timestamp("2017-07-20T00:05:00")) & \
           (pdf.time <= pd.Timestamp("2017-07-20T00:10:00"))
    exp2 = in_t & ((pdf.ant1 == 0) | (pdf.ant2 == 0))
    assert (out2.flag.to_numpy() == exp2.to_numpy()).all()


def test_merge_timerange_cmds_reduces_and_preserves_flags(spark, tmp_path):
    """_merge_timerange_cmds parity (reference
    ngcasa/flagging/_flagging_utils/_merge_timerange_cmds.py:20-57):
    overlapping/adjacent timerange commands with identical other keys
    coalesce; applying merged vs unmerged command lists must produce
    the identical FLAG column."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cngi_prototype_spark.operators.flags import (
        manual_flag,
        merge_timerange_cmds,
        parse_sel_cmd,
        read_flagcmds,
    )
    from cngi_prototype_spark.schema import VisSchema

    cmds = [
        # 4 overlapping/adjacent ea01 ranges -> 1 merged [00:00, 00:20]
        {"antenna": "ea01", "time": ("2017-07-20T00:00:00", "2017-07-20T00:06:00")},
        {"antenna": "ea01", "time": ("2017-07-20T00:04:00", "2017-07-20T00:10:00")},
        {"antenna": "ea01", "time": ("2017-07-20T00:10:00", "2017-07-20T00:15:00")},  # touching
        {"antenna": "ea01", "time": ("2017-07-20T00:12:00", "2017-07-20T00:20:00")},
        # disjoint ea01 range stays separate
        {"antenna": "ea01", "time": ("2017-07-20T00:30:00", "2017-07-20T00:35:00")},
        # different compound key: own group
        {"antenna": "ea02", "time": ("2017-07-20T00:02:00", "2017-07-20T00:08:00")},
        {"antenna": "ea02", "time": ("2017-07-20T00:05:00", "2017-07-20T00:11:00")},
        # non-mergeable (no timerange) flushes the buffer, stays put
        {"chan": [0]},
        # post-flush group re-opens
        {"antenna": "ea02", "time": ("2017-07-20T01:00:00", "2017-07-20T01:05:00")},
        {"antenna": "ea02", "time": ("2017-07-20T01:03:00", "2017-07-20T01:09:00")},
        # invalid range (stop <= start) passes through unmerged
        {"antenna": "ea03", "time": ("2017-07-20T02:00:00", "2017-07-20T02:00:00")},
    ]
    merged = merge_timerange_cmds(cmds)
    # 1 (ea01 big) + 1 (ea01 disjoint) + 1 (ea02) + 1 (chan) + 1 (ea02
    # later) + 1 (invalid) = 6
    assert len(merged) == 6
    assert {"chan": [0]} in merged
    assert ("2017-07-20T00:00:00", "2017-07-20T00:20:00") in [
        c.get("time") for c in merged]

    vs = VisSchema(time="time", baseline="bl", chan="chan", pol="pol",
                   data_cols=(("data_re", "data_im"),), weight="w",
                   flag="flag")
    n = 160
    pdf = pd.DataFrame({
        "time": pd.to_datetime("2017-07-20") + pd.to_timedelta(range(n), unit="min"),
        "ant1": [i % 4 for i in range(n)],
        "ant2": [(i + 1) % 4 for i in range(n)],
        "bl": range(n), "chan": [i % 5 for i in range(n)],
        "pol": [i % 2 for i in range(n)],
        "data_re": 1.0, "data_im": 0.0, "w": 1.0, "flag": False,
    })
    df = spark.createDataFrame(pdf)
    names = {"ea01": 0, "ea02": 1, "ea03": 2, "ea04": 3}

    def apply_all(cmd_list):
        out = df
        for c in cmd_list:
            out = manual_flag(out, parse_sel_cmd(c, antenna_names=names,
                                                 vs=vs), vs=vs)
        return out.select("bl", "flag").toPandas() \
                  .sort_values("bl").flag.to_numpy()

    a = apply_all(cmds)
    b = apply_all(merged)
    assert a.sum() > 0  # something actually flagged
    assert (a == b).all()

    # read_flagcmds merges by default (reference _read_flagcmds.py:83)
    p = tmp_path / "m.flagonline.txt"
    p.write_text(
        "antenna='ea01' timerange='2017/07/20/00:00:00~2017/07/20/00:06:00'\n"
        "antenna='ea01' timerange='2017/07/20/00:04:00~2017/07/20/00:10:00'\n")
    assert read_flagcmds(str(p)) == [
        {"antenna": "ea01",
         "time": ("2017-07-20T00:00:00", "2017-07-20T00:10:00")}]
    assert len(read_flagcmds(str(p), merge=False)) == 2


def test_merge_timerange_cmds_unhashable_value_passthrough():
    """A command whose non-time value is unhashable (dict, set) is not
    mergeable: it must flush the buffer and pass through untouched —
    not raise at the group-dict insert (the reference's bare-except
    fallback semantics, _merge_timerange_cmds.py:50-55)."""
    from cngi_prototype_spark.operators.flags import merge_timerange_cmds

    cmds = [
        {"antenna": "a", "time": ("2017-01-01T00:00:00", "2017-01-01T00:05:00")},
        {"antenna": "a", "extra": {"x": 1}, "time": ("2017-01-01T00:03:00", "2017-01-01T00:08:00")},
        {"antenna": "a", "extra": {"x": 1}, "time": ("2017-01-01T00:06:00", "2017-01-01T00:10:00")},
        {"antenna": "b", "extra": {1, 2}, "time": ("2017-01-01T01:00:00", "2017-01-01T01:05:00")},
    ]
    out = merge_timerange_cmds(cmds)
    # nothing merged: the dict-valued commands are distinct passthroughs
    assert len(out) == 4
    assert out[1]["extra"] == {"x": 1} and out[2]["extra"] == {"x": 1}
    assert out[3]["extra"] == {1, 2}


def test_corr_type_names_and_manager_descr(spark):
    """_summary_utils parity: the casacore StokesTypes table (same enum
    order, same [1,32] range) in scalar and Column form; manager_add
    descriptions ride column metadata through a projection."""
    import pandas as pd
    import pytest as pt

    from cngi_prototype_spark.operators import flags as OF

    assert OF.pol_id_to_corr_type_name(1) == "I"
    assert OF.pol_id_to_corr_type_name(5) == "RR"
    assert OF.pol_id_to_corr_type_name(12) == "YY"
    assert OF.pol_id_to_corr_type_name(28) == "Ptotal"
    assert OF.pol_id_to_corr_type_name(32) == "Pangle"
    for bad in (0, 33, -1):
        with pt.raises(ValueError):
            OF.pol_id_to_corr_type_name(bad)

    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        pd.DataFrame({"corr": [5, 6, 7, 8, 9, 12, 0, 40]}))
    got = [r.n for r in df.select(
        OF.corr_type_name_col(F.col("corr")).alias("n"))
        .collect()]
    assert got == ["RR", "RL", "LR", "LL", "XX", "YY", None, None]

    from cngi_prototype_spark.schema import VisSchema
    vs = VisSchema(time="t", baseline="bl", chan="chan", pol="pol",
                   data_cols=(("re", "im"),), weight="w", flag="flag")
    vdf = spark.createDataFrame(
        pd.DataFrame({"t": [1.0], "bl": [0], "chan": [0], "pol": [0],
                      "re": [1.0], "im": [0.0], "w": [1.0],
                      "flag": [False]}))
    out = OF.manager_add(vdf, "backup", vs=vs,
                         descr="backup_beginning")
    out = out.select("*")  # metadata must survive a projection
    assert OF.manager_list(out) == ["FLAG_backup"]
    assert OF.manager_list(out, with_descr=True) == [
        ("FLAG_backup", "backup_beginning")]
    # descr-less versions keep the lean path (no metadata)
    out2 = OF.manager_add(vdf, "plain", vs=vs)
    assert OF.manager_list(out2, with_descr=True) == [("FLAG_plain", "")]


def test_flagging_suite_fused_matches_unfused(spark):
    """flagging_suite_fused (one checkpointed events materialization,
    r15 shared-scan fusion) must return exactly the rows of the
    declared flagging_suite gate — the fused form is a plan change,
    never a value change."""
    from cngi_prototype_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, Q.flagging_suite_q(spark, sf).collect()))
    b = sorted(map(tuple, Q.flagging_suite_fused_q(spark, sf).collect()))
    assert a == b
