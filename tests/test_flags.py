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
