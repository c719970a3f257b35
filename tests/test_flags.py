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
