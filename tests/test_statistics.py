import numpy as np
import pyspark.sql.functions as F

from types import SimpleNamespace

from cngi_prototype_spark.operators.statistics import flag_summary, moments, statistics

OS = SimpleNamespace(statistics=statistics, moments=moments, flag_summary=flag_summary)
from tests.fixtures import make_vis_pdf

TOL = 1e-8


def test_statistics_matches_numpy(vis_df):
    out = OS.statistics(vis_df, "data_re", pos_cols=["chan"], compute_madmedian=True)
    row = out.first().asDict()
    x = make_vis_pdf()["data_re"].dropna().to_numpy(dtype=float)
    assert row["npts"] == len(x)
    assert abs(row["sum"] - x.sum()) < 1e-6
    assert abs(row["mean"] - x.mean()) < TOL
    assert abs(row["sigma"] - x.std(ddof=1)) < 1e-7
    assert abs(row["rms"] - np.sqrt((x**2).mean())) < TOL
    assert abs(row["min"] - x.min()) < TOL and abs(row["max"] - x.max()) < TOL
    assert abs(row["median"] - np.percentile(x, 50)) < TOL
    assert abs(row["q1"] - np.percentile(x, 25)) < TOL
    assert abs(row["q3"] - np.percentile(x, 75)) < TOL
    med = np.percentile(x, 50)
    assert abs(row["medabsdevmed"] - np.percentile(np.abs(x - med), 50)) < TOL


def test_moments_matches_numpy(vis_df):
    out = OS.moments(
        vis_df.filter(F.col("data_re").isNotNull()),
        group_cols=["baseline", "pol"], axis_col="chan", value_col="data_re",
        delta=2.0,
    ).toPandas()
    pdf = make_vis_pdf()
    pdf = pdf[pdf.data_re.notna()]
    g = pdf[(pdf.baseline == 0) & (pdf.pol == 9)]
    row = out[(out.baseline == 0) & (out.pol == 9)].iloc[0]
    x = g["data_re"].to_numpy(dtype=float)
    ax = g["chan"].to_numpy(dtype=float)
    assert abs(row["mom_mean"] - x.mean()) < TOL
    assert abs(row["mom_integrated"] - x.sum() * 2.0) < TOL
    assert abs(row["mom_weighted_coord"] - (ax * x).sum() / x.sum()) < TOL
    vbar = (ax * x).sum() / x.sum()
    disp = np.sqrt((x * (ax - vbar) ** 2).sum() / x.sum())
    assert abs(row["mom_weighted_dispersion"] - disp) < 1e-6
    assert abs(row["mom_median"] - np.percentile(x, 50)) < TOL
    assert abs(row["mom_stddev"] - x.std(ddof=1)) < 1e-7
    assert abs(row["mom_rms"] - np.sqrt((x**2).mean())) < TOL
    assert abs(row["mom_abs_mean_dev"] - np.abs(x - x.mean()).mean()) < TOL
    assert abs(row["mom_max"] - x.max()) < TOL
    assert row["mom_max_coord"] == ax[x.argmax()]
    assert abs(row["mom_min"] - x.min()) < TOL
    assert row["mom_min_coord"] == ax[x.argmin()]


def test_flag_summary(vis_df):
    out = OS.flag_summary(vis_df, ["pol", "scan_number", "field_id"]).toPandas()
    pdf = make_vis_pdf()
    total = len(pdf)
    for key in ["pol", "scan_number", "field_id"]:
        sub = out[out.group_key == key]
        assert sub["total"].sum() == total
        exp = pdf.groupby(key)["flag"].sum()
        for _, r in sub.iterrows():
            assert r["flagged"] == exp[type(exp.index[0])(r["group_value"])]
