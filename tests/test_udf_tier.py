import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from cngi_prototype_spark.operators.fitting import cont_sub, fit_gaussian, spec_fit, uv_cont_fit
from cngi_prototype_spark.operators.smoothing import chan_smooth, window_weights
from tests.fixtures import make_image_pdf, make_vis_pdf


def test_window_weights():
    assert window_weights("boxcar", 3) == [1.0, 1.0, 1.0]
    w = window_weights("hann", 5)
    assert abs(w[0]) < 1e-15 and abs(w[4]) < 1e-15 and w[2] == 1.0
    t = window_weights("triang", 3)
    assert t[1] == 1.0 and t[0] == t[2]


def test_chan_smooth_matches_numpy(spark, vis_df):
    out = chan_smooth(vis_df, window="triang", size=3, cols=["data_re"]).toPandas()
    pdf = make_vis_pdf()
    w = np.array(window_weights("triang", 3))
    g = pdf[(pdf.baseline == 1) & (pdf.pol == 9) & (pdf.time == pdf.time.iloc[0])]
    g = g.sort_values("chan")
    y = g["data_re"].to_numpy(dtype=float)
    got = out[(out.baseline == 1) & (out.pol == 9) & (out.time == pdf.time.iloc[0])] \
        .sort_values("chan")["data_re"].to_numpy(dtype=float)
    for i in range(len(y)):
        lo, hi = max(0, i - 1), min(len(y), i + 2)
        ww = w[lo - i + 1: hi - i + 1]
        yy = y[lo:hi]
        m = ~np.isnan(yy)
        exp = np.nan if not m.any() else (ww[m] * yy[m]).sum() / ww[m].sum()
        if np.isnan(exp):
            assert np.isnan(got[i])
        else:
            assert abs(got[i] - exp) < 1e-10


def test_uv_cont_fit_recovers_polynomial(spark):
    # exact quadratic input -> fit order 2 must reproduce it (residual ~0)
    rows = []
    for bl in range(3):
        for c in range(16):
            rows.append({"time": pd.Timestamp("2020-01-01"), "baseline": bl, "pol": 9,
                         "chan": c, "data_re": 1.0 + 0.5 * bl + 0.1 * c + 0.01 * c * c,
                         "data_im": 0.2 * c})
    df = spark.createDataFrame(pd.DataFrame(rows))
    from cngi_prototype_spark.schema import VisSchema
    vs = VisSchema(data_cols=(("data_re", "data_im"),))
    out = uv_cont_fit(df, vs=vs, fitorder=2).toPandas()
    assert np.abs(out["data_re"] - out["data_re_cont"]).max() < 1e-9
    sub = cont_sub(df, vs=vs, fitorder=2).toPandas()
    assert np.abs(sub["data_re"]).max() < 1e-9


def test_uv_cont_fit_excludechans(spark):
    # line in chans 6-9 on a linear continuum; excluding them recovers it
    rows = []
    for c in range(16):
        y = 2.0 + 0.3 * c + (5.0 if 6 <= c <= 9 else 0.0)
        rows.append({"time": pd.Timestamp("2020-01-01"), "baseline": 0, "pol": 9,
                     "chan": c, "data_re": y, "data_im": 0.0})
    df = spark.createDataFrame(pd.DataFrame(rows))
    from cngi_prototype_spark.schema import VisSchema
    vs = VisSchema(data_cols=(("data_re", "data_im"),))
    out = uv_cont_fit(df, vs=vs, fitorder=1, excludechans=[6, 7, 8, 9]).toPandas()
    line_free = out[~out.chan.isin([6, 7, 8, 9])]
    assert np.abs(line_free["data_re"] - line_free["data_re_cont"]).max() < 1e-9
    line = out[out.chan.isin([6, 7, 8, 9])]
    assert ((line["data_re"] - line["data_re_cont"]) > 4.9).all()


def test_spec_fit_recovers_gaussian(spark):
    x = np.arange(64, dtype=float)
    rows = []
    for k, (amp, mu, sig) in enumerate([(3.0, 20.0, 4.0), (1.5, 40.0, 2.5)]):
        y = amp * np.exp(-0.5 * ((x - mu) / sig) ** 2)
        for xi, yi in zip(x, y):
            rows.append({"sid": k, "chan": int(xi), "val": float(yi)})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = spec_fit(df, ["sid"], "chan", "val").toPandas().sort_values("sid")
    assert np.allclose(out["amp"], [3.0, 1.5], atol=1e-6)
    assert np.allclose(out["center"], [20.0, 40.0], atol=1e-6)
    assert np.allclose(out["sigma"], [4.0, 2.5], atol=1e-6)


def test_fit_gaussian_psf(spark):
    img = spark.createDataFrame(make_image_pdf())
    out = fit_gaussian(img, plane_cols=["chan", "pol"], value_col="psf").toPandas()
    # fixture PSF: centered at (16,16), sigma_l=3/sqrt(2), sigma_m=2/sqrt(2)
    # (exp(-(d/3)^2) = exp(-0.5 (d/(3/sqrt2))^2)); moment fit on a truncated
    # grid biases sigma slightly low — accept 15%
    assert np.allclose(out["x0"], 16.0, atol=0.2)
    assert np.allclose(out["y0"], 16.0, atol=0.2)
    assert np.allclose(out["amp"], 1.0, atol=0.05)
    exp_major, exp_minor = 3.0 / np.sqrt(2), 2.0 / np.sqrt(2)
    assert np.all(np.abs(out["major"] - exp_major) / exp_major < 0.15)
    assert np.all(np.abs(out["minor"] - exp_minor) / exp_minor < 0.15)


def test_real_media_decoders_roundtrip():
    import numpy as np

    from cngi_prototype_spark.multimodal import media as M

    for seed in (0, 7, 123):
        p = M._decode_one(M.synth_ppm(seed), fake=False)
        ii, jj = np.meshgrid(np.arange(8), np.arange(12), indexing="ij")
        assert p.shape == (8, 12, 3)
        assert (p[:, :, 0] == (seed * 7 + ii * 3 + jj) % 256).all()
        b = M._decode_one(M.synth_bmp(seed), fake=False)
        assert b.shape == (6, 8, 3)
        ii, jj = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
        assert (b[:, :, 0] == (seed + jj * 9) % 256).all()  # R channel
        w = M._decode_one(M.synth_wav(seed), fake=False)
        t = np.arange(64)
        assert w.shape == (64, 1)
        assert (w[:, 0] == (seed * 17 + t * 9) % 65536 - 32768).all()
        g = M._decode_one(M.synth_png(seed), fake=False)
        ii, jj = np.meshgrid(np.arange(7), np.arange(10), indexing="ij")
        assert g.shape == (7, 10, 4)
        assert (g[:, :, 0] == (seed * 3 + ii * 5 + jj) % 256).all()
        assert (g[:, :, 3] == (seed * 9 + ii + jj * 13) % 256).all()


def test_png_decode_roundtrip_and_filters():
    """decode_png inverts this repo's encoder for every supported
    channel shape, and undoes all five spec scanline filters on a
    hand-filtered IDAT (the encoder only emits filter 0, so the
    filter coverage must be constructed)."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from cngi_prototype_spark.functions.png import (
        PNG_SIGNATURE, _chunk, decode_png, png_bytes)

    rng = np.random.default_rng(5)
    for shape in ((9, 13), (9, 13, 2), (9, 13, 3), (9, 13, 4)):
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(png_bytes(a)) == a).all()

    # hand-filter one image with every filter type (spec algorithms)
    a = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch).astype(np.int32)
    lines = []
    for r, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[r]
        up = flat[r - 1] if r else np.zeros(w * ch, np.int32)
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), up[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur - (left + up) // 2
        else:
            p = left + up - upleft
            pred = np.where(
                (abs(p - left) <= abs(p - up))
                & (abs(p - left) <= abs(p - upleft)), left,
                np.where(abs(p - up) <= abs(p - upleft), up, upleft))
            enc = cur - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))
    assert (decode_png(blob) == a).all()

    # unsupported shapes raise, not mis-decode
    pal_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette
    with _pytest.raises(NotImplementedError):
        decode_png(PNG_SIGNATURE + _chunk(b"IHDR", pal_ihdr)
                   + _chunk(b"IDAT", zlib.compress(b"\0\0\0"))
                   + _chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_fake_decode_never_raises_on_magic_collision():
    # a codec blob whose leading bytes collide with a real-decoder magic
    # must fall through to the fake decoder under fake=True, not crash
    from cngi_prototype_spark.multimodal import media as M

    for blob in (b"P6 garbage-not-a-ppm", b"BM\x01\x02", b"RIFFxxxxnotWAVE",
                 b"\x89PNG\r\n\x1a\ntruncated", b"\xff\xd8\xff\xe0 jpeg-ish"):
        out = M._decode_one(blob, fake=True)
        assert out.size > 0
    # fake=False keeps raising on the same corrupt blobs
    import pytest as _pytest
    with _pytest.raises(Exception):
        M._decode_one(b"P6 garbage-not-a-ppm", fake=False)


def test_ivf_training_survives_zero_norm_embedding(spark):
    from cngi_prototype_spark.similarity.ann import train_ivf_centroids

    rows = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (3, [0.9, 0.1, 0.0]), (4, [0.1, 0.9, 0.0])]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    cents = train_ivf_centroids(df, n_centroids=2, sample=5,
                                id_col="id", vec_col="emb")
    import numpy as np
    assert np.isfinite(np.asarray(cents)).all()


def test_ivf_centroids_and_recall(spark):
    from pyspark.sql import functions as F

    from cngi_prototype_spark.similarity.ann import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_centroids=8, sample=256)
    assert len(cents) == 8 and len(cents[0]) == 64
    import numpy as np
    norms = [np.linalg.norm(c) for c in cents]
    assert np.allclose(norms, 1.0)
    # deterministic: training twice gives identical centroids
    assert cents == train_ivf_centroids(emb, n_centroids=8, sample=256)

    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, q, k=3).collect()}
    # probing EVERY list must recover the exact result
    full = {(r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, cents, k=3, nprobe=8).collect()}
    assert full == exact
    # partial probing keeps decent recall on this data
    part = {(r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, cents, k=3, nprobe=3).collect()}
    assert len(part & exact) >= len(exact) // 2


def test_cosine_pairs_hash_blocks_complete(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from cngi_prototype_spark.similarity.ann import cosine_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(120)
    # one block vs many hash blocks must produce the identical pair set
    # (regression: hash blocks decouple id order from block order, so
    # an id-ordered upper-triangle filter across blocks loses pairs)
    one = cosine_pairs(emb, threshold=0.3, block_size=1024).toPandas()
    many = cosine_pairs(emb, threshold=0.3, block_size=16).toPandas()
    key = lambda d: set(zip(d.id_a, d.id_b, np.round(d.cos_sim, 6)))
    assert key(one) == key(many) and len(one) > 0


def test_resize_media_real_decode(spark):
    import numpy as np
    import pandas as pd

    from cngi_prototype_spark.multimodal.media import resize_media, synth_ppm

    pdf = pd.DataFrame({"media_id": [1, 2],
                        "media": [synth_ppm(1), synth_ppm(2)]})
    df = spark.createDataFrame(pdf)
    out = resize_media(df, out_w=6, out_h=4).toPandas().sort_values("media_id")
    assert list(out.width) == [6, 6] and list(out.height) == [4, 4]
    assert all(len(p) == 24 for p in out.pixels)
    # corners of a bilinear resize equal the source corners (gray mean)
    src = np.stack([( (1*7 + i*3 + j) % 256 + (1*11 + i) % 256
                      + (1*13 + j*5) % 256) / 3.0
                    for i in (0, 7) for j in (0, 11)])
    got = np.asarray(out.iloc[0].pixels).reshape(4, 6)
    assert np.allclose([got[0, 0], got[0, -1], got[-1, 0], got[-1, -1]], src)


def test_pq_encode_tiers_agree_and_roundtrip(spark):
    """PQ: (a) the unrolled-expression encode and the broadcast-numpy
    encode emit identical codes; (b) vectors that ARE codewords encode
    to themselves (zero distortion round-trip); (c) the two pq_topk
    tiers return the same neighbors/ranks with cos_sim equal to float
    re-association (~1 ulp)."""
    import numpy as np

    from cngi_prototype_spark.similarity.ann import (
        _pq_kmeans_matrix, pq_encode, pq_topk)

    rng = np.random.default_rng(17)
    d, m, ksub = 16, 4, 4
    v = rng.normal(size=(120, d))
    books = _pq_kmeans_matrix(v, m, ksub, iters=8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(v)],
        "vec_id long, embedding array<double>")
    expr = {r["vec_id"]: list(r["pq_code"])
            for r in pq_encode(df, books).collect()}
    prod = {r["vec_id"]: list(r["pq_code"])
            for r in pq_encode(df, books, max_codegen_cells=0).collect()}
    assert expr == prod

    # codewords encode to themselves: build vectors by concatenating
    # one codeword per subspace and check the code comes back exact
    dsub = d // m
    picks = [(0, 1, 2, 3), (3, 2, 1, 0), (1, 3, 0, 2)]
    rows = []
    for i, pk in enumerate(picks):
        vec = []
        for j, c in enumerate(pk):
            vec += [float(x) for x in books[j][c]]
        rows.append((100 + i, vec))
    cw = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: tuple(r["pq_code"])
           for r in pq_encode(cw, books).collect()}
    assert got == {100 + i: pk for i, pk in enumerate(picks)}

    qdf = df.filter("vec_id < 5")
    a = (pq_topk(df, qdf, books, k=3).toPandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (pq_topk(df, qdf, books, k=3, max_codegen_cells=0).toPandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert (a[["query_id", "neighbor_id", "rank"]].to_numpy()
            == b[["query_id", "neighbor_id", "rank"]].to_numpy()).all()
    assert np.allclose(a.cos_sim, b.cos_sim, rtol=0, atol=1e-12)


def test_pq_trainers_bit_identical_and_recall_on_clusters(spark, tmp_path):
    """(a) The Spark-sample trainer and the arrow trainer share the
    Lloyd core, so the codebooks are bit-identical on the same corpus;
    (b) on CLUSTERED data (PQ's design regime, unlike the random gate
    corpus) recall@3 is high."""
    import numpy as np
    import pandas as pd

    from cngi_prototype_spark.similarity.ann import (
        brute_force_topk, pq_topk, train_pq_codebooks,
        train_pq_codebooks_arrow)

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(6, 32)) * 4.0
    v = np.concatenate([c + rng.normal(size=(40, 32)) * 0.25
                        for c in centers])
    pdf = pd.DataFrame({"vec_id": np.arange(len(v), dtype=np.int64),
                        "embedding": [list(map(float, r)) for r in v]})
    df = spark.createDataFrame(pdf)
    pq_path = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(pq_path)

    spark_books = train_pq_codebooks(df, m=4, ksub=8)
    arrow_books = train_pq_codebooks_arrow(pq_path, m=4, ksub=8)
    assert spark_books == arrow_books

    # retrieval contract on clustered data: every retrieved neighbor
    # lies in the query's own cluster (exact top-3 identity is decided
    # by within-cluster noise SMALLER than the quantization cell — the
    # regime where recall@k is meaningless; cluster membership is what
    # PQ must preserve, and what it's used for at 100 TB)
    q = df.filter("vec_id < 8")
    got = pq_topk(df, q, spark_books, k=3).toPandas()
    assert len(got) == 8 * 3
    same_cluster = (got.neighbor_id // 40) == (got.query_id // 40)
    assert same_cluster.all()
    # and the ADC estimate is close to the true cosine for those pairs
    ref = brute_force_topk(df, q, k=120).toPandas().rename(
        columns={"cos_sim": "true_cos"})
    j = got.merge(ref[["query_id", "neighbor_id", "true_cos"]],
                  on=["query_id", "neighbor_id"])
    assert len(j) == len(got)
    assert np.abs(j.cos_sim - j.true_cos).max() < 0.02


def test_hamming_topk_packing_and_quality(spark):
    """Sign-bit Hamming search: (a) orthogonal one-hot vectors whose
    signs differ in exactly 2 positions get hamming distance 2 (packing
    sanity via the selected candidates); (b) reported cos_sim values
    are EXACT cosines (never exceed the brute optimum — the dominance
    property pq cannot offer); (c) recall rises with rerank width."""
    import numpy as np
    import pandas as pd

    from cngi_prototype_spark.similarity.ann import (
        brute_force_topk, hamming_topk)

    rng = np.random.default_rng(31)
    v = rng.normal(size=(200, 64))
    pdf = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                        "embedding": [list(map(float, r)) for r in v]})
    df = spark.createDataFrame(pdf)
    q = df.filter("vec_id < 6")

    got = hamming_topk(df, q, k=4).toPandas()
    ref = brute_force_topk(df, q, k=4).toPandas()
    # exactness: every reported cos_sim equals the true cosine of that
    # pair (merge against the brute scores over a wide k)
    wide = brute_force_topk(df, q, k=199).toPandas().rename(
        columns={"cos_sim": "true_cos"})
    j = got.merge(wide[["query_id", "neighbor_id", "true_cos"]],
                  on=["query_id", "neighbor_id"])
    assert len(j) == len(got)
    assert np.allclose(j.cos_sim, j.true_cos, rtol=0, atol=1e-12)
    # dominance: per query, hamming's best <= brute's best
    gm = got.groupby("query_id").cos_sim.max()
    bm = ref.groupby("query_id").cos_sim.max()
    assert (gm <= bm + 1e-12).all()
    # recall grows with the rerank width (and hits 1.0 at full width)
    def rec(rr):
        g = hamming_topk(df, q, k=4, rerank=rr).toPandas()
        a = set(map(tuple, g[["query_id", "neighbor_id"]].to_numpy()))
        b = set(map(tuple, ref[["query_id", "neighbor_id"]].to_numpy()))
        return len(a & b) / len(b)
    r16, r199 = rec(16), rec(199)
    assert r199 == 1.0 and r16 <= r199


def test_hamming_topk_wide_dims(spark):
    """dim > 64 packs into ceil(dim/32) words without LongType
    overflow (round-10 advice: the old two-half layout needed
    1 << 63 at dim >= 96): full-width rerank at dim=96 recovers the
    brute result exactly, and word spans stay <= 32 bits."""
    import numpy as np
    import pandas as pd

    from cngi_prototype_spark.similarity.ann import (
        _sig_words, brute_force_topk, hamming_topk)

    assert _sig_words(96) == [(0, 32), (32, 32), (64, 32)]
    assert _sig_words(64) == [(0, 32), (32, 32)]
    assert _sig_words(70) == [(0, 32), (32, 32), (64, 6)]
    assert _sig_words(16) == [(0, 16)]

    rng = np.random.default_rng(47)
    v = rng.normal(size=(60, 96))
    pdf = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                        "embedding": [list(map(float, r)) for r in v]})
    df = spark.createDataFrame(pdf)
    q = df.filter("vec_id < 3")
    got = hamming_topk(df, q, k=3, rerank=59, dim=96).toPandas()
    ref = brute_force_topk(df, q, k=3).toPandas()
    a = set(map(tuple, got[["query_id", "neighbor_id"]].to_numpy()))
    b = set(map(tuple, ref[["query_id", "neighbor_id"]].to_numpy()))
    assert a == b
    # packed signatures are non-negative (no sign-bit spill)
    import pyspark.sql.functions as F
    from cngi_prototype_spark.similarity.ann import _dvec, _sign_sig
    sigs = df.select(*[
        _sign_sig(_dvec(F.col("embedding")), lo, nb).alias(f"s{i}")
        for i, (lo, nb) in enumerate(_sig_words(96))]).toPandas()
    assert (sigs >= 0).all().all()


def test_ivfpq_tiers_agree_and_cluster_retrieval(spark):
    """IVF-PQ: (a) the expression index-build tier and the forced
    numpy tier return identical neighbors/ranks and scores (both end
    in the same scoring kernel); (b) on clustered data every retrieved
    neighbor is in the query's cluster and the ADC estimate tracks the
    true cosine; (c) one trainer call yields both structures
    deterministically (repeat call identical)."""
    import numpy as np
    import pandas as pd

    from cngi_prototype_spark.similarity.ann import (
        brute_force_topk, ivfpq_topk, train_ivfpq)

    rng = np.random.default_rng(41)
    centers = rng.normal(size=(6, 32)) * 4.0
    v = np.concatenate([c + rng.normal(size=(50, 32)) * 0.3
                        for c in centers])
    pdf = pd.DataFrame({"vec_id": np.arange(len(v), dtype=np.int64),
                        "embedding": [list(map(float, r)) for r in v]})
    df = spark.createDataFrame(pdf)
    cents, books = train_ivfpq(df, n_cells=6, m=4, ksub=8)
    cents2, books2 = train_ivfpq(df, n_cells=6, m=4, ksub=8)
    assert cents == cents2 and books == books2

    q = df.filter("vec_id < 8")
    a = (ivfpq_topk(df, q, cents, books, k=4, nprobe=2).toPandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (ivfpq_topk(df, q, cents, books, k=4, nprobe=2,
                    max_codegen_cells=0).toPandas()
         .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert (a[["query_id", "neighbor_id", "rank"]].to_numpy()
            == b[["query_id", "neighbor_id", "rank"]].to_numpy()).all()
    assert np.allclose(a.cos_sim, b.cos_sim, rtol=0, atol=1e-12)

    assert len(a) == 8 * 4
    assert ((a.neighbor_id // 50) == (a.query_id // 50)).all()
    wide = brute_force_topk(df, q, k=299).toPandas().rename(
        columns={"cos_sim": "true_cos"})
    j = a.merge(wide[["query_id", "neighbor_id", "true_cos"]],
                on=["query_id", "neighbor_id"])
    assert len(j) == len(a)
    assert np.abs(j.cos_sim - j.true_cos).max() < 0.02


def test_jpeg_zigzag_matches_spec():
    """The programmatic zigzag generator must reproduce the published
    T.81 scan order exactly (flat row*8+col indices)."""
    from cngi_prototype_spark.functions.jpeg import _ZZ

    spec = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37,
            44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47,
            55, 62, 63]
    assert [i * 8 + j for i, j in _ZZ] == spec


def test_jpeg_roundtrip_bounds():
    """decode(encode(x)) within lossy-codec bounds on smooth content,
    across 4:4:4 / 4:2:0 / grayscale / odd dims; byte-determinism."""
    import numpy as np

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    h, w = 23, 37
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.clip(np.round(np.stack([
        128 + 100 * np.sin(ii / 6.0),
        128 + 100 * np.cos(jj / 7.0),
        128 + 80 * np.sin((ii + jj) / 9.0)], axis=2)), 0, 255) \
        .astype(np.uint8)

    for q, sub, emax, emean in ((90, False, 10, 2.0), (90, True, 35, 6.0),
                                (75, True, 40, 7.0)):
        blob = jpeg_bytes(img, quality=q, subsample=sub)
        assert blob[:3] == b"\xff\xd8\xff" and blob[-2:] == b"\xff\xd9"
        dec = decode_jpeg(blob)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= emax and err.mean() <= emean, (q, sub)

    gray = img[..., 0]
    dg = decode_jpeg(jpeg_bytes(gray, quality=85))
    assert dg.shape == gray.shape
    assert np.abs(dg.astype(int) - gray.astype(int)).max() <= 4

    # exactly-one-MCU and exactly-one-block shapes
    for shape in ((16, 16, 3), (8, 8, 3), (8, 8)):
        a = np.full(shape, 144, np.uint8)
        assert decode_jpeg(jpeg_bytes(a, quality=50)).shape == shape

    assert jpeg_bytes(img) == jpeg_bytes(img)  # deterministic encoder


def test_jpeg_constant_blocks_exact():
    """Constant images whose level-shifted DC is a multiple of the
    quantizer round-trip EXACTLY (DC-only blocks, analytic IDCT):
    at quality 50 the Annex-K tables are unscaled, Q[0,0]=16, and
    DC = 8*(v-128), so v in {128, 130, 144} is lossless end-to-end —
    a decoder correctness check that does not lean on the encoder's
    own inverse beyond the standard's arithmetic."""
    import numpy as np

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    for v in (128, 130, 144):
        for shape in ((16, 24, 3), (9, 10, 3), (8, 8)):
            a = np.full(shape, v, np.uint8)
            for sub in (False, True):
                if len(shape) == 2 and sub:
                    continue
                dec = decode_jpeg(jpeg_bytes(a, quality=50, subsample=sub))
                assert (dec == v).all(), (v, shape, sub)


def test_jpeg_progressive_equals_baseline():
    """The decisive progressive cross-check: a progressive and a
    baseline encoding of the same image share identical quantized
    coefficients (same DCT, same tables), so their decodes must match
    BYTE-FOR-BYTE — catching any complementary encoder/decoder bug in
    the entropy layer (the coefficient math is shared and checked
    analytically elsewhere)."""
    import numpy as np

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (24, 17, 3), dtype=np.uint8), True),
        (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), False),
        (rng.integers(0, 256, (9, 30, 3), dtype=np.uint8), "422"),
        (rng.integers(0, 256, (19, 13), dtype=np.uint8), False),
        # smooth gradient: long zero runs exercise EOB-run coding
        (np.tile(np.linspace(0, 255, 40, dtype=np.uint8), (32, 1))
         [..., None].repeat(3, axis=2), True),
        # constant: every AC band is one EOB run per block
        (np.full((24, 24, 3), 130, np.uint8), True),
    ]
    for img, sub in cases:
        for q in (50, 85):
            base = decode_jpeg(jpeg_bytes(img, quality=q, subsample=sub))
            prog = decode_jpeg(jpeg_bytes(img, quality=q, subsample=sub,
                                          progressive=True))
            assert (prog == base).all(), (img.shape, sub, q)


def test_jpeg_progressive_restarts_and_determinism():
    import numpy as np

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(jpeg_bytes(img, quality=70))
    for ri in (1, 2, 5):
        blob = jpeg_bytes(img, quality=70, progressive=True,
                          restart_interval=ri)
        assert (decode_jpeg(blob) == base).all(), ri
    p = jpeg_bytes(img, progressive=True)
    assert p == jpeg_bytes(img, progressive=True)  # deterministic
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    # review finding: a progressive stream truncated after the headers
    # (zero decoded scans) must raise, not return a silent all-gray
    # IDCT of empty coefficients
    sos = p.index(b"\xff\xda")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_jpeg(p[:sos] + b"\xff\xd9")


def test_jpeg_capability_guards_and_media_wiring():
    import numpy as np
    import pytest as _pytest

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes
    from cngi_prototype_spark.multimodal import media as M

    img = np.full((12, 9, 3), 99, np.uint8)
    blob = jpeg_bytes(img, quality=60)

    # lossless (SOF3) is an explicit capability guard, not a silent
    # wrong answer; a baseline scan header under an SOF2 marker is
    # corrupt (DC scan must have Se=0), never silently mis-decoded;
    # a DRI segment with no due restarts is simply honored
    lossless = blob.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with _pytest.raises(NotImplementedError):
        decode_jpeg(lossless)
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        decode_jpeg(prog)
    dri = blob[:2] + b"\xff\xdd\x00\x04\x00\x08" + blob[2:]
    assert (decode_jpeg(dri) == decode_jpeg(blob)).all()
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + blob)

    # media tier wiring: magic dispatch + synth fixture shape
    d = M._decode_one(M.synth_jpeg(5), fake=False)
    assert d.shape == (16, 16, 3)
    # deterministic: the gate twin embeds python-side decodes
    assert (d == M._decode_one(M.synth_jpeg(5), fake=False)).all()
    # corrupt jpeg under fake=True falls through to the pseudo-decoder
    bad = blob[:40] + b"\x00" * 10
    assert M._decode_one(bad, fake=True).shape == (8, 8)


def test_jpeg_422_and_restart_intervals():
    """4:2:2 encode mode and DRI/RSTn streams round-trip: restarts
    byte-align and reset predictors every N MCUs (the camera-output
    convention), and must reproduce the unrestarted decode exactly on
    lossless (constant) content."""
    import numpy as np

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    h, w = 21, 45  # multiple MCUs in both 4:2:0 (16x16) and 4:2:2 (16x8)
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.clip(np.round(np.stack([
        128 + 100 * np.sin(ii / 6.0),
        128 + 100 * np.cos(jj / 7.0),
        128 + 80 * np.sin((ii + jj) / 9.0)], axis=2)), 0, 255) \
        .astype(np.uint8)

    d422 = decode_jpeg(jpeg_bytes(img, quality=90, subsample="422"))
    err = np.abs(d422.astype(int) - img.astype(int))
    assert d422.shape == img.shape and err.mean() <= 4.0

    for sub in (True, False, "422"):
        plain = decode_jpeg(jpeg_bytes(img, quality=80, subsample=sub))
        for ri in (1, 2, 5):
            blob = jpeg_bytes(img, quality=80, subsample=sub,
                              restart_interval=ri)
            assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
            assert (decode_jpeg(blob) == plain).all(), (sub, ri)

    # lossless constant content stays exact through restarts too
    a = np.full((20, 40, 3), 144, np.uint8)
    assert (decode_jpeg(jpeg_bytes(a, quality=50, subsample=False,
                                   restart_interval=1)) == 144).all()


def test_ivfpq_rerank_restores_recall_and_dominance(spark):
    """The FAISS refine stage: ADC shortlist -> exact rescore. Recall
    must not drop vs pure ADC (round-12 curve: quantized recall decays
    with corpus size; rerank is the standard counter), and with exact
    final scores dominance holds again (no approximate score may beat
    brute force's global optimum)."""
    from pyspark.sql import functions as F

    from cngi_prototype_spark.similarity.ann import (
        brute_force_topk, ivfpq_topk, train_ivfpq)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(emb, qs, k=5).toPandas()
    bp = set(zip(brute.query_id, brute.neighbor_id))
    cents, books = train_ivfpq(emb, n_cells=8, m=8, ksub=16)

    adc = ivfpq_topk(emb, qs, cents, books, k=5, nprobe=3).toPandas()
    ref = ivfpq_topk(emb, qs, cents, books, k=5, nprobe=3,
                     rerank=50).toPandas()
    r_adc = len(set(zip(adc.query_id, adc.neighbor_id)) & bp) / len(bp)
    r_ref = len(set(zip(ref.query_id, ref.neighbor_id)) & bp) / len(bp)
    assert r_ref >= r_adc
    assert r_ref >= 0.4  # measured 0.62+ at sf0.01, 0.22 at 600k w/ 50

    # dominance: reranked scores are TRUE cosines of a subset, so the
    # per-query max cannot exceed brute force's
    bmax = brute.groupby("query_id").cos_sim.max()
    rmax = ref.groupby("query_id").cos_sim.max()
    for qid, v in rmax.items():
        assert v <= bmax[qid] + 1e-12
    # rank-1 hit of the shortlist equals brute rank-1 whenever brute's
    # best lives in a probed cell — weaker but deterministic: every
    # reranked row must be a (query, neighbor) pair ADC could emit
    assert len(ref) <= 5 * qs.count()


def test_jpeg_fill_bytes_and_large_scan():
    """T.81 B.1.1.2 fill bytes (0xFF padding before a marker code,
    common camera output) must parse; and a ~real-sized scan must
    decode in linear time (regression: the bit reader's accumulator
    grew unboundedly, turning big scans O(N^2))."""
    import time

    import numpy as np

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    img = np.full((12, 9, 3), 77, np.uint8)
    blob = jpeg_bytes(img, quality=60)
    # inject fill bytes before the DQT and SOF0 marker codes
    filled = blob.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1) \
                 .replace(b"\xff\xc0", b"\xff\xff\xc0", 1)
    assert (decode_jpeg(filled) == decode_jpeg(blob)).all()

    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    blob = jpeg_bytes(big, quality=90, subsample=False)  # noisy -> big
    assert len(blob) > 300_000
    t0 = time.time()
    dec = decode_jpeg(blob)
    sec = time.time() - t0
    assert dec.shape == big.shape
    # pure-python Huffman on ~1.2M coefficients: generous linear-time
    # bound; the quadratic accumulator measured minutes here
    assert sec < 60, sec


def test_jpeg_progressive_strict_marker_resync():
    """A garbage byte where the next marker should sit (simulating an
    under-consuming scan on a corrupt/foreign stream) must raise, not
    be leniently skipped — the lenient walk could silently interpret
    arbitrary bytes as length-prefixed segments and miss a real
    SOS/DHT (review finding)."""
    import numpy as np
    import pytest as _pytest

    from cngi_prototype_spark.functions.jpeg import decode_jpeg, jpeg_bytes

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    p = jpeg_bytes(img, quality=70, progressive=True)
    assert decode_jpeg(p) is not None  # sanity: pristine stream decodes
    # find the first REAL marker after scan 1's entropy data (skip
    # stuffed FF00 / RSTn / FF fills — those belong to the scan)
    first_sos = p.index(b"\xff\xda")
    ln = int.from_bytes(p[first_sos + 2:first_sos + 4], "big")
    j = first_sos + 2 + ln
    while True:
        j = p.index(b"\xff", j)
        nxt = p[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            j += 2
        elif nxt == 0xFF:
            j += 1
        else:
            break
    corrupt = p[:j] + b"\x55" + p[j:]
    with _pytest.raises(ValueError, match="expected a marker"):
        decode_jpeg(corrupt)
