"""Lloyd k-means operator: convergence vs a numpy replay, empty-cluster
retention, zero-shuffle assignment plan, and the kmeans-built IVF index
probing through the unchanged ``ivf_topk_probe`` contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.clustering import (
    KMeansModel,
    kmeans_assign,
    kmeans_fit,
)


@pytest.fixture(scope="module")
def blob_rows():
    rng = np.random.RandomState(11)
    centers = np.array([[5.0, 5.0, 5.0], [-5.0, -5.0, -5.0], [5.0, -5.0, 5.0]])
    rows = []
    for i in range(60):
        c = i % 3
        v = centers[c] + 0.2 * rng.randn(3)
        rows.append((i, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def blobs(spark, blob_rows):
    return spark.createDataFrame(blob_rows, "vec_id int, embedding array<double>")


def _numpy_lloyd(rows, k, n_iter):
    """Replay the operator's exact semantics: first-k-by-id init,
    squared-distance argmin with smaller-cid tie-break, mean update."""
    by_id = dict(rows)
    ids = sorted(by_id)
    cents = {j + 1: np.array(by_id[ids[j]]) for j in range(k)}
    assign = {}
    for _ in range(n_iter):
        assign = {}
        for i in ids:
            v = np.array(by_id[i])
            d = sorted((float(((v - c) ** 2).sum()), cid) for cid, c in cents.items())
            assign[i] = d[0][1]
        for cid in cents:
            members = [np.array(by_id[i]) for i in ids if assign[i] == cid]
            if members:
                cents[cid] = np.mean(members, axis=0)
    return cents, assign


def test_converges_on_separable_blobs(blobs, blob_rows):
    model = kmeans_fit(blobs, k=3, max_iter=25, tol=1e-12)
    # Separable data: Lloyd reaches a fixed point well before max_iter
    # and the convergence test must detect it.
    assert model.n_iter < 25
    assert model.shift <= 1e-12
    np_cents, np_assign = _numpy_lloyd(blob_rows, 3, model.n_iter)
    for cid, c in model.centroids.items():
        assert np.allclose(c, np_cents[cid], atol=1e-9)
    got = {
        r["vec_id"]: r["cid"]
        for r in kmeans_assign(blobs, model.centroids).collect()
    }
    assert got == np_assign


def test_tol_zero_runs_exactly_max_iter(blobs):
    model = kmeans_fit(blobs, k=3, max_iter=2, tol=0.0)
    assert model.n_iter == 2
    # assign_centroids is one update behind the final centroids.
    assert model.assign_centroids != model.centroids or model.shift == 0.0


def test_empty_cluster_keeps_previous_centroid(spark):
    # ids 0 and 1 share one vector, so both seed cids 1-2 identically;
    # every tie resolves to the smaller cid and cid 2 loses ALL members
    # in iteration 1 — the retention branch (_mean_update dims-None)
    # must keep its seed verbatim.
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [5.0, 5.0]),
            (3, [5.1, 5.0]), (4, [1.2, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    model = kmeans_fit(df, k=2, max_iter=1, tol=0.0)
    assert model.centroids[2] == [1.0, 1.0]  # retained seed, not a mean
    assert model.centroids[1] != [1.0, 1.0]  # cid 1 DID update
    counts = {
        r["cid"]: r["count"]
        for r in kmeans_assign(df, model.assign_centroids)
        .groupBy("cid")
        .count()
        .collect()
    }
    assert counts == {1: 5}  # cid 2 truly empty under the seed centroids


def test_kmeans_oracle_retains_empty_clusters_like_operator(spark, tmp_path):
    """End-to-end operator-vs-oracle on a corpus where a cluster
    EMPTIES mid-run (duplicate seed vectors): the SQL unroll must
    mirror the operator's retain-previous-centroid policy, or the two
    diverge the moment a retained centroid recaptures members."""
    import random

    import duckdb

    rng = random.Random(5)
    rows = [(0, [1.0, 1.0, 1.0, 1.0], 0), (1, [1.0, 1.0, 1.0, 1.0], 0)] + [
        (i, [rng.uniform(-5, 5) for _ in range(4)], 0) for i in range(2, 40)
    ]
    d = str(tmp_path / "sf_tiny")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    from opentimes_spark.plans.queries import ORACLE_SQL, QUERIES

    got = sorted(
        tuple(r) for r in QUERIES["kmeans_lloyd_2iter"](spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(ORACLE_SQL["kmeans_lloyd_2iter"]).fetchall())
    assert got == want
    # the scenario is real: some cluster must have recaptured members
    # after being retained (cids span the full 1..8 despite dup seeds)
    assert {c for c, *_ in got} == set(range(1, 9))


def test_assignment_plan_has_no_exchange(blobs):
    model = kmeans_fit(blobs, k=3, max_iter=1, tol=0.0)
    plan = kmeans_assign(blobs, model.centroids)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # literal-centroid argmin is a pure projection


def test_fit_validates_inputs(blobs, spark):
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_fit(blobs, k=0)
    tiny = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="< k"):
        kmeans_fit(tiny, k=5)


def test_kmeans_ivf_index_probe(spark, blobs, blob_rows, tmp_path_factory):
    from opentimes_spark.operators.similarity import (
        ensure_ivf_index,
        ivf_topk_probe,
        read_ivf_centroids,
    )

    base = str(tmp_path_factory.mktemp("ivf_km"))
    idx = ensure_ivf_index(
        spark,
        blobs,
        cache_key="test-km",
        base_dir=base,
        builder="kmeans",
        k=3,
        max_iter=10,
        tol=1e-9,
    )
    cents = read_ivf_centroids(spark, idx)
    assert cents.count() == 3
    out = ivf_topk_probe(
        spark, blobs.filter(F.col("vec_id") < 3), idx, k=4, n_probe=1
    ).collect()
    # Blobs are tight: probing ONE fitted centroid must recover the
    # exact brute-force neighbours (all in the query's own cluster).
    by_id = dict(blob_rows)
    for qid in range(3):
        q = np.array(by_id[qid])
        cos = {
            i: float(q @ np.array(v) / (np.linalg.norm(q) * np.linalg.norm(np.array(v))))
            for i, v in blob_rows
            if i != qid
        }
        want = sorted(cos, key=lambda i: (-cos[i], i))[:4]
        got = [r["cand_id"] for r in sorted(
            (r for r in out if r["query_id"] == qid), key=lambda r: r["rnk"]
        )]
        assert got == want

    # Build-once: a second ensure with the same key returns the same
    # path without rebuilding (mtime unchanged).
    import os

    marker = os.path.getmtime(os.path.join(idx, "_SUCCESS"))
    assert ensure_ivf_index(
        spark, blobs, cache_key="test-km", base_dir=base,
        builder="kmeans", k=3, max_iter=10, tol=1e-9,
    ) == idx
    assert os.path.getmtime(os.path.join(idx, "_SUCCESS")) == marker


def test_model_centroids_df_roundtrip(spark):
    m = KMeansModel(
        centroids={1: [1.0, 2.0], 2: [3.0, 4.0]},
        assign_centroids={1: [0.0, 0.0], 2: [1.0, 1.0]},
        n_iter=1,
        shift=0.5,
    )
    rows = {r["cid"]: r["c"] for r in m.centroids_df(spark).collect()}
    assert rows == {1: [1.0, 2.0], 2: [3.0, 4.0]}


@pytest.fixture(scope="module")
def skewed_blobs(spark):
    """ids ordered so the first k points ALL sit in one blob — the
    failure mode first-k seeding exists to be rescued from."""
    rng = np.random.RandomState(3)
    centers = np.array([[8.0, 0.0], [-8.0, 0.0], [0.0, 8.0]])
    rows = []
    i = 0
    for c in range(3):          # blob-major id order
        for _ in range(20):
            v = centers[c] + 0.3 * rng.randn(2)
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_kmeans_parallel_init_is_deterministic(skewed_blobs):
    from opentimes_spark.operators.clustering import kmeans_fit

    m1 = kmeans_fit(skewed_blobs, k=3, max_iter=10, init="kmeans||")
    m2 = kmeans_fit(skewed_blobs, k=3, max_iter=10, init="kmeans||")
    assert m1.centroids == m2.centroids
    assert m1.n_iter == m2.n_iter


def test_kmeans_parallel_init_beats_degenerate_first_k(skewed_blobs):
    """First-3 ids are all in blob 0, so first-k Lloyd strands two
    centroids inside one blob; k-means|| must seed all three blobs and
    land a strictly lower inertia."""
    from opentimes_spark.operators.clustering import inertia, kmeans_fit

    base = skewed_blobs.selectExpr("vec_id", "embedding as v")
    bad = kmeans_fit(skewed_blobs, k=3, max_iter=15, init="first-k")
    good = kmeans_fit(skewed_blobs, k=3, max_iter=15, init="kmeans||")
    i_bad = inertia(base, bad.centroids)
    i_good = inertia(base, good.centroids)
    assert i_good < i_bad / 5  # one blob split vs three blobs found
    # each fitted centroid sits on a distinct true blob center
    trues = [(8.0, 0.0), (-8.0, 0.0), (0.0, 8.0)]
    matched = set()
    for c in good.centroids.values():
        d, j = min(
            (sum((a - b) ** 2 for a, b in zip(c, t)), j)
            for j, t in enumerate(trues)
        )
        assert d < 1.0
        matched.add(j)
    assert matched == {0, 1, 2}


def test_kmeans_parallel_init_raises_when_pool_too_small(spark):
    from opentimes_spark.operators.clustering import kmeans_parallel_init

    # two coincident points: after the first seed, phi = 0 and the pool
    # cannot reach k=3
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])], "vec_id int, embedding array<double>"
    ).selectExpr("vec_id", "embedding as v")
    with pytest.raises(ValueError, match="candidates < k"):
        kmeans_parallel_init(df, k=3)


def test_pq_codes_m1_degenerates_to_plain_kmeans_assignment(spark):
    """With one subspace PQ *is* k-means: code0 must equal the cid of a
    kmeans_fit(max_iter=1) assignment and recon_err its min-dist²."""
    from opentimes_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        min_dist2_expr,
        pq_codes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = {r["vec_id"]: r for r in pq_codes(emb, m=1, k=4, max_iter=1).collect()}
    model = kmeans_fit(emb, k=4, max_iter=1, tol=0.0)
    ref = kmeans_assign(emb, model.centroids).withColumn(
        "d", min_dist2_expr(F.col("v"), model.centroids)
    )
    for r in ref.collect():
        assert out[r["vec_id"]]["code0"] == r["cid"]
        assert out[r["vec_id"]]["recon_err"] == r["d"]


def test_pq_codes_shape_and_split_error(spark):
    from opentimes_spark.operators.clustering import pq_codes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = pq_codes(emb, m=4, k=4, max_iter=1, dim=64)
    assert df.columns == ["vec_id", "code0", "code1", "code2", "code3", "recon_err"]
    rows = df.collect()
    assert len(rows) == emb.count()
    for r in rows:
        for j in range(4):
            assert 1 <= r[f"code{j}"] <= 4
        assert r["recon_err"] >= 0.0

    import pytest

    with pytest.raises(ValueError):
        pq_codes(emb, m=3, k=4, dim=64)  # 64 % 3 != 0


def test_pq_encode_plan_is_shuffle_free(spark):
    """Scale claim: after the (driver-side) codebook fits, the PQ
    encode of the corpus is a pure projection — ZERO exchanges, so
    encoding any number of vectors is a map-only pass."""
    from opentimes_spark.operators.clustering import pq_codes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = pq_codes(emb, m=2, k=4, max_iter=1)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan


def test_pq_rejects_wrong_length_vectors_per_row(spark):
    """A vector shorter than dim must raise (assert_true), not encode
    to an arbitrary code via a NULLed distance fold."""
    import pyspark.errors

    good = [(i, [float(i + j) for j in range(8)]) for i in range(6)]
    bad = good + [(99, [1.0, 2.0])]
    df = spark.createDataFrame(bad, "vec_id long, embedding array<double>")
    from opentimes_spark.operators.clustering import pq_codes

    with pytest.raises(Exception) as exc:
        pq_codes(df, m=2, k=2, max_iter=1, dim=8).collect()
    assert "vector length != dim" in str(exc.value)


def test_opq_rotation_orthogonal_and_reduces_error(spark):
    """OPQ (Ge et al. 2013, non-parametric alternating solution): the
    learned R must be orthogonal to float tolerance, and the
    quantization MSE under (R, refit codebooks) must not exceed plain
    PQ (R = I) on the same corpus — the rotation's whole point.  Also
    pins end-to-end determinism: two fits over the same layout give
    identical R."""
    import numpy as np
    from pyspark.sql import functions as F

    from opentimes_spark.operators.clustering import (
        opq_fit,
        opq_quantization_error,
        pq_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r, pqs = opq_fit(emb, m=4, k=4, n_iter=2, dim=64, pq_iter=1)
    assert np.allclose(r @ r.T, np.eye(64), atol=1e-10)

    opq_mse = opq_quantization_error(emb, r, pqs, dim=64)
    plain_pqs = pq_fit(emb, m=4, k=4, max_iter=1, dim=64)
    plain_mse = opq_quantization_error(emb, np.eye(64), plain_pqs, dim=64)
    assert opq_mse <= plain_mse * 1.0001, (opq_mse, plain_mse)

    r2, _ = opq_fit(emb, m=4, k=4, n_iter=2, dim=64, pq_iter=1)
    assert np.array_equal(r, r2)


def test_opq_fit_driver_twin_matches_distributed_bitwise(spark):
    """The small-corpus driver cutover must reproduce the distributed
    alternation BIT-FOR-BIT — rotation matrix and every codebook
    centroid.  The distributed side runs on a single id-ordered
    partition (n < one Arrow batch), the one layout where its
    cross-matrix accumulation order is defined; multi-partition
    layouts reassociate that float sum, which is the operator's
    long-disclosed layout dependence, not a twin divergence."""
    import numpy as np

    from opentimes_spark.operators.clustering import opq_fit

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .coalesce(1)
    )
    r_loc, pqs_loc = opq_fit(emb, m=4, k=4, n_iter=2, dim=64, pq_iter=1)
    r_dist, pqs_dist = opq_fit(
        emb, m=4, k=4, n_iter=2, dim=64, pq_iter=1, force_distributed=True
    )
    assert np.array_equal(r_loc, r_dist)
    assert len(pqs_loc) == len(pqs_dist)
    for ml, md in zip(pqs_loc, pqs_dist):
        assert ml.centroids == md.centroids
        assert ml.assign_centroids == md.assign_centroids
        assert ml.n_iter == md.n_iter and ml.shift == md.shift


def test_opq_rotation_improves_on_planted_rotation_structure(spark):
    """Synthetic probe: axis-aligned 2-block pattern data mixed by a
    45° rotation.  The covariance here is ~isotropic (equal-variance
    independent coordinates), so no second-moment init can recover the
    mix and the alternating solution descends from R = I into a local
    minimum — the documented OPQ caveat (Ge et al. §4).  The honest
    guarantees, asserted: the objective strictly improves on plain PQ
    (alternating minimization is monotone) and by a meaningful margin
    (>10%) on this structure."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from opentimes_spark.operators.clustering import (
        opq_fit,
        opq_quantization_error,
        pq_fit,
    )

    dim = 4
    rng = np.random.RandomState(0)
    # codebook-friendly base: each half takes one of 4 exact patterns
    patterns = np.array([[0.0, 0.0], [0.0, 4.0], [4.0, 0.0], [4.0, 4.0]])
    halves = rng.randint(0, 4, size=(400, 2))
    base = np.hstack(
        [patterns[halves[:, 0]], patterns[halves[:, 1]]]
    )
    # plant a rotation that mixes the two halves
    theta = math.pi / 4
    mix = np.eye(dim)
    mix[0, 0] = mix[2, 2] = math.cos(theta)
    mix[0, 2] = math.sin(theta)
    mix[2, 0] = -math.sin(theta)
    data = base @ mix.T
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    plain = opq_quantization_error(
        df, np.eye(dim), pq_fit(df, m=2, k=4, max_iter=3, dim=dim), dim=dim
    )
    r, pqs = opq_fit(df, m=2, k=4, n_iter=4, dim=dim, pq_iter=3)
    opq = opq_quantization_error(df, r, pqs, dim=dim)
    assert opq < plain * 0.9, (opq, plain)


# ---------------------------------------------------------------------------
# gram_matrix / pca_power_from_gram — the BLAS production twin of the
# embed_gram_pca_power explode form (VERDICT r7 weak #1)
# ---------------------------------------------------------------------------


def _numpy_gram_scaled(rows, dim):
    """Exact int replay: round-half-up to 6 decimals, scale 1e6, V^T@V."""
    from decimal import ROUND_HALF_UP, Decimal

    vi = np.array(
        [
            [
                int(
                    Decimal(x).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                    * 10**6
                )
                for x in v
            ]
            for _i, v in rows
        ],
        dtype=object,
    )
    return vi.T @ vi  # object dtype -> exact Python ints


def test_gram_matrix_matches_exact_integer_replay(spark):
    from opentimes_spark.operators.clustering import gram_matrix

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.randn(5)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    g = gram_matrix(df, "embedding", dim=5)
    expect = _numpy_gram_scaled(rows, 5)
    assert g.shape == (5, 5)
    for i in range(5):
        for j in range(5):
            assert int(g[i][j]) == int(expect[i][j])


def test_gram_matrix_is_partition_layout_invariant(spark):
    from opentimes_spark.operators.clustering import gram_matrix

    rng = np.random.RandomState(13)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(30)]
    df1 = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    df2 = df1.repartition(7)
    g1 = gram_matrix(df1, "embedding", dim=4)
    g2 = gram_matrix(df2, "embedding", dim=4)
    assert (g1 == g2).all()


def test_gram_matrix_overflow_guard_raises(spark):
    from opentimes_spark.operators.clustering import gram_matrix

    df = spark.createDataFrame(
        [(0, [5000.0, 1.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="overflow guard"):
        gram_matrix(df, "embedding", dim=2)


def test_gram_matrix_rejects_wrong_dim(spark):
    from opentimes_spark.operators.clustering import gram_matrix

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        gram_matrix(df, "embedding", dim=2)


def test_pca_power_matches_numpy_eigvector_direction():
    from opentimes_spark.operators.clustering import pca_power_from_gram

    rng = np.random.RandomState(3)
    # planted dominant direction
    u = rng.randn(6)
    u /= np.linalg.norm(u)
    v = np.stack([3.0 * rng.randn() * u + 0.05 * rng.randn(6) for _ in range(200)])
    g_scaled = np.rint(v.T @ v * 10**12).astype(np.int64)
    loading, lam, us = pca_power_from_gram(g_scaled, iters=6)
    top = np.linalg.eigh(v.T @ v)[1][:, -1]
    cos = abs(float(np.dot(loading, top)))
    assert cos > 0.999
    assert lam > 0


def test_blas_pca_query_equals_explode_twin(spark):
    from opentimes_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = {
        r["dim"]: (r["loading"], r["lambda_est"])
        for r in QUERIES["embed_gram_pca_power"](spark, sf).collect()
    }
    b = {
        r["dim"]: (r["loading"], r["lambda_est"])
        for r in QUERIES["embed_gram_pca_blas"](spark, sf).collect()
    }
    assert a == b


def test_blas_pca_query_plan_has_no_element_fanout(spark):
    """The production twin's distributed plan must not contain the
    posexplode fan-out (that is the whole point of the twin)."""
    from opentimes_spark.plans.queries import QUERIES

    # the result df is a driver-built literal frame; the heavy lifting
    # happened inside gram_matrix whose plan we assert directly
    from opentimes_spark.io.read import read_table
    from pyspark.sql import functions as SF

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    scaled = emb.select(
        SF.transform(
            SF.col("embedding"),
            lambda el: (
                SF.round(el.cast("double"), 6).cast("decimal(12,6)")
                * SF.lit(1000000)
            ).cast("long"),
        ).alias("vq")
    )
    plan = scaled._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan  # no explode/posexplode anywhere


def test_assign_broadcast_bit_identical_to_literal_form(spark):
    """The fit-loop's broadcast-centroid assignment must agree with the
    literal-argmin projection BIT-FOR-BIT (same zip_with left-fold dot,
    same array_sort (d, cid) tie-break) — kmeans_fit uses the broadcast
    form per iteration while certified queries replay the literal form,
    so any divergence would silently shift every downstream centroid."""
    from pyspark.sql import functions as SF

    from opentimes_spark.io.read import read_table
    from opentimes_spark.operators.clustering import (
        _assign_broadcast,
        assign_expr,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.select(
        SF.col("vec_id"), SF.col("embedding").cast("array<double>").alias("v")
    )
    seed = base.orderBy("vec_id").limit(5).collect()
    cents = {i + 1: list(r["v"]) for i, r in enumerate(seed)}
    lit = {
        r["vec_id"]: r["cid"]
        for r in base.withColumn("cid", assign_expr(SF.col("v"), cents))
        .select("vec_id", "cid")
        .collect()
    }
    bc = {
        r["vec_id"]: r["cid"]
        for r in _assign_broadcast(base, cents)
        .select("vec_id", "cid")
        .collect()
    }
    assert lit == bc and len(lit) > 0


def test_driver_lloyd_matches_distributed_step(spark):
    """The small-corpus driver Lloyd twin must reproduce the
    distributed step's centroids: same dimension-sequential dots, same
    (d, cid) tie-break, same id-ordered sequential mean accumulation.
    Run 3 iterations both ways on the real embeddings table and demand
    near-exact agreement (identical fold orders make this typically
    bit-equal; the bound guards residual layout-order variation)."""
    import numpy as np
    from pyspark.sql import functions as SF

    from opentimes_spark.io.read import read_table
    from opentimes_spark.operators.clustering import (
        _assign_broadcast,
        _lloyd_step_local,
        _mean_update,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.select(
        SF.col("vec_id"), SF.col("embedding").cast("array<double>").alias("v")
    ).persist()
    seed = base.orderBy("vec_id").limit(5).collect()
    cents = {i + 1: list(r["v"]) for i, r in enumerate(seed)}
    M = np.array(
        [r["v"] for r in base.orderBy("vec_id").collect()], dtype=np.float64
    )
    cd, cl = dict(cents), dict(cents)
    for _ in range(3):
        cd = _mean_update(_assign_broadcast(base.coalesce(1), cd), cd)
        cl = _lloyd_step_local(M, cl)
        for cid in cd:
            for x, y in zip(cd[cid], cl[cid]):
                assert abs(x - y) <= 1e-12 * max(abs(x), 1.0)
    base.unpersist()


def test_kmeans_fit_distributed_path_matches_driver_path(spark, monkeypatch):
    """kmeans_fit's two execution paths (driver-vectorized below the
    element threshold, distributed above) must produce the same model.
    Force the distributed loop by zeroing the threshold and compare
    against the default (driver) run — centroids must agree to
    near-ulp on every dimension, and n_iter must match."""
    from pyspark.sql import functions as SF

    from opentimes_spark.io.read import read_table
    from opentimes_spark.operators import clustering

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    m_driver = clustering.kmeans_fit(emb, k=4, max_iter=3, tol=0.0)
    monkeypatch.setattr(clustering, "_DRIVER_LLOYD_MAX_ELEMS", 0)
    m_dist = clustering.kmeans_fit(emb, k=4, max_iter=3, tol=0.0)
    assert m_driver.n_iter == m_dist.n_iter
    for cid in m_driver.centroids:
        for x, y in zip(m_driver.centroids[cid], m_dist.centroids[cid]):
            assert abs(x - y) <= 1e-12 * max(abs(x), 1.0)


def test_kmeans_fast_path_centroids_are_python_floats(spark):
    """The r14 single-collect fast path seeds centroids from numpy rows;
    they must land as python floats — assign_centroids flows into
    createDataFrame (index writes), whose DoubleType rejects np.float64
    (caught live by the magnitude gate on kmeans_lloyd_2iter)."""
    from opentimes_spark.operators.clustering import kmeans_fit, pq_fit

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    model = kmeans_fit(emb, k=2, max_iter=1, tol=0.0, dim=2)
    for cents in (model.centroids, model.assign_centroids):
        for vec in cents.values():
            assert all(type(x) is float for x in vec), cents
    # createDataFrame with an explicit DoubleType schema is the crash
    # surface — must not raise
    assert model.centroids_df(spark).count() == 2
    for m in pq_fit(emb, m=2, k=2, max_iter=1, dim=2):
        for vec in m.assign_centroids.values():
            assert all(type(x) is float for x in vec)
