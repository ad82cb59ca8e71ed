"""Similarity search: brute-force top-k vs a numpy oracle; IVF probe
recall; near-dup blocking."""

from __future__ import annotations

import numpy as np
import pytest

from opentimes_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    label_centroids,
)


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(7)
    base = rng.randn(3, 8)
    rows = []
    for i in range(30):
        label = i % 3
        v = base[label] + 0.1 * rng.randn(8)
        rows.append((i, [float(x) for x in v], label))
    return rows


@pytest.fixture(scope="module")
def emb(spark, vecs):
    return spark.createDataFrame(
        vecs, "vec_id int, embedding array<float>, label int"
    )


def _numpy_topk(vecs, qid, k):
    arr = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v, _ in vecs}
    q = arr[qid]
    scores = {
        i: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in arr.items()
        if i != qid
    }
    return sorted(scores, key=lambda i: (-scores[i], i))[:k]


def test_topk_matches_numpy(emb, vecs):
    out = brute_force_topk(emb.filter("vec_id < 3"), emb, k=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rnk"], r["cand_id"]))
    for qid in range(3):
        spark_ids = [c for _, c in sorted(got[qid])]
        assert spark_ids == _numpy_topk(vecs, qid, 4)


def test_centroids(emb):
    cents = {r["centroid_id"]: r["centroid"] for r in label_centroids(emb).collect()}
    assert len(cents) == 3 and all(len(v) == 8 for v in cents.values())


def test_ivf_recall_on_clustered_data(emb, vecs):
    """With well-separated clusters, probing 1 centroid reproduces the
    exact top-k (every true neighbor shares the query's label)."""
    exact = brute_force_topk(emb.filter("vec_id < 3"), emb, k=3)
    approx = ivf_topk(emb.filter("vec_id < 3"), emb, k=3, n_probe=1)
    e = {(r["query_id"], r["rnk"]): r["cand_id"] for r in exact.collect()}
    a = {(r["query_id"], r["rnk"]): r["cand_id"] for r in approx.collect()}
    assert e == a


def test_neardup_blocked_by_label(emb):
    out = embedding_neardup_pairs(emb, threshold=0.9)
    rows = out.collect()
    assert len(rows) > 0
    lbl = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert lbl[r["id_a"]] == lbl[r["id_b"]]  # blocking respected
        assert r["id_a"] < r["id_b"]


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The IVF storage layout must prune at the DIRECTORY level: a
    probe of one centroid shows PartitionFilters in the scan and reads
    only that partition's rows."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        read_ivf_probe,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = str(tmp_path / "ivf_index")
    write_ivf_index(emb, out)
    one_label = emb.select("label").distinct().orderBy("label").collect()[0][0]
    probe = read_ivf_probe(spark, out, [one_label])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    assert probe.count() == emb.filter(F.col("label") == one_label).count()
    # the other partitions' files are untouched (directory pruning)
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("centroid_id=")]
    assert len(dirs) > 1  # layout actually partitioned


def test_materialized_probe_matches_inline_ivf(spark, tmp_path):
    """ivf_topk_probe against a materialized index returns exactly the
    inline ivf_topk rows, its scan is partition-pruned, and the index is
    built once (second ensure_ivf_index call must not rewrite)."""
    import contextlib
    import io
    import os

    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        ensure_ivf_index,
        ivf_topk_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    idx = ensure_ivf_index(spark, emb, cache_key="t", base_dir=str(tmp_path))
    probe = ivf_topk_probe(spark, q, idx, k=3, n_probe=2)
    inline = ivf_topk(q, emb, k=3, n_probe=2)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, inline.collect())
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    # dynamic partition pruning on the index scan: the broadcast probe
    # assignment is reused as a runtime partition filter — no driver
    # round-trip, non-probed directories never read
    assert "dynamicpruning" in plan.lower() and "centroid_id" in plan
    # posexplode must be gone from the probe path entirely
    assert "Generate" not in plan

    mtime = os.path.getmtime(os.path.join(idx, "_SUCCESS"))
    assert ensure_ivf_index(spark, emb, cache_key="t", base_dir=str(tmp_path)) == idx
    assert os.path.getmtime(os.path.join(idx, "_SUCCESS")) == mtime


def test_numpy_zero_norm_guard(spark):
    """Zero-norm embeddings score cos=0 (never NaN) and id dtypes follow
    the input schema (int ids, not hardcoded bigint)."""
    from opentimes_spark.operators.similarity import brute_force_topk_numpy

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id int, embedding array<float>",
    )
    out = brute_force_topk_numpy(df, df, k=2)
    assert dict(out.dtypes)["query_id"] == "int"
    rows = {(r["query_id"], r["cand_id"]): r["cos_sim"] for r in out.collect()}
    assert rows[(0, 1)] == 0.0 and rows[(0, 2)] == 0.0  # present, not NaN
    assert len([k for k in rows if k[0] == 0]) == 2


def test_numpy_topk_matches_hof_twin(spark):
    """The numpy fast path must return the same neighbor sets (and
    ranks) as the oracle-checked fold-expression baseline."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_numpy,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    a = {(r["query_id"], r["rnk"]): r["cand_id"]
         for r in brute_force_topk(q, emb, k=5).collect()}
    b = {(r["query_id"], r["rnk"]): r["cand_id"]
         for r in brute_force_topk_numpy(q, emb, k=5).collect()}
    assert a == b

    import pytest as pt

    with pt.raises(ValueError, match="max_broadcast_queries"):
        brute_force_topk_numpy(emb, emb, k=3, max_broadcast_queries=5)


def test_srp_lsh_recall_on_clustered_data(emb, vecs):
    """On well-separated clusters, SRP-LSH (4 tables x 4 bits over dim=8)
    must recover the brute-force top-3 for most queries: same-cluster
    vectors agree on nearly every sign bit, so they share buckets."""
    from opentimes_spark.operators.similarity import srp_lsh_topk

    q = emb.filter(emb.vec_id < 6)
    got = {
        (r.query_id, r.rnk): r.cand_id
        for r in srp_lsh_topk(q, emb, k=3, dim=8).collect()
    }
    exact = {
        (r.query_id, r.rnk): r.cand_id
        for r in brute_force_topk(q, emb, k=3).collect()
    }
    hits = sum(1 for key, cid in exact.items() if got.get(key) == cid)
    assert hits >= 0.8 * len(exact), (hits, len(exact))


def test_srp_signatures_deterministic_and_zero_shuffle(emb):
    from opentimes_spark.operators.similarity import (
        srp_sign_planes,
        srp_signatures,
    )

    planes = srp_sign_planes(8, 8)
    assert planes == srp_sign_planes(8, 8)
    assert {x for row in planes for x in row} <= {1, -1}
    sig = srp_signatures(emb, planes, n_tables=2)
    # per-row expressions only: no exchange anywhere in the plan
    assert "Exchange" not in sig._jdf.queryExecution().executedPlan().toString()
    rows = sig.collect()
    assert len(rows) == emb.count() * 2
    assert all(0 <= r.bucket < 16 for r in rows)
    # same vector -> same buckets on a second evaluation (no rand())
    assert sorted(map(tuple, rows)) == sorted(map(tuple, sig.collect()))


def test_srp_planes_not_divisible_raises(emb):
    from opentimes_spark.operators.similarity import srp_lsh_topk

    with pytest.raises(ValueError, match="not divisible"):
        srp_lsh_topk(emb, emb, n_planes=10, n_tables=4, dim=8)


def test_ivfpq_topk_shape_and_determinism(spark):
    """IVF-PQ: k results per query ranked by ADC; ADC is a squared
    distance (non-negative up to fold ulp); two runs are identical
    (no RNG anywhere in the coarse/PQ fits or ranking)."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    a = ivfpq_topk(q, emb, k=5, n_probe=2)
    rows = a.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["adc_dist"] > -1e-9
        assert r["cand_id"] != r["query_id"]
    assert all(len(v) == 5 for v in per_q.values())
    b = sorted(map(tuple, ivfpq_topk(q, emb, k=5, n_probe=2).collect()))
    assert sorted(map(tuple, rows)) == b

    import pytest

    with pytest.raises(ValueError):
        ivfpq_topk(q, emb, m=3, dim=64)


def test_ivfpq_materialized_probe_matches_inline_and_prunes(spark, tmp_path):
    """The materialized IVF-PQ index must (a) return BIT-IDENTICAL
    results to the in-query ivfpq_topk with the same build parameters,
    (b) join the probe via the Hive centroid_id key so partition
    pruning applies, and (c) never read candidate vectors — the codes
    are the whole ranking payload (column pruning at the scan)."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        ensure_ivfpq_index,
        ivfpq_topk,
        ivfpq_topk_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    idx = ensure_ivfpq_index(
        spark, emb, cache_key=str(tmp_path), base_dir=str(tmp_path),
        coarse_k=8, coarse_iter=2, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    probe = ivfpq_topk_probe(spark, q, idx, k=5, n_probe=2)
    inline = ivfpq_topk(q, emb, k=5, n_probe=2, coarse_k=8, coarse_iter=2,
                        m=2, pq_k=4, pq_iter=1, dim=64)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, inline.collect())
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    # the scan's ReadSchema must carry the codes, not the vectors
    scan = next(s for s in plan.split("(") if "ReadSchema" in s)
    assert "embedding" not in scan
    # second ensure call returns the cached path without rebuilding
    assert ensure_ivfpq_index(
        spark, emb, cache_key=str(tmp_path), base_dir=str(tmp_path),
        coarse_k=8, coarse_iter=2, m=2, pq_k=4, pq_iter=1, dim=64,
    ) == idx


def test_ivfpq_rescore_reranks_by_exact_cosine(spark, tmp_path):
    """Two-stage retrieval: with rescore=R the ADC shortlist re-ranks
    by EXACT cosine — scores must equal brute_force_topk's cosine for
    the same (query, candidate) pairs, recall vs exact top-k can only
    improve or hold vs the pure-ADC cut, and k rows per query remain."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        brute_force_topk,
        ensure_ivfpq_index,
        ivfpq_topk_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    idx = ensure_ivfpq_index(
        spark, emb, cache_key=str(tmp_path), base_dir=str(tmp_path),
        coarse_k=8, coarse_iter=2, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    adc = ivfpq_topk_probe(spark, q, idx, k=5, n_probe=2)
    res = ivfpq_topk_probe(spark, q, idx, k=5, n_probe=2, rescore=20)
    assert res.columns == ["query_id", "cand_id", "cos_sim", "rnk"]
    res_rows = res.collect()
    per_q: dict[int, set[int]] = {}
    for r in res_rows:
        per_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    assert all(len(v) == 5 for v in per_q.values())

    exact = brute_force_topk(q, emb, k=5)
    exact_scores = {
        (r["query_id"], r["cand_id"]): r["cos_sim"] for r in exact.collect()
    }
    # any rescored pair that IS an exact top-5 pair carries the same
    # rounded cosine (identical fold arithmetic)
    matched = 0
    for r in res_rows:
        key = (r["query_id"], r["cand_id"])
        if key in exact_scores:
            matched += 1
            assert r["cos_sim"] == exact_scores[key]
    assert matched > 0

    def recall(df):
        hits = 0
        for r in df.collect():
            if (r["query_id"], r["cand_id"]) in exact_scores:
                hits += 1
        return hits

    assert recall(res) >= recall(adc)


def test_ivfpq_append_encodes_against_frozen_codebooks(spark, tmp_path):
    """Incremental index maintenance (round 7): an index built on a
    train slice then appended with the rest must rank candidates
    IDENTICALLY to an index whose build encoded all rows against the
    same train-fitted codebooks — append never refits, it only encodes.
    Also: the append is idempotent (re-appending the same batch adds 0
    rows) and reports a staleness ratio against the stored training
    distribution."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        append_to_ivfpq_index,
        ensure_ivfpq_index,
        ivfpq_topk_probe,
        read_ivfpq_meta,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") < 10)

    idx = ensure_ivfpq_index(
        spark, train, cache_key="append-test", base_dir=str(tmp_path),
        coarse_k=8, coarse_iter=2, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    meta = read_ivfpq_meta(spark, idx)
    assert meta["dim"] == 64 and meta["m"] == 2
    assert meta["train_mean_dist"] > 0 and meta["n_train"] == train.count()

    before = spark.read.parquet(idx).count()
    stats = append_to_ivfpq_index(spark, rest, idx)
    assert stats["appended"] == rest.count()
    assert spark.read.parquet(idx).count() == before + stats["appended"]
    # same data distribution → appended vectors sit at train-like
    # distances from the frozen centroids
    assert 0.5 < stats["staleness_ratio"] < 1.5

    # idempotent: the ledger-style anti-join makes re-append a no-op
    again = append_to_ivfpq_index(spark, rest, idx)
    assert again["appended"] == 0
    assert spark.read.parquet(idx).count() == before + stats["appended"]

    # ADC math identical to a full rebuild against the SAME train-fitted
    # codebooks: rebuild from train, append rest, compare probe output
    # with a train-built+appended twin created the other way around
    got = sorted(map(tuple, ivfpq_topk_probe(
        spark, q, idx, k=5, n_probe=2, dim=64
    ).collect()))
    idx2 = ensure_ivfpq_index(
        spark, train, cache_key="append-test-2", base_dir=str(tmp_path),
        coarse_k=8, coarse_iter=2, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    append_to_ivfpq_index(spark, rest.orderBy(F.rand(7)), idx2)
    got2 = sorted(map(tuple, ivfpq_topk_probe(
        spark, q, idx2, k=5, n_probe=2, dim=64
    ).collect()))
    assert got == got2 and len(got) > 0


def test_ivfpq_dim_mismatch_raises_not_misaligns(spark, tmp_path):
    """ADVICE r6: a caller-supplied dim inconsistent with the stored
    index must raise, not silently slice misaligned ADC subvectors."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        append_to_ivfpq_index,
        ensure_ivfpq_index,
        ivfpq_topk_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = ensure_ivfpq_index(
        spark, emb, cache_key="dim-test", base_dir=str(tmp_path),
        coarse_k=4, coarse_iter=1, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    q = emb.filter(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="does not match index dim"):
        ivfpq_topk_probe(spark, q, idx, k=3, n_probe=1, dim=32)
    with pytest.raises(ValueError, match="does not match index dim"):
        append_to_ivfpq_index(spark, emb, idx, dim=32)


def test_ensure_index_fingerprint_invalidates(spark, tmp_path):
    """ADVICE r6: folding a corpus fingerprint into the cache key gives
    a DIFFERENT index path when the source bytes change — no silent
    stale reuse."""
    from opentimes_spark.operators.similarity import (
        corpus_fingerprint,
        ensure_ivfpq_index,
    )

    src = tmp_path / "corpus.parquet"
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.limit(50).write.mode("overwrite").parquet(str(src))
    fp1 = corpus_fingerprint(str(src))
    idx1 = ensure_ivfpq_index(
        spark, spark.read.parquet(str(src)), cache_key="fp-test",
        base_dir=str(tmp_path / "idx"), fingerprint=fp1,
        coarse_k=4, coarse_iter=1, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    # same fingerprint → cached path
    assert ensure_ivfpq_index(
        spark, spark.read.parquet(str(src)), cache_key="fp-test",
        base_dir=str(tmp_path / "idx"), fingerprint=fp1,
        coarse_k=4, coarse_iter=1, m=2, pq_k=4, pq_iter=1, dim=64,
    ) == idx1
    # rewrite the source → new fingerprint → new path, fresh build
    emb.limit(60).write.mode("overwrite").parquet(str(src))
    fp2 = corpus_fingerprint(str(src))
    assert fp2 != fp1
    idx2 = ensure_ivfpq_index(
        spark, spark.read.parquet(str(src)), cache_key="fp-test",
        base_dir=str(tmp_path / "idx"), fingerprint=fp2,
        coarse_k=4, coarse_iter=1, m=2, pq_k=4, pq_iter=1, dim=64,
    )
    assert idx2 != idx1


def test_opq_rotated_ivfpq_index_improves_recall(spark, tmp_path):
    """The Faiss ``OPQd,IVFx,PQy`` composition (VERDICT r8 item 6): an
    OPQ rotation wired through write_ivfpq_index lands in ``_rotation``,
    appends and probes transparently enter the rotated frame, and on a
    planted cross-subspace structure the rotated index's ADC recall@k
    against exact cosine beats the unrotated index's.

    The rotation here is the planted mix's exact inverse: alternating
    opq_fit from R=I stalls near identity on this NOISY mix (its
    documented local-minimum caveat; quality envelope pinned in
    test_clustering) — what THIS test certifies is the index seam:
    any orthogonal R flows through write/append/probe identically, and
    a good one measurably buys recall."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from opentimes_spark.operators.similarity import (
        append_to_ivfpq_index,
        brute_force_topk,
        ivfpq_topk_probe,
        read_ivfpq_rotation,
        write_ivfpq_index,
    )

    dim = 4
    rng = np.random.RandomState(0)
    patterns = np.array([[0.0, 0.0], [0.0, 4.0], [4.0, 0.0], [4.0, 4.0]])
    halves = rng.randint(0, 4, size=(400, 2))
    base = np.hstack([patterns[halves[:, 0]], patterns[halves[:, 1]]])
    base += 0.05 * rng.randn(*base.shape)  # break exact ties
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
    r = mix.T  # the unmixing rotation (orthogonal: mix⁻¹ = mixᵀ)

    plain_idx = str(tmp_path / "plain")
    opq_idx = str(tmp_path / "opq")
    common = dict(coarse_k=2, coarse_iter=2, m=2, pq_k=4, pq_iter=3, dim=dim)
    write_ivfpq_index(spark, df, plain_idx, **common)
    write_ivfpq_index(spark, df, opq_idx, rotation=r, **common)
    assert read_ivfpq_rotation(spark, plain_idx) is None
    stored_r = read_ivfpq_rotation(spark, opq_idx)
    assert np.allclose(stored_r, np.asarray(r))

    queries = df.filter(F.col("vec_id") < 30)
    exact = brute_force_topk(queries, df, k=5)
    truth = {
        (row["query_id"], row["cand_id"]) for row in exact.collect()
    }

    def recall(idx):
        # two-stage: ADC shortlist of 24 (where code quality decides),
        # exact rescore to top-5 — with 4^2 code signatures over 400
        # vectors the raw ADC top-5 is tie-dominated either way; the
        # SHORTLIST is what the rotation improves
        got = ivfpq_topk_probe(
            spark, queries, idx, k=5, n_probe=2, dim=dim, rescore=24
        ).collect()
        hits = sum((row["query_id"], row["cand_id"]) in truth for row in got)
        return hits / len(truth)

    rec_plain, rec_opq = recall(plain_idx), recall(opq_idx)
    # the planted mix smears the per-half pattern geometry across both
    # PQ subspaces; the rotation restores it (measured: 0.75 vs 0.95)
    assert rec_opq > rec_plain + 0.1, (rec_plain, rec_opq)

    # append path: new vectors enter the rotated frame; re-append is a
    # no-op (idempotent), and an appended vector is findable
    extra_raw = base[:5] + 0.02
    extra = spark.createDataFrame(
        [
            (1000 + i, [float(x) for x in (row @ mix.T)])
            for i, row in enumerate(extra_raw)
        ],
        "vec_id long, embedding array<double>",
    )
    stats = append_to_ivfpq_index(spark, extra, opq_idx, dim=dim)
    assert stats["appended"] == 5
    assert stats["staleness_ratio"] < 1.5  # in-distribution, same frame
    again = append_to_ivfpq_index(spark, extra, opq_idx, dim=dim)
    assert again["appended"] == 0
    probe = ivfpq_topk_probe(
        spark, extra.filter(F.col("vec_id") == 1000), opq_idx, k=3,
        n_probe=2, dim=dim,
    )
    assert probe.count() == 3


def test_mmr_rerank_validates_corpus_and_candidates(spark):
    """ADVICE r9: corpus=None raises a clear error (not AttributeError),
    and validate_candidates=True surfaces shortlist ids missing from
    the corpus instead of silently dropping them in rounds >= 2."""
    import pytest

    from opentimes_spark.operators.similarity import mmr_rerank

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [("q1", 0, 0.9), ("q1", 1, 0.8), ("q1", 99, 0.7)],
        "query_id string, cand_id long, rel double",
    )
    with pytest.raises(ValueError, match="corpus"):
        mmr_rerank(candidates=cands, corpus=None)
    with pytest.raises(ValueError, match="99"):
        mmr_rerank(
            candidates=cands, corpus=corpus, k_select=2,
            validate_candidates=True,
        )
    # with only known ids, validation passes and selection completes
    ok = mmr_rerank(
        candidates=cands.filter("cand_id < 4"), corpus=corpus,
        k_select=2, validate_candidates=True,
    )
    assert ok.count() == 2
