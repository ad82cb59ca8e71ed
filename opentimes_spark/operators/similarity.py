"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Query side is broadcast (queries ≪ corpus); the corpus is scanned once
  per batch of queries, cost O(|Q|·|C|·d) spread across executors. Right
  strategy when |Q| is small; at 100 TB with large |Q| use the IVF path.
- ``ivf_topk``: IVF-style ANN — partition the corpus by nearest centroid
  (here: per-label mean vectors, deterministic), probe only the
  ``n_probe`` nearest centroids per query. Turns the scan into a
  partition-pruned lookup: cost drops by ~n_centroids/n_probe, the
  centroid assignment is a one-off broadcast join, and the corpus can be
  *stored* partitioned by centroid id so the probe prunes files.

All math in DOUBLE via functions/vectors.py (sequential fold → matches
the DuckDB oracle bit-for-bit on DOUBLE[]-cast inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentimes_spark.functions.vectors import cosine


def _well_formed_vecs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Exclude rows whose id or vector is NULL before any vector op —
    the SQL-aggregate exclusion policy (r13 nulls-compare gate): a NULL
    vector carries no position, NULLs a fold, poisons a numpy stack, or
    raises through the length assert.  Mirrored in every caller's
    oracle as ``WHERE embedding IS NOT NULL``."""
    return df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).
    Rank on the raw double; emit the rounded score. Ties broken by
    candidate id for determinism."""
    queries = _well_formed_vecs(queries, id_col, vec_col)
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cos", round_to).alias("cos_sim"),
            "rnk",
        )
    )


def label_centroids(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Deterministic centroids: per-label mean vector.

    ONE shuffle and NO row fan-out: d per-dimension
    ``AVG(element_at(vec, i))`` aggregate expressions, evaluated JVM-side
    with map-side partial aggregation — each input partition contributes
    one (label → d partial sums) row to the exchange. The previous
    posexplode formulation multiplied shuffle *rows* by d (an index-build
    cost that at d≈768 dwarfs the probe); this sends the same d doubles
    per (partition, label) without the explode or the second groupBy.
    ``dim`` is peeked from one row when not given (bounded 1-row driver
    action; pass it explicitly in pipelines that know their schema).
    """
    corpus = _well_formed_vecs(corpus, label_col, vec_col)
    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("empty corpus: cannot infer embedding dim")
        dim = len(first[0])
    avgs = [
        F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"_m{i}")
        for i in range(dim)
    ]
    return (
        corpus.groupBy(F.col(label_col).alias("centroid_id"))
        .agg(*avgs)
        .select(
            "centroid_id",
            F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias("centroid"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """ANN top-k probing only the ``n_probe`` centroids nearest to each
    query. Corpus rows are assigned to their own label's centroid (the
    storage-partitioning key at scale)."""
    queries = _well_formed_vecs(queries, id_col, vec_col)
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("cent_cos"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", cosine(F.col("q_vec"), F.col("centroid")))
        .withColumn("cent_rnk", F.row_number().over(probe_w))
        .filter(F.col("cent_rnk") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("centroid_id"),
    )
    scored = (
        probes.join(c, "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", F.round("cos", round_to).alias("cos_sim"), "rnk")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    round_to: int = 6,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold. Blocked by
    ``block_col`` (label/centroid) so the self-join is per-block rather
    than full n² — the standard scale pattern: cluster first, compare
    within clusters."""
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = corpus.select(*cols)
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        *([F.col("blk")] if block_col else []),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        *([F.col("blk")] if block_col else []),
    )
    joined = a.join(b, on="blk" if block_col else None) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", round_to).alias("cos_sim"))
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> None:
    """Materialize the IVF index as a Hive layout partitioned by
    centroid id — the storage half of ``ivf_topk``'s claim: probing
    n_probe centroids then touches n_probe DIRECTORIES (partition
    pruning), exactly like the times table prunes on its Hive keys.
    At 100 TB the corpus scan cost per query drops by
    ~n_centroids/n_probe before a single row is read.

    The centroid table rides along under ``<path>/_centroids`` (the
    underscore prefix hides it from the Hive partition listing), so a
    probe never recomputes centroids — build cost is paid once at WRITE
    time, the way a real ANN index amortizes training.  Each row also
    stores its vector L2 norm (``_norm``), computed with the exact
    left-fold expression the inline scorer uses, so probes pay ONE fold
    (the dot product) per candidate pair instead of three — results stay
    bit-identical because the stored double equals what the inline
    ``cosine`` would recompute."""
    corpus = _well_formed_vecs(corpus, id_col, vec_col).filter(
        F.col(label_col).isNotNull()
    )
    from opentimes_spark.functions.vectors import norm

    (
        corpus.select(
            id_col,
            vec_col,
            norm(F.col(vec_col)).alias("_norm"),
            F.col(label_col).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    label_centroids(corpus, label_col, vec_col, dim).write.mode(
        "overwrite"
    ).parquet(path + "/_centroids")


def write_ivf_index_kmeans(
    spark,
    corpus: DataFrame,
    path: str,
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """IVF index built by REAL Lloyd k-means (``operators/
    clustering.py``) instead of per-label means — the unsupervised path
    for corpora without a partitioning label.  Fit runs driver-bounded
    Lloyd (zero-shuffle literal-centroid assignment, one map-side-
    combined update shuffle per iteration, convergence on ``tol``); the
    final assignment partitions the Hive layout exactly like
    ``write_ivf_index``; the k fitted centroids land in
    ``<path>/_centroids`` from the driver (k x dim — bytes).  Same
    storage contract, so ``ivf_topk_probe`` works unchanged."""
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    from opentimes_spark.functions.vectors import norm
    from opentimes_spark.operators.clustering import assign_expr, kmeans_fit

    model = kmeans_fit(
        corpus, k=k, max_iter=max_iter, tol=tol, id_col=id_col, vec_col=vec_col
    )
    (
        corpus.select(
            id_col,
            vec_col,
            norm(F.col(vec_col)).alias("_norm"),
            assign_expr(F.col(vec_col), model.centroids).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(model.centroids.items())],
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(path + "/_centroids")


def read_ivf_centroids(spark, path: str) -> DataFrame:
    """The centroid table materialized by ``write_ivf_index``."""
    return spark.read.parquet(path + "/_centroids")


def ensure_ivf_index(
    spark,
    corpus: DataFrame,
    cache_key: str,
    base_dir: str | None = None,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    builder: str = "label",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-9,
    fingerprint: tuple | None = None,
) -> str:
    """Build-once semantics of a real ANN index: if an index keyed by
    ``cache_key`` (e.g. the source directory) already has a PUBLISHED
    version, return its live version directory without touching the
    corpus; otherwise build and publish one.  Key is content-addressed
    on the cache_key string (plus the builder settings) only —
    rewriting the source under the same path requires clearing the
    index dir (documented staleness contract).

    ``builder="label"`` partitions by per-label mean centroids (needs a
    label column); ``builder="kmeans"`` fits real Lloyd k-means
    (``k``/``max_iter``/``tol``) for unlabeled corpora.

    Pass ``fingerprint=corpus_fingerprint(source_path)`` to fold the
    source's (file count, bytes, max mtime) into the key so rewritten
    data under the same path gets a fresh index instead of silently
    reusing a stale one.

    Since r10 the root is a VERSIONED SNAPSHOT root (same read-through
    contract as ``ensure_ivfpq_index``): a published version is
    consumed with no refit, a miss fits and publishes under the lock +
    atomic pointer.  Returns the live version directory."""
    import hashlib
    import os
    import tempfile

    from opentimes_spark.io import snapshots

    if builder not in ("label", "kmeans"):
        raise ValueError(f"unknown IVF builder: {builder!r}")
    base = base_dir or os.path.join(tempfile.gettempdir(), "opentimes_ivf")
    keyed = f"{cache_key}::{builder}::{k}::{max_iter}::{tol!r}::{fingerprint!r}"
    root = os.path.join(
        base, hashlib.md5(keyed.encode("utf-8")).hexdigest()[:16]
    )
    try:
        return snapshots.current_dir(root)
    except FileNotFoundError:
        pass

    def build(d: str) -> None:
        if builder == "kmeans":
            write_ivf_index_kmeans(
                spark, corpus, d, k=k, max_iter=max_iter, tol=tol,
                vec_col=vec_col, id_col=id_col,
            )
        else:
            write_ivf_index(corpus, d, label_col, vec_col, id_col, dim)

    snapshots.publish_dir_snapshot(
        root, build, meta={"built_from": "ensure", "builder": builder}
    )
    return snapshots.current_dir(root)


def ivf_topk_probe(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """The probe half of IVF against a MATERIALIZED index: rank the
    (small, pre-computed) centroid table per query, broadcast the probe
    assignment, and let DYNAMIC PARTITION PRUNING skip every
    non-probed directory of the index scan — one Spark job, no driver
    round-trip (the broadcast is reused as the pruning filter; the scan
    shows ``dynamicpruningexpression`` in PartitionFilters).  Per-pair
    scoring pays a single fold (the dot product): the candidate norm is
    read from the index, the query norm is computed once per probe row
    before the join.  Same output contract (and bit-identical scores)
    as ``ivf_topk``."""
    queries = _well_formed_vecs(queries, id_col, vec_col)
    from opentimes_spark.functions.vectors import dot, norm

    cents = read_ivf_centroids(spark, index_path)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("cent_cos"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", cosine(F.col("q_vec"), F.col("centroid")))
        .withColumn("cent_rnk", F.row_number().over(probe_w))
        .filter(F.col("cent_rnk") <= n_probe)
        .select("query_id", "q_vec", norm(F.col("q_vec")).alias("q_norm"), "centroid_id")
    )
    c = spark.read.parquet(index_path).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
        "centroid_id",
    )
    # NULL (not NaN) for a zero-norm side: a raw double division gives
    # NaN, which Spark sorts GREATER than every double — a zero vector
    # would rank #1 under desc.  NULL sorts last, matching the guarded
    # cosine() contract ivf_topk uses.
    denom = F.col("q_norm") * F.col("c_norm")
    scored = (
        c.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos",
            F.when(denom != 0.0, dot(F.col("q_vec"), F.col("c_vec")) / denom),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", F.round("cos", round_to).alias("cos_sim"), "rnk")
    )


def read_ivf_probe(spark, path: str, centroid_ids: list[str]) -> DataFrame:
    """Partition-pruned probe read of an IVF index written by
    ``write_ivf_index`` (centroid ids arrive as strings — partition
    values stay strings engine-wide)."""
    return spark.read.parquet(path).filter(
        F.col("centroid_id").isin([str(c) for c in centroid_ids])
    )


def brute_force_topk_numpy(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_broadcast_queries: int = 10_000,
) -> DataFrame:
    """The at-scale fast path of ``brute_force_topk``: the query block
    rides a broadcast as a normalized numpy MATRIX and each Arrow batch
    of the corpus is scored with one BLAS matmul (Q̂ · Ĉᵀ) inside
    mapInPandas, followed by a per-batch top-(k+1) cut so only
    |Q|·(k+1) candidate rows per batch reach the final window — not
    |Q|·|batch|. Measured 10× faster than the fold-expression variant
    at sf0.1 (0.30s vs 2.8s) with identical neighbor sets; scores can
    differ from the sequential fold in the last ulp (pairwise vs
    sequential summation), so this variant is rows-only for the oracle
    — ``brute_force_topk`` stays the hash-checked twin.
    """
    queries = _well_formed_vecs(queries, id_col, vec_col)
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    import numpy as np
    import pandas as pd

    from opentimes_spark.session import ship_package

    spark = queries.sparkSession
    ship_package(spark)
    # NULL ids/vectors can't be scored — excluded like SQL aggregates
    # skip NULLs (and np.array over ragged None rows would throw)
    _present = F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    qrows = (
        queries.select(id_col, vec_col)
        .filter(_present)
        .orderBy(id_col)
        .limit(max_broadcast_queries + 1)
        .collect()
    )
    if len(qrows) > max_broadcast_queries:
        raise ValueError(
            f"query side exceeds max_broadcast_queries={max_broadcast_queries}; "
            "block the queries (e.g. by IVF centroid) and run per block"
        )
    qids = np.array([r[id_col] for r in qrows])
    Q = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(Q, axis=1, keepdims=True)
    # zero-norm guard: a zero vector scores cos=0 against everything
    # (deterministic, never NaN → rows can't silently vanish at the
    # threshold compare)
    Qn = Q / np.where(qnorm == 0.0, 1.0, qnorm)
    bc = spark.sparkContext.broadcast((qids, Qn))

    def score(batches):
        qids_l, Qn_l = bc.value
        for b in batches:
            if not len(b):
                continue
            C = np.array(list(b[vec_col]), dtype=np.float64)
            cnorm = np.linalg.norm(C, axis=1, keepdims=True)
            Cn = C / np.where(cnorm == 0.0, 1.0, cnorm)
            S = Qn_l @ Cn.T
            cids = b[id_col].to_numpy()
            kk = min(k + 1, S.shape[1])  # +1 absorbs the self-match
            # keep EVERY candidate tied with the kk-th score, not an
            # arbitrary argpartition subset — equal-cosine candidates at
            # the cut boundary (duplicate embeddings) must all survive so
            # the final (cos desc, cand_id asc) window is deterministic
            thresh = -np.partition(-S, kk - 1, axis=1)[:, kk - 1]
            qi, ci = np.nonzero(S >= thresh[:, None])
            yield pd.DataFrame(
                {
                    "query_id": qids_l[qi],
                    "cand_id": cids[ci],
                    "cos": S[qi, ci],
                }
            )

    # derive the id field types from the actual inputs (query side and
    # corpus side may differ) instead of hardcoding bigint
    q_id_t = queries.schema[id_col].dataType.simpleString()
    c_id_t = corpus.schema[id_col].dataType.simpleString()
    scored = corpus.select(id_col, vec_col).filter(_present).mapInPandas(
        score, f"query_id {q_id_t}, cand_id {c_id_t}, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "cand_id", F.round("cos", round_to).alias("cos_sim"), "rnk"
        )
    )


# ---------------------------------------------------------------------------
# SRP-LSH: signed-random-projection bucketed ANN (the LSH scale path the
# brief names alongside IVF).  Charikar 2002 ("Similarity estimation
# techniques from rounding algorithms"): P[bit_a = bit_b] = 1 - θ/π, so
# vectors at high cosine collide in whole buckets with high probability.
# ---------------------------------------------------------------------------


def srp_sign_planes(
    n_planes: int = 16, dim: int = 64, seed: str = "srp"
) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5(seed:plane:dim) — Rademacher
    projections are LSH-valid (Achlioptas 2003 sparse-sign projections)
    and, unlike gaussian draws, replay exactly in the SQL oracle as
    literal arrays."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()[0] & 1 else -1
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_signatures(
    corpus: DataFrame,
    planes: list[list[int]],
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_id, bucket) — one row per hash table.  Each bit is the
    sign of <v, s_p> (left-fold in DOUBLE, bit-identical to the oracle's
    list_dot_product); each table packs its contiguous plane-group into
    an integer bucket key.  Zero-shuffle: pure per-row expressions.
    NULL-id/NULL-vector rows emit no signature rows (r13 policy: a NULL
    vector carries no position) — handled inside the projection, no
    filter pass.

    Built as ONE nested higher-order expression shipped as a single
    expr() string — planes ride a 2-D array literal and `transform`
    iterates them engine-side.  The naive form (a Python loop emitting
    16 separate fold subtrees of 64 scalar literals each) cost ~2s of
    DRIVER time per query build in py4j construction + analysis; the
    python-lambda HOF builders still cost ~1,800 round trips (~0.65s);
    one parsed string is one round trip and builds in milliseconds,
    which is also what keeps a 1000-plane config usable."""
    if len(planes) % n_tables:
        raise ValueError(f"{len(planes)} planes not divisible by {n_tables} tables")
    per = len(planes) // n_tables
    dim = len(planes[0])
    # The WHOLE projection ships as two expr() strings: the python-lambda
    # HOF builders (transform/aggregate/zip_with) cost ~30 py4j round
    # trips EACH to register their lambdas, ~1,800 per build — measured
    # at ~0.65 s of driver time per query construction at 16 planes.
    # One SQL string is one round trip; the JVM parser builds the same
    # Catalyst tree (same fold order, same doubles — values unchanged).
    planes_lit = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)}D" for x in p) + ")" for p in planes
    ) + ")"
    # NULL-exclusion folded into the projection (r13 nulls policy — a
    # NULL id/vector carries no position): NULL `_bits` flows to NULL
    # buckets, and posexplode(NULL) emits no rows, so malformed rows
    # drop without a separate Filter pass over the vector column.
    #
    # dimension guard: a vector shorter/longer than the planes would
    # null-pad zip_with, NULL the fold, and the IF's else-0 would
    # silently collapse every row into bucket 0 (quadratic join, wrong
    # recall).  assert_true returns NULL on pass, raises per-row on a
    # present-but-misshapen vector.
    bits_sql = (
        f"CASE WHEN `{id_col}` IS NULL OR `{vec_col}` IS NULL THEN NULL "
        f"WHEN assert_true(size(`{vec_col}`) = {dim}, concat("
        f"'srp_signatures: embedding length != plane dim {dim} at id=', "
        f"CAST(`{id_col}` AS STRING))) IS NULL THEN "
        f"transform({planes_lit}, p -> CASE WHEN aggregate("
        f"zip_with(transform(`{vec_col}`, x -> CAST(x AS DOUBLE)), p, "
        f"(x, w) -> x * w), 0.0D, (a, x) -> a + x) >= 0 "
        f"THEN 1 ELSE 0 END) END"
    )
    pow2_lit = "array(" + ",".join(f"{float(1 << i)}D" for i in range(per)) + ")"
    # stage the bit vector as a real column: HOF subtrees are interpreted
    # and not CSE'd, so packing straight off `bits` would re-run all
    # n_planes folds once PER TABLE
    buckets_sql = (
        f"CASE WHEN `_bits` IS NULL THEN NULL ELSE "
        f"transform(sequence(0, {n_tables - 1}), t -> CAST(aggregate("
        f"zip_with(slice(`_bits`, t * {per} + 1, {per}), {pow2_lit}, "
        f"(b, w) -> b * w), 0.0D, (a, x) -> a + x) AS BIGINT)) END"
    )
    return corpus.select(
        F.col(id_col).alias("id"), F.expr(bits_sql).alias("_bits")
    ).select("id", F.posexplode(F.expr(buckets_sql)).alias("table_id", "bucket"))


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """ANN top-k via SRP-LSH candidate buckets + exact cosine rescore.

    Scale shape (the point at 100 TB): the bucket join shuffles only
    (id, table_id, bucket) — never the vectors; candidate pairs are
    DISTINCT'd before rescoring so a pair sharing several tables is
    scored once; vectors re-attach by id afterwards (queries broadcast,
    corpus equi-join).  Versus IVF this needs no index build/centroids —
    signatures are per-row expressions — at the cost of recall being
    governed by (n_planes/n_tables, n_tables) instead of n_probe.

    NULL policy (r13, value-gated): the signature projection itself
    drops NULL-id/NULL-vector rows (posexplode of the NULL bucket array
    emits nothing), so the bucket branch needs no separate filter pass;
    the vector re-attach keeps the explicit `_well_formed_vecs` guard so
    a duplicate id with a NULL vector can never reach the cosine
    rescore."""
    planes = srp_sign_planes(n_planes, dim)
    sig_q = srp_signatures(queries, planes, n_tables, id_col, vec_col).withColumnsRenamed(
        {"id": "query_id"}
    )
    sig_c = srp_signatures(corpus, planes, n_tables, id_col, vec_col).withColumnsRenamed(
        {"id": "cand_id"}
    )
    pairs = (
        sig_q.join(sig_c, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    queries = _well_formed_vecs(queries, id_col, vec_col)
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        pairs.join(qv, "query_id")
        .join(cv, "cand_id")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "cand_id", F.round("cos", round_to).alias("cos_sim"), "rnk"
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    coarse_k: int = 8,
    coarse_iter: int = 2,
    m: int = 2,
    pq_k: int = 4,
    pq_iter: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou, Douze & Schmid 2011; the Faiss
    `IVFx,PQy` composition): a coarse k-means quantizer prunes the
    corpus to ``n_probe`` cells per query, and candidates are ranked by
    ASYMMETRIC DISTANCE (ADC) — the exact query subvector against the
    candidate's quantized codes — so ranking needs only each
    candidate's m small codes, never its full vector.

    Scale shape: coarse assignment and PQ encoding are zero-shuffle
    literal-centroid projections (both codebooks are driver-side
    bytes); each query precomputes its m ADC lookup tables (m·pq_k
    doubles) as literal expressions; the probe explodes queries to
    (query, cell) rows and EQUI-JOINS candidates on the cell key —
    with a cell-partitioned index layout that join is partition-pruned
    I/O, and the per-candidate work is m array lookups + an add.  The
    ADC tables ride the row, so no per-pair vector math ever runs.
    Determinism: the same first-k/fold/cid-tie contract as kmeans_fit,
    L2 cell ranking, (adc, cand_id) result ordering."""
    from opentimes_spark.operators.clustering import (
        _lit_vec,
        _nearest_struct,
        _pq_guarded_vec,
        _self_dot,
        assign_expr,
        kmeans_fit,
        pq_fit,
    )
    from opentimes_spark.functions.vectors import dot

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    coarse = kmeans_fit(
        corpus, k=coarse_k, max_iter=coarse_iter, tol=0.0,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    pqs = pq_fit(
        corpus, m=m, k=pq_k, max_iter=pq_iter, dim=dim,
        id_col=id_col, vec_col=vec_col,
    )

    # wrong-length vectors raise per-row rather than silently encoding
    # to an arbitrary code (NULLed fold) — same guard as pq_codes
    cbase = corpus.select(
        F.col(id_col).alias("cand_id"),
        _pq_guarded_vec(id_col, vec_col, dim).alias("v"),
    )
    code_cols = [
        _nearest_struct(F.slice(F.col("v"), j * sub + 1, sub), pqs[j].centroids)[
            "cid"
        ].alias(f"code{j}")
        for j in range(m)
    ]
    cand = cbase.select(
        "cand_id", assign_expr(F.col("v"), coarse.centroids).alias("cell"), *code_cols
    )

    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        _pq_guarded_vec(id_col, vec_col, dim).alias("q_vec"),
    )
    # top-n_probe cells by L2, ties on cid — array_sort == ROW_NUMBER
    qv = F.col("q_vec")
    cell_structs = F.array(
        *[
            F.struct(
                (
                    dot(qv, qv) - 2.0 * dot(qv, _lit_vec(c)) + F.lit(_self_dot(c))
                ).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in sorted(coarse.centroids.items())
        ]
    )
    probe_cells = F.transform(
        F.slice(F.array_sort(cell_structs), 1, n_probe), lambda s: s["cid"]
    )
    # per-subspace ADC lookup tables, in cid order for element_at
    adc_cols = []
    for j in range(m):
        qs = F.slice(qv, j * sub + 1, sub)
        adc_cols.append(
            F.array(
                *[
                    dot(qs, qs)
                    - 2.0 * dot(qs, _lit_vec(c))
                    + F.lit(_self_dot(c))
                    for _cid, c in sorted(pqs[j].centroids.items())
                ]
            ).alias(f"adc{j}")
        )
    probes = qbase.select(
        "query_id", F.explode(probe_cells).alias("cell"), *adc_cols
    )
    adc = None
    for j in range(m):
        term = F.element_at(F.col(f"adc{j}"), F.col(f"code{j}"))
        adc = term if adc is None else adc + term
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        probes.join(cand, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("adc", adc)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("adc", round_to).alias("adc_dist"),
            "rnk",
        )
    )


def write_ivfpq_index(
    spark,
    corpus: DataFrame,
    path: str,
    coarse_k: int = 8,
    coarse_iter: int = 2,
    m: int = 2,
    pq_k: int = 4,
    pq_iter: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation=None,
) -> None:
    """Materialize an IVF-PQ index: the corpus Hive-partitioned by
    coarse cell with each row carrying its m PQ codes, the coarse
    centroids under ``_centroids`` and the per-subspace codebooks under
    ``_codebooks`` (subspace, cid, c).  Build cost — both fits + one
    encode pass — is paid once at write time; the stored codes mean a
    probe never touches candidate vectors at all (they are stored only
    for optional exact rescoring).  Same staleness/cache contract as
    ``write_ivf_index``.

    ``rotation`` (a dim×dim orthogonal matrix, e.g. from
    ``clustering.opq_fit``) builds the Faiss ``OPQd,IVFx,PQy`` shape:
    the WHOLE index lives in the rotated frame — corpus is rotated once
    (map-only BLAS pass) before the coarse fit, the PQ fits, the encode,
    and the stored vectors; R is persisted under ``_rotation`` so
    ``append_to_ivfpq_index`` and ``ivfpq_topk_probe`` transparently
    rotate incoming vectors/queries.  L2 and cosine are rotation-
    invariant, so cell geometry, staleness baselines, and rescore
    results are unchanged in meaning — only the PQ subspace axes move,
    which is the whole point (VERDICT r8 item 6)."""
    from opentimes_spark.operators.clustering import (
        _nearest_struct,
        _pq_guarded_vec,
        apply_rotation,
        assign_expr,
        kmeans_fit,
        pq_fit,
    )

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    if rotation is not None:
        corpus = apply_rotation(corpus, rotation, dim, id_col, vec_col)
    coarse = kmeans_fit(
        corpus, k=coarse_k, max_iter=coarse_iter, tol=0.0,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    pqs = pq_fit(
        corpus, m=m, k=pq_k, max_iter=pq_iter, dim=dim,
        id_col=id_col, vec_col=vec_col,
    )
    base = corpus.select(
        F.col(id_col), _pq_guarded_vec(id_col, vec_col, dim).alias("v")
    )
    code_cols = [
        _nearest_struct(F.slice(F.col("v"), j * sub + 1, sub), pqs[j].centroids)[
            "cid"
        ].cast("int").alias(f"code{j}")
        for j in range(m)
    ]
    (
        base.select(
            F.col(id_col),
            F.col("v").alias(vec_col),
            *code_cols,
            assign_expr(F.col("v"), coarse.centroids).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(coarse.centroids.items())],
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(path + "/_centroids")
    spark.createDataFrame(
        [
            (j, cid, vec)
            for j, model in enumerate(pqs)
            for cid, vec in sorted(model.centroids.items())
        ],
        "subspace int, cid int, c array<double>",
    ).write.mode("overwrite").parquet(path + "/_codebooks")
    # Index metadata: geometry (dim, m — probes validate against these
    # instead of trusting caller-supplied dims, which silently misalign
    # ADC subvector slices) and the training distribution's mean
    # vector→coarse-centroid distance (the append path's staleness
    # baseline).
    train_stats = (
        base.select(_cell_dist_expr(F.col("v"), coarse.centroids).alias("d"))
        .agg(F.avg("d").alias("mean_d"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    spark.createDataFrame(
        [(dim, m, coarse_k, pq_k, float(train_stats["mean_d"]),
          int(train_stats["n"]))],
        "dim int, m int, coarse_k int, pq_k int, "
        "train_mean_dist double, n_train bigint",
    ).write.mode("overwrite").parquet(path + "/_meta")
    if rotation is not None:
        import numpy as np

        r = np.asarray(rotation, dtype=np.float64)
        spark.createDataFrame(
            [(i, [float(x) for x in r[i]]) for i in range(dim)],
            "i int, r array<double>",
        ).write.mode("overwrite").parquet(path + "/_rotation")


def read_ivfpq_rotation(spark, path: str):
    """The index's stored OPQ rotation as a dim×dim ndarray, or None
    for an unrotated index."""
    import os

    import numpy as np

    if not os.path.exists(os.path.join(path, "_rotation", "_SUCCESS")):
        return None
    rows = spark.read.parquet(path + "/_rotation").collect()
    return np.array(
        [list(r["r"]) for r in sorted(rows, key=lambda x: x["i"])],
        dtype=np.float64,
    )


def _cell_dist_expr(v, centroids: dict):
    """L2 distance from ``v`` to its NEAREST centroid (literal-centroid
    fold, zero shuffle) — the quantization-coverage measure behind the
    append path's staleness ratio."""
    from opentimes_spark.operators.clustering import _lit_vec, _self_dot
    from opentimes_spark.functions.vectors import dot

    dists = F.array(
        *[
            dot(v, v) - 2.0 * dot(v, _lit_vec(c)) + F.lit(_self_dot(c))
            for _cid, c in sorted(centroids.items())
        ]
    )
    return F.sqrt(F.greatest(F.array_min(dists), F.lit(0.0)))


def read_ivfpq_meta(spark, path: str) -> dict:
    """Index metadata row as a dict; {} for pre-round-7 indexes."""
    import os

    if not os.path.exists(os.path.join(path, "_meta", "_SUCCESS")):
        return {}
    return spark.read.parquet(path + "/_meta").collect()[0].asDict()


def append_to_ivfpq_index(
    spark,
    new_vectors: DataFrame,
    path: str,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally add vectors to a materialized IVF-PQ index WITHOUT
    reclustering (VERDICT r6 item 6): each new row is encoded against
    the EXISTING codebooks into its existing coarse cell and appended to
    that cell's Hive partition — O(batch) work, mirroring
    ``incremental_exact_dedup``'s ledger contract
    (operators/dedup.py:751), not O(corpus).

    Idempotent: ids already present in the index are anti-joined away
    (a 1-column pruned scan of the stored index — never the vectors),
    so re-appending the same batch is a no-op.

    Returns staleness telemetry: ``appended`` row count,
    ``mean_cell_dist`` (mean L2 of appended vectors to their assigned
    coarse centroid), the stored ``train_mean_dist`` baseline, and
    ``staleness_ratio`` = mean/baseline.  A drifting corpus (ratio
    >> 1, e.g. >1.5) means the frozen centroids no longer cover the
    data and a rebuild (``write_ivfpq_index``) should be scheduled —
    the quantization-error analogue of the dedup ledger's compaction
    trigger.

    OPQ-rotated indexes (a stored ``_rotation``) rotate the incoming
    batch once before encoding — appends land in the same frame the
    index lives in, and the staleness baseline (computed in rotated
    space at build time) stays comparable because L2 is rotation-
    invariant."""
    from opentimes_spark.operators.clustering import (
        _nearest_struct,
        _pq_guarded_vec,
        apply_rotation,
        assign_expr,
    )

    meta = read_ivfpq_meta(spark, path)
    if not meta:
        raise ValueError(f"no _meta at {path} — rebuild with write_ivfpq_index")
    if dim is None:
        dim = meta["dim"]
    elif dim != meta["dim"]:
        raise ValueError(
            f"dim={dim} does not match index dim={meta['dim']} at {path}"
        )
    m = meta["m"]
    sub = dim // m
    cents = {
        r["centroid_id"]: list(r["centroid"])
        for r in spark.read.parquet(path + "/_centroids").collect()
    }
    codebooks: list[dict[int, list[float]]] = [dict() for _ in range(m)]
    for r in spark.read.parquet(path + "/_codebooks").collect():
        codebooks[r["subspace"]][r["cid"]] = list(r["c"])

    rot = read_ivfpq_rotation(spark, path)
    if rot is not None:
        new_vectors = apply_rotation(new_vectors, rot, dim, id_col, vec_col)
    existing = spark.read.parquet(path).select(F.col(id_col))
    base = (
        new_vectors.select(
            F.col(id_col), _pq_guarded_vec(id_col, vec_col, dim).alias("v")
        )
        .join(existing, on=id_col, how="left_anti")
    )

    code_cols = [
        _nearest_struct(
            F.slice(F.col("v"), j * sub + 1, sub), codebooks[j]
        )["cid"].cast("int").alias(f"code{j}")
        for j in range(m)
    ]
    # localCheckpoint (not persist): the write below APPENDS to the
    # same directory this plan's anti-join reads — truncating the
    # lineage guarantees the write job can never re-list the path it
    # is mutating (the classic read-your-own-write hazard a cache
    # eviction would otherwise reintroduce)
    encoded = base.select(
        F.col(id_col),
        F.col("v").alias(vec_col),
        *code_cols,
        assign_expr(F.col("v"), cents).alias("centroid_id"),
        _cell_dist_expr(F.col("v"), cents).alias("_cell_d"),
    ).localCheckpoint(eager=True)
    stats = encoded.agg(
        F.count(F.lit(1)).alias("n"), F.avg("_cell_d").alias("mean_d")
    ).collect()[0]
    n_appended = int(stats["n"])
    if n_appended:
        (
            encoded.drop("_cell_d")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(path)
        )
    mean_d = float(stats["mean_d"]) if n_appended else 0.0
    baseline = float(meta["train_mean_dist"])
    return {
        "appended": n_appended,
        "mean_cell_dist": mean_d,
        "train_mean_dist": baseline,
        "staleness_ratio": (mean_d / baseline) if (n_appended and baseline) else 0.0,
    }


def corpus_fingerprint(path: str) -> tuple[int, int, int]:
    """(n_files, total_bytes, max_mtime_ns) over a parquet file or
    directory — a cheap content proxy for the ensure_* cache keys so a
    rewritten corpus under the same path invalidates the cached index
    (ADVICE r6: ensure_ivfpq_index staleness)."""
    import os

    n = sz = mt = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                st = os.stat(os.path.join(root, f))
                n += 1
                sz += st.st_size
                mt = max(mt, st.st_mtime_ns)
    elif os.path.exists(path):
        st = os.stat(path)
        n, sz, mt = 1, st.st_size, st.st_mtime_ns
    return (n, sz, mt)


def ivfpq_cache_root(
    cache_key: str,
    base_dir: str | None = None,
    fingerprint: tuple | None = None,
    **kwargs,
) -> str:
    """The content-addressed VERSIONED ROOT ``ensure_ivfpq_index``
    resolves for a (cache_key, build params, corpus fingerprint)
    triple.  Exposed so the lifecycle job (``jobs/maintain_indexes.
    maintain_ivfpq_index``) can be pointed at the SAME root a query's
    ensure call will read through — one index, one pointer, one code
    path."""
    import hashlib
    import os
    import tempfile

    base = base_dir or os.path.join(tempfile.gettempdir(), "opentimes_ivfpq")
    keyed = f"{cache_key}::ivfpq::{sorted(kwargs.items())!r}::{fingerprint!r}"
    return os.path.join(
        base, hashlib.md5(keyed.encode("utf-8")).hexdigest()[:16]
    )


def ensure_ivfpq_index(
    spark,
    corpus: DataFrame,
    cache_key: str,
    base_dir: str | None = None,
    fingerprint: tuple | None = None,
    snapshot_root: str | None = None,
    **kwargs,
) -> str:
    """Build-once resolution of an IVF-PQ index through the VERSIONED
    SNAPSHOT POINTER (VERDICT r9 Next #6): the index root is a
    ``io/snapshots`` root (``v=N`` dirs + atomic ``_LATEST``), shared
    with ``jobs/maintain_indexes.maintain_ivfpq_index`` — a published
    version (whether this helper fit it, or the lifecycle job
    bootstrapped/rebuilt it) is consumed as-is with NO refit; only a
    pointer miss pays the fit ladder, and the build publishes through
    ``publish_dir_snapshot`` (lock + atomic pointer), so two racing
    ensures fail fast instead of double-fitting.

    Root resolution: ``snapshot_root`` when given (point it at a
    lifecycle-managed root), else the content-addressed
    ``ivfpq_cache_root(cache_key, ..., fingerprint)`` (pass
    ``fingerprint=corpus_fingerprint(source_path)`` to invalidate on
    source rewrites).  A published version whose stored geometry
    (dim/m/coarse_k/pq_k) contradicts the requested build params
    raises instead of silently serving wrong-shaped ADC tables.
    Returns the live VERSION directory (probe functions take it
    verbatim)."""
    from opentimes_spark.io import snapshots

    root = snapshot_root or ivfpq_cache_root(
        cache_key, base_dir, fingerprint, **kwargs
    )
    try:
        vdir = snapshots.current_dir(root)
    except FileNotFoundError:
        pass
    else:
        meta = read_ivfpq_meta(spark, vdir)
        if meta:
            for param in ("dim", "m", "coarse_k", "pq_k"):
                want = kwargs.get(param)
                if want is not None and meta.get(param) != want:
                    raise ValueError(
                        f"published index at {vdir} has {param}="
                        f"{meta.get(param)}, requested {want} — refit "
                        "under a different cache_key or let the "
                        "lifecycle job republish"
                    )
        return vdir
    snapshots.publish_dir_snapshot(
        root,
        lambda d: write_ivfpq_index(spark, corpus, d, **kwargs),
        meta={
            "built_from": "ensure",
            "cache_key": cache_key,
            "rotated": kwargs.get("rotation") is not None,
        },
    )
    return snapshots.current_dir(root)


def ivfpq_topk_probe(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int = 5,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    rescore: int | None = None,
) -> DataFrame:
    """IVF-PQ probe against a MATERIALIZED index: per-query ADC tables
    come from the stored codebooks (collected — m·pq_k·(dim/m) doubles,
    driver-side bytes), cells rank by L2 against the stored coarse
    centroids, and the index scan joins on the Hive ``centroid_id``
    key so dynamic partition pruning skips every non-probed cell
    directory.  Per-candidate cost is m ``element_at`` lookups + an
    add on the stored codes — candidate VECTORS are never read
    (column pruning drops them at the scan).  Bit-identical results to
    the in-query ``ivfpq_topk`` with the same build parameters.

    ``rescore=R`` enables the standard two-stage retrieval (Jégou et
    al. §V): the ADC pass keeps the top R ≥ k candidates per query,
    then ONLY those R rows re-join the index for their stored vectors
    and re-rank by exact cosine — output columns become
    (query_id, cand_id, cos_sim, rnk), comparable with
    ``brute_force_topk``.  The vector read is |Q|·R rows, not a
    corpus scan, and quantization-error inversions inside the ADC
    shortlist are corrected at exact-math cost proportional to R."""
    from opentimes_spark.operators.clustering import _lit_vec, _pq_guarded_vec, _self_dot
    from opentimes_spark.functions.vectors import dot

    meta = read_ivfpq_meta(spark, index_path)
    if meta and dim != meta["dim"]:
        # a caller-supplied dim inconsistent with the build would slice
        # misaligned ADC subvectors and return silently-wrong distances
        raise ValueError(
            f"dim={dim} does not match index dim={meta['dim']} at {index_path}"
        )
    cents = {
        r["centroid_id"]: list(r["centroid"])
        for r in spark.read.parquet(index_path + "/_centroids").collect()
    }
    books = spark.read.parquet(index_path + "/_codebooks").collect()
    m = 1 + max(r["subspace"] for r in books)
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by index m={m}")
    sub = dim // m
    codebooks: list[dict[int, list[float]]] = [dict() for _ in range(m)]
    for r in books:
        codebooks[r["subspace"]][r["cid"]] = list(r["c"])

    rot = read_ivfpq_rotation(spark, index_path)
    if rot is not None:
        # OPQ index: queries enter the index's rotated frame (one BLAS
        # pass over |Q| rows); cosine/L2 outputs are frame-invariant
        from opentimes_spark.operators.clustering import apply_rotation

        queries = apply_rotation(queries, rot, dim, id_col, vec_col)
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        _pq_guarded_vec(id_col, vec_col, dim).alias("q_vec"),
    )
    qv = F.col("q_vec")
    cell_structs = F.array(
        *[
            F.struct(
                (
                    dot(qv, qv) - 2.0 * dot(qv, _lit_vec(c)) + F.lit(_self_dot(c))
                ).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in sorted(cents.items())
        ]
    )
    probe_cells = F.transform(
        F.slice(F.array_sort(cell_structs), 1, n_probe), lambda s: s["cid"]
    )
    adc_cols = []
    for j in range(m):
        qs = F.slice(qv, j * sub + 1, sub)
        adc_cols.append(
            F.array(
                *[
                    dot(qs, qs) - 2.0 * dot(qs, _lit_vec(c)) + F.lit(_self_dot(c))
                    for _cid, c in sorted(codebooks[j].items())
                ]
            ).alias(f"adc{j}")
        )
    probes = qbase.select(
        "query_id", F.explode(probe_cells).alias("centroid_id"), *adc_cols
    )
    cand = spark.read.parquet(index_path).select(
        F.col(id_col).alias("cand_id"),
        *[F.col(f"code{j}") for j in range(m)],
        "centroid_id",
    )
    adc = None
    for j in range(m):
        term = F.element_at(F.col(f"adc{j}"), F.col(f"code{j}"))
        adc = term if adc is None else adc + term
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    shortlist_k = k if rescore is None else max(int(rescore), k)
    shortlist = (
        cand.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("adc", adc)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= shortlist_k)
    )
    if rescore is None:
        return shortlist.select(
            "query_id",
            "cand_id",
            F.round("adc", round_to).alias("adc_dist"),
            "rnk",
        )
    vecs = spark.read.parquet(index_path).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    qv_side = qbase.select("query_id", F.col("q_vec"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("cand_id")
    )
    return (
        shortlist.select("query_id", "cand_id")
        .join(vecs, "cand_id")
        .join(F.broadcast(qv_side), "query_id")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
        .withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cos", round_to).alias("cos_sim"),
            "rnk",
        )
    )


# --- MMR diversity re-rank (round 8) ----------------------------------------


def mmr_rerank(
    queries: DataFrame | None = None,
    corpus: DataFrame | None = None,
    k_candidates: int = 8,
    k_select: int = 3,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    round_to: int = 6,
    validate_candidates: bool = False,
) -> DataFrame:
    """Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein 1998):
    from each query's shortlist, iteratively select ``k_select``
    results maximizing
    ``lam*relevance - (1-lam)*max_similarity_to_already_selected`` —
    the diversity pass every retrieval-augmented pipeline runs between
    ANN shortlist and prompt assembly.

    The shortlist source is pluggable: pass ``candidates`` as a
    ``(query_id, cand_id, rel)`` DataFrame (e.g. the output of
    ``ivfpq_topk_probe(..., rescore=R)`` with ``cos_sim`` aliased to
    ``rel``) and MMR composes directly onto any ANN probe; when
    ``candidates`` is None, ``queries`` is required and the shortlist
    defaults to the exact top-``k_candidates`` cosine scan (the
    oracle-replayable demo path).  ``corpus`` always supplies the
    candidate vectors for the pairwise-diversity matrix — only
    shortlist ids are joined against it (a k·|Q|-key lookup join,
    never a corpus scan).

    Deterministic by construction: relevance and candidate-candidate
    similarities are cosine values ROUNDED to 1e-6 before selection
    (the registry's certified cosine idiom), every argmax tie-breaks on
    candidate id, and the selection loop is k_select DataFrame rounds
    (argmax per query via one row_number window each) — so the DuckDB
    oracle replays the full selection exactly.

    Scale story: the shortlist is k rows/query and the pair matrix
    k² rows/query, both independent of corpus size — MMR cost rides
    on the ANN probe, never the corpus.  Returns
    (query_id, cand_id, sel_rank, mmr_score).

    Every candidate id MUST exist in ``corpus``: the diversity pass
    inner-joins shortlist ids against corpus vectors, so an external
    candidate absent from corpus would be silently dropped from
    selection rounds >= 2 (round 1 could still pick it), yielding an
    inconsistent shortlist.  Pass ``validate_candidates=True`` to pay
    one anti-join action that raises listing the unknown ids instead."""
    if corpus is None:
        raise ValueError(
            "mmr_rerank needs `corpus` — it supplies the candidate "
            "vectors for the pairwise-diversity matrix"
        )
    if candidates is not None:
        cands = candidates.select("query_id", "cand_id", "rel")
    else:
        if queries is None:
            raise ValueError("mmr_rerank needs `queries` or `candidates`")
        cands = brute_force_topk(
            queries, corpus, k=k_candidates, id_col=id_col, vec_col=vec_col
        ).select("query_id", "cand_id", F.col("cos_sim").alias("rel"))
    if validate_candidates:
        unknown = [
            r["cand_id"]
            for r in cands.select("cand_id")
            .distinct()
            .join(
                corpus.select(F.col(id_col).alias("cand_id")),
                "cand_id",
                "left_anti",
            )
            .limit(20)
            .collect()
        ]
        if unknown:
            raise ValueError(
                f"mmr_rerank: candidate ids missing from corpus "
                f"(first {len(unknown)}): {unknown}"
            )
    # Materialize the shortlist ONCE: it is k rows/query but its plan
    # may be an entire ANN probe (ADC shortlist + rescore) — without
    # this, every selection round (and both sides of the pair matrix)
    # re-executes that probe, multiplying a fixed ~1s plan by ~3k jobs
    # (the r9 bench showed 5.7s warm where ~2s is the real work).
    # (no coalesce(1) here: it would propagate up and single-task the
    # entire ANN probe that produces the shortlist)
    cands = cands.localCheckpoint(eager=True)
    vecs = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("v")
    )
    a = cands.select("query_id", F.col("cand_id").alias("a_id"))
    b = cands.select("query_id", F.col("cand_id").alias("b_id"))
    pair = (
        a.join(b, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .join(vecs.select(F.col("cand_id").alias("a_id"),
                          F.col("v").alias("a_v")), "a_id")
        .join(vecs.select(F.col("cand_id").alias("b_id"),
                          F.col("v").alias("b_v")), "b_id")
        .select(
            "query_id", "a_id", "b_id",
            F.round(cosine(F.col("a_v"), F.col("b_v")), 6).alias("sim"),
        )
    )
    # k^2 rows/query; computed once, read by every round >= 2
    pair = pair.localCheckpoint(eager=True)

    selected: DataFrame | None = None
    out = []
    for r in range(1, k_select + 1):
        if selected is None:
            scored = cands.select(
                "query_id", "cand_id", F.col("rel").alias("mmr_score")
            )
        else:
            remaining = cands.join(
                selected.select("query_id", "cand_id"),
                ["query_id", "cand_id"],
                "left_anti",
            )
            maxsim = (
                pair.join(
                    selected.select(
                        "query_id", F.col("cand_id").alias("b_id")
                    ),
                    ["query_id", "b_id"],
                )
                .groupBy("query_id", F.col("a_id").alias("cand_id"))
                .agg(F.max("sim").alias("max_sim"))
            )
            scored = remaining.join(maxsim, ["query_id", "cand_id"]).select(
                "query_id",
                "cand_id",
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("max_sim")
                ).alias("mmr_score"),
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("mmr_score"), F.asc("cand_id")
        )
        pick = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "cand_id",
                F.lit(r).cast("long").alias("sel_rank"),
                "mmr_score",
            )
        )
        out.append(pick)
        if r == k_select:
            break  # nothing re-reads `selected` after the final pick
        selected = pick if selected is None else selected.unionByName(pick)
        # cut the growing self-referential plan per round: each round's
        # pick is tiny (1 row/query) and later rounds re-read it twice
        selected = selected.localCheckpoint(eager=True)

    result = out[0]
    for p in out[1:]:
        result = result.unionByName(p)
    # round_to=6 can TIE on lam=0.5 scores (0.5*rel - 0.5*sim lands on
    # the 5e-7 half-grid); callers needing cross-engine hash equality on
    # such grids pass round_to=7, where every grid point is exact.
    return result.select(
        "query_id",
        "cand_id",
        "sel_rank",
        F.round("mmr_score", round_to).alias("mmr_score"),
    )


# --- Two-NN intrinsic dimension (round 8) ------------------------------------


def twonn_intrinsic_dim(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al. 2017): for each
    sampled point take the ratio mu = d2/d1 of its two nearest-neighbor
    distances; the manifold dimension MLE is n / sum(ln mu).  The
    embedding-health probe that catches collapsed or inflated embedding
    spaces before they poison ANN recall.

    Distances use the certified dot-product idiom only
    (d^2 = |a|^2 + |b|^2 - 2ab, clamped at 0 for float cancellation),
    ranking ties break on candidate id, degenerate d1=0 pairs (exact
    duplicate vectors) are excluded, and the final sum folds ln(mu) in
    query-id order — all replayable by the oracle.  Cost is
    O(|sample| * corpus): run on a query SAMPLE, never corpus-wide.
    Returns one row: (n_queries, sum_ln_mu, dim_est)."""
    queries = _well_formed_vecs(queries, id_col, vec_col)
    corpus = _well_formed_vecs(corpus, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    from opentimes_spark.functions.vectors import dot

    d2 = (
        dot(F.col("q_vec"), F.col("q_vec"))
        + dot(F.col("c_vec"), F.col("c_vec"))
        - F.lit(2.0) * dot(F.col("q_vec"), F.col("c_vec"))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("dsq", F.greatest(d2, F.lit(0.0)))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dsq"), F.asc("cand_id"))
    two = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("dsq"))).alias("d1sq"),
            F.min(F.when(F.col("rn") == 2, F.col("dsq"))).alias("d2sq"),
        )
        .filter(F.col("d1sq") > 0)
        .select(
            "query_id",
            F.log(F.sqrt(F.col("d2sq") / F.col("d1sq"))).alias("ln_mu"),
        )
    )
    folded = two.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("query_id", "ln_mu"))),
            F.lit(0.0),
            lambda acc, s: acc + s["ln_mu"],
        ).alias("s"),
    )
    # empty-fold parity: with no valid (d1, d2) pair Spark's fold gives
    # 0.0 where the oracle's list() gives NULL; with all-tied distances
    # s is genuinely 0 and the division must NULL in both engines
    return folded.select(
        F.col("n_queries").cast("long").alias("n_queries"),
        F.when(F.col("n_queries") > 0, F.round(F.col("s"), 6))
        .alias("sum_ln_mu"),
        F.round(
            F.col("n_queries") / F.nullif(F.col("s"), F.lit(0.0)), 4
        ).alias("dim_est"),
    )
