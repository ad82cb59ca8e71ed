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
) -> DataFrame:
    """Deterministic centroids: per-label mean vector (posexplode →
    groupBy(label, dim) → collect back, ordered by dim)."""
    dims = corpus.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    means = dims.groupBy(label_col, "dim").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return (
        means.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("m")))
            ).alias("dm")
        )
        .select(
            F.col(label_col).alias("centroid_id"),
            F.transform(F.col("dm"), lambda s: s.m).alias("centroid"),
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
) -> None:
    """Materialize the IVF index as a Hive layout partitioned by
    centroid id — the storage half of ``ivf_topk``'s claim: probing
    n_probe centroids then touches n_probe DIRECTORIES (partition
    pruning), exactly like the times table prunes on its Hive keys.
    At 100 TB the corpus scan cost per query drops by
    ~n_centroids/n_probe before a single row is read."""
    (
        corpus.select(id_col, vec_col, F.col(label_col).alias("centroid_id"))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
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
    import numpy as np
    import pandas as pd

    from opentimes_spark.session import ship_package

    spark = queries.sparkSession
    ship_package(spark)
    qrows = (
        queries.select(id_col, vec_col)
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
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, Qn))

    def score(batches):
        qids_l, Qn_l = bc.value
        for b in batches:
            if not len(b):
                continue
            C = np.array(list(b[vec_col]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
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

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, cand_id long, cos double"
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
