"""Record linkage: edit-distance-bounded fuzzy matching with blocking.

Entity resolution when rows share no key (vendor catalogs, scraped
entity names, near-identical author strings): candidates come from a
cheap BLOCKING key (first token, length band, q-gram — anything
equi-joinable), and the expensive string distance evaluates only on
co-blocked pairs as a join residual.  Same scale skeleton as LSH band
joins (`operators/dedup.py:lsh_candidate_pairs`): per-block n², never
corpus n², and a hot-block guard for the skew case.

The reference has no linkage operator (its entities carry GEOIDs); this
is part of the training-pipeline surface the brief mandates beyond the
reference.  Spark's `levenshtein` and DuckDB's implement the same
classic DP edit distance, so results are engine-portable for the
oracle (`fuzzy_name_linkage` in plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(name: Column) -> Column:
    """Default blocking key: the first whitespace token, lowercased."""
    return F.lower(F.split_part(name, F.lit(" "), F.lit(1)))


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
    block_key: Column | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Distinct (id_a < id_b, dist) pairs whose names are within
    ``max_dist`` edits, candidates restricted to equal blocking keys.

    **Hot-block guard** (``max_block_size``): a block of k rows emits
    k·(k−1)/2 candidates — a degenerate key ("the", "", a boilerplate
    prefix) turns the self-join quadratic exactly like an LSH mega-band.
    Over-cap blocks degrade to STAR comparisons against the block's
    minimum id (k−1 pairs, transitively connected through the
    representative), identical contract to
    ``lsh_candidate_pairs(max_band_size=...)``; block membership counts
    ride the same exchange as the join.
    """
    key = block_key if block_key is not None else first_token_block(F.col(name_col))
    base = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name"), key.alias("__blk")
    ).repartition(F.col("__blk"))
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__name").alias("name_a"), "__blk"
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__name").alias("name_b"), "__blk"
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    if max_block_size is None:
        return (
            a.join(b, "__blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(dist <= max_dist)
            .select("id_a", "id_b", dist.alias("dist"))
            .distinct()
        )
    stats = base.groupBy("__blk").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__id").alias("__rep")
    )
    tagged_b = b.join(stats, "__blk")
    cool = (
        a.join(tagged_b.filter(F.col("__n") <= max_block_size), "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    rep_names = base.select(
        F.col("__id").alias("__rep"), F.col("__name").alias("name_a")
    )
    hot = (
        tagged_b.filter(
            (F.col("__n") > max_block_size) & (F.col("id_b") != F.col("__rep"))
        )
        .join(rep_names, "__rep")
        .select(F.col("__rep").alias("id_a"), "name_a", "id_b", "name_b")
    )
    both = cool.select("id_a", "name_a", "id_b", "name_b").unionByName(hot)
    return (
        both.filter(dist <= max_dist)
        .select("id_a", "id_b", dist.alias("dist"))
        .distinct()
    )
