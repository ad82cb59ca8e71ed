"""Boilerplate n-gram detection (C4 / RefinedWeb-style template
removal, Raffel et al. 2020 §2.2; Penedo et al. 2023).

Web-scale corpora repeat navigation chrome, footers, and license
blurbs verbatim across pages; the detector is corpus-statistical: a
token n-gram appearing in ≥ ``min_df`` DISTINCT documents is template,
and a document whose n-gram positions are mostly template is dropped.

Scale shape: the gram melt is per-row bounded fan-out (len−n+1 grams
per doc), the doc-frequency agg combines map-side onto the
corpus-bounded gram keyspace, and the coverage join broadcasts the
template-tail-sized boilerplate set — one fact shuffle end to end.
Backs the ``docs_boilerplate_ngrams`` / ``docs_boilerplate_coverage``
oracle queries and the curation job's ``--boilerplate-max`` stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_stream(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, gram) stream of token ``n``-grams; docs shorter than ``n``
    tokens emit nothing."""
    from opentimes_spark.functions.text import tokens

    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    return toks.filter(F.size("toks") >= n).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.col("toks")[i + j - 1] for j in range(n)]
                ),
            )
        ).alias("gram"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, doc_freq, n_occ) for every n-gram in ≥ ``min_df``
    distinct docs — the corpus template set."""
    g = gram_stream(docs, n, id_col, text_col)
    return (
        g.groupBy("gram")
        .agg(
            F.count_distinct(id_col).cast("bigint").alias("doc_freq"),
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )


def boilerplate_coverage(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_templates: bool | None = None,
) -> DataFrame:
    """(id, n_grams, n_boilerplate, bp_frac) per document: the fraction
    of its n-gram positions matched by the corpus template set.  Docs
    with fewer than ``n`` tokens emit no row (no gram positions to
    judge) — callers treating absence as 'pass' must say so.

    Join strategy (ADVICE r6): the df≥min_df template set grows with
    corpus VOCABULARY, not corpus size, but at web scale a C4-style
    template set can still exceed broadcast budgets and OOM the driver.
    Default (``broadcast_templates=None``) therefore lets AQE pick —
    it broadcasts when the built side is under
    ``spark.sql.autoBroadcastJoinThreshold`` and falls back to a
    shuffle join above it.  Pass ``True`` to force the broadcast (the
    bench twins do, where the set is provably tiny) or ``False`` to
    force the shuffle plan."""
    g = gram_stream(docs, n, id_col, text_col)
    bp = (
        g.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    marked = bp.withColumn("df_mark", F.lit(1))
    if broadcast_templates is True:
        marked = F.broadcast(marked)
    elif broadcast_templates is False:
        marked = marked.hint("shuffle_hash")
    hit = F.when(F.col("df_mark").isNotNull(), 1).otherwise(0)
    return (
        g.join(marked, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(hit).cast("bigint").alias("n_boilerplate"),
            F.round(F.sum(hit) * 1.0 / F.count(F.lit(1)), 6).alias("bp_frac"),
        )
    )
