"""Byte-pair-encoding tokenizer training, Spark-first (Sennrich et al.
2016, public).

The classic trainer operates on the WORD-FREQUENCY table, not the raw
corpus — after one ``groupBy(word)`` the working set is vocabulary-
sized (Zipf), and that one shuffle is the only corpus-scale operation.
The merge loop then runs distributed over the (word, freq, symbol
sequence) table:

* **pair counting** — explode adjacent symbol pairs weighted by word
  freq, ``groupBy(pair).sum`` with map-side partial aggregation (keys
  are bounded by the live pair alphabet);
* **best pair** — ``orderBy(count desc, pair).limit(1)`` plans as
  TakeOrderedAndProject (no global sort), ties break lexicographically
  so training is deterministic;
* **rewrite** — the merge (a, b) → ab is applied to every symbol
  sequence by a single ``F.aggregate`` left fold with a struct
  accumulator (emit-or-hold state machine, left-to-right non-
  overlapping — the reference algorithm's semantics), a pure
  whole-stage-codegen projection: ZERO shuffle, no UDF.

Each merge iteration therefore costs one vocabulary-sized shuffle plus
a projection; the driver holds only the merge list.  The registered
query ``bpe_merge_step`` (plans/queries.py) oracle-certifies the pair-
count/top-k core; the full trainer is differential-tested against a
pure-Python reference implementation (tests/test_bpe.py).

Reference parity: dfsnow/opentimes has no tokenizer stage; this is the
LLM-pipeline surface (SURVEY.md text-analysis family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentimes_spark.functions.text import tokens

END = "</w>"  # end-of-word marker, per the published algorithm


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the one corpus-scale shuffle of BPE training."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _init_symbols(word_col) -> F.Column:
    """word → [c₁, c₂, …, cₙ, </w>]."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(word_col, i, 1),
    )
    return F.concat(chars, F.array(F.lit(END)))


def merge_expr(syms_col, a: str, b: str) -> F.Column:
    """Apply ONE merge (a, b) → a+b to a symbol array — left-to-right,
    non-overlapping — as a single fold expression (no UDF).

    State machine over a struct(acc, prev) accumulator: ``prev`` holds
    at most one pending symbol; when (prev, s) == (a, b) the merged
    token is emitted and the pending slot cleared (so ``aaa`` under
    merge (a,a) → [aa, a], the reference semantics); otherwise the
    pending symbol is flushed and ``s`` takes its place.  The final
    pending symbol is flushed at the end of the fold.
    """
    merged = F.lit(a + b)
    empty = F.array().cast("array<string>")
    init = F.struct(
        empty.alias("acc"), F.lit("").alias("prev"), F.lit(False).alias("has")
    )

    def step(st, s):
        hit = st["has"] & (st["prev"] == F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(st["acc"], F.array(merged)))
            .when(st["has"], F.concat(st["acc"], F.array(st["prev"])))
            .otherwise(st["acc"])
            .alias("acc"),
            F.when(hit, F.lit("")).otherwise(s).alias("prev"),
            (~hit).alias("has"),
        )

    def fin(st):
        return F.when(
            st["has"], F.concat(st["acc"], F.array(st["prev"]))
        ).otherwise(st["acc"])

    return F.aggregate(syms_col, init, step, fin)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Stops early when no pair occurs at least ``min_freq`` times (or at
    all).  Returns the ordered merge list — the trained tokenizer.
    The working table is persisted between iterations and re-persisted
    after each rewrite so every iteration reads the previous one's
    result, not the whole lineage.
    """
    return [(a, b) for a, b, _ in train_bpe_steps(docs, n_merges, text_col, min_freq)]


def train_bpe_steps(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str, int]]:
    """``train_bpe`` with each merge's corpus-wide pair count attached
    — the auditable training log the oracle query replays."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    vocab = (
        word_freqs(docs, text_col)
        .select("freq", _init_symbols(F.col("word")).alias("syms"))
        .persist()
    )
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            ).filter(F.size("syms") >= 2)
            best = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["n"] < min_freq:
                break
            a, b = best[0]["p"]["a"], best[0]["p"]["b"]
            merges.append((a, b, int(best[0]["n"])))
            nxt = vocab.select(
                "freq", merge_expr(F.col("syms"), a, b).alias("syms")
            ).persist()
            vocab.unpersist()
            vocab = nxt
        return merges
    finally:
        vocab.unpersist()


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment each document's words with a trained merge list.

    Merges chain as nested fold expressions in training order — the
    published apply rule (each learned merge applied greedily in rank
    order).  The expression tree grows linearly with ``len(merges)``;
    fine into the hundreds, beyond that chunk the plan with
    intermediate projections (documented limit)."""
    def _mk(a: str, b: str):
        # a plain 1-arg lambda: PySpark reads lambda arity to pick the
        # HOF variable count, so default-arg capture would mis-bind
        return lambda s: merge_expr(s, a, b)

    words = F.transform(tokens(F.col(text_col)), _init_symbols)
    for a, b in merges:
        words = F.transform(words, _mk(a, b))
    return df.withColumn(out_col, F.flatten(words))
