"""Text-analysis column expressions for large-scale training-data
pipelines: tokenization, quality scoring, language ID, fingerprinting.

All pure `pyspark.sql.functions` compositions — JVM-side, whole-stage
codegen, no Python UDFs — so they run at full scan speed over a 100 TB
documents table. Each has an exact ANSI-SQL twin used by the DuckDB
oracle (see plans/queries.py), which forces determinism: no RNG, no
float-order dependence, md5 as the only hash (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic English stopword list shared with the SQL oracle.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Character sets for translate()-based counting (see _punct_count).
_ALNUM = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)
_WHITESPACE = " \t\n\x0b\f\r"  # Java regex \s


# Shared heuristic constants — quality_score / langid_en and the
# one-pass profile() MUST read these same values: the two surfaces are
# documented twins, and restating the numbers in both places let them
# silently drift (review finding).  The arithmetic in each stays
# otherwise unchanged so their oracles are unaffected.
QUALITY_WEIGHTS = (0.4, 0.3, 0.3)  # length band / punctuation / diversity
QUALITY_LEN_BAND = (20, 1000)
LANGID_STOP_THRESHOLD = 0.03


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_len(text: Column, round_to: int = 4) -> Column:
    """NULL for token-less docs — an unguarded ratio DIVIDE_BY_ZEROs
    the whole job under default ANSI mode (same guard family as
    profile())."""
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
            )
            / F.size(toks),
            round_to,
        ),
    )


def stopword_ratio(text: Column, round_to: int = 6) -> Column:
    """Fraction of tokens that are (English) stopwords; NULL for
    token-less docs (ANSI divide guard — langid_en then falls through
    to 'unknown' by NULL-compare semantics)."""
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, F.round(n_stop / F.size(toks), round_to))


def _punct_count(text: Column) -> Column:
    """Count of non-alphanumeric, non-whitespace chars — i.e. chars
    matching ``[^A-Za-z0-9\\s]`` — WITHOUT running a regex engine:

        punct = |strip(alnum)| + |strip(ws)| - |text|

    because each char is in exactly one of {alnum, ws, other}, so
    (len-n_alnum) + (len-n_ws) - len = len - n_alnum - n_ws = n_other.
    ``translate`` is a plain char-map inside whole-stage codegen; the
    previous ``regexp_count`` formulation materialized a match-array
    entry per punctuation char and measured 23× slower at 40× sf0.1
    (6.4s → 0.27s for the isolated column, 200k docs). Values are
    identical (the SQL oracle keeps the regexp_replace formulation,
    hash-match verified)."""
    return (
        F.length(F.translate(text, _ALNUM, ""))
        + F.length(F.translate(text, _WHITESPACE, ""))
        - F.length(text)
    )


def punct_ratio(text: Column, round_to: int = 6) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace;
    NULL for empty docs (ANSI divide guard)."""
    return F.when(
        F.length(text) > 0,
        F.round(_punct_count(text) / F.length(text), round_to),
    )


def stable_round(x: Column, digits: int) -> Column:
    """Engine-portable rounding: floor(x·10^d + 0.5)/10^d computed in
    IEEE double. Unlike ROUND — where Spark rounds the shortest decimal
    repr half-up while DuckDB rounds the binary value, disagreeing on
    exact .5 boundaries — this is the same double arithmetic in any
    engine, so results are bit-identical."""
    scale = float(10**digits)
    return F.floor(x * scale + 0.5) / scale


def quality_score(text: Column, round_to: int = 4) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    vocabulary diversity. Deterministic arithmetic only; stable_round so
    the oracle matches bit-for-bit on .5 boundaries."""
    n_tok = token_count(text)
    # ANSI divide guards: empty/whitespace-only docs get a NULL score
    # (the composite has no meaning without tokens) instead of killing
    # the job with DIVIDE_BY_ZERO
    diversity = F.when(n_tok > 0, distinct_token_count(text) / n_tok)
    w_band, w_punct, w_div = QUALITY_WEIGHTS
    lo, hi = QUALITY_LEN_BAND
    length_band = F.when((n_tok >= lo) & (n_tok <= hi), 1.0).otherwise(0.5)
    raw_punct = F.when(F.length(text) > 0, _punct_count(text) / F.length(text))
    return stable_round(
        w_band * length_band + w_punct * (1 - raw_punct) + w_div * diversity,
        round_to,
    )


def langid_en(text: Column, threshold: float = LANGID_STOP_THRESHOLD) -> Column:
    """Heuristic language ID: stopword-ratio thresholding ('en' vs
    'unknown'). The scale path for real language ID is a Pandas-UDF model
    scorer; this built-in variant exists for the oracle-checked surface."""
    return F.when(stopword_ratio(text, 10) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def profile(df, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)):
    """One-pass text profile: tokenize ONCE into an intermediate
    projection, then derive every stat from the shared array. The flat
    form re-evaluates split() per derived expression (Catalyst does not
    CSE non-cheap higher-order expressions across output columns) — at
    100 TB that's 6 tokenizer passes instead of 1. Staging through a
    projection holds it at one (verified via plan inspection)."""
    t = F.col(text_col)
    # zero-length / zero-token guards: under ANSI mode a bare ratio
    # DIVIDE_BY_ZEROs the whole job on one empty document; CASE WHEN
    # evaluates its branch lazily per row, so the ratios are NULL for
    # degenerate docs instead (and lang_pred falls through to 'unknown')
    raw_punct = F.when(F.length(t) > 0, _punct_count(t) / F.length(t))
    staged = df.select(
        *id_cols, tokens(t).alias("_toks"), raw_punct.alias("_praw")
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    w_band, w_punct, w_div = QUALITY_WEIGHTS
    lo, hi = QUALITY_LEN_BAND
    length_band = F.when((n_tok >= lo) & (n_tok <= hi), 1.0).otherwise(0.5)
    nonzero = F.when(n_tok > 0, n_tok)  # NULL divisor → NULL ratio, no error
    return staged.select(
        *id_cols,
        n_tok.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_uniq_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x)) / nonzero, 4
        ).alias("avg_token_len"),
        F.round(n_stop / nonzero, 6).alias("stop_ratio"),
        F.round(F.col("_praw"), 6).alias("punct_ratio"),
        stable_round(
            w_band * length_band + w_punct * (1 - F.col("_praw"))
            + w_div * (n_uniq / nonzero),
            4,
        ).alias("quality"),
        F.when(n_stop / nonzero >= LANGID_STOP_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("lang_pred"),
    )


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed, trimmed) text."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def prefix_fingerprint(text: Column, n_tokens: int = 3) -> Column:
    """Blocking key: md5 of the first ``n_tokens`` tokens — groups
    documents that share an opening phrase (near-dup blocking)."""
    toks = tokens(text)
    return F.md5(F.array_join(F.slice(toks, 1, n_tokens), " "))


def gopher_pass(text: Column) -> Column:
    """Boolean: the document passes the Gopher rule-based quality
    filter (Rae et al. 2021 §A1.1) — word count in [50, 100k], mean
    word length in [3, 10], ≥80% of words CONTAIN an alphabetic
    character (the paper's rule verbatim — r7 fix per ADVICE: the
    previous fully-alphabetic test counted ordinary prose tokens like
    "dog." or "it's" against the ratio and over-dropped clean docs),
    ≥2 stopwords.
    Zero-shuffle array folds; empty docs fail.  The per-rule breakdown
    lives in the ``docs_gopher_flags`` oracle query; this is the
    composed verdict the curation job's ``--gopher`` stage applies."""
    toks = tokens(text)
    n_words = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    mwl = F.length(F.array_join(toks, "")) * 1.0 / n_words
    return F.when(
        n_words > 0,
        n_words.between(50, 100_000)
        & mwl.between(3, 10)
        & ((n_alpha * 1.0 / n_words) >= 0.8)
        & (n_stop >= 2),
    ).otherwise(F.lit(False))


def bm25_scores(
    docs,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
):
    """Okapi BM25 over a FIXED query-term set, with the idf kept as the
    rational Robertson ratio (N - df + 0.5)/(df + 0.5) rather than its
    log — a monotone transform that never changes the ranking but keeps
    every operation a correctly-rounded IEEE */÷ (the registry's
    ln-avoidance idiom, text_tfidf_topk).  Returns one row per document:
    (id, dl, s_<term>... , bm25) with the term scores summed in the
    caller-given FIXED order so the fold is engine-reproducible.

    Scale shape: per-term tf is ``size(filter(tokens, = t))`` — a
    zero-shuffle projection; the corpus stats (N, avgdl, per-term df)
    are ONE aggregate row broadcast back via crossJoin.  No token
    explode, no per-term join: cost is one corpus pass + one 1-row
    broadcast, independent of |terms| beyond expression width."""
    toks = tokens(F.col(text_col))

    def _tf(term: str):
        # NB: a two-parameter lambda would make F.filter pass the array
        # INDEX as the second argument — bind the term via closure
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(term).alias(f"tf_{i}") for i, term in enumerate(terms)],
        # stats + the scored join re-planned the tf projection (a full
        # tokenize pass) per reference; materialize it once so the cost
        # really is the documented single corpus pass (r15 pattern).
        # materialize=False keeps the helper lazy for explain-only
        # callers (r15 ADVICE: a library function should not execute a
        # Spark job at construction unless the caller opted in).
    )
    if materialize:
        from opentimes_spark.materialize import mz_proxy

        base = mz_proxy(base)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    out_cols = []
    total = None
    for i, term in enumerate(terms):
        tf = F.col(f"tf_{i}").cast("double")
        dfq = F.col(f"df_{i}").cast("double")
        idf = (F.col("n_docs") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        s = (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        )
        out_cols.append(stable_round(s, 6).alias(f"s_{term}"))
        total = s if total is None else total + s
    return scored.select(
        F.col(id_col),
        F.col("dl").cast("bigint").alias("dl"),
        *out_cols,
        stable_round(total, 6).alias("bm25"),
    )
