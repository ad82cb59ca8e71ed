"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of doing this in Spark):

- **Exact** dedup is a hash groupBy on a fingerprint — one shuffle keyed
  by a uniformly-distributed md5, so no skew; map-side partial
  aggregation ships one row per (fingerprint, partition).
- **MinHash+LSH** avoids the O(n²) pairwise comparison: per-document
  signatures are a single explode+groupBy pass; candidate generation is
  an equi-join on band keys (shuffle keyed by band hash). Only candidates
  get the exact Jaccard verification. At 100 TB the band join is the only
  quadratic-risk step, and its fan-out is bounded by collision rate, not
  corpus size.
- **SimHash** is one linear pass producing a compact integer per doc;
  near-dup lookup becomes a self-join on rotated bit-bands (same LSH
  trick) rather than pairwise Hamming.

Hash parity: the oracle-checked variants use md5 (identical in Spark and
DuckDB). The fast path at scale would swap md5 → xxhash64 (JVM intrinsic,
~5× faster) — semantics identical, hashes engine-specific, so that
variant is oracle-exempt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentimes_spark.functions.text import fingerprint, tokens


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: one row per
    group with the canonical (minimum) id and the group size."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def token_sets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs, distinct — the unit for set-based similarity."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
    )


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs — word n-gram shingles. Shingling is
    what makes MinHash discriminative on small vocabularies: token *sets*
    of natural text overlap heavily, while n-gram shingle sets diverge
    exponentially in n. With unigrams a corpus-wide LSH degenerates into
    an O(n²) candidate explosion (every doc shares every band).

    ``distinct=True`` (a full shuffle on (id, shingle)) is required by
    set-cardinality consumers (Jaccard); min-aggregating consumers
    (MinHash) pass ``distinct=False`` — min over a multiset equals min
    over its set, so they skip that shuffle entirely."""
    if shingle_size <= 1:
        out = df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
        )
        return out.distinct() if distinct else out
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    # guard: F.sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # docs shorter than shingle_size must map to an empty shingle set
    grams = F.when(
        F.size("t") >= shingle_size,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (shingle_size - 1)),
            lambda i: F.concat_ws(
                " ", *[F.col("t")[i - 1 + j] for j in range(shingle_size)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = toks.select(F.col(id_col), F.explode(grams).alias("tok"))
    return out.distinct() if distinct else out


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int = 3
) -> DataFrame:
    """(id, array<string> shingles) with in-doc duplicates removed —
    the per-row (shuffle-free) twin of ``shingle_sets``. Docs shorter
    than ``shingle_size`` get an empty array."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    if shingle_size <= 1:
        return toks.select(F.col(id_col), F.array_distinct("t").alias("grams"))
    grams = F.when(
        F.size("t") >= shingle_size,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (shingle_size - 1)),
            lambda i: F.concat_ws(
                " ", *[F.col("t")[i - 1 + j] for j in range(shingle_size)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(F.col(id_col), F.array_distinct(grams).alias("grams"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document MinHash signature over word shingles: h_i = min over
    shingles of md5(i || '|' || shingle). One explode + one groupBy with
    ``num_hashes`` conditional-min aggregates — a single shuffle
    regardless of k.

    Measured note (sf0.1): a shuffle-free per-row variant (``array_min``
    over ``transform`` on ``shingle_arrays``) was 4× SLOWER — Spark
    evaluates higher-order-function lambdas interpreted, outside
    whole-stage codegen, while this explode+groupBy pipeline is fully
    compiled. One compiled shuffle beats zero interpreted ones.

    The shingle stream is NOT deduplicated first: min(multiset) ==
    min(set), so signatures skip the distinct's full-width shuffle —
    the groupBy here is the only exchange."""
    toks = shingle_sets(df, id_col, text_col, shingle_size, distinct=False)
    if hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("tok")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    elif hash_fn == "xxhash64":
        # JVM-intrinsic 64-bit hash — the at-scale fast path (no hex
        # string materialization, BIGINT min). Spark-only: exempt from
        # the DuckDB oracle (engine-specific hash values).
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    return toks.groupBy(id_col).agg(*aggs)


def _banded(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int,
    band_size: int,
    hash_fn: str,
) -> DataFrame:
    """(id, band_idx, band_hash) stream, shuffled once on the band key."""
    n_bands = num_hashes // band_size

    def band_hash(b: int):
        cols = [F.col(f"h{b * band_size + j}") for j in range(band_size)]
        if hash_fn == "md5":
            return F.md5(F.concat_ws("|", *cols))
        if hash_fn == "xxhash64":
            return F.xxhash64(*cols).cast("string")
        raise ValueError(f"unknown hash_fn: {hash_fn}")

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                band_hash(b).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, "b.band_idx", "b.band_hash"
    )
    # materialize one shuffle on the join keys: both sides of the
    # self-join below are the SAME exchange subtree, so Spark plans a
    # ReusedExchange — the signature pipeline runs once, not twice, and
    # the join itself needs no further shuffle. Without this boundary a
    # purely per-row signature lineage is recomputed per join side.
    return banded.repartition(F.col("band_idx"), F.col("band_hash"))


def lsh_hot_bands(
    signatures: DataFrame,
    threshold: int,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Quarantine report: bands whose membership exceeds ``threshold`` —
    (band_idx, band_hash, n_members), the skew diagnostic for sizing
    ``max_band_size``. One count per band over the banded exchange."""
    banded = _banded(signatures, id_col, num_hashes, band_size, hash_fn)
    return (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > threshold)
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    hash_fn: str = "md5",
    max_band_size: int | None = None,
) -> DataFrame:
    """Band the signature (rows of ``minhash_signatures``) and emit
    distinct candidate pairs (id_a < id_b) sharing ≥1 band. The join is
    an equi-join on (band_idx, band_hash) — broadcastable when one side
    is small, shuffle-partitioned by band hash otherwise. ``hash_fn``
    must match the signature's (md5 → hex-string band keys, oracle
    parity; xxhash64 → BIGINT band keys, the at-scale fast path).

    **Hot-band guard** (``max_band_size``): a band shared by k documents
    emits k·(k−1)/2 pairs — boilerplate-heavy corpora (empty docs,
    license headers) create mega-bands that turn the band join into the
    skewed-key quadratic blowup LSH exists to avoid. With the cap set,
    bands with ≤ cap members take the all-pairs join unchanged, and
    hotter bands degrade to STAR pairs — every member paired with the
    band's minimum id (k−1 pairs, all on one already-co-located
    partition). A true duplicate cluster stays fully connected through
    its representative, so Jaccard-verify + grouping (components)
    recover the same clusters; what's given up is only direct pairs
    between non-dup docs that collided into the same mega-band. Band
    membership counts ride the SAME exchange as the join (one shuffle
    total, ReusedExchange); use ``lsh_hot_bands`` for the quarantine
    report. Output on a corpus with no over-cap bands is IDENTICAL to
    the uncapped plan (oracle-checked)."""
    banded = _banded(signatures, id_col, num_hashes, band_size, hash_fn)
    left = banded.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    if max_band_size is None:
        pairs = (
            left.join(right, ["band_idx", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        return pairs.distinct()
    # per-band size + representative as a WINDOW over the band keys —
    # the banded stream is already repartitioned on exactly these keys,
    # so the window is a per-partition sort with no exchange and no
    # join (the earlier groupBy+join form paid a join merge for the
    # same information)
    from pyspark.sql import Window

    wband = Window.partitionBy("band_idx", "band_hash")
    tagged_r = right.withColumn("__n", F.count(F.lit(1)).over(wband)).withColumn(
        "__rep", F.min("id_b").over(wband)
    )
    cool = tagged_r.filter(F.col("__n") <= max_band_size)
    pairs_cool = (
        left.join(cool, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    pairs_hot = (
        tagged_r.filter(
            (F.col("__n") > max_band_size) & (F.col("id_b") != F.col("__rep"))
        )
        .select(F.col("__rep").alias("id_a"), "id_b")
    )
    return pairs_cool.unionByName(pairs_hot).distinct()


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.0,
    round_to: int = 6,
    shingle_size: int = 1,
) -> DataFrame:
    """Exact set Jaccard for candidate pairs (token sets, or shingle sets
    when ``shingle_size`` > 1): per-row ``array_intersect`` on the two
    docs' (distinct) shingle arrays after joining them onto the
    candidate pairs — |A∪B| = |A|+|B|−|A∩B|. Cost is proportional to
    candidate count × doc length, never n².

    Plan shape: the corpus is tokenized ONCE — candidate pairs are
    melted to (id_a, id_b, member) rows and joined to the shingle
    arrays in a single join (the melt side is 2 rows/pair — tiny, so
    AQE broadcasts it and the corpus streams through map-side), then a
    groupBy on the pair re-assembles the two arrays for a codegen
    ``array_intersect``.  The earlier two-join form re-ran the whole
    tokenize+distinct-shingle projection per pair side (two full corpus
    passes); cost is proportional to candidate count × doc length,
    never n².  Zero-intersection pairs (and docs with an empty shingle
    set) drop out — identical semantics to the old inner join on
    exploded rows, which is also what the SQL oracle states."""
    arrs = shingle_arrays(df, id_col, text_col, shingle_size)
    melt = candidates.select(
        "id_a",
        "id_b",
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__member"),
    )
    joined = (
        arrs.join(melt, F.col(id_col) == F.col("__member"))
        .groupBy("id_a", "id_b")
        .agg(
            F.first(
                F.when(F.col("__member") == F.col("id_a"), F.col("grams")),
                ignorenulls=True,
            ).alias("__ga"),
            F.first(
                F.when(F.col("__member") == F.col("id_b"), F.col("grams")),
                ignorenulls=True,
            ).alias("__gb"),
        )
        # a pair whose doc lacks a shingle row must drop, as the old
        # inner joins did
        .filter(F.col("__ga").isNotNull() & F.col("__gb").isNotNull())
    )
    n_a, n_b = F.size("__ga"), F.size("__gb")
    n_inter = F.size(F.array_intersect("__ga", "__gb"))
    raw = n_inter / (n_a + n_b - n_inter)
    return (
        joined
        # filter on the raw double (identical in any engine), round only
        # for output — keeps the threshold boundary oracle-exact
        .filter((n_inter > 0) & (raw >= min_jaccard))
        .select("id_a", "id_b", F.round(raw, round_to).alias("jaccard"))
    )


def containment_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """PPJoin-style prefix-filtered EXACT containment join:
    C(a→b) = |A∩B| / |A| ≥ ``threshold`` over distinct shingle sets —
    value-identical output to the direct melted-pair form
    (``plans/queries.py:docs_containment_pairs``), different physical
    plan (prefix filtering, Chaudhuri/Xiao et al.'s published SSJoin /
    PPJoin family).

    Why it survives adversarial vocabulary where the direct form is
    Σdf² — candidate generation probes ONLY each a-doc's PREFIX: its
    rarest shingles under a global (document frequency ASC, shingle)
    total order, of length |A| − ⌈t·|A|⌉ + 1.  If no prefix shingle
    hits B, the intersection is confined to the remaining ⌈t|A|⌉ − 1
    shingles, so C < t — no pair is lost.  A stop-shingle shared by
    every document sorts LAST in the df order and never enters any
    prefix, so the df² pair blow-up it causes in the direct join simply
    does not occur; the b-side still indexes all shingles (the
    asymmetric-containment requirement), but pair fan-out is bounded by
    prefix postings, not full postings.  Exact verification (one
    pair-constrained join back to the shingle stream) then touches only
    surviving candidates.

    Two further published PPJoin prunes keep candidate count near the
    true pair count: a LENGTH filter on the index side (|A∩B| ≥ t|A|
    forces |B| ≥ ⌈t|A|⌉, so shorter b-docs never pair), and
    verification by per-pair ``array_intersect`` on the distinct
    shingle ARRAYS via the same 2-rows-per-pair melt ``jaccard_pairs``
    uses — one join + one groupBy over surviving candidates instead of
    a pair-constrained re-join of the whole shingle stream.

    ``⌈t·n⌉`` is computed as ``ceil(t·n − 1e-9)``: the ε-nudge keeps
    float representation error (0.8·5 = 4.0000000000000002 → ceil 5)
    from SHORTENING the prefix below the correctness bound; it can only
    lengthen it by one shingle on exact-integer boundaries.
    """
    from pyspark.sql import Window

    toks = shingle_sets(df, id_col, text_col, shingle_size)
    # df first (one Exchange on tok), THEN both doc-partitioned windows
    # — same partition key, so |A| and the prefix rank share a single
    # Exchange on id (computing |A| before the df window would insert a
    # third full shuffle of the shingle stream).
    w_doc = Window.partitionBy(id_col).orderBy("df", "tok")
    ranked = (
        toks.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        .withColumn("rnk", F.row_number().over(w_doc))
    )
    need = F.ceil(F.lit(float(threshold)) * F.col("n") - F.lit(1e-9))
    prefix = ranked.filter(F.col("rnk") <= F.col("n") - need + 1).select(
        F.col(id_col).alias("id_a"), "tok", need.alias("need_a")
    )
    # Positional filter (PPJoin): for the FIRST matching token in the
    # global df order, the whole intersection sits at b-positions >= j,
    # so |A∩B| <= n_b - j + 1 — a pair whose every match fails the
    # bound cannot reach the threshold.  j is the rnk already computed
    # for the prefix, reused for the full index side.
    cands = (
        prefix.join(
            ranked.select(
                F.col(id_col).alias("id_b"),
                "tok",
                F.col("n").alias("n_b"),
                F.col("rnk").alias("j_b"),
            ),
            "tok",
        )
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("n_b") - F.col("j_b") + 1 >= F.col("need_a"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    arrs = shingle_arrays(df, id_col, text_col, shingle_size)
    melt = cands.select(
        "id_a",
        "id_b",
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__member"),
    )
    joined = (
        arrs.join(melt, F.col(id_col) == F.col("__member"))
        .groupBy("id_a", "id_b")
        .agg(
            F.first(
                F.when(F.col("__member") == F.col("id_a"), F.col("grams")),
                ignorenulls=True,
            ).alias("__ga"),
            F.first(
                F.when(F.col("__member") == F.col("id_b"), F.col("grams")),
                ignorenulls=True,
            ).alias("__gb"),
        )
        .filter(F.col("__ga").isNotNull() & F.col("__gb").isNotNull())
    )
    cont = F.size(F.array_intersect("__ga", "__gb")) / F.size("__ga").cast(
        "double"
    )
    return (
        joined.filter(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, round_to).alias("containment"))
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 32,
) -> DataFrame:
    """SimHash over distinct tokens: bit_j = sign of Σ_tokens (±1 by
    md5-bit j), j MSB-first over the hash's first ``num_bits`` bits.

    Computed entirely per-row — ZERO shuffles: tokens → 32-bit ints
    (md5 once per token), one ``aggregate`` folds the ±1 bit-vectors
    into counters, one more folds signs into the BIGINT. The SQL oracle
    replays the equivalent explode + nibble-decode formulation and
    hash-matches exactly (bit j of ``conv(hex[1:8])`` == nibble j//4 &
    (1<<(3-j%4)))."""
    assert num_bits <= 32, "bits come from the md5's first 8 hex chars"
    arrs = df.select(
        F.col(id_col),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    ).filter(F.size("toks") > 0)
    # md5 ONCE per token: map tokens → the 32-bit int of the hash's
    # first 8 hex chars; bit j (MSB-first) == nibble-j//4 & (1<<(3-j%4)),
    # i.e. exactly the bit the oracle's nibble decode reads.
    vs = F.transform(
        F.col("toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
    )
    # one pass: fold ±1 bit-vectors into num_bits counters (zip_with on
    # the lambda variable, so nothing is recomputed per bit); bit j
    # extracted as floor(v / 2^(31-j)) % 2 — v < 2^32 so the double
    # division is exact
    zero = F.array_repeat(F.lit(0).cast("bigint"), num_bits)
    divisors = F.array(
        *[F.lit(1 << (31 - j)).cast("bigint") for j in range(num_bits)]
    )
    sums = F.aggregate(
        vs,
        zero,
        lambda acc, v: F.zip_with(
            acc,
            F.transform(
                divisors,
                lambda d: F.pmod(F.floor(v / d), F.lit(2)).cast("bigint") * 2 - 1,
            ),
            lambda a, b: a + b,
        ),
    )
    powers = F.array(
        *[F.lit(1 << (num_bits - 1 - j)).cast("bigint") for j in range(num_bits)]
    )
    value = F.aggregate(
        F.zip_with(
            sums, powers, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return arrs.select(F.col(id_col), value.alias("simhash"))


def _span_base(
    df: DataFrame, n: int, id_col: str, text_col: str,
    keep_tokens: bool = False,
) -> DataFrame:
    """(id, _hs: array of md5 span hashes, n_spans) per document —
    plus the staged token array ``_tk`` when ``keep_tokens`` (the
    rewrite path needs it to cut covered spans).

    Two hard-won plan rules live here:

    - The tokenization is STAGED into its own projection: Catalyst does
      not CSE non-cheap expressions into higher-order lambdas, so an
      un-staged split() would re-tokenize the document PER SPAN
      (measured 20s vs 1s at sf0.1).  Same pattern as text.profile.
    - Small-scan guard: span hashing is the expensive part, and a
      corpus that fits in one scan split would run it on one core.
      Widen to cluster parallelism first; at real scale the scan
      already has >= defaultParallelism splits and this is a no-op.
    """
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    ctx = df.sparkSession.sparkContext
    if staged.rdd.getNumPartitions() < ctx.defaultParallelism:
        staged = staged.repartition(ctx.defaultParallelism)
    tk = F.col("_tk")
    span_hashes = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cols = [F.col(id_col)]
    if keep_tokens:
        cols.append(tk)
    return staged.select(
        *cols,
        span_hashes.alias("_hs"),
        F.greatest(F.size(tk) - (n - 1), F.lit(0)).alias("n_spans"),
    )


def _span_stream(base: DataFrame, id_col: str) -> DataFrame:
    """Explode the span-hash arrays to (id, h) rows.

    explode_outer, NOT explode: for a plain explode Catalyst's
    InferFiltersFromGenerate synthesizes `size(_hs) > 0` and pushes it
    below the exchange — re-inlining the whole span expression
    (including the tokenizer) into the serial scan stage.  The outer
    variant infers nothing; empty docs surface as one NULL span row
    dropped by the cheap post-explode filter.
    """
    return base.select(
        F.col(id_col), F.explode_outer("_hs").alias("h")
    ).filter(F.col("h").isNotNull())


def duplicated_span_stats(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring detection at token-span granularity
    (the Lee et al. 2022 "Deduplicating Training Data" ExactSubstr idea,
    re-expressed relationally): every length-``n`` token window is
    hashed, and a span is *duplicated* when the same hash occurs in at
    least two distinct documents.  Returns one row per input document
    with ``n_spans``, ``n_dup`` (span positions whose content appears in
    another document) and ``dup_frac``.

    Scale design: instead of a corpus-wide suffix array (the paper's
    single-node structure), span hashes are a distributed group-by —
    span generation is a per-row projection (no shuffle) and the
    cross-document occurrence count is ONE shuffle keyed by the
    uniformly-distributed span hash.  Hot spans (boilerplate repeated
    in millions of docs) group to a single counter row rather than
    fanning out pairwise, so there is no quadratic blow-up to cap.

    The span stream is hashed ONCE: both consumers (the nd>=2 dup-hash
    set and the per-doc dup count) hang off the same
    ``groupBy(h, id)`` exchange, so the md5 explode runs a single pass
    and the second consumer is a ReusedExchange.  The earlier form ran
    the whole span projection twice (once under count_distinct, once
    under the join back); at sf0.1 the two plans measure within host
    noise of each other (~1.2-2s, the exchange materialization costs
    locally what the recompute saves), but at corpus scale the trade is
    not symmetric: the reused exchange shuffles ~40 B/span ONCE, while
    the old shape re-scanned and re-hashed the full corpus — a second
    100 TB scan+md5 pass vs shuffle I/O that AQE/compression already
    amortize.  The ``nd >= 2`` side collapses to almost nothing at
    realistic duplication rates, so AQE turns the join back into a
    broadcast over the reused pairs.

    md5 span hashes keep the result engine-portable for the oracle; a
    production run would swap in xxhash64.
    """
    from opentimes_spark.functions.text import stable_round

    base = _span_base(df, n, id_col, text_col)
    spans = _span_stream(base, id_col)
    # (h, doc) occurrence pairs: ONE shuffle, shared by both branches
    pairs = spans.groupBy("h", id_col).agg(F.count(F.lit(1)).alias("occ"))
    dup_hashes = (
        pairs.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup_per_doc = (
        pairs.join(dup_hashes, "h")
        .groupBy(id_col)
        .agg(F.sum("occ").alias("n_dup"))
    )
    return (
        base.drop("_hs")
        .join(dup_per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            stable_round(
                F.when(F.col("n_spans") == 0, F.lit(0.0)).otherwise(
                    F.coalesce("n_dup", F.lit(0))
                    / F.col("n_spans").cast("double")
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def span_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    exact ``n``-token span with an evaluation/benchmark set (the
    standard n-gram-overlap contamination check used before LLM
    training runs).  Returns one row per training document with
    ``n_spans``, ``n_hits`` (span positions whose content occurs
    anywhere in the eval set) and a ``contaminated`` flag.

    Scale design: benchmark sets are small relative to a 100 TB corpus,
    so the distinct eval span hashes are the BROADCAST side of the
    probe join — the training corpus streams through map-side, and the
    only shuffle is the per-document hit count (keyed by doc id, then
    broadcast back onto the n_spans projection).  The eval side's
    distinct() is a shuffle of the eval set only.
    """
    t_base = _span_base(train, n, id_col, text_col)
    t_spans = _span_stream(t_base, id_col)
    e_spans = (
        _span_stream(_span_base(eval_df, n, id_col, text_col), id_col)
        .select("h")
        .distinct()
    )
    hits = (
        t_spans.join(F.broadcast(e_spans), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        t_base.drop("_hs")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def remove_duplicated_spans(
    train: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full ExactSubstr deduplication (Lee et al. 2022): REWRITE the
    corpus so that every cross-document duplicated ``n``-token span
    survives in exactly one canonical document (the minimum id among
    its holders) and is cut from all others.  Returns
    (id, n_before, n_after, text_clean).

    Scale design mirrors ``duplicated_span_stats``: span hashing is a
    per-row projection, cross-doc stats one shuffle on the span hash.
    The removal itself is per-row again — the only new exchange is the
    per-doc removal-position list (collect_list keyed by doc id, which
    rides back onto the token arrays as a broadcast at realistic dup
    rates).  Canonical-holder semantics keep the op idempotent: a
    second pass removes nothing, because each surviving span now has
    one holder.
    """
    tk = F.col("_tk")
    base = _span_base(train, n, id_col, text_col, keep_tokens=True).drop(
        "n_spans"
    )
    # posexplode_outer for the same InferFiltersFromGenerate reason as
    # _span_stream; pos is 1-based to match the sequence() start.
    spans = base.select(
        F.col(id_col), F.posexplode_outer("_hs").alias("_p0", "h")
    ).filter(F.col("h").isNotNull()).select(
        F.col(id_col), (F.col("_p0") + 1).alias("pos"), "h"
    )
    stats = spans.groupBy("h").agg(
        F.count_distinct(id_col).alias("nd"),
        F.min(id_col).alias("min_doc"),
    )
    removals = (
        spans.join(stats.filter(F.col("nd") >= 2), "h")
        .filter(F.col(id_col) != F.col("min_doc"))
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("_dps"))
    )
    dps = F.coalesce("_dps", F.array().cast("array<int>"))
    covered = lambda i: F.exists(  # noqa: E731 — reads best inline
        dps, lambda q: ((i + 1) >= q) & ((i + 1) <= q + (n - 1))
    )
    cleaned = F.filter(tk, lambda x, i: ~covered(i))
    return (
        base.drop("_hs")
        .join(removals, id_col, "left")
        .select(
            F.col(id_col),
            F.size(tk).cast("long").alias("n_before"),
            F.size(cleaned).cast("long").alias("n_after"),
            F.concat_ws(" ", cleaned).alias("text_clean"),
        )
    )


def incremental_exact_dedup(
    new_batch: DataFrame,
    ledger: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Exact dedup for INCREMENTAL corpus ingestion: a new batch is
    deduplicated against a fingerprint LEDGER — (fp, canonical_id) for
    every document ever accepted — without touching historical text.

    Returns ``(fresh, updated_ledger)``: ``fresh`` is the new batch
    minus docs whose normalized fingerprint already exists (in the
    ledger OR earlier in the batch, min-id canonical within the batch);
    ``updated_ledger`` is the ledger plus the fresh batch's
    fingerprints, ready to persist for the next ingest (pair it with
    ``io.snapshots.write_snapshot`` for versioned ledger publishes).

    Scale story — the reason this exists: re-deduplicating a 100 TB
    corpus on every daily ingest re-scans 100 TB; this touches only
    (batch text) + (ledger fingerprints, 48 bytes/doc).  The anti join
    shuffles fingerprints, never text; within-batch grouping is one
    fingerprint-keyed exchange.  Ledger growth is linear in accepted
    docs and independent of rejected duplicates."""
    fp_new = new_batch.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    batch_canon = fp_new.groupBy("fp").agg(F.min(id_col).alias(id_col))
    if ledger is not None:
        batch_canon = batch_canon.join(
            ledger.select("fp"), "fp", "left_anti"
        )
    fresh = new_batch.join(batch_canon.select(id_col), id_col, "left_semi")
    new_entries = batch_canon.select("fp", F.col(id_col).alias("canonical_id"))
    updated = (
        new_entries
        if ledger is None
        else ledger.select("fp", "canonical_id").unionByName(new_entries)
    )
    return fresh, updated


# --- materialized incremental LSH index (round 7) ---------------------------
# The near-dup mirror of `incremental_exact_dedup`'s ledger and
# `append_to_ivfpq_index`'s frozen-parameter append: band rows live in a
# Hive layout partitioned by band_idx, new documents are signed with the
# SAME (num_hashes, band_size, shingle_size, hash_fn) parameters from
# the index's `_params` sidecar and appended O(batch), and a probe joins
# ONLY the new docs' band rows against the stored index — daily near-dup
# ingest never re-signs the corpus.


def write_lsh_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_size: int = 3,
    hash_fn: str = "md5",
) -> None:
    """Materialize the banded MinHash index: (id, band_hash) rows
    Hive-partitioned by band_idx, plus a `_params` sidecar pinning the
    signature geometry (appends and probes MUST reuse it — signatures
    under different parameters are incomparable, the LSH analogue of
    the IVF-PQ dim/m contract)."""
    spark = docs.sparkSession
    sigs = minhash_signatures(
        docs, id_col, text_col, num_hashes, shingle_size, hash_fn
    )
    banded = _banded(sigs, id_col, num_hashes, band_size, hash_fn)
    (
        banded.select(F.col(id_col), "band_hash", "band_idx")
        .write.mode("overwrite")
        .partitionBy("band_idx")
        .parquet(path)
    )
    spark.createDataFrame(
        [(num_hashes, band_size, shingle_size, hash_fn)],
        "num_hashes int, band_size int, shingle_size int, hash_fn string",
    ).write.mode("overwrite").parquet(path + "/_params")


def read_lsh_params(spark, path: str) -> dict:
    """The index's pinned signature geometry; raises if absent."""
    import os

    if not os.path.exists(os.path.join(path, "_params", "_SUCCESS")):
        raise ValueError(f"no _params at {path} — rebuild with write_lsh_index")
    return spark.read.parquet(path + "/_params").collect()[0].asDict()


def append_to_lsh_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incrementally add documents to a materialized LSH index: sign
    the batch under the index's pinned parameters and append its band
    rows — O(batch) like the exact-dedup ledger, never a corpus
    re-sign.  Idempotent: ids already indexed are anti-joined away via
    a 1-column pruned scan.  Returns {'appended': n_docs}."""
    spark = new_docs.sparkSession
    p = read_lsh_params(spark, path)
    existing = spark.read.parquet(path).select(F.col(id_col)).distinct()
    fresh = new_docs.join(existing, id_col, "left_anti")
    sigs = minhash_signatures(
        fresh, id_col, text_col, p["num_hashes"], p["shingle_size"],
        p["hash_fn"],
    )
    banded = _banded(
        sigs, id_col, p["num_hashes"], p["band_size"], p["hash_fn"]
    ).select(F.col(id_col), "band_hash", "band_idx").localCheckpoint(
        eager=True  # truncate lineage: the write appends to the path
    )  # this plan's anti-join read
    n = banded.select(id_col).distinct().count()
    if n:
        banded.write.mode("append").partitionBy("band_idx").parquet(path)
    return {"appended": int(n)}


def lsh_index_candidates(
    query_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate pairs (query_id, index_id) between a batch of
    documents and the MATERIALIZED index: the batch is signed under the
    pinned parameters and its band rows join the stored index on
    (band_idx, band_hash) — cost scales with the batch's band
    collisions, never with index size, and the Hive band_idx key keeps
    each probe partition-local.  Self-matches excluded; distinct pairs.
    The ingest-time gate: run before `append_to_lsh_index`, send
    collisions to jaccard-verify, append only the accepted docs."""
    spark = query_docs.sparkSession
    p = read_lsh_params(spark, path)
    sigs = minhash_signatures(
        query_docs, id_col, text_col, p["num_hashes"], p["shingle_size"],
        p["hash_fn"],
    )
    qb = _banded(
        sigs, id_col, p["num_hashes"], p["band_size"], p["hash_fn"]
    ).select(
        F.col(id_col).alias("query_id"), "band_idx", "band_hash"
    )
    idx = spark.read.parquet(path).select(
        F.col(id_col).alias("index_id"), "band_idx", "band_hash"
    )
    return (
        qb.join(idx, ["band_idx", "band_hash"])
        .filter(F.col("query_id") != F.col("index_id"))
        .select("query_id", "index_id")
        .distinct()
    )
