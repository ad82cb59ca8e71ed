"""Connected components over a pair/edge list — the clustering step that
turns near-duplicate PAIRS (minhash/jaccard output) into dedup GROUPS
with a canonical representative (min doc id) per group.

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — the same
algorithm GraphFrames' connectedComponents implements). Each round:

- large-star: every node u links its LARGER neighbors to the minimum of
  its neighborhood ∪ {u};
- small-star: every node u (edges oriented large→small) links its
  smaller neighbors and itself to that minimum.

Both steps preserve connectivity, and the fixpoint is a forest of
stars whose root is the component minimum. Convergence takes
O(log² n) rounds regardless of graph DIAMETER — the previous min-label
propagation needed diameter rounds, so a 10⁶-node chain (pathological
near-dup graph) went from ~10⁶ rounds to ~40. A 25-round cap therefore
covers any graph that fits on a cluster.

Scale: each round is two groupBy-join pairs keyed by node id —
uniformly distributed, one row per edge, nothing driver-side except the
1-row convergence checksum; ``localCheckpoint`` truncates lineage each
round so plans don't grow exponentially.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small, drop self-loops and duplicates."""
    return (
        edges.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


# The two star steps are WINDOW-form (r15): the original groupBy+join
# shape referenced its input twice (once for the per-node min, once to
# re-attach it), so each star cost a join with both sides shuffled AND —
# because the intermediate is not materialized — the upstream star's
# whole pipeline was planned and executed once per reference: one
# contraction round ran 11 Exchanges / 4 SortMergeJoins over 12 scans of
# the checkpointed edge set.  A window over ``u`` computes the same
# per-node min in the SAME exchange that distributes the rows, and the
# "neighbors + self" fan-out is an in-row explode.  r15 left a round at
# 3 Exchanges (large-star window → small-star window → terminal
# distinct); r16 removes the distinct's exchange outright (guide §2.4):
#
# - the round's (u, v) dedup RIDES the large-star exchange — an
#   explicit hash(u) repartition satisfies the (u, v) clustering
#   (hash partitioning on a subset of the grouping keys), so the
#   dropDuplicates aggregate and the window both reuse that one
#   exchange;
# - small-star's transient duplicates (cross-group collisions only —
#   see its docstring) are carried into the NEXT round's checkpoint
#   (bounded per node by its degree, LESS than the pre-distinct volume
#   the r15 form carried into its dedicated dedup shuffle) and die in
#   the next round's riding dedup instead.
#
# A full round is now one linear 2-Exchange, 0-join pipeline.  Window
# mins are duplicate-insensitive and both stars consume DEDUPED rows,
# so the per-round edge SETS are exactly the r15 sets (pinned by
# test).  The fixpoint fingerprint is now a MULTISET fingerprint over
# an output that may carry cross-group duplicates; once the input set
# is a star forest both stars emit a clean duplicate-free set, so the
# fingerprint stabilizes either on the same round as the r15 set
# comparison or — when the FIRST star-forest output still carried a
# cross-group duplicate — exactly one round later.  One possible extra
# 2-Exchange round against R ≥ 10 rounds saving one Exchange each is
# a strict win; the bench rows pin the measured round counts.


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, m = min(Γ(u) ∪ {u}); the
    round's (u, v) dedup rides this exchange (see module comment)."""
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    w = Window.partitionBy("u")
    return (
        sym.repartition("u")
        .dropDuplicates(["u", "v"])
        .withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Edges oriented large→small; every node u links Γ⁻(u) ∪ {u} to
    m = min(Γ⁻(u)) (all out-neighbors are < u, so m is the overall min).

    The (u, v) dedup rides this exchange too (hash(u) repartition
    satisfies the (u, v) clustering), which makes the v == m row unique
    per group — so the u → m self-link is emitted exactly ONCE per
    group, on that row, instead of once per row as in r15 (whose
    terminal distinct culled the copies).  Output set is identical:
    {(v_i, m) : v_i != m} ∪ {(u, m)}, with m always attained by some
    in-neighbor row.  Remaining duplicates are cross-group only
    ((x, m) emitted by two groups sharing min m) and die in the next
    round's riding dedup."""
    w = Window.partitionBy("u")
    base = (
        edges.repartition("u")
        .dropDuplicates(["u", "v"])
        .withColumn("m", F.min("v").over(w))
    )
    return base.select(
        F.when(F.col("v") != F.col("m"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("u"),
        F.col("m").alias("v"),
    )


def _observed_checkpoint(edges: DataFrame):
    """Eager localCheckpoint + order-independent 129-bit edge-set
    fingerprint (count, sum of xxhash64, xor of xxhash64) riding the
    SAME materialization job via ``observe`` — the per-round fixpoint
    check costs no extra pass over the edges (r15; it used to be a
    separate aggregate job per round)."""
    h = F.xxhash64(F.col("u"), F.col("v"))
    obs = Observation()
    out = edges.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: immune to ANSI long-overflow at any edge count
        F.sum(h.cast("decimal(38,0)")).alias("s"),
        F.bit_xor(h).alias("x"),
    ).localCheckpoint(eager=True)
    row = obs.get
    return out, (row["n"], row["s"], row["x"])


# Above this canonical-edge count the star-contraction loop runs
# distributed; below it the graph is driver-sized and one union-find
# pass beats 10-40 six-shuffle Spark rounds.  Output semantics are a
# pure min-id SET — no floating point — so the two paths are exactly
# interchangeable (pinned by test).
_DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(edge_rows, node_rows):
    """Exact (node, component_id=min member) via union-find on
    driver-collected canonical edges."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    nodes = [r[0] for r in node_rows]
    roots = {x: find(x) for x in nodes}
    for x, r in roots.items():
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    return [(x, comp_min[roots[x]]) for x in nodes]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    force_distributed: bool = False,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``;
    component_id = min node id in the component (lexicographic for
    string ids — same ordering the DuckDB-recursive-CTE oracle uses).
    Raises if not converged within ``max_iter`` rounds; with log²-round
    convergence that cap is structural, not a tuning knob.

    Adaptive execution: at or below ``_DRIVER_CC_MAX_EDGES`` RAW edges
    the graph fits on the driver and union-find answers from one Arrow
    transfer instead of up to 40 six-shuffle contraction rounds (the
    kmeans_fit driver-twin precedent — here with NO numeric caveat at
    all, the output is a min-id set).  The cutover keys on the raw
    count (one shuffle-free job) rather than the canonical count so
    the driver path pays NO Spark shuffles at all: no node distinct,
    no canonicalization, no checksum — union-find is insensitive to
    duplicate/self-loop/uncanonicalized edges, so the raw pairs feed
    it directly (raw ≥ canonical, so the memory bound still holds).
    ``force_distributed=True`` pins the star-contraction path; the
    bench stress rows use it so the O(log² n) scale claim keeps
    getting priced on the clock."""
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # One eager checkpoint = the ONLY materialization of the upstream
    # edge producer (often an expensive LSH pair join): the cutover
    # count, the driver-path Arrow transfer, and the distributed
    # path's node/canonical builds all read these partitions instead
    # of re-executing the upstream lineage (which the pre-cutover code
    # paid twice — once for the node distinct, once for canonical).
    # r15: the cutover count rides the checkpoint materialization via
    # observe() — previously a second (shuffle-free but full-scan) job.
    _obs = Observation()
    raw = raw.observe(_obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    if not force_distributed and _obs.get["n"] <= _DRIVER_CC_MAX_EDGES:
        spark = edges.sparkSession
        pdf = raw.toPandas()
        us, vs = pdf["u"].tolist(), pdf["v"].tolist()
        seen: set = set()
        node_list = []
        for x in us:
            if x not in seen:
                seen.add(x)
                node_list.append(x)
        for x in vs:
            if x not in seen:
                seen.add(x)
                node_list.append(x)
        pairs = _driver_union_find(zip(us, vs), [(n,) for n in node_list])
        # Output type = the UNION-widened type of (u, v), exactly as the
        # distributed path's node frame resolves it (analysis only, no
        # job) — typing from u alone would narrow int-u/bigint-v edges.
        node_type = (
            raw.select(F.col("u").alias("node"))
            .union(raw.select(F.col("v").alias("node")))
            .schema["node"].dataType.simpleString()
        )
        out = pd.DataFrame(pairs, columns=["node", "component_id"])
        return spark.createDataFrame(
            out, f"node {node_type}, component_id {node_type}"
        )
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e, prev = _observed_checkpoint(_canonical(raw))
    # Size the ITERATION's shuffle parallelism to the edge count: each
    # round is ~6 tiny shuffles, and localCheckpoint defeats AQE's
    # cross-round partition coalescing, so at small edge counts the
    # session default (e.g. 32) pays 6x32 task launches per round for
    # microscopic partitions (~35% of round wall-clock measured on the
    # 1e5-edge path graph).  ~50k edges per partition keeps partitions
    # comfortably in memory at any scale; the session value is restored
    # before the (one-shot, AQE-covered) final labelling join.
    spark = edges.sparkSession
    session_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(8, min(int(session_parts), int(prev[0]) // 50_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    # r16 round-batching experiment (measured, REJECTED): checkpointing
    # every TWO rounds halves the per-round job/observe/build overhead,
    # but a phase probe on the 1e5-edge path graph decomposed a round
    # as ~0.24s Python DataFrame build + ~0.04s planning + ~0.55s
    # execution + ~0.1s checkpoint — and re-executing the SAME physical
    # plan costs the same 0.55s, i.e. the round is bound by the
    # per-stage execution floor of its two window exchanges, not by the
    # checkpoint.  A 2-rounds-per-checkpoint unit timed 1.56-1.91s vs
    # 2x0.85-0.94s for two single-round units (no saving), and the
    # 3-pair interleaved bench A/B sat inside the noise band both ways.
    # 1 loop partition instead of 8 measured WORSE (2.4s/round), and
    # codegen-off changed nothing, so the floor is not task count or
    # JIT.  The unbatched loop stays: one checkpoint per round also
    # keeps fixpoint detection exact.
    try:
        for _ in range(max_iter):
            e, cur = _observed_checkpoint(_small_star(_large_star(e)))
            if cur == prev:
                # fixpoint: e is a star forest rooted at component minima
                labelled = e.groupBy("u").agg(F.min("v").alias("component_id"))
                return (
                    nodes.join(
                        labelled, nodes["node"] == labelled["u"], "left"
                    )
                    .select(
                        "node",
                        F.coalesce(F.col("component_id"), F.col("node")).alias(
                            "component_id"
                        ),
                    )
                )
            prev = cur
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", session_parts)
    raise RuntimeError(f"did not converge in {max_iter} rounds")


def dedup_groups(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """(node, component_id, n_members): components plus their sizes —
    the keep-one-per-group frame a dedup pipeline anti-joins against."""
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("n_members"))
    return comp.join(sizes, "component_id").select("node", "component_id", "n_members")
