"""End-to-end training-corpus curation: the LLM-data counterpart of
``calculate_times`` — every pipeline operator this repo implements,
composed into one checkpointed Spark job.

Stages (each a content-addressed checkpoint via ``plans/incremental`` —
re-running with unchanged inputs reads checkpoints instead of
recomputing, the reference's DVC semantics):

1. ``quality``   — classifier scoring (Arrow-batched inference seam),
                   drop low-score docs and the held-out eval source.
1b. ``gopher``   — (opt-in ``--gopher``) the Gopher rule-based filter
                   (word count / mean word length / alphabetic and
                   stopword fractions, Rae et al. 2021).
1c. ``boilerplate`` — (opt-in ``--boilerplate-max``) drop docs whose
                   trigram positions are mostly corpus-level templates
                   (C4/RefinedWeb-style; operators/boilerplate.py).
2. ``exact``     — exact dedup: keep the canonical (min-id) doc per
                   normalized-text fingerprint.
3. ``spans``     — ExactSubstr rewrite: cut cross-doc duplicated
                   8-token spans from non-canonical holders; drop docs
                   that end up empty.
4. ``decontam``  — drop docs sharing any 8-token span with the
                   held-out eval source.
4b. ``semantic`` — (opt-in ``--semantic-tau``) SemDeDup: drop docs
                   whose embedding is a within-cluster cosine near-dup
                   of a lower-id doc; docs without an embedding pass
                   through.
5. ``curated``   — mixture-sample per source weights, assign each doc
                   its token-budget training-sequence bin, write the
                   final corpus + a manifest of per-stage row counts.

Run: ``python -m opentimes_spark.jobs.curate_corpus --sf-dir
/root/testdata/sf0.001 --out /tmp/curated``
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--eval-source", default="src19")
    p.add_argument("--min-score", type=int, default=50)
    p.add_argument("--budget", type=int, default=512)
    p.add_argument("--span", type=int, default=8)
    p.add_argument(
        "--gopher",
        action="store_true",
        help="apply the Gopher rule-based quality filter (Rae et al. "
        "2021: word count, mean word length, alphabetic and stopword "
        "fractions) after classifier scoring",
    )
    p.add_argument(
        "--boilerplate-max",
        type=float,
        default=None,
        help="drop docs whose trigram boilerplate coverage (fraction "
        "of n-gram positions matched by corpus-level df>=5 templates) "
        "exceeds this threshold; docs too short to have trigrams pass",
    )
    p.add_argument(
        "--semantic-tau",
        type=float,
        default=None,
        help="enable SemDeDup semantic dedup at this cosine threshold "
        "(docs whose embedding is a within-cluster near-dup of a "
        "lower-id doc are dropped; docs without an embedding pass "
        "through)",
    )
    p.add_argument(
        "--publish",
        action="store_true",
        help="publish the curated corpus as a versioned snapshot "
        "(<out>/published/v=N + atomic _LATEST pointer) so training "
        "runs can pin the exact version they consumed",
    )
    return p.parse_args(argv)


def curate(spark: SparkSession, args: argparse.Namespace) -> dict:
    from opentimes_spark.functions.text import fingerprint
    from opentimes_spark.operators.dedup import (
        remove_duplicated_spans,
        span_contamination,
    )
    from opentimes_spark.operators.inference import score_documents
    from opentimes_spark.operators.packing import (
        pack_sequences,
        weighted_source_mixture,
    )
    from opentimes_spark.plans.incremental import run_stage

    import time

    src = os.path.join(args.sf_dir, "documents.parquet")
    out = args.out
    # stage_seconds: wall clock between checkpoint boundaries (r14,
    # VERDICT r13 #6) — the e2e bench row is checkpoint-I/O-dominated
    # and host-banded; per-stage splits in the manifest (and from there
    # in BENCH_FULL) turn a ±40% band on the total into a localizable
    # signal.  Each figure covers build + checkpoint write + the
    # recorded count for that stage.
    manifest: dict = {"stages": {}, "stage_seconds": {}}
    _t0 = [time.perf_counter()]

    def mark(name: str) -> None:
        now = time.perf_counter()
        manifest["stage_seconds"][name] = round(now - _t0[0], 3)
        _t0[0] = now

    def record(name: str, df, skipped: bool) -> None:
        manifest["stages"][name] = {
            "rows": df.count(),
            "skipped": skipped,
        }
        mark(name)

    def path(name: str) -> str:
        return os.path.join(out, name)

    docs = spark.read.parquet(src)
    eval_df = docs.filter(F.col("source") == args.eval_source)

    # quality → gopher → boilerplate are ONE fused scan (VERDICT r10
    # Next #4): the classifier score and the Gopher rules are row-local
    # filters, so checkpointing between them bought nothing but two
    # parquet round-trips; per-stage manifest counts ride the write job
    # itself via observe().  Only boilerplate needs the survivor corpus
    # twice (template df counts + the anti-join) — a persist inside the
    # single stage covers that.  Counts for the fused interior stages
    # are persisted to a sidecar so a content-addressed SKIP can still
    # report them (the old per-stage checkpoints made them recountable).
    from pyspark.sql import Observation

    obs: dict[str, Observation] = {}
    prefilter_caches: list = []

    def build_prefilter():
        train = docs.filter(F.col("source") != args.eval_source)
        keep = score_documents(train, threshold=args.min_score).filter(
            "keep"
        )
        q = train.join(keep.select("doc_id"), "doc_id", "left_semi")
        obs["quality"] = Observation()
        q = q.observe(obs["quality"], F.count(F.lit(1)).alias("n"))
        if args.gopher:
            from opentimes_spark.functions.text import gopher_pass

            q = q.filter(gopher_pass(F.col("text")))
            obs["gopher"] = Observation()
            q = q.observe(obs["gopher"], F.count(F.lit(1)).alias("n"))
        if args.boilerplate_max is not None:
            from opentimes_spark.operators.boilerplate import (
                boilerplate_coverage,
            )

            # coverage is computed among SURVIVORS (template df counts
            # shift as upstream filters drop docs); docs too short for
            # a trigram emit no coverage row and pass through
            q = q.persist()
            prefilter_caches.append(q)
            over = boilerplate_coverage(q, n=3, min_df=5).filter(
                F.col("bp_frac") > args.boilerplate_max
            )
            q = q.join(over.select("doc_id"), "doc_id", "left_anti")
        return q

    prefilter_params = {
        "min_score": args.min_score,
        "eval": args.eval_source,
        "gopher": args.gopher,
        "boilerplate_max": args.boilerplate_max,
    }
    q, skipped = run_stage(
        spark, "prefilter", [src], path("prefilter"), build_prefilter,
        params=prefilter_params,
    )
    counts_path = os.path.join(path("prefilter"), "_stage_counts.json")
    if skipped and not os.path.exists(counts_path):
        # The sidecar commits AFTER run_stage's lock: a crash in that
        # window leaves a complete checkpoint whose interior counts are
        # unrecoverable from the parquet alone.  Invalidate the lock
        # and rebuild ONCE instead of wedging every later run on
        # FileNotFoundError.
        from opentimes_spark.plans.incremental import _lock_path

        os.remove(_lock_path(path("prefilter")))
        q, skipped = run_stage(
            spark, "prefilter", [src], path("prefilter"),
            build_prefilter, params=prefilter_params,
        )
    for c in prefilter_caches:
        c.unpersist()
    final_rows = q.count()
    if skipped:
        with open(counts_path) as fh:
            interior = json.load(fh)
    else:
        interior = {name: int(o.get["n"]) for name, o in obs.items()}
        tmp = counts_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(interior, fh)
        os.replace(tmp, counts_path)  # atomic: no torn sidecar on skip
    stage_rows = dict(interior)
    if args.boilerplate_max is not None:
        stage_rows["boilerplate"] = final_rows
    elif args.gopher:
        stage_rows["gopher"] = final_rows
    else:
        stage_rows["quality"] = final_rows
    for name in ("quality", "gopher", "boilerplate"):
        if name in stage_rows:
            manifest["stages"][name] = {
                "rows": stage_rows[name],
                "skipped": skipped,
            }
    mark("prefilter")  # fused quality+gopher+boilerplate: one boundary
    quality_upstream = path("prefilter")

    def build_exact():
        canon = (
            q.select("doc_id", fingerprint(F.col("text")).alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        return q.join(canon.select("doc_id"), "doc_id", "left_semi")

    ex, skipped = run_stage(
        spark, "exact", [quality_upstream], path("exact"), build_exact,
    )
    record("exact", ex, skipped)

    def build_spans():
        rewritten = remove_duplicated_spans(ex, n=args.span)
        return (
            ex.drop("text", "n_chars")
            .join(
                rewritten.filter(F.col("n_after") > 0).select(
                    "doc_id", F.col("text_clean").alias("text")
                ),
                "doc_id",
            )
        )

    sp, skipped = run_stage(
        spark, "spans", [path("exact")], path("spans"), build_spans,
        params={"n": args.span},
    )
    record("spans", sp, skipped)

    def build_decontam():
        flags = span_contamination(sp, eval_df, n=args.span)
        return sp.join(
            flags.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_semi",
        )

    dc, skipped = run_stage(
        spark, "decontam", [path("spans"), src], path("decontam"),
        build_decontam, params={"eval": args.eval_source, "n": args.span},
    )
    record("decontam", dc, skipped)
    upstream = path("decontam")

    if args.semantic_tau is not None:
        emb_src = os.path.join(args.sf_dir, "embeddings.parquet")

        def build_semantic():
            from opentimes_spark.operators.clustering import semantic_prune

            # Prune among SURVIVORS only: running semantic_prune over
            # the full embeddings table would drop a surviving doc as a
            # near-dup of a lower-id doc the earlier stages already
            # removed — losing every representative of that content.
            # The keep-one-representative rule requires the kept
            # lower-id doc to actually be in the corpus.
            emb = spark.read.parquet(emb_src).join(
                dc.select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
            pruned = semantic_prune(
                emb, k=8, threshold=args.semantic_tau, max_iter=10, tol=1e-9
            ).filter(F.col("kept") == 0)
            # Embedding coverage is partial (not every doc has a
            # vector); docs without one pass through untouched — only a
            # vector-certified semantic dup is dropped.
            return dc.join(
                pruned.select(F.col("vec_id").alias("doc_id")),
                "doc_id",
                "left_anti",
            )

        dc, skipped = run_stage(
            spark, "semantic", [path("decontam"), emb_src], path("semantic"),
            build_semantic, params={"tau": args.semantic_tau},
        )
        record("semantic", dc, skipped)
        upstream = path("semantic")

    def build_curated():
        # try_cast: source names are user data — a corpus whose sources
        # aren't 'src<NN>' must fall through to the default weight, not
        # die on an ANSI CAST_INVALID_INPUT
        src_mod = F.expr("try_cast(substring(source, 4, 8) AS int)") % 4
        wt = (
            F.when(src_mod == 0, 0.5)
            .when(src_mod == 1, 0.75)
            .otherwise(1.0)
        )
        mixed = weighted_source_mixture(dc.withColumn("wt", wt), F.col("wt"))
        bins = pack_sequences(mixed, budget=args.budget)
        return mixed.drop("wt").join(
            bins.select("doc_id", "n_tok", "seq_bin"), "doc_id"
        )

    cur, skipped = run_stage(
        spark, "curated", [upstream], path("curated"),
        build_curated, params={"budget": args.budget},
    )
    record("curated", cur, skipped)

    manifest["out"] = path("curated")
    if args.publish:
        from opentimes_spark.io.snapshots import write_snapshot

        manifest["published_version"] = write_snapshot(
            cur, os.path.join(out, "published"), sort_by="doc_id"
        )
    with open(os.path.join(out, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def main(argv: list[str] | None = None) -> dict:
    from opentimes_spark.session import get_spark

    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark()
    return curate(spark, args)


if __name__ == "__main__":
    print(json.dumps(main(), sort_keys=True))
