"""Degenerate-corpus crash gate: every registered query must EXECUTE
(not necessarily return rows) on an adversarial tiny corpus.

The round-11 review found `docs_dedup_threshold_sweep` crashing with
INVALID_ARRAY_INDEX on any document of fewer than two tokens — a class
the oracle differential can never see because the synthetic corpora
carry only well-formed rows (min 10 tokens per doc).  This gate builds
the corpus the real world ships: empty strings, single-token and
whitespace-only documents, unicode, a 2-row fact table exercising every
empty-aggregate / empty-window / guard-expression path — then runs the
FULL registry against it and fails on any exception.

Row counts and values are deliberately unchecked (most queries
legitimately return empty or NULL frames here); the contract is only
"no query crashes on data the schema permits".

Usage: python tools/stress_degenerate.py [--constant|--nulls] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

# Documents that break naive n-gram / tokenizer / ratio arithmetic:
# the text column is overwritten on a schema-faithful base row.
ADVERSARIAL_TEXTS = [
    "",  # zero tokens
    " ",  # whitespace only -> zero tokens after filter
    "one",  # single token: bigram/trigram windows are empty
    "a b",  # exactly one bigram, no trigram
    "ümläut töken 你好",  # non-ASCII
    "x" * 5000,  # one enormous token
    "dup dup dup dup dup",  # degenerate repetition
]


def build_corpus(spark, out_dir: str) -> None:
    """Schema-faithful tiny tables: every table is the real sf0.001
    schema limited to 2 rows; documents get the adversarial texts."""
    from pyspark.sql import functions as F

    for t in TABLES:
        df = spark.read.parquet(os.path.join(SEED_SF, f"{t}.parquet"))
        if t == "documents":
            base = df.limit(len(ADVERSARIAL_TEXTS)).collect()
            rows = []
            for i, r in enumerate(base):
                d = r.asDict()
                d["text"] = ADVERSARIAL_TEXTS[i % len(ADVERSARIAL_TEXTS)]
                d["n_chars"] = len(d["text"])
                rows.append(d)
            out = spark.createDataFrame(rows, df.schema)
        else:
            out = df.limit(2)
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    # silence unused-import linters that scan this file textually
    _ = F


def build_constant_corpus(spark, out_dir: str) -> None:
    """Second adversarial class (round 12): EVERY row of every table is
    the SAME row repeated 4x — one grid value, one group, one flag.
    Exercises the zero-variance / single-category / empty-second-sample
    guard paths (Var = 0 NULLIFs, n2 = 0 two-sample denominators,
    all-ties rank grids) that the 2-row mixed corpus can slip past when
    its two rows happen to differ."""
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SEED_SF, f"{t}.parquet"))
        base = df.limit(1).collect()[0].asDict()
        if t == "documents":
            base["text"] = "dup dup dup dup dup"
            base["n_chars"] = len(base["text"])
        rows = [base] * 4
        spark.createDataFrame(rows, df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))


def build_null_corpus(spark, out_dir: str) -> None:
    """Third adversarial class (round 12): one real row plus one row of
    ALL NULLs per table — the parquet schemas mark every column
    nullable, so NULL rows are data the schema permits.  First probe
    caught 8 crashes: non-nullable mapInPandas output schemas fed NULL
    ids (OD matrix, snap), numpy stacks over None vectors (cosine,
    gram), and raise_error/assert_true arms whose condition or message
    goes NULL (morton keys, PQ's length guard)."""
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SEED_SF, f"{t}.parquet"))
        base = df.limit(1).collect()[0].asDict()
        nulls = {k: None for k in base}
        spark.createDataFrame([base, nulls], df.schema).coalesce(1) \
            .write.mode("overwrite") \
            .parquet(os.path.join(out_dir, f"{t}.parquet"))


_CORPORA = {
    "degenerate": build_corpus,
    "constant": build_constant_corpus,
    "nulls": build_null_corpus,
}


def run(names: list[str] | None) -> int:
    import traceback

    import __spark_entry__ as entrymod
    from opentimes_spark.session import get_spark

    mode = "degenerate"
    if names and names[0] in ("--constant", "--nulls"):
        mode = names[0][2:]
        names = names[1:] or None

    spark = get_spark("stress-degenerate")
    corpus = os.path.join(
        tempfile.gettempdir(), f"opentimes_stress_{mode}"
    )
    shutil.rmtree(corpus, ignore_errors=True)
    _CORPORA[mode](spark, corpus)

    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}
    failures: list[str] = []
    guards = 0
    for name, fn in qs.items():
        try:
            df = fn(spark, corpus)
            n = df.count()
            print(f"OK    {name}: {n} rows", flush=True)
        except ValueError as exc:
            # The engine's own precondition idiom (k > corpus rows,
            # empty index, ...) — a NAMED refusal is correct behavior
            # on degenerate data; only unnamed engine crashes fail.
            guards += 1
            print(
                f"GUARD {name}: {str(exc).splitlines()[0][:160]}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 - the gate's whole point
            failures.append(name)
            head = str(exc).splitlines()[0][:200]
            print(f"CRASH {name}: {head}", flush=True)
            if os.environ.get("STRESS_VERBOSE"):
                traceback.print_exc()
    label = mode
    print(
        f"\n{len(qs) - len(failures)}/{len(qs)} queries survive the "
        f"{label} corpus ({guards} named guard refusals)"
    )
    if failures:
        print("failing:", " ".join(sorted(failures)))
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:] or None))
