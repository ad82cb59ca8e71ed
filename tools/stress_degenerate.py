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

Round 13 adds a fourth corpus, ``--magnitude`` (int64/2^53 envelope
edges), which always compares Spark vs DuckDB VALUES, and a
``--compare`` flag that turns the same value comparison on for any
corpus (e.g. ``--nulls --compare`` machine-checks NULL-ordering parity).

Usage: python tools/stress_degenerate.py
           [--constant|--nulls|--magnitude] [--compare] [--out FILE]
           [query ...]

``--out FILE`` (round 14) writes the per-query statuses as a JSON round
artifact (STRESS_r{N}_{mode}.json) so gate results diff across rounds
like BENCH/CORRECTNESS instead of living only in SCALE.md prose.
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

# Each table's primary ordering key: seed rows are picked by
# orderBy(key).limit(n) so the corpus is byte-stable across Spark
# versions and file layouts (ADVICE r12: df.limit(1) row choice is not
# guaranteed reproducible).  lineitem's key is composite; the first two
# columns order it deterministically at these corpus sizes.
KEYS = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"], "events": ["event_id"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}

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
            base = df.orderBy(*KEYS[t]).limit(len(ADVERSARIAL_TEXTS)).collect()
            rows = []
            for i, r in enumerate(base):
                d = r.asDict()
                d["text"] = ADVERSARIAL_TEXTS[i % len(ADVERSARIAL_TEXTS)]
                d["n_chars"] = len(d["text"])
                rows.append(d)
            out = spark.createDataFrame(rows, df.schema)
        else:
            out = df.orderBy(*KEYS[t]).limit(2)
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
        base = df.orderBy(*KEYS[t]).limit(1).collect()[0].asDict()
        if t == "documents":
            base["text"] = "dup dup dup dup dup"
            base["n_chars"] = len(base["text"])
        rows = [base] * 4
        spark.createDataFrame(rows, df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))


# Measure columns NULLed in the mixed null-corpus row: group/filter keys
# stay real (the row SURVIVES returnflag/priority filters) while the
# measured value goes NULL — the shape the all-NULL row can never reach
# because group-key filters drop it first (ADVICE r12 finding #1: NULL
# grid keys shift Spark NULLS FIRST vs DuckDB NULLS LAST orderings).
MIXED_NULL_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_size"],
    "events": ["value"],
    "documents": ["n_chars"],
    "embeddings": ["embedding"],
}

# Group/filter keys the mixed row pins to COMMON values so it survives
# the registry's usual predicates (returnflag IN ('A','R'), event_type
# filters, priority/status grids) and actually reaches the NULL-measure
# arithmetic instead of being filtered away with whatever flag the seed
# row happened to carry.
MIXED_PIN_COLS = {
    "lineitem": {"l_returnflag": "A", "l_linestatus": "F"},
    "orders": {"o_orderstatus": "F", "o_orderpriority": "1-URGENT"},
    "customer": {"c_mktsegment": "BUILDING"},
    "events": {"event_type": "click"},
    "documents": {"lang": "en"},
}


def build_null_corpus(spark, out_dir: str) -> None:
    """Third adversarial class (round 12): one real row plus one row of
    ALL NULLs per table — the parquet schemas mark every column
    nullable, so NULL rows are data the schema permits.  First probe
    caught 8 crashes: non-nullable mapInPandas output schemas fed NULL
    ids (OD matrix, snap), numpy stacks over None vectors (cosine,
    gram), and raise_error/assert_true arms whose condition or message
    goes NULL (morton keys, PQ's length guard).  Round 13 adds a third
    MIXED row per measured table: real keys + NULL measures, reaching
    the NULL-grid-key ordering paths the all-NULL row cannot."""
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SEED_SF, f"{t}.parquet"))
        base = df.orderBy(*KEYS[t]).limit(1).collect()[0].asDict()
        nulls = {k: None for k in base}
        rows = [base, nulls]
        if t in MIXED_NULL_COLS:
            mixed = dict(base)
            for c in MIXED_NULL_COLS[t]:
                mixed[c] = None
            mixed.update(MIXED_PIN_COLS.get(t, {}))
            for k in KEYS[t]:  # keep the key unique vs the base row
                if isinstance(mixed[k], int):
                    mixed[k] = mixed[k] + 1
                elif isinstance(mixed[k], str):
                    mixed[k] = mixed[k] + "_x"
            rows.append(mixed)
        spark.createDataFrame(rows, df.schema).coalesce(1) \
            .write.mode("overwrite") \
            .parquet(os.path.join(out_dir, f"{t}.parquet"))


def build_magnitude_corpus(spark, out_dir: str) -> None:
    """Fourth adversarial class (round 13): values and row
    multiplicities pushed to the documented int64/2^53 envelope edges
    (SCALE.md "Overflow lesson").  Quantities sit on a 50-value grid at
    ~10^4 with ~96k lineitem rows, so Sum(q^2) ~ 10^13 stays in int64
    while (Sum q)^2 and n*Sum(q^2) reach ~10^18 — crossing 2^53 and
    approaching 2^63: every n*Sxx - Sx^2 integer variance form either
    overflows (Spark ANSI) or silently widens (DuckDB HUGEINT) and
    diverges; the double-moment forms the r12 overflow fixes installed
    survive with digit parity.  Prices/balances move to the 10^6..10^7
    dollar range (integer cents ~10^9), stressing every cents-scaled
    square and cross product.  Unlike the other corpora this gate
    compares Spark vs DuckDB VALUES (run() mode "magnitude" forces
    --compare): parity, not just survival, is the contract.

    Keys/dates/flags keep their sf0.001 base so joins, calendars, and
    group structure stay realistic; replication preserves the
    orders<->lineitem FK (lineitem rep r joins order rep r%8)."""
    from pyspark.sql import functions as F

    def mag_price(*key_cols):
        # deterministic 2-decimal price in [1e6, 1e7): integer cents in
        # [1e8, 1e9) from a version-stable xxhash64 of the row key
        h = F.pmod(F.xxhash64(*key_cols), F.lit(900000000))
        return ((h + F.lit(100000000)).cast("double")
                + F.pmod(F.xxhash64(*key_cols, F.lit(7)), F.lit(100))
                .cast("double")) / F.lit(100.0)

    for t in TABLES:
        df = spark.read.parquet(os.path.join(SEED_SF, f"{t}.parquet"))
        if t == "lineitem":
            rep = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("rep")
            df = df.select("*", rep).select(
                (F.col("l_orderkey") * 8 + F.col("rep") % 8)
                .alias("l_orderkey"),
                "l_partkey", "l_suppkey",
                (F.col("l_linenumber") + 10 * (F.col("rep") / 8)
                 .cast("int")).alias("l_linenumber"),
                (F.lit(9951) + F.pmod(
                    F.xxhash64("l_orderkey", "l_linenumber", "rep"),
                    F.lit(50))).cast("double").alias("l_quantity"),
                mag_price(F.col("l_orderkey"), F.col("l_linenumber"),
                          F.col("rep")).alias("l_extendedprice"),
                "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                "l_shipdate",
            ).select(*[f.name for f in df.schema.fields])
        elif t == "orders":
            rep = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("rep")
            df = df.select("*", rep).select(
                (F.col("o_orderkey") * 8 + F.col("rep"))
                .alias("o_orderkey"),
                "o_custkey", "o_orderstatus",
                mag_price(F.col("o_orderkey"), F.col("rep"))
                .alias("o_totalprice"),
                "o_orderdate", "o_orderpriority",
            ).select(*[f.name for f in df.schema.fields])
        elif t == "customer":
            df = df.withColumn("c_acctbal", mag_price(F.col("c_custkey")))
        elif t == "supplier":
            df = df.withColumn("s_acctbal", mag_price(F.col("s_suppkey")))
        elif t == "part":
            df = df.withColumn(
                "p_retailprice", mag_price(F.col("p_partkey")))
        elif t == "events":
            df = df.withColumn("value", mag_price(F.col("event_id")))
        elif t == "documents":
            # r14 (VERDICT r13 #7): token/gram/postings counts are
            # int64 sums too.  Each base doc is replicated 16x with
            # text = a SHARED 3-token phrase (gram df ~ 8k across the
            # corpus — tf/df/cooccur counts at the ~10^4 grain of the
            # ask) + the doc's own distinctive tail (cross-base Jaccard
            # stays low, so prefix-bounded pair joins still prune —
            # only the 16-replica groups are true dups).  Replicas
            # share IDENTICAL text: exact-dedup groups of 16, C(16,2)
            # pair counts, hot-band LSH buckets.  n_chars stays
            # len(text) — the magnitude stress is count replication,
            # not inconsistent metadata.
            rep = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("rep")
            # tails are SYNTHESIZED per base doc (u<id>a .. u<id>e) —
            # the sf0.001 texts share a small vocabulary, so keeping
            # original tokens leaked cross-base Jaccard above pair
            # thresholds and degenerated every pair join to ~n^2
            # (measured: 7.8M result rows).  With unique tails only
            # the 3 shared tokens overlap across bases.
            tail = F.concat_ws(
                " ",
                *[
                    F.format_string(f"u%d{ch}", F.col("doc_id"))
                    for ch in "abcde"
                ],
            )
            df = df.select("*", rep).select(
                (F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"),
                F.concat(F.lit("lorem ipsum dolor "), tail).alias("text"),
                "lang", "source",
            ).withColumn("n_chars", F.length("text")).select(
                *[f.name for f in df.schema.fields]
            )
        elif t == "embeddings":
            # lock-step with documents: vec_id = base*16 + rep so the
            # doc_id = vec_id joins (semdedup, curation) keep full
            # coverage; vectors are copied verbatim — 16 exact
            # duplicates per base vector is the hot-cluster /
            # all-ties-topk shape (vector math itself is double
            # throughout, no integer envelope).
            rep = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("rep")
            df = df.select("*", rep).select(
                (F.col("vec_id") * 16 + F.col("rep")).alias("vec_id"),
                "embedding", "label",
            ).select(*[f.name for f in df.schema.fields])
        # region/nation: copied unchanged.
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet"))


_CORPORA = {
    "degenerate": build_corpus,
    "constant": build_constant_corpus,
    "nulls": build_null_corpus,
    "magnitude": build_magnitude_corpus,
}


def _load_check():
    """Import tools/check.py (no package __init__) for its compare()."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "check.py")
    spec = importlib.util.spec_from_file_location("ot_check", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run(names: list[str] | None) -> int:
    import traceback

    import __spark_entry__ as entrymod
    from opentimes_spark.session import get_spark

    mode, compare_values, out_path = "degenerate", False, None
    while names and names[0].startswith("--"):
        flag = names.pop(0)
        if flag in ("--constant", "--nulls", "--magnitude"):
            mode = flag[2:]
        elif flag == "--compare":
            compare_values = True
        elif flag == "--out":
            if not names:
                raise SystemExit("usage: --out FILE (missing FILE operand)")
            out_path = names.pop(0)
        else:
            raise SystemExit(f"unknown flag {flag}")
    names = names or None
    if mode == "magnitude":
        # parity, not just survival, is the magnitude contract
        compare_values = True

    spark = get_spark("stress-degenerate")
    # per-PID corpus dir: two concurrent gate runs of the same mode
    # otherwise race the rmtree+rebuild and one reads half-built
    # parquet (caught live in r14 — a full-registry run recorded 98
    # phantom failures while a subset run rebuilt the shared dir)
    corpus = os.path.join(
        tempfile.gettempdir(), f"opentimes_stress_{mode}_{os.getpid()}"
    )
    shutil.rmtree(corpus, ignore_errors=True)
    # try/finally (ADVICE r14): an exception mid-run (e.g. KeyError on
    # an unknown query name) must not leak the per-PID corpus dir.
    try:
        _CORPORA[mode](spark, corpus)

        check = _load_check() if compare_values else None
        con = None
        if compare_values:
            import duckdb

            # Spark writes each table as a DIRECTORY of part files; the
            # testdata layout check.py targets is a single file per table.
            con = duckdb.connect()
            for t in TABLES:
                p = os.path.join(corpus, f"{t}.parquet")
                pat = f"{p}/*.parquet" if os.path.isdir(p) else p
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
                )
        oracles = entrymod.oracle_sql() if compare_values else {}

        qs = entrymod.queries()
        if names:
            qs = {n: qs[n] for n in names}
        failures: list[str] = []
        guards = approx = 0
        results: dict[str, dict] = {}
        for name, fn in qs.items():
            try:
                df = fn(spark, corpus)
                if compare_values and name in oracles:
                    sdf = df.toPandas()
                    try:
                        ddf = con.execute(oracles[name]).df()
                    except Exception as exc:  # noqa: BLE001
                        failures.append(name)
                        results[name] = {
                            "status": "DUCKERR",
                            "detail": str(exc).splitlines()[0][:200],
                        }
                        print(f"DUCKERR {name}: "
                              f"{str(exc).splitlines()[0][:200]}", flush=True)
                        continue
                    problems = check.compare(name, sdf, ddf)
                    # On the magnitude corpus the hash-strictness of the
                    # sf0.01 driver gate does not apply: values past 2^53
                    # may round differently per engine at the last digit.
                    # Exact parity is still the norm (the double-moment
                    # forms convert identical exact sums); approx-only is a
                    # warning, a true value MISMATCH fails.
                    hard = [p for p in problems if "APPROX ONLY" not in p]
                    if hard:
                        failures.append(name)
                        results[name] = {
                            "status": "DIVERGE",
                            "detail": "; ".join(p[:160] for p in problems[:3]),
                        }
                        print(f"DIVERGE {name}:", flush=True)
                        for p in problems:
                            print(f"      {p}")
                    elif problems:
                        approx += 1
                        results[name] = {
                            "status": "APPROX",
                            "detail": problems[0][:160],
                        }
                        print(f"APPROX {name}: "
                              f"{problems[0][:160]}", flush=True)
                    else:
                        results[name] = {"status": "OK", "rows": len(sdf)}
                        print(f"OK    {name}: {len(sdf)} rows (hash-equal)",
                              flush=True)
                else:
                    n = df.count()
                    results[name] = {"status": "OK", "rows": n}
                    print(f"OK    {name}: {n} rows", flush=True)
            except ValueError as exc:
                # The engine's own precondition idiom (k > corpus rows,
                # empty index, ...) — a NAMED refusal is correct behavior
                # on degenerate data; only unnamed engine crashes fail.
                guards += 1
                results[name] = {
                    "status": "GUARD",
                    "detail": str(exc).splitlines()[0][:160],
                }
                print(
                    f"GUARD {name}: {str(exc).splitlines()[0][:160]}",
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001 - the gate's whole point
                failures.append(name)
                head = str(exc).splitlines()[0][:200]
                results[name] = {"status": "CRASH", "detail": head}
                print(f"CRASH {name}: {head}", flush=True)
                if os.environ.get("STRESS_VERBOSE"):
                    traceback.print_exc()
        label = mode
        print(
            f"\n{len(qs) - len(failures)}/{len(qs)} queries survive the "
            f"{label} corpus ({guards} named guard refusals"
            + (f", {approx} approx-only warnings" if compare_values else "")
            + ")"
        )
        if out_path:
            # Round-14 (VERDICT r13 #2): the gates' results become diffable
            # round artifacts, like BENCH/CORRECTNESS, instead of prose.
            import json

            payload = {
                "mode": mode,
                "compare_values": compare_values,
                "total": len(qs),
                "survive": len(qs) - len(failures),
                "guards": sorted(
                    n for n, r in results.items() if r["status"] == "GUARD"
                ),
                "approx": sorted(
                    n for n, r in results.items() if r["status"] == "APPROX"
                ),
                "failures": sorted(failures),
                "queries": results,
            }
            with open(out_path, "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=False)
                fh.write("\n")
            print(f"wrote {out_path}")
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
    if failures:
        print("failing:", " ".join(sorted(failures)))
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:] or None))
