"""One-off sf1 scaling datapoint (round 15; VERDICT r14 #6).

The r14 verdict attributes the sf0.1 Spark-vs-DuckDB substantive gap
(~2.9x on the 21 rows where DuckDB does >= 0.15 s of real work) to a
fixed ~0.1-0.3 s/row scheduling floor plus JVM-vs-vectorized-C++
constant factors at 400 MB scale, and asked for one sf1 datapoint to
turn the amortization claim into data: as real work grows 10x, the
floor stays fixed, so the ratio should close toward ~1x.

This tool:
  1. builds an sf1 corpus at $SPARK_GRAFT_SF1_DIR (default
     /tmp/opentimes_sf1) by replicating /root/testdata/sf0.1 10x with
     per-replica key offsets (orderkey/custkey/suppkey/partkey/
     event_id/user_id/doc_id/vec_id shift by replica * OFFSET so key
     cardinalities scale; dates/values keep their distributions —
     the same construction idea as the magnitude corpus's 16x
     replication, at 10x without the envelope edits);
  2. times every oracle-equipped HEADLINE row on Spark (noop sink,
     min of 2) and on DuckDB (same oracle SQL the correctness gate
     runs, min of 2) at BOTH sf0.1 and the sf1 corpus;
  3. writes one JSON artifact (--out BENCH_SF1_r15.json) with the
     per-row seconds and the substantive-subset ratio at each scale,
     where "substantive" = duck >= 0.15 s at sf0.1 (the r14 verdict's
     rule, recomputed on this host).

Round 16 (VERDICT r15 #7): replicated documents get a unique tail token
keyed on (text md5, replica) so the pair-join text/dedup families are
tractable at sf1 on the DuckDB side too, and oracle-less bench-only
rows (stress twins, xxhash production twins) are timed spark-only so
the genuinely-parallel rows and the dedup family appear in the
artifact.

Usage: python tools/bench_sf1.py [--out FILE] [--skip-build] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# r16 dir (the r15 corpus replicated text VERBATIM; see build())
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/opentimes_sf1_r16")
REPLICAS = 10
OFFSET = 10_000_000_000

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

# Key columns shifted per replica (replica 0 is the original).  Small
# dims (region/nation) are NOT replicated — they are genuine dimensions
# whose cardinality does not grow with corpus size.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        out = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        if t not in KEYED:
            df.write.mode("overwrite").parquet(out)
            continue
        reps = []
        for r in range(REPLICAS):
            d = df
            for c in KEYED[t]:
                d = d.withColumn(c, F.col(c) + F.lit(r * OFFSET))
            if t == "documents" and r:
                # r16 (VERDICT r15 #7): verbatim replication made every
                # replica of a doc an EXACT duplicate, so the pair-join
                # dedup oracles exploded combinatorially on the DuckDB
                # side (dedup groups of 10, C(10,2) pairs each).  The
                # magnitude corpus's unique-tail construction fixes it:
                # append one tail token keyed on (text hash, replica) —
                # within a replica, exact-dup groups stay exact-dup
                # groups (same text → same tail), across replicas all
                # texts become distinct, so dup-group sizes stay at the
                # sf0.1 distribution while the corpus grows 10x.
                tail = F.concat(
                    F.lit(" u"),
                    F.substring(F.md5(F.col("text")), 1, 8),
                    F.lit(f"r{r}"),
                )
                d = d.withColumn("text", F.concat(F.col("text"), tail))
                if "n_chars" in d.columns:
                    d = d.withColumn("n_chars", F.length("text"))
            reps.append(d)
        allr = reps[0]
        for d in reps[1:]:
            allr = allr.unionByName(d)
        allr.write.mode("overwrite").parquet(out)
        print(f"built {t}", flush=True)


def time_spark(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def time_duck(con, sql: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
    return con


def main() -> int:
    args = sys.argv[1:]
    out_path, skip_build = None, False
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--out":
            if not args:
                raise SystemExit("usage: --out FILE")
            out_path = args.pop(0)
        elif a == "--skip-build":
            skip_build = True
        else:
            names.append(a)

    import bench as benchmod
    from opentimes_spark.plans.queries import BENCH_ONLY, ORACLE_SQL, QUERIES
    from opentimes_spark.session import get_spark

    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not skip_build:
        build(spark)

    # r16: include oracle-less rows (bench-only stress twins, xxhash
    # production twins) spark-only — the scaling story needs the
    # genuinely-parallel rows and the dedup family even where DuckDB
    # has no twin to race.
    rows = names or [
        n for n in benchmod.HEADLINE if n in QUERIES or n in BENCH_ONLY
    ]
    result: dict = {"sf0.1": {}, "sf1": {}, "replicas": REPLICAS}
    for scale, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        con = duck_connect(sf_dir)
        # warm both engines once
        QUERIES["q1_pricing_summary"](spark, sf_dir).write.format(
            "noop").mode("overwrite").save()
        time_duck(con, ORACLE_SQL["q1_pricing_summary"])
        per = {}
        for n in rows:
            fn = QUERIES.get(n) or BENCH_ONLY[n]
            try:
                s = time_spark(fn, spark, sf_dir)
            except Exception as exc:  # noqa: BLE001
                per[n] = {"error": str(exc).splitlines()[0][:160]}
                print(f"ERR spark {scale} {n}", flush=True)
                continue
            if n not in ORACLE_SQL:
                per[n] = {"spark": s}
                print(f"{scale} {n}: spark {s}s (no oracle)", flush=True)
                continue
            try:
                d = time_duck(con, ORACLE_SQL[n])
            except Exception as exc:  # noqa: BLE001
                per[n] = {"spark": s,
                          "duck_error": str(exc).splitlines()[0][:160]}
                print(f"ERR duck {scale} {n}", flush=True)
                continue
            per[n] = {"spark": s, "duck": d}
            print(f"{scale} {n}: spark {s}s duck {d}s", flush=True)
        result[scale] = per
        con.close()

    # substantive subset per the r14 rule: duck >= 0.15 s at sf0.1
    sub = [
        n for n, v in result["sf0.1"].items()
        if isinstance(v.get("duck"), float) and v["duck"] >= 0.15
        and isinstance(result["sf1"].get(n, {}).get("duck"), float)
        and isinstance(result["sf1"].get(n, {}).get("spark"), float)
    ]
    summary = {}
    for scale in ("sf0.1", "sf1"):
        sp = sum(result[scale][n]["spark"] for n in sub)
        du = sum(result[scale][n]["duck"] for n in sub)
        summary[scale] = {
            "substantive_rows": len(sub),
            "spark_sec": round(sp, 3),
            "duck_sec": round(du, 3),
            "ratio": round(sp / du, 3) if du else None,
        }
    result["substantive"] = sorted(sub)
    result["summary"] = summary
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
