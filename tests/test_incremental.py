"""Content-addressed stage skipping (plans/incremental.py): DVC dep-
fingerprint semantics around the blockloc -> cenloc -> destpoint chain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from opentimes_spark.plans.incremental import (
    file_fingerprint,
    run_stage,
    stage_fingerprint,
)
from opentimes_spark.plans.pipeline import build_blockloc, build_cenloc, build_destpoint


def _write_inputs(spark, d):
    c = spark.range(1, 101).select(F.col("id").alias("c"))
    key10 = F.lpad(F.col("c").cast("string"), 10, "0")
    blocks = c.select(
        F.concat(F.lit("17001"), key10).alias("geoid"),
        (F.lit(-88.0) + (F.col("c") % 10) * 0.1).alias("lon"),
        (F.lit(40.0) + (F.col("c") % 7) * 0.1).alias("lat"),
    )
    blockpop = c.select(
        F.lit("17").alias("state"),
        F.lit("001").alias("county"),
        F.substring(key10, 1, 6).alias("tract"),
        F.substring(key10, 7, 4).alias("block"),
        (F.col("c") % 50).cast("int").alias("population"),
    )
    blocks.write.mode("overwrite").parquet(os.path.join(d, "blocks"))
    blockpop.write.mode("overwrite").parquet(os.path.join(d, "blockpop"))


def _run_chain(spark, d, calls):
    blocks_p, pop_p = os.path.join(d, "blocks"), os.path.join(d, "blockpop")

    def build_bl():
        calls.append("blockloc")
        return build_blockloc(
            spark.read.parquet(blocks_p), spark.read.parquet(pop_p)
        )

    bl_out = os.path.join(d, "ck_blockloc")
    bl, s1 = run_stage(spark, "blockloc", [blocks_p, pop_p], bl_out, build_bl)

    def build_cl():
        calls.append("cenloc")
        return build_cenloc(spark.read.parquet(bl_out), "county")

    cl_out = os.path.join(d, "ck_cenloc")
    cl, s2 = run_stage(spark, "cenloc", [bl_out], cl_out, build_cl)

    def build_dp():
        calls.append("destpoint")
        return build_destpoint(
            spark.read.parquet(cl_out),
            state_center=(-88.0, 40.0),
            buffer_m=1e9,
        )

    dp_out = os.path.join(d, "ck_destpoint")
    dp, s3 = run_stage(spark, "destpoint", [cl_out], dp_out, build_dp)
    return (s1, s2, s3), dp


def test_second_run_skips_everything(spark, tmp_path):
    d = str(tmp_path)
    _write_inputs(spark, d)
    calls: list[str] = []
    skips1, out1 = _run_chain(spark, d, calls)
    assert skips1 == (False, False, False)
    assert calls == ["blockloc", "cenloc", "destpoint"]
    n1 = out1.count()
    calls.clear()
    skips2, out2 = _run_chain(spark, d, calls)
    # no build closure invoked: the second run only READS checkpoints
    assert skips2 == (True, True, True) and calls == []
    assert out2.count() == n1 > 0


def test_changed_input_invalidates_downstream(spark, tmp_path):
    d = str(tmp_path)
    _write_inputs(spark, d)
    calls: list[str] = []
    _run_chain(spark, d, calls)
    calls.clear()
    # touch one input file: stat fingerprint changes, whole chain refires
    # (each stage's rewrite bumps the next stage's dep)
    part = next(
        os.path.join(d, "blockpop", f)
        for f in os.listdir(os.path.join(d, "blockpop"))
        if f.endswith(".parquet")
    )
    os.utime(part, ns=(os.stat(part).st_atime_ns, os.stat(part).st_mtime_ns + 10**9))
    skips, _ = _run_chain(spark, d, calls)
    assert skips == (False, False, False)
    assert calls == ["blockloc", "cenloc", "destpoint"]


def test_param_change_invalidates(tmp_path):
    d = str(tmp_path / "dep")
    os.makedirs(d)
    open(os.path.join(d, "a"), "w").write("x")
    fp1 = stage_fingerprint([d], {"buffer_m": 1000})
    fp2 = stage_fingerprint([d], {"buffer_m": 2000})
    assert fp1 != fp2
    assert stage_fingerprint([d], {"buffer_m": 1000}) == fp1


def test_content_mode_sees_through_stat(tmp_path):
    p = str(tmp_path / "f")
    open(p, "w").write("hello")
    st = os.stat(p)
    fp_stat = file_fingerprint(p)
    fp_content = file_fingerprint(p, content=True)
    # rewrite same bytes, restore mtime: stat fp unchanged, content fp too
    open(p, "w").write("hello")
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert file_fingerprint(p) == fp_stat
    assert file_fingerprint(p, content=True) == fp_content
    # different bytes, same length + forged mtime: only content mode sees it
    open(p, "w").write("hellO")
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert file_fingerprint(p) == fp_stat
    assert file_fingerprint(p, content=True) != fp_content


def test_lsh_index_append_and_probe_match_batch(spark, tmp_path):
    """Incremental LSH index (round 7): build on half the corpus,
    append the rest, and the index's candidate pairs for a probe batch
    must equal the batch LSH run over the full corpus restricted to
    (probe × corpus) pairs.  Append is idempotent; parameter sidecar
    enforced."""
    import pytest as pt
    from pyspark.sql import functions as F

    from opentimes_spark.operators.dedup import (
        append_to_lsh_index,
        lsh_candidate_pairs,
        lsh_index_candidates,
        minhash_signatures,
        read_lsh_params,
        write_lsh_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "lshidx")

    write_lsh_index(first, path, num_hashes=8, band_size=2)
    p = read_lsh_params(spark, path)
    assert p["num_hashes"] == 8 and p["hash_fn"] == "md5"

    got = append_to_lsh_index(rest, path)
    assert got["appended"] == rest.count()
    # idempotent: re-appending the same docs is a no-op
    assert append_to_lsh_index(rest, path)["appended"] == 0

    probe = docs.filter(F.col("doc_id") < 40)
    from_index = {
        (r["query_id"], r["index_id"])
        for r in lsh_index_candidates(probe, path).collect()
    }

    sigs = minhash_signatures(docs, "doc_id", "text", 8, 3, "md5")
    batch_pairs = lsh_candidate_pairs(sigs, "doc_id", 8, 2, "md5")
    probe_ids = {r["doc_id"] for r in probe.select("doc_id").collect()}
    expect = set()
    for r in batch_pairs.collect():
        if r["id_a"] in probe_ids:
            expect.add((r["id_a"], r["id_b"]))
        if r["id_b"] in probe_ids:
            expect.add((r["id_b"], r["id_a"]))
    assert from_index == expect and len(expect) > 0

    # missing sidecar fails fast
    with pt.raises(ValueError, match="_params"):
        read_lsh_params(spark, str(tmp_path / "nowhere"))


def test_lsh_index_probe_prunes_band_partitions(spark, tmp_path):
    """The probe's index scan must carry PartitionFilters on band_idx —
    the Hive key is the point of the layout (each band's join is
    directory-local)."""
    from pyspark.sql import functions as F

    from opentimes_spark.operators.dedup import (
        lsh_index_candidates,
        write_lsh_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "lshidx2")
    write_lsh_index(docs, path)
    probe = docs.filter(F.col("doc_id") < 10)
    cand = lsh_index_candidates(probe, path)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cand.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(band_idx" in plan, plan[:600]
