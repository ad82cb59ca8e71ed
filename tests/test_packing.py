"""Sequence packing, mixture sampling, and duplicated-span tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.dedup import duplicated_span_stats
from opentimes_spark.operators.packing import (
    pack_sequences,
    weighted_source_mixture,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            # src_a tokens: 4, 3, 5 -> offsets 0, 4, 7 under budget 6 ->
            # bins 0, 0, 1
            (1, "a b c d", "src_a"),
            (2, "e f g", "src_a"),
            (3, "h i j k l", "src_a"),
            # src_b tokens: 7 -> offset 0 -> bin 0
            (4, "m n o p q r s", "src_b"),
        ],
        "doc_id long, text string, source string",
    )


def test_pack_sequences_bins(corpus):
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(corpus, budget=6).collect()
    }
    assert rows[1]["n_tok"] == 4 and rows[1]["seq_bin"] == 0
    assert rows[2]["n_tok"] == 3 and rows[2]["seq_bin"] == 0
    assert rows[3]["n_tok"] == 5 and rows[3]["seq_bin"] == 1
    assert rows[4]["seq_bin"] == 0  # separate source restarts offsets


def test_pack_sequences_rejects_bad_budget(corpus):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(corpus, budget=0)


def test_mixture_weight_extremes_and_determinism(corpus):
    assert weighted_source_mixture(corpus, F.lit(1.0)).count() == 4
    assert weighted_source_mixture(corpus, F.lit(0.0)).count() == 0
    half_1 = sorted(
        r["doc_id"]
        for r in weighted_source_mixture(corpus, F.lit(0.5)).collect()
    )
    half_2 = sorted(
        r["doc_id"]
        for r in weighted_source_mixture(corpus, F.lit(0.5)).collect()
    )
    assert half_1 == half_2  # hash coin, not rand(): replayable


def test_duplicated_span_stats(spark):
    shared = "one two three four five six seven eight"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),  # 10 tokens -> 3 spans
            (2, "head0 " + shared),  # 9 tokens -> 2 spans
            (3, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (4, "too short"),  # < 8 tokens -> 0 spans
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(docs, n=8).collect()}
    assert len(out) == 4  # zero-span docs preserved
    # docs 1 and 2 share exactly the `shared` 8-token window
    assert out[1]["n_spans"] == 3 and out[1]["n_dup"] == 1
    assert out[2]["n_spans"] == 2 and out[2]["n_dup"] == 1
    assert out[1]["dup_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[3]["n_spans"] == 2 and out[3]["n_dup"] == 0
    assert out[4]["n_spans"] == 0 and out[4]["dup_frac"] == 0.0


def test_span_contamination(spark):
    from opentimes_spark.operators.dedup import span_contamination

    bench_text = "q one two three four five six seven eight end"
    train = spark.createDataFrame(
        [
            (1, "x one two three four five six seven eight y"),  # shares span
            (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (3, "tiny doc"),  # zero spans
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in span_contamination(train, eval_df).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_spans"] == 0 and not out[3]["contaminated"]
    assert 100 not in out  # eval docs are not output rows


def test_remove_duplicated_spans_canonical_and_idempotent(spark):
    from opentimes_spark.operators.dedup import remove_duplicated_spans

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, "keep1 " + shared + " keep2"),  # canonical holder (min id)
            (2, "lead " + shared + " tail"),  # loses the span
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs).collect()}
    assert out[1]["text_clean"] == "keep1 " + shared + " keep2"  # untouched
    assert out[2]["text_clean"] == "lead tail"
    assert out[2]["n_before"] == 10 and out[2]["n_after"] == 2
    assert out[3]["n_after"] == 8  # unique doc untouched

    # idempotence: each surviving span now has one holder
    cleaned = spark.createDataFrame(
        [(r["doc_id"], r["text_clean"]) for r in out.values()],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r for r in remove_duplicated_spans(cleaned).collect()}
    assert all(r["n_before"] == r["n_after"] for r in out2.values())


def test_score_documents_seam_and_default_model(spark):
    from opentimes_spark.operators.inference import score_documents

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc")], "doc_id long, text string"
    )
    # default integer linear model: 3*n_tok + 5*n_uniq - n_chars + 40
    out = {r["doc_id"]: r for r in score_documents(docs).collect()}
    assert out[1]["score"] == 3 * 3 + 5 * 2 - 6 + 40
    assert out[2]["score"] == 3 * 1 + 5 * 1 - 2 + 40
    assert not out[1]["keep"] and not out[2]["keep"]

    # the factory seam: a custom "model" sees the broadcast payload
    def fake_factory(payload):
        assert payload == (3, 5, -1, 40)
        return lambda texts: texts.str.len()

    out2 = {
        r["doc_id"]: r["score"]
        for r in score_documents(docs, model_factory=fake_factory).collect()
    }
    assert out2 == {1: 8, 2: 2}


def test_duplicated_span_stats_hot_span_no_blowup(spark):
    """1000 identical docs: every span hash is held by 1000 docs. The
    group-by collapses each hot hash to ONE counter row — the exploded
    join-back is linear in span count, with no pairwise candidate step
    (the failure mode LSH band joins need a cap for)."""
    from opentimes_spark.operators.dedup import duplicated_span_stats

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(i, text) for i in range(1000)], "doc_id long, text string"
    )
    out = duplicated_span_stats(docs, n=8).collect()
    assert len(out) == 1000
    assert all(r["n_spans"] == 3 and r["n_dup"] == 3 for r in out)
    assert all(r["dup_frac"] == 1.0 for r in out)
