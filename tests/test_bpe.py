"""BPE trainer: differential vs a pure-Python reference implementation
(Sennrich et al. 2016 algorithm, identical tie-breaks), state-machine
edge cases, plan shape, and apply-time segmentation."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.bpe import (
    END,
    apply_bpe,
    merge_expr,
    train_bpe,
    word_freqs,
)


def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                c[w] += 1
    return c


def _py_merge(syms, a, b):
    """Left-to-right non-overlapping merge — the reference semantics."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts, n_merges, min_freq=1):
    vocab = {
        tuple(list(w) + [END]): f for w, f in _py_word_freqs(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((a, b))
        vocab = {
            tuple(_py_merge(list(s), a, b)): f for s, f in vocab.items()
        }
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest new low",
    "the newer the lower the wider",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )


def test_train_matches_python_reference(docs):
    got = train_bpe(docs, n_merges=12)
    want = _py_train(TEXTS, 12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough to supply 12 merges


def test_word_freqs(docs):
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert wf == dict(_py_word_freqs(TEXTS))


def test_merge_expr_overlapping_runs(spark):
    """aaa under merge (a,a) → [aa, a]: left-to-right non-overlapping,
    the canonical BPE edge case; plus no-op and boundary merges."""
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],),
         (["a"],), ([],)],
        "syms array<string>",
    )
    out = [r["m"] for r in df.select(merge_expr(F.col("syms"), "a", "a").alias("m")).collect()]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "aa"], ["a"], []]


def test_merge_expr_matches_python_on_random_sequences(spark):
    import random

    rng = random.Random(7)
    rows = [
        [rng.choice("abc") for _ in range(rng.randint(0, 8))]
        for _ in range(60)
    ]
    df = spark.createDataFrame([(r,) for r in rows], "syms array<string>")
    for a, b in [("a", "b"), ("b", "b"), ("c", "a")]:
        got = [
            r["m"]
            for r in df.select(
                merge_expr(F.col("syms"), a, b).alias("m")
            ).collect()
        ]
        assert got == [_py_merge(r, a, b) for r in rows]


def test_apply_bpe_segments_like_reference(docs):
    merges = train_bpe(docs, n_merges=8)
    out = apply_bpe(docs, merges).select("doc_id", "bpe_tokens").collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in out}
    for i, t in enumerate(TEXTS):
        want = []
        for w in re.split(r"\s+", t.lower()):
            if not w:
                continue
            syms = list(w) + [END]
            for a, b in merges:
                syms = _py_merge(syms, a, b)
            want.extend(syms)
        assert by_id[i] == want


def test_rewrite_plan_is_shuffle_free(docs):
    """The merge rewrite must be a pure projection over the persisted
    vocab — no Exchange anywhere in its plan."""
    vocab = word_freqs(docs).select(
        "freq",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substring(F.col("word"), i, 1),
            ),
            F.array(F.lit(END)),
        ).alias("syms"),
    )
    local = vocab.localCheckpoint(eager=True)
    plan = (
        local.select(merge_expr(F.col("syms"), "l", "o").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_train_stops_when_dry(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    # every word is a single char + END: one pair each, freq 1 —
    # min_freq=2 stops immediately
    assert train_bpe(df, n_merges=5, min_freq=2) == []
    # min_freq=1 merges the three (char, END) pairs then runs dry
    m = train_bpe(df, n_merges=10, min_freq=1)
    assert len(m) == 3


def test_oracle_sql_matches_reference_on_adversarial_corpus(spark):
    """Run the registered DuckDB oracle on a corpus engineered so the
    winning merges repeat back-to-back inside words (coco/banana/aaaa
    class) — the case where a single-separator replace() would share
    the middle separator and merge only the first occurrence.  The
    block-encoded oracle must reproduce the Python reference (and the
    operator, by the train-matches-reference test) exactly."""
    import duckdb

    texts = [
        "coco cocoa coco banana bananas",
        "aaaa aaa aa coco banana",
        "murmur tartar coco banana aaaa",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    for t in texts:
        con.execute("INSERT INTO documents VALUES (?)", [t])
    from opentimes_spark.plans.queries import ORACLE_SQL

    got = con.sql(ORACLE_SQL["bpe_train_3merges"]).fetchall()
    want = [
        (i + 1, a, b, n) for i, (a, b, n) in enumerate(_py_train_counts(texts, 3))
    ]
    assert got == want
    # and the Spark operator agrees on the same corpus
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    from opentimes_spark.operators.bpe import train_bpe_steps

    assert train_bpe_steps(docs, 3) == [(a, b, n) for _, a, b, n in want]


def _py_train_counts(texts, n_merges, min_freq=1):
    vocab = {
        tuple(list(w) + [END]): f for w, f in _py_word_freqs(texts).items()
    }
    out = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        out.append((a, b, n))
        vocab = {
            tuple(_py_merge(list(s), a, b)): f for s, f in vocab.items()
        }
    return out
