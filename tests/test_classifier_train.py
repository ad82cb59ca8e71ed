"""Quality-classifier TRAINING (operators/inference.py round-8 block):
NB one-pass fit, preconditioned GD refinement, convergence above the
majority baseline, determinism of the whole run, and the numpy replay
of every quantized arithmetic step."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentimes_spark.operators.inference import (
    classifier_confusion,
    classifier_scores,
    fit_nb_weights,
    hashed_token_features,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def toy(spark):
    # class 1 says "good" a lot; class 0 says "spam" a lot; both share
    # filler vocabulary — linearly separable with noise
    rows = []
    for i in range(40):
        filler = f"alpha beta gamma {'delta ' * (i % 3)}"
        if i % 2:
            rows.append((i, f"good good {'good ' * (i % 4)}{filler}", 1))
        else:
            rows.append((i, f"spam spam {'spam ' * (i % 4)}{filler}", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


@pytest.fixture(scope="module")
def toy_feats(spark, toy):
    return hashed_token_features(toy, F.col("y"), d=32).persist()


def test_features_counts_and_intercept(spark, toy_feats, toy):
    n_docs = toy.count()
    ic = toy_feats.filter(F.col("bucket") == -1)
    assert ic.count() == n_docs
    assert ic.agg(F.max("cnt")).collect()[0][0] == 1
    # token rows: positive buckets < d, integer counts >= 1
    tok = toy_feats.filter(F.col("bucket") >= 0)
    mm = tok.agg(
        F.min("bucket"), F.max("bucket"), F.min("cnt")
    ).collect()[0]
    assert 0 <= mm[0] and mm[1] < 32 and mm[2] >= 1


def test_nb_init_signs_and_grid(spark, toy_feats):
    import hashlib

    w = fit_nb_weights(toy_feats, d=32)
    good_b = int(hashlib.md5(b"good").hexdigest()[:8], 16) % 32
    spam_b = int(hashlib.md5(b"spam").hexdigest()[:8], 16) % 32
    assert w[good_b] > 0 > w[spam_b]
    assert -1 in w  # intercept
    for v in w.values():  # every weight on the 1e-9 grid
        assert v == math.floor(v * 1e9 + 0.5) / 1e9


def test_training_converges_above_majority(spark, toy_feats):
    w = train_quality_classifier(toy_feats, d=32, iters=3, lr=0.5)
    conf = {
        (r["label"], r["predicted"]): r["n"]
        for r in classifier_confusion(toy_feats, w).collect()
    }
    n = sum(conf.values())
    acc = (conf.get((1, 1), 0) + conf.get((0, 0), 0)) / n
    maj = max(
        sum(v for (l, _), v in conf.items() if l == 1),
        sum(v for (l, _), v in conf.items() if l == 0),
    ) / n
    assert acc == 1.0  # separable toy corpus
    assert acc > maj


def test_training_deterministic_across_partitionings(spark, toy_feats):
    w1 = train_quality_classifier(toy_feats, d=32, iters=2, lr=0.5)
    w2 = train_quality_classifier(
        toy_feats.repartition(7), d=32, iters=2, lr=0.5
    )
    assert w1 == w2  # exact float equality — the int64-gradient claim


def test_numpy_replay_of_quantized_training(spark, toy_feats):
    """Every arithmetic step (NB init, sorted-order activation fold,
    1e-6 residual grid, int64 gradient, preconditioned 1e-9 update)
    replayed in plain python agrees exactly with the Spark run."""
    rows = toy_feats.collect()
    feats = {}  # doc -> {bucket: cnt}, label
    for r in rows:
        feats.setdefault(r["doc_id"], ({}, r["y"]))[0][r["bucket"]] = r["cnt"]

    d, lr, iters = 32, 0.5, 2

    def q9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    # NB init
    c1, c0 = {}, {}
    t1 = t0 = n1 = n0 = 0
    for _doc, (bc, y) in feats.items():
        (n1, n0) = (n1 + 1, n0) if y == 1 else (n1, n0 + 1)
        for b, c in bc.items():
            if b < 0:
                continue
            if y == 1:
                c1[b] = c1.get(b, 0) + c
                t1 += c
            else:
                c0[b] = c0.get(b, 0) + c
                t0 += c
    buckets = sorted({b for bc, _ in feats.values() for b in bc})
    w = {
        b: q9(
            math.log((c1.get(b, 0) + 1.0) / (t1 + float(d)))
            - math.log((c0.get(b, 0) + 1.0) / (t0 + float(d)))
        )
        for b in buckets
        if b >= 0
    }
    w[-1] = q9(math.log((n1 * 1.0) / n0))
    s = {}
    for bc, _ in feats.values():
        for b, c in bc.items():
            s[b] = s.get(b, 0) + c * c
    for _ in range(iters):
        g = {}
        for _doc, (bc, y) in feats.items():
            z = 0.0
            for b in sorted(bc):  # the sorted-fold order
                z = z + w[b] * bc[b]
            sig = 0.5 * (1.0 + z / (1.0 + abs(z)))
            rq = math.floor((sig - y) * 1000000.0 + 0.5)
            for b, c in bc.items():
                g[b] = g.get(b, 0) + rq * c
        w = {
            b: q9(wb - lr * ((g.get(b, 0) / 1000000.0) / s[b]))
            for b, wb in w.items()
        }

    spark_w = train_quality_classifier(toy_feats, d=d, iters=iters, lr=lr)
    assert spark_w == w


def test_scores_schema_and_prediction_consistency(spark, toy_feats):
    w = train_quality_classifier(toy_feats, d=32, iters=2, lr=0.5)
    out = classifier_scores(toy_feats, w).collect()
    assert len(out) == toy_feats.select("doc_id").distinct().count()
    for r in out:
        assert r["predicted"] == (1 if r["score"] >= 0 else 0)
