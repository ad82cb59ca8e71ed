"""Batch model-inference plumbing for quality-classifier scoring.

The canonical LLM-pipeline step this models: run a trained quality /
toxicity / language classifier over every document in the corpus
(fastText or a small transformer).  What matters at 100 TB is the
plumbing, not the model:

- **Arrow-batched** `mapInPandas` — rows reach Python as pandas
  batches (`spark.sql.execution.arrow.maxRecordsPerBatch` sized), never
  row-at-a-time.
- **One model load per partition**, not per batch: the generator form
  of `mapInPandas` runs setup code once, then streams batches through
  the loaded model.  A real scorer opens its weights file / ONNX
  session there.
- **Weights ride a broadcast variable**, so a 100 MB model ships to
  each executor once, not once per task.

The default model is deliberately a deterministic linear scorer over
integer text features — it exercises every seam above while staying
bit-reproducible, so the DuckDB oracle can replay the exact scores.
A real model slots in by passing ``model_factory``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

#: (n_tokens, n_uniq_tokens, total_token_chars) -> score weights.
DEFAULT_WEIGHTS = (3, 5, -1, 40)


def _linear_model(weights):
    w_tok, w_uniq, w_chars, bias = weights

    def score(texts: pd.Series) -> pd.Series:
        # NULL text -> score as empty: str.split maps NaN through, and
        # iterating the NaN float would TypeError the whole task
        toks = texts.fillna("").str.lower().str.split()
        toks = toks.apply(lambda ts: [t for t in ts if t])
        n_tok = toks.apply(len)
        n_uniq = toks.apply(lambda ts: len(set(ts)))
        n_chars = toks.apply(lambda ts: sum(len(t) for t in ts))
        return w_tok * n_tok + w_uniq * n_uniq + w_chars * n_chars + bias

    return score


def score_documents(
    df: DataFrame,
    weights: tuple[int, int, int, int] = DEFAULT_WEIGHTS,
    threshold: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_factory: Callable[[object], Callable[[pd.Series], pd.Series]]
    | None = None,
) -> DataFrame:
    """Score every document with a per-partition-initialized model.

    Returns (id, score bigint, keep boolean).  ``model_factory``
    receives the broadcast weights payload and must return a
    ``pd.Series[str] -> pd.Series`` scorer; the default is the exact
    integer linear model the oracle replays.
    """
    from opentimes_spark.session import ship_package

    ship_package(df.sparkSession)  # closure references package symbols
    factory = model_factory or _linear_model
    bc = df.sparkSession.sparkContext.broadcast(weights)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = factory(bc.value)  # once per partition — the load seam
        for pdf in batches:
            score = model(pdf[text_col]).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "score": score,
                    "keep": score >= threshold,
                }
            )

    # carry the id column's REAL type through the output schema — a
    # hardcoded `long` breaks Arrow conversion for string ids
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, score long, keep boolean"
    )
