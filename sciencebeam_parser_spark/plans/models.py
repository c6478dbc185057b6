"""Model stage protocol (SURVEY §2A A11/A12).

Reference: models/model_impl.py (ModelImpl interface), wapiti subprocess
wrapper (models/wapiti_model_impl.py:25-164, 20 s timeout + retry +
process-reuse) and delft in-process impl; batch assembly packs N documents
into one prediction call with blank-line separators and splits results back
(models/model.py:207-214, 289-355).

Spark mapping: ``groupBy(doc_id).applyInPandas`` replaces the manual batch
marker protocol — Spark's grouping IS the batching, and the per-group UDF
sorts by token_seq (order is not preserved through shuffles). The model
implementation is pluggable:

* ``FunctionLabelModel`` — a deterministic function (the mock-model trick,
  tests/processors/fulltext/model_mocks.py:46-135)
* ``DataFrameLabelModel`` — labels provided as an F2 token_labels table
  (pure join, no UDF at all)
* real sidecar models (wapiti/delft) would subclass with an executor-local
  lazy singleton (A32 pattern) inside the UDF.

The alignment assert (models/model.py:317-327) is preserved: a model must
return exactly one label per input token.
"""
from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sciencebeam_parser_spark.utils import repartition_for_python
from pyspark.sql import types as T

LABELS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("token_seq", T.LongType()),
        T.StructField("model_name", T.StringType()),
        T.StructField("label", T.StringType()),
    ]
)


class FunctionLabelModel:
    """Deterministic per-token labeling function — executor-side, no state.

    ``fn(texts: list[str]) -> list[str]`` labels one document's tokens in
    document order (the ModelImpl.predict_labels contract for one doc).
    """

    def __init__(self, name: str, fn: Callable[[Sequence[str]], Sequence[str]]):
        self.name = name
        self.fn = fn

    def apply(self, tokens: DataFrame) -> DataFrame:
        name, fn = self.name, self.fn

        def label_partition(batches):
            # the reference's batch assembly (models/model.py:207-214) packs
            # N documents into ONE prediction call; the Spark analog is one
            # Python roundtrip per PARTITION with a pandas groupby, not one
            # applyInPandas call per doc. repartition_for_python keeps each
            # document whole within its partition.
            pdfs = list(batches)
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            outs = []
            for doc_id, g in pdf.groupby("doc_id", sort=False):
                g = g.sort_values("token_seq")
                labels = list(fn(list(g["text"])))
                # alignment assert (models/model.py:317-327)
                if len(labels) != len(g):
                    raise ValueError(
                        f"model {name}: {len(labels)} labels for "
                        f"{len(g)} tokens"
                    )
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id": g["doc_id"].values,
                            "token_seq": g["token_seq"].values,
                            "model_name": name,
                            "label": labels,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

        return (
            tokens.select("doc_id", "token_seq", "text")
            .transform(repartition_for_python, "doc_id")
            .mapInPandas(label_partition, schema=LABELS_OUT_SCHEMA)
        )


class DataFrameLabelModel:
    """Labels from a pre-built F2 token_labels table — the fully-relational
    mock: model inference becomes an equi-join (no Python at all)."""

    def __init__(self, name: str, labels: DataFrame):
        self.name = name
        self.labels = labels.filter(F.col("model_name") == name)

    def apply(self, tokens: DataFrame) -> DataFrame:
        return (
            tokens.select("doc_id", "token_seq")
            .join(self.labels, ["doc_id", "token_seq"], "inner")
            .select("doc_id", "token_seq", "model_name", "label")
        )


def apply_model(tokens: DataFrame, model) -> DataFrame:
    """Run a model stage: (doc_id, token_seq, text, …) → F2 labels rows."""
    return model.apply(tokens)
