"""Pluggable UDF surface (reference operator O18).

The reference resolves map/reduce functions by module name from config
(``master.py:26-42``; signature ``f(dataset, mapper_id) -> dict``,
``scripts/mapper.py:9-25``) — a whole-partition Python plug-in convention.
The Spark-native generalization is a registry of typed, Arrow-batched
grouped-map functions applied with ``applyInPandas`` (grouped map) /
``mapInPandas`` (partition map): same "bring your own Python" capability,
but schema-checked, vectorized, and planned by Catalyst around the
exchange.

Registered built-ins mirror the reference's two operations so the plug-in
path is exercised end-to-end; its output is oracle-checked against the
same SQL as the built-in operator — proving the Python path computes the
same answer the JVM path does (and letting the bench quantify its cost).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_map_reduce_spark.functions.text import sql_tokens_cte, tokenize
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


@dataclass(frozen=True)
class GroupedMapUDF:
    """A named grouped-map plug-in: ``fn(key_tuple, pdf) -> pdf`` applied
    per group, with a declared output schema (the reference's untyped
    dict-in/dict-out contract, made typed)."""

    name: str
    schema: T.StructType
    fn: Callable[[tuple, pd.DataFrame], pd.DataFrame]


UDF_REGISTRY: dict[str, GroupedMapUDF] = {}


def register_udf(udf: GroupedMapUDF) -> GroupedMapUDF:
    if udf.name in UDF_REGISTRY:
        raise ValueError(f"duplicate UDF {udf.name!r}")
    UDF_REGISTRY[udf.name] = udf
    return udf


def apply_grouped(df: DataFrame, group_cols: list[str], name: str) -> DataFrame:
    """Apply a registered plug-in per group (Arrow-batched grouped map)."""
    udf = UDF_REGISTRY[name]
    return df.groupBy(*group_cols).applyInPandas(
        lambda key, pdf: udf.fn(key, pdf), schema=udf.schema
    )


# -- built-in plug-ins mirroring the reference's two operations -----------


def _wordcount_grouped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-doc token counting in pandas (reference wordcount_map+reduce
    collapsed to one grouped map; ``scripts/wordcount_map.py:4-16``)."""
    counts = pdf["word"].value_counts()
    return pd.DataFrame(
        {"doc_id": key[0], "word": counts.index, "cnt": counts.values}
    )


register_udf(
    GroupedMapUDF(
        name="wordcount_grouped",
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("word", T.StringType()),
                T.StructField("cnt", T.LongType()),
            ]
        ),
        fn=_wordcount_grouped,
    )
)


@query(
    "udf_wordcount_grouped",
    oracle=f"WITH toks AS ({sql_tokens_cte()}) "
    "SELECT doc_id, word, count(*) AS cnt FROM toks WHERE word <> '' "
    "GROUP BY doc_id, word",
)
def udf_wordcount_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plug-in path end-to-end: tokenize (JVM) -> grouped-map pandas
    UDF computing per-doc counts. Same oracle as the built-in would have —
    the Python plug-in must agree with SQL semantics exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokenize(docs, text_col="text", out_col="word", keep_cols=["doc_id"])
    return apply_grouped(toks, ["doc_id"], "wordcount_grouped")
