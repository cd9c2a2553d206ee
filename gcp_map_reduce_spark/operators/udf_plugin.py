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

from gcp_map_reduce_spark.functions.text import NON_WS, WS_SPLIT, sql_tokens_cte, tokenize
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


N_UDF_BUCKETS = 64  # coarse group count for the grouped-map demo


def _wordcount_grouped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-doc token counting in pandas (reference wordcount_map+reduce
    collapsed to one grouped map; ``scripts/wordcount_map.py:4-16``).

    Grouped COARSELY (doc_id buckets, not doc_id): applyInPandas makes
    one Python call per group, so thousands of tiny groups drown in
    per-call overhead — bucket to ~num-cores groups and do the fine
    grouping vectorized inside pandas. Same result, ~5x faster at sf0.1.
    """
    counts = pdf.groupby(["doc_id", "word"], sort=False).size()
    out = counts.reset_index()
    out.columns = ["doc_id", "word", "cnt"]
    return out


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
    bucketed = toks.withColumn(
        "bucket", F.pmod(F.col("doc_id"), F.lit(N_UDF_BUCKETS))
    )
    return apply_grouped(bucketed, ["bucket"], "wordcount_grouped")


# -- the other three UDF shapes (SURVEY §2.2: UDAF/UDTF as formal API) -----


@query(
    "udf_scalar_token_count",
    oracle=f"""
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '{WS_SPLIT}'), x -> x <> ''))
       AS INT) AS n_tokens
FROM documents
""",
)
def udf_scalar_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR pandas UDF (Arrow-vectorized, one Series in/out per batch):
    whitespace token count per document. Exists to prove the scalar
    Python path — the JVM-side ``token_count_regex`` is the production
    operator. Uses the shared explicit whitespace class (Python's \\S is
    unicode-aware; RE2's is not)."""

    @F.pandas_udf("int")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.findall(NON_WS + "+").str.len().astype("int32")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens("text").alias("n_tokens"))


@query(
    "udf_grouped_agg_extrema",
    oracle="""
SELECT c_mktsegment, max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal
FROM customer GROUP BY c_mktsegment
""",
)
def udf_grouped_agg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDFs (vectorized UDAF: Series -> scalar per
    group). Extrema are order-insensitive, so the Python answer is
    bit-identical to SQL (a mean/sum UDAF would need the integer-scaling
    trick used by embedding_centroids)."""

    @F.pandas_udf("double")
    def pmax(v: pd.Series) -> float:
        return float(v.max())

    @F.pandas_udf("double")
    def pmin(v: pd.Series) -> float:
        return float(v.min())

    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        pmax("c_acctbal").alias("max_bal"), pmin("c_acctbal").alias("min_bal")
    )


@query(
    "udf_tokenize_udtf",
    oracle=f"WITH toks AS ({sql_tokens_cte()}) "
    "SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word",
)
def udf_tokenize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function: one row in, N rows out) — the typed
    Spark-native form of the reference's map-style emitters
    (``scripts/wordcount_map.py:4-16`` emits (token, 1) per occurrence).
    Row-at-a-time Python: API-surface demonstration; the production
    tokenizer is the codegen'd explode(split(...)) path."""
    from pyspark.sql.functions import udtf

    from gcp_map_reduce_spark.functions.text import PY_NORMALIZE

    @udtf(returnType="word string")
    class TokenizeUDTF:
        def eval(self, text: str):
            for w in PY_NORMALIZE(text or "").split():
                yield (w,)

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.word, count(*) AS cnt "
        "FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t "
        "GROUP BY t.word"
    )
