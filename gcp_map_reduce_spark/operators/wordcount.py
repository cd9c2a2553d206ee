"""Reference-parity text operators: wordcount + inverted index family.

These re-express the reference's two built-in "queries" over the synthetic
``documents`` table so the driver's DuckDB oracle can verify them:

- wordcount: ``scripts/wordcount_map.py:4-16`` (emit ``(token, 1)``) +
  ``scripts/wordcount_reduce.py:3-11`` (sum) + global key sort at merge
  (``scripts/kv_store_server.py:267``). In Spark the whole job is one
  ``tokenize -> groupBy -> count`` chain; the shuffle replaces the KV-store
  mapper-output files and partial aggregation (map-side combine) fixes the
  reference's biggest inefficiency (it shipped one ``1`` per occurrence —
  shuffle size == token count; SURVEY.md §4 "Map-side combine: none").

- inverted index: ``scripts/invertedindex_map.py:4-18`` (map-side set
  dedup of ``(token, doc)`` pairs) + ``scripts/invertedindex_reduce.py:3-17``
  (posting-list build). Spark: ``distinct`` pairs (partial-agg dedup is the
  map-side combiner) + ``collect_set``. Posting lists are set-ordered in the
  reference (nondeterministic), so the oracle-checked form sorts and joins
  them into a canonical string.

Scale notes (100 TB): groupBy(token) hash-partitions on the full token —
strictly better than the reference's letter->reducer round-robin
(``scripts/reducer.py:27-34``), which is Zipf-skewed. AQE skew handling
covers hot tokens. ``collect_set`` per token is bounded by the corpus doc
count per token; for web-scale posting lists you'd switch to the
``inverted_index_pairs`` shape (flat, no per-key array materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import sql_tokens_cte, tokenize
from gcp_map_reduce_spark.operators.scale import ensure_parallelism
from gcp_map_reduce_spark.plans.probes import corpus_key
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, word) token stream for the synthetic documents table.

    Degenerate-split correction on the scan: tokenize's regex split +
    explode is per-row CPU, and the stress run showed a single-row-group
    file serializing it on one core (wordcount max task 1.5 s vs 37 ms
    median) — ``ensure_parallelism`` adds the Exchange only in that case.
    """
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    return tokenize(docs, text_col="text", out_col="word", keep_cols=["doc_id"])


_TOKENS_CTE = f"WITH toks AS ({sql_tokens_cte()}) "


@query(
    "wordcount",
    oracle=_TOKENS_CTE
    + "SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word",
)
def wordcount(
    spark: SparkSession, sf_dir: str, engine: str = "expr"
) -> DataFrame:
    """Token -> occurrence count over the whole corpus (flagship query).

    ``engine`` picks the map side; the result is identical (pytest-gated):

    - ``"expr"`` (default, registered/bench plan, what the oracle
      mirrors): JVM ``normalize -> split -> explode -> hash agg`` — best
      at bench scale (0.67 vs 0.75 s at sf0.1: the Arrow exchange costs
      more than the regex passes save on 5k docs);
    - ``"arrow"``: one Python pass per partition builds a token Counter
      (the same C-level normalize chain as the ``text_profile`` kernel)
      and emits (word, partial_count) — the shuffle then carries one row
      per distinct word per partition, same as the JVM partial agg, but
      the 3-regex normalize + explode CPU collapses into C string ops:
      1.26 -> 0.76 s at the sf1 stress set. The 100 TB option when the
      corpus-side CPU dominates; same boundary rule as ``text_profile``.
    """
    if engine == "expr":
        return (
            doc_tokens(spark, sf_dir)
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
        )
    if engine != "arrow":
        raise ValueError(f"engine must be 'expr' or 'arrow', got {engine!r}")
    import string as _string

    ws_chars = " \t\n\x0b\f\r\x1c\x1d\x1e\x1f"
    punct_del = {ord(c): None for c in _string.punctuation}
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("text"),
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )

    def kernel(batches):
        from collections import Counter

        import pandas as pd

        cnt = Counter()
        for pdf in batches:
            for t in pdf["text"]:
                if t is None:
                    continue  # expr parity: tokenize emits no rows
                norm = (
                    t.translate(punct_del)
                    .lower()
                    .encode("ascii", "ignore")
                    .decode("ascii")
                    .strip(ws_chars)
                )
                # post-ASCII-fold, str.split() == the explicit WS class
                # (the WS_CLASS design invariant; see functions/text.py)
                cnt.update(norm.split())
        if cnt:
            yield pd.DataFrame(
                {"word": list(cnt.keys()), "pc": list(cnt.values())}
            )

    partials = docs.mapInPandas(kernel, "word string, pc long")
    return partials.groupBy("word").agg(F.sum("pc").alias("cnt"))


def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens; tiebreak on word so the result set is deterministic.

    Library helper (the registered top-k demonstrations are
    ``topk_orders`` and the ORDER BY ... LIMIT TPC-H queries).
    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
    a per-partition top-k + single merge, no global sort at scale.
    """
    return (
        wordcount(spark, sf_dir)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


@query(
    "inverted_index_pairs",
    oracle=_TOKENS_CTE
    + "SELECT DISTINCT word, doc_id FROM toks WHERE word <> ''",
)
def inverted_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped (word, doc_id) pairs — the scalable flat form of the index
    (reference map-side shape, ``scripts/invertedindex_map.py:13-16``)."""
    return doc_tokens(spark, sf_dir).select("word", "doc_id").distinct()


@query(
    "inverted_index",
    oracle=_TOKENS_CTE
    + "SELECT word, count(DISTINCT doc_id) AS n_docs, "
    "string_agg(DISTINCT doc_id, ',' ORDER BY doc_id) AS docs "
    "FROM toks WHERE word <> '' GROUP BY word",
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word -> sorted posting list (canonical comma-joined string form).

    ``sort_array(collect_set(...))`` pins the set-iteration nondeterminism
    the reference exhibits (``scripts/invertedindex_reduce.py:14-15``).

    r17: aggregates the RAW token stream in one shuffle —
    ``collect_set`` dedups per (word, doc_id) by itself, so the former
    ``distinct()`` pre-pass added a second full Exchange plus a
    HashAggregate pair for work the set aggregation already does
    (``n_docs`` = the set's size, exactly count-distinct). The flat
    deduped-pairs form stays registered as ``inverted_index_pairs``.
    """
    toks = doc_tokens(spark, sf_dir)
    return toks.groupBy("word").agg(
        F.size(F.collect_set("doc_id")).cast("long").alias("n_docs"),
        F.array_join(
            F.sort_array(F.collect_set("doc_id")).cast("array<string>"), ","
        ).alias("docs"),
    )


@query(
    "doc_search",
    oracle=_TOKENS_CTE
    + "SELECT DISTINCT doc_id FROM toks WHERE word = 'spark'",
)
def doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup over the inverted index (reference O16/O24: the FaaS
    Web-UI search handler looks a word up in the final output). Expressed
    as a filter on the pair stream; with the index persisted as a table
    partitioned by first letter this is a partition-pruned scan."""
    return (
        inverted_index_pairs(spark, sf_dir)
        .filter(F.col("word") == "spark")
        .select("doc_id")
    )


# Per-document token statistics are part of the consolidated
# ``text_profile`` query (operators/text_analysis.py), computed
# array-natively there (zero shuffle vs the groupBy-over-exploded-tokens
# formulation this module would use).
