"""Stage-artifact fidelity sink: mirror the reference's per-stage KV-store
dumps (``kv-data-store/{input-docs,mapper-output,reducer-output,
final-output}/``, written by ``scripts/kv_store_server.py:139-194,246-277``).

Spark's shuffle files are the honest equivalent of the reference's
mapper/reducer JSON artifacts, so the engine itself never materializes
stages. This OPTIONAL sink exists for parity/debugging: it re-derives
each stage's artifact from the corpus with DataFrame ops and dumps the
reference's exact JSON shapes:

- ``input-docs/input-mapper{N}.json`` — ``dict[doc -> [normalized lines]]``
  for the mapper's line-count-balanced chunk (``create_partitioned_dataset``,
  ``scripts/kv_store_server.py:17-64``: chunk = total_lines // M, documents
  split across mappers at chunk boundaries, mapper M takes the remainder);
- ``mapper-output/mapper{N}.json`` — wordcount: ``dict[token -> [1,1,...]]``
  (``scripts/wordcount_map.py:4-16``); invertedindex:
  ``{"default_mapper_key": [[token, doc], ...]}`` deduped
  (``scripts/invertedindex_map.py:4-18``);
- ``reducer-output/reducer{N}.json`` — keys assigned by first-letter
  round-robin over a-z (``scripts/reducer.py:27-34``; non-letter-leading
  keys are dropped, the reference's accidental semantic — see
  ``reference_shuffle_filter``); wordcount: ``dict[token -> count]``;
  invertedindex: ``dict[token -> [docs]]``;
- ``final-output/final-output-{op}.json`` — key-sorted merged dict
  (``scripts/kv_store_server.py:246-277``).

Scale posture: every artifact is ONE JSON object — the reference's KV
server is a single process writing whole dicts, and this sink mirrors
that: per-artifact rows are built distributed (grouped aggregation), then
streamed to named files one at a time via ``toLocalIterator`` (one
artifact in driver memory at a time, never the corpus). Like
``write_sorted_single_json``, this is a FIDELITY mode for small merged
outputs — the native path is partitioned parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import (
    WS_SPLIT,
    reference_shuffle_filter,
)

# Python str.strip()'s whitespace set (unicode-aware), as a Java regex
# class — the reference strips BEFORE the ascii-delete, so the byte-exact
# strip must handle unicode whitespace the way str.strip() does.
_PY_WS_CLASS = (
    "[ \\t\\n\\x0B\\f\\r\\x1C-\\x1F\\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)
_PY_STRIP = f"^{_PY_WS_CLASS}+|{_PY_WS_CLASS}+$"


def _normalize_line_reference_order(c):
    """Byte-exact ``cleanup_lines_list`` (``master.py:44-61``) — the RULE
    ORDER differs from the engine's ``normalize_text``: de-punct -> strip
    -> (blank drop, by the caller) -> lower -> ascii-DELETE LAST. A line
    led by a non-ASCII char keeps its following space: strip ran before
    the char was deleted. Token streams are insensitive to this (the
    whitespace split eats it) but the input-docs artifacts are compared
    line-for-line, so the order matters here."""
    c = F.regexp_replace(c, r"[\p{Punct}]", "")
    return F.regexp_replace(c, _PY_STRIP, "")


def _finish_line(c):
    """Rules 4a/4b applied after the blank drop (see above)."""
    return F.regexp_replace(F.lower(c), r"[^\x00-\x7F]", "")


def _normalized_corpus(spark: SparkSession, input_dir: str) -> DataFrame:
    """(doc, lines: array<string>) — whole-file read, per-line reference-
    order normalization, blank lines dropped between strip and lower
    (``master.py:44-71``). wholetext keeps each document's line order
    exact without needing a global sort."""
    return (
        spark.read.text(input_dir, wholetext=True)
        .select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("doc"),
            F.transform(
                F.filter(
                    F.transform(
                        F.split(F.col("value"), r"\n"),
                        _normalize_line_reference_order,
                    ),
                    lambda l: l != "",
                ),
                _finish_line,
            ).alias("lines"),
        )
    )


def _chunked_lines(corpus: DataFrame, n_mappers: int) -> DataFrame:
    """(doc, line_no, line, mapper_id) with the reference's line-count-
    balanced chunking: docs ordered by name, global line index, chunk =
    total // M, mappers 1..M-1 take exactly one chunk, mapper M the
    remainder. The doc-level window is over one row per DOCUMENT (not per
    line) — tiny, and confined to this fidelity sink."""
    w = Window.orderBy("doc").rowsBetween(Window.unboundedPreceding, -1)
    total = corpus.agg(F.sum(F.size("lines")).alias("total"))
    with_off = corpus.withColumn(
        "offset", F.coalesce(F.sum(F.size("lines")).over(w), F.lit(0))
    ).crossJoin(F.broadcast(total))
    chunk = F.greatest(F.floor(F.col("total") / n_mappers), F.lit(1))
    lines = with_off.select(
        "doc",
        "offset",
        chunk.alias("chunk"),
        F.posexplode("lines").alias("line_no", "line"),
    )
    return lines.select(
        "doc",
        "line_no",
        "line",
        F.least(
            F.floor((F.col("offset") + F.col("line_no")) / F.col("chunk")) + 1,
            F.lit(n_mappers),
        ).cast("int").alias("mapper_id"),
    )


def _reducer_id(token_col, n_reducers: int):
    """First-letter round-robin: letter index mod R, 1-based
    (``scripts/reducer.py:27-34``)."""
    return (
        (F.ascii(F.substring(token_col, 1, 1)) - 97) % n_reducers + 1
    ).cast("int")


def _dump(df: DataFrame, dest_dir: str, name_pattern: str) -> None:
    """Stream (artifact_id, json) rows to ``dest_dir/name_pattern.format(id)``
    — one artifact in driver memory at a time.

    Kill-safe per file (r10 audit): each artifact is written to a
    ``.tmp`` sibling and ``os.replace``d into place (atomic on POSIX),
    so a killed run can never leave a TRUNCATED artifact that parses as
    valid-but-wrong JSON downstream; at worst the file is absent or
    fully old. Stale ``.tmp`` leftovers from a killed prior run are
    swept on entry."""
    os.makedirs(dest_dir, exist_ok=True)
    for stale in os.listdir(dest_dir):
        if stale.endswith(".tmp"):
            os.remove(os.path.join(dest_dir, stale))
    for row in df.toLocalIterator():
        final = os.path.join(dest_dir, name_pattern.format(row[0]))
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write(row[1])
        os.replace(tmp, final)


def write_stage_artifacts(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    operation: str = "invertedindex",
    n_mappers: int = 4,
    n_reducers: int = 3,
) -> None:
    """Dump all four stage artifacts for ``operation`` ('wordcount' or
    'invertedindex') over the text corpus at ``input_dir``, mirroring the
    reference's ``kv-data-store/`` layout (module docstring)."""
    if operation not in ("wordcount", "invertedindex"):
        raise ValueError(f"unknown operation: {operation!r}")

    lines = _chunked_lines(_normalized_corpus(spark, input_dir), n_mappers)
    # the chunked lines feed input artifacts AND the token pipeline
    lines = lines.localCheckpoint(eager=False)

    # -- input-docs: dict[doc -> lines] per mapper ------------------------
    per_doc = (
        lines.groupBy("mapper_id", "doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("line_no", "line"))
            ).alias("nl"),
            F.min("line_no").alias("first_no"),
        )
        .select(
            "mapper_id",
            "doc",
            "first_no",
            F.transform("nl", lambda s: s["line"]).alias("doc_lines"),
        )
    )
    inputs = (
        per_doc.groupBy("mapper_id")
        .agg(
            F.to_json(
                F.map_from_entries(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("first_no", "doc", "doc_lines")
                            )
                        ),
                        lambda s: F.struct(
                            s["doc"].alias("key"),
                            s["doc_lines"].alias("value"),
                        ),
                    )
                )
            ).alias("js"),
        )
    )
    _dump(inputs, os.path.join(store_dir, "input-docs"), "input-mapper{}.json")

    toks = lines.select(
        "mapper_id",
        "doc",
        F.explode(F.split(F.col("line"), WS_SPLIT)).alias("word"),
    ).filter(F.col("word") != "")

    # -- mapper-output ----------------------------------------------------
    if operation == "wordcount":
        # dict[token -> [1,1,...]] — one 1 per occurrence
        mapper_out = (
            toks.groupBy("mapper_id", "word")
            .agg(F.count("*").alias("cnt"))
            .groupBy("mapper_id")
            .agg(
                F.to_json(
                    F.map_from_entries(
                        F.collect_list(
                            F.struct(
                                F.col("word").alias("key"),
                                F.array_repeat(F.lit(1), F.col("cnt").cast("int")).alias(
                                    "value"
                                ),
                            )
                        )
                    )
                ).alias("js")
            )
        )
    else:
        # {"default_mapper_key": [[token, doc], ...]} deduped
        mapper_out = (
            toks.select("mapper_id", "word", "doc")
            .distinct()
            .groupBy("mapper_id")
            .agg(
                F.to_json(
                    F.create_map(
                        F.lit("default_mapper_key"),
                        F.collect_list(F.array("word", "doc")),
                    )
                ).alias("js")
            )
        )
    _dump(mapper_out, os.path.join(store_dir, "mapper-output"), "mapper{}.json")

    # -- reducer-output + final-output ------------------------------------
    # non-letter-leading keys drop out of the shuffle (reference semantic)
    red_toks = toks.filter(reference_shuffle_filter("word")).withColumn(
        "reducer_id", _reducer_id(F.col("word"), n_reducers)
    )
    if operation == "wordcount":
        per_key = red_toks.groupBy("reducer_id", "word").agg(
            F.count("*").alias("val")
        )
    else:
        per_key = (
            red_toks.select("reducer_id", "word", "doc")
            .distinct()
            .groupBy("reducer_id", "word")
            .agg(F.sort_array(F.collect_set("doc")).alias("val"))
        )
    per_key = per_key.localCheckpoint(eager=False)  # reducers + final

    # key-sorted dict JSON (the reference sorts only the FINAL output,
    # kv_store_server.py:267; sorting the reducer dicts too is harmless —
    # golden comparisons are order-insensitive)
    sorted_dict_json = F.to_json(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("word").alias("key"), F.col("val").alias("value"))
                )
            )
        )
    ).alias("js")

    reducers = per_key.groupBy("reducer_id").agg(sorted_dict_json)
    _dump(reducers, os.path.join(store_dir, "reducer-output"), "reducer{}.json")

    final = per_key.groupBy(F.lit(operation).alias("op")).agg(sorted_dict_json)
    _dump(
        final,
        os.path.join(store_dir, "final-output"),
        "final-output-{}.json",
    )
