"""Golden test: engine inverted index vs the reference's checked-in reducer
outputs (``kv-data-store/reducer-output/reducer{1..3}.json`` — an
invertedindex-format run over the same raw corpus).

Posting lists are set-iteration-ordered in the reference
(``scripts/invertedindex_reduce.py:14-15``) so comparison is
order-insensitive per SURVEY.md §5. Reducer key spaces are disjoint by
construction (letter groups), so a plain dict union reconstructs the full
index — the reference's own "combine" step (``kv_store_server.py:246-265``).
"""

from __future__ import annotations

import json
import os

import pytest

RED_DIR = "/root/reference/kv-data-store/reducer-output"
RAW = "/root/reference/raw-dataset"


@pytest.mark.skipif(not os.path.isdir(RED_DIR), reason="reference goldens absent")
def test_inverted_index_matches_reference_golden(spark):
    from pyspark.sql import functions as F

    from gcp_map_reduce_spark.functions.text import (
        reference_shuffle_filter,
        tokenize,
    )
    from gcp_map_reduce_spark.sources.text import read_text_corpus

    want: dict[str, set[str]] = {}
    for fn in sorted(os.listdir(RED_DIR)):
        with open(os.path.join(RED_DIR, fn)) as f:
            for word, docs in json.load(f).items():
                assert word not in want, f"reducer key spaces overlap at {word!r}"
                want[word] = set(docs)

    corpus = read_text_corpus(spark, RAW)
    toks = tokenize(corpus, text_col="line", out_col="word", keep_cols=["doc"])
    toks = toks.filter(reference_shuffle_filter("word"))
    got = {
        r["word"]: set(r["docs"])
        for r in toks.groupBy("word")
        .agg(F.collect_set("doc").alias("docs"))
        .collect()
    }
    assert got == want
