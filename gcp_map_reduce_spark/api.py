"""Control plane (reference operators O21/E1/E2).

The reference exposes two Flask routes (``app.py:18-46``): ``POST
/launch_map_reduce`` runs the whole job synchronously (config-driven
operation name -> map/reduce modules -> VM orchestration -> KV-store final
output) and ``GET /final_output`` fetches the merged result. Here the
"job" is one lazy DataFrame chain and the store is a parquet directory:

- :func:`launch_map_reduce` — run a named operation (``wordcount`` /
  ``invertedindex``, same names as ``config.json:9``) over a raw text
  directory and persist the merged, key-sorted final output;
- :func:`get_final_output` — read it back (E2);
- :func:`create_app` — optional thin Flask façade with the same two
  routes, for drop-in API parity, plus one clearly-marked EXTENSION
  route (``POST /semantic_search``, serving top-k cosine search from
  the persisted ANN index — the reference has no ANN surface at all;
  enabled only when ``emb_sf_dir`` is configured). The engine never
  depends on it.

The reference's whole cluster lifecycle (O19/O20 barriers + VM create)
has no analog here by design: Spark's scheduler owns stages and executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import tokenize
from gcp_map_reduce_spark.sinks.writers import write_sorted_single_json
from gcp_map_reduce_spark.sources.text import read_text_corpus

OPERATIONS = ("wordcount", "invertedindex")


def _run_operation(spark: SparkSession, operation: str, input_dir: str) -> DataFrame:
    corpus = read_text_corpus(spark, input_dir)
    toks = tokenize(corpus, text_col="line", out_col="word", keep_cols=["doc"])
    if operation == "wordcount":
        return toks.groupBy("word").agg(F.count("*").alias("cnt"))
    if operation == "invertedindex":
        return (
            toks.select("word", "doc")
            .distinct()
            .groupBy("word")
            .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
        )
    raise ValueError(f"unknown operation {operation!r}; known: {OPERATIONS}")


def launch_map_reduce(
    spark: SparkSession, operation: str, input_dir: str, store_dir: str
) -> str:
    """Run ``operation`` over ``input_dir`` and persist the key-sorted
    final output under ``store_dir`` (reference E1 collapsed to one lazy
    chain; the merge+sort is ``kv_store_server.py:246-277``). Returns the
    output path."""
    out = os.path.join(store_dir, f"final-output-{operation}")
    write_sorted_single_json(_run_operation(spark, operation, input_dir), out, "word")
    return out


def get_final_output(spark: SparkSession, operation: str, store_dir: str) -> DataFrame:
    """Reference E2 (``GET /final_output`` -> ``app.py:23-46``)."""
    return spark.read.json(os.path.join(store_dir, f"final-output-{operation}"))


def create_app(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    emb_sf_dir: str | None = None,
):
    """Thin Flask façade with the reference's two routes (synchronous
    like the original — the HTTP response returns after the job
    completes) and, when ``emb_sf_dir`` is given, the extension
    ``POST /semantic_search`` route: body ``{"queries": [{"query_id":
    long, "embedding": [float, ...]}, ...], "k": int}`` -> top-k cosine
    candidates per query served from the persisted IVF index
    (``ann_index_for_corpus``: the first call per corpus version pays
    the build, every later request reads only probed cells' files —
    the HTTP face of build-once/query-many)."""
    from flask import Flask, jsonify, request

    app = Flask("gcp_map_reduce_spark")

    @app.post("/launch_map_reduce")
    def launch():  # pragma: no cover - exercised via test client
        operation = (request.get_json(silent=True) or {}).get(
            "operation_name", "wordcount"
        )
        path = launch_map_reduce(spark, operation, input_dir, store_dir)
        return jsonify({"status": "SUCCESS", "operation": operation, "path": path})

    @app.get("/final_output")
    def final():  # pragma: no cover - exercised via test client
        operation = request.args.get("operation_name", "wordcount")
        rows = get_final_output(spark, operation, store_dir).collect()
        payload = {}
        for r in rows:
            d = r.asDict(recursive=True)
            payload[d["word"]] = d.get("cnt", d.get("docs"))
        return jsonify(payload)

    if emb_sf_dir is not None:

        @app.post("/semantic_search")
        def semantic_search():  # pragma: no cover - via test client
            from gcp_map_reduce_spark.operators.ann_index import (
                ann_index_for_corpus,
                ann_index_search,
            )

            body = request.get_json(silent=True) or {}
            queries = body.get("queries") or []
            if not queries:
                return jsonify({"error": "queries is required"}), 400
            k = int(body.get("k", 5))
            n_probe = int(body.get("n_probe", 2))
            idx = ann_index_for_corpus(spark, emb_sf_dir)
            qdf = spark.createDataFrame(
                [
                    (int(q["query_id"]), [float(x) for x in q["embedding"]])
                    for q in queries
                ],
                "query_id long, embedding array<double>",
            )
            rows = ann_index_search(
                spark, idx, qdf, k=k, n_probe=n_probe
            ).collect()
            out: dict = {}
            for r in rows:
                out.setdefault(str(r.query_id), []).append(
                    {"cand_id": r.cand_id, "cosine": r.cosine}
                )
            return jsonify(out)

    return app
