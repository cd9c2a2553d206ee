"""Text-directory source (reference operator O1).

The reference reads every file under ``raw-dataset/`` into
``dict[doc_name -> list[line]]`` (``master.py:63-71``, ``generate_dataset``)
and ships the whole corpus through driver RAM over pickled TCP
(``master.py:73-77``). Here the scan is distributed: ``spark.read.text``
splits files by byte ranges across executors and never materializes the
corpus on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of text files as ``(doc: string, line: string)``.

    ``doc`` is the basename of the source file — the same document key the
    reference uses (``master.py:66-70`` keys the corpus dict by filename).
    """
    return (
        spark.read.text(path)
        .withColumn(
            "doc", F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
        )
        .select("doc", F.col("value").alias("line"))
    )
