"""PII redaction unit tests: the phone pattern must cover real NANP
formats (not just the injected fixture format — the r3/r4 verdict carry),
and Spark and DuckDB must agree on every variant (the regex lives in the
Java/RE2 common subset; divergence here would silently break the oracle
hash)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gcp_map_reduce_spark.operators.curation_rules import PHONE_RE

REDACTED = [
    "+1-555-0123",
    "555-867-5309",
    "(555) 867-5309",
    "+1 (555) 867-5309",
    "555.867.5309",
    "867-5309",
]

KEPT = [
    "5558675309",  # bare 10-digit integer: no separator, don't redact
    "version 1.2.3456",  # needs 3-digit group before the separator
    "10.0.203.7",  # IPv4 is the IP rule's job
    "order 1234567",  # bare 7-digit integer
]


@pytest.mark.parametrize("s", REDACTED)
def test_phone_variants_redacted(spark, s):
    out = (
        spark.createDataFrame([(f"call {s} now",)], ["t"])
        .select(
            F.regexp_replace("t", PHONE_RE, "<PHONE>").alias("clean"),
            F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), F.lit(0))).alias("n"),
        )
        .first()
    )
    assert out.clean == "call <PHONE> now", (s, out.clean)
    assert out.n == 1


@pytest.mark.parametrize("s", KEPT)
def test_non_phones_kept(spark, s):
    out = (
        spark.createDataFrame([(f"x {s} y",)], ["t"])
        .select(F.regexp_replace("t", PHONE_RE, "<PHONE>").alias("clean"))
        .first()
    )
    assert out.clean == f"x {s} y", (s, out.clean)


@pytest.mark.parametrize("s", REDACTED + KEPT)
def test_spark_duckdb_agree_on_phone_regex(spark, s):
    text = f"call {s} now"
    spark_row = (
        spark.createDataFrame([(text,)], ["t"])
        .select(
            F.regexp_replace("t", PHONE_RE, "<PHONE>").alias("clean"),
            F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), F.lit(0))).alias("n"),
        )
        .first()
    )
    duck = duckdb.sql(
        f"SELECT regexp_replace('{text}', '{PHONE_RE}', '<PHONE>', 'g') AS clean, "
        f"len(regexp_extract_all('{text}', '{PHONE_RE}')) AS n"
    ).fetchone()
    assert (spark_row.clean, spark_row.n) == duck, (s, spark_row, duck)
