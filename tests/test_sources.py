"""Source-layer contracts that keep environment drift out of the queries.

Round 4 postmortem: the driver regenerated ``events.parquet`` with a
different physical encoding for ``ts`` (INT64 TIMESTAMP(NANOS) -> plain
TIMESTAMP micros, which Spark reads as TIMESTAMP_NTZ) and every
downstream bare ``ts.cast("double")`` failed analysis. These tests pin
the two contracts that prevent a recurrence:

1. ``load_table`` canonicalizes ``events.ts`` to TIMESTAMP no matter how
   the parquet writer encoded it.
2. No query source does bare epoch math on ``ts`` (``ts.cast("double")``
   / direct ``cast("long")`` without the NTZ-safe ``cast("timestamp")``
   hop), so the next encoding shift fails here, loudly, not in the
   driver.
"""

from __future__ import annotations

import pathlib
import re

from pyspark.sql import functions as F

from gcp_map_reduce_spark.sources.tables import TABLE_NAMES, load_table
from tests.conftest import SF_ORACLE, SF_SMALL

PKG_ROOT = pathlib.Path(__file__).resolve().parents[1] / "gcp_map_reduce_spark"


def test_events_ts_is_timestamp(spark):
    for sf_dir in (SF_SMALL, SF_ORACLE):
        dtypes = dict(load_table(spark, sf_dir, "events").dtypes)
        assert dtypes["ts"] == "timestamp", (
            f"events.ts must canonicalize to TIMESTAMP, got {dtypes['ts']!r} "
            f"for {sf_dir} — fix sources/tables.py:_canonicalize_timestamps"
        )


def test_no_table_exposes_timestamp_ntz(spark):
    # the drift guard covers EVERY temporal column of EVERY table (orders
    # and lineitem dates arrive NTZ too under inferTimestampNTZ)
    for name in TABLE_NAMES:
        bad = [
            (c, t)
            for c, t in load_table(spark, SF_SMALL, name).dtypes
            if t == "timestamp_ntz"
        ]
        assert not bad, f"{name}: NTZ columns leaked through load_table: {bad}"


def test_events_ts_epoch_math_works(spark):
    # the exact idiom the queries use must analyze and execute
    ev = load_table(spark, sf_dir=SF_SMALL, name="events")
    row = ev.select(
        F.col("ts").cast("timestamp").cast("long").alias("epoch")
    ).agg(F.min("epoch").alias("lo"), F.max("epoch").alias("hi")).first()
    assert row.lo is not None and row.hi >= row.lo


def test_ntz_input_canonicalized(spark, tmp_path):
    # simulate the round-4 drift directly: write an NTZ ts, read it back
    # through the canonicalizer
    from gcp_map_reduce_spark.sources.tables import _canonicalize_timestamps

    src = load_table(spark, SF_SMALL, "events").limit(10)
    ntz_path = str(tmp_path / "events_ntz")
    src.withColumn("ts", F.to_timestamp_ntz(F.col("ts"))).write.parquet(ntz_path)
    back = _canonicalize_timestamps(spark.read.parquet(ntz_path), "events")
    assert dict(back.dtypes)["ts"] == "timestamp"
    assert back.filter(F.col("ts").cast("long").isNull()).count() == 0


_BARE_TS_CAST = re.compile(
    r"""(?:\bcol\(\s*)?["'](?:ts|last_click_ts|click_ts|hour
        |o_orderdate|l_shipdate)["']\s*
        (?:\)|\])\s*\.cast\(\s*["'](?:double|long|int|float)["']\s*\)
    """,
    re.VERBOSE,
)
# the sanctioned idiom contains a cast("timestamp") hop immediately before
# the numeric cast; strip those before scanning
_SAFE_HOP = re.compile(r"""\.cast\(\s*["']timestamp["']\s*\)""")


def test_no_bare_ts_epoch_casts_in_package():
    offenders: list[str] = []
    for py in sorted(PKG_ROOT.rglob("*.py")):
        text = _SAFE_HOP.sub(".SAFE", py.read_text())
        for i, line in enumerate(text.splitlines(), 1):
            if ".SAFE" in line:
                continue
            if _BARE_TS_CAST.search(line):
                offenders.append(f"{py.relative_to(PKG_ROOT)}:{i}: {line.strip()}")
    assert not offenders, (
        "bare numeric cast on a timestamp column (breaks under "
        "TIMESTAMP_NTZ inputs); use .cast('timestamp').cast('long'):\n"
        + "\n".join(offenders)
    )
