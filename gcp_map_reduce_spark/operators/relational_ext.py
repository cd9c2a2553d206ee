"""Extended relational operators: as-of / range joins, pivot, numeric
profiling, exact percentiles, string functions.

The reference has no joins at all (SURVEY.md §2.2); these cover the join
variants Spark lacks as single primitives (as-of) plus the profiling
surface a data-curation pipeline needs.

Determinism notes:
- variance/stddev are computed from decimal-exact sums surfaced as doubles,
  then combined with plain IEEE double arithmetic — identical operand
  sequence in both engines -> identical results (no order-dependent
  accumulation anywhere);
- exact percentiles: both engines sort and linearly interpolate on the
  same doubles (verified bit-exact empirically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gcp_map_reduce_spark.functions.numeric import dec
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "asof_join_clicks",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM events
)
SELECT user_id, event_id AS purchase_id, last_click_id,
  CAST(floor(epoch(ts)) - floor(epoch(last_click_ts)) AS BIGINT) AS gap_sec
FROM tagged WHERE event_type = 'purchase'
""",
)
def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (Spark has no primitive for it): for every purchase,
    the most recent prior-or-same-instant click of the same user.

    Implemented as the union-scan pattern: one window pass with
    last(..., ignorenulls) over the time-ordered per-user stream — a
    single shuffle on user_id, no join at all. This is the scalable as-of
    plan (the naive range self-join is quadratic per user).
    """
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    gap = (
        F.floor(F.col("ts").cast("double"))
        - F.floor(F.col("last_click_ts").cast("double"))
    ).cast("bigint")
    return tagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "last_click_id",
        gap.alias("gap_sec"),
    )


@query(
    "range_join_ship_window",
    oracle="""
SELECT o_orderpriority, count(*) AS n_lineitems,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
""",
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: lineitems shipped within 30 days of their
    order date. Equi key (orderkey) carries the shuffle; the range
    predicate evaluates post-match — the scalable shape for banded
    temporal joins (pure range joins without an equi key need bucketed
    time-bin keys instead)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(dec("l_extendedprice", precision=12))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "pivot_order_status",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts by status per priority. Explicit
    pivot values keep the plan static (no extra distinct-values job)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


@query(
    "numeric_profile",
    oracle="""
WITH s AS (
  SELECT c_mktsegment, count(*) AS n,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_sq,
    MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, min_bal, max_bal,
  sum_bal / n AS mean_bal,
  (n * sum_sq - sum_bal * sum_bal) / (CAST(n AS DOUBLE) * (n - 1)) AS var_bal,
  sqrt((n * sum_sq - sum_bal * sum_bal) / (CAST(n AS DOUBLE) * (n - 1))) AS std_bal
FROM s
""",
)
def numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling: count/min/max/mean/variance/stddev per segment.
    Variance uses the sum-of-squares identity over decimal-exact sums so
    no order-dependent double accumulation exists anywhere."""
    cust = _t(spark, sf_dir, "customer")
    bal = dec("c_acctbal", precision=12)
    s = cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(bal).cast("double").alias("sum_bal"),
        F.sum(bal * bal).cast("double").alias("sum_sq"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )
    n_d = F.col("n").cast("double")
    var = (F.col("n") * F.col("sum_sq") - F.col("sum_bal") * F.col("sum_bal")) / (
        n_d * (F.col("n") - 1)
    )
    return s.select(
        "c_mktsegment",
        "n",
        "min_bal",
        "max_bal",
        (F.col("sum_bal") / F.col("n")).alias("mean_bal"),
        var.alias("var_bal"),
        F.sqrt(var).alias("std_bal"),
    )


@query(
    "percentiles_totalprice",
    oracle="""
SELECT o_orderpriority,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.9) AS p90,
  quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderpriority
""",
)
def percentiles_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort + linear interpolation — bit-identical
    across engines). At 100 TB swap to approx_percentile (t-digest
    sketch): exact percentile materializes each group."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


@query("approx_percentiles_totalprice")  # sketch internals differ per engine
def approx_percentiles_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch, accuracy 1e4):
    the 100 TB path — constant memory per group, mergeable partials,
    single shuffle of sketches instead of materialized groups. Accuracy
    vs the exact operator is asserted in tests (no SQL oracle: sketch
    internals are engine-specific)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
    )


@query(
    "map_functions",
    oracle="""
SELECT o_orderpriority,
  count(*) FILTER (o_orderstatus = 'F') AS n_f,
  count(*) FILTER (o_orderstatus = 'O') AS n_o,
  count(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
""",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions: build a status->count map per priority
    (map_from_entries over collect_list) and extract with element_at.
    The map is internal — output is plain integers so the oracle (plain
    conditional aggregation) hash-matches."""
    orders = _t(spark, sf_dir, "orders")
    by_status = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    mapped = by_status.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "n"))
        ).alias("status_counts")
    )
    get = lambda s: F.coalesce(  # noqa: E731
        F.element_at("status_counts", s), F.lit(0)
    )
    return mapped.select(
        "o_orderpriority",
        get("F").alias("n_f"),
        get("O").alias("n_o"),
        get("P").alias("n_p"),
    )


@query(
    "math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
  abs(l_discount - 0.05) AS disc_dev,
  round(l_extendedprice, 1) AS price_r1,
  CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
  sqrt(l_extendedprice) AS price_sqrt,
  l_quantity * l_quantity AS qty_sq,
  CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
FROM lineitem WHERE l_orderkey < 100
""",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions over the fact table — the deterministic set
    (abs/round/floor/ceil/sqrt/multiply/mod are IEEE-exact or integer;
    transcendentals are excluded — see text_tfidf for why ln can't
    value-hash)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@query(
    "string_functions",
    oracle="""
SELECT p_partkey,
  upper(p_brand) AS brand_u,
  substring(p_name, 1, 8) AS name8,
  concat(p_brand, ':', p_type) AS brand_type,
  length(p_name) AS name_len,
  replace(p_type, ' ', '_') AS type_snake,
  CAST(position('a' IN p_name) AS INTEGER) AS first_a
FROM part
WHERE p_name LIKE '%e%' AND p_size BETWEEN 10 AND 40
""",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (the reference's only string ops are
    the §1.4 normalization chain): case, slicing, concat, search, LIKE."""
    part = _t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%e%") & F.col("p_size").between(10, 40)
    ).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
    )
