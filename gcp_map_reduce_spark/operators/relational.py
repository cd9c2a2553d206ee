"""Relational operator suite: joins, aggregations, windows, set ops, top-k.

The reference has NONE of these (SURVEY.md §2.2 — its only relational-ish
op is the per-key merge of mapper outputs, a group-by-key). They are part
of the engine's extended surface, expressed purely with Spark built-ins so
Catalyst/Tungsten handle planning (broadcast vs shuffle join, partial
aggregation, TakeOrderedAndProject for top-k).

Oracle determinism rules used throughout (see functions/numeric.py):
- double SUM/AVG go through exact DECIMAL accumulation, surfaced as double;
- timestamps are never emitted raw — formatted to strings or extracted to
  ints so Spark/DuckDB/pandas timezone plumbing can't drift;
- every ORDER BY ... LIMIT has a unique-key tiebreak so the selected SET of
  rows is deterministic (the driver's compare is order-insensitive but the
  membership must match).

Scale notes (100 TB):
- region/nation (and at most supplier) are broadcast — explicitly hinted so
  the plan survives stale stats; customer/orders/lineitem join on their
  keys via shuffle hash/sort-merge with AQE skew splitting.
- Aggregations are all partial->final (map-side combine); no collect()
  anywhere; top-k is per-partition top-k + single merge, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gcp_map_reduce_spark.functions.numeric import dec, dsum
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# SQL fragment: exact decimal sum of a 2-dec double column, as double.
def _dsum_sql(expr: str, alias: str, cast: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {cast})) AS DOUBLE) AS {alias}"


# -- TPC-H-style analytics ------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Single scan -> partial/final
    HashAggregate; the shipdate filter is pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    qty, price = dec("l_quantity", precision=12), dec("l_extendedprice", precision=12)
    disc, tax = dec("l_discount", 2, 4), dec("l_tax", 2, 4)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + top-k (tiebreak on l_orderkey)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    price = dec("l_extendedprice", precision=12)
    disc = dec("l_discount", 2, 4)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join. nation/region/supplier are broadcast
    (dimension tables); the fact-side joins shuffle on their keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    price = dec("l_extendedprice", precision=12)
    disc = dec("l_discount", 2, 4)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    AS promo_pct,
  count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: fact scan joined to the part
    dimension (broadcast — at 100 TB part is still orders of magnitude
    smaller than lineitem), conditional aggregation, exact decimal sums
    with one final double division."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(_t(spark, sf_dir, "part"))
    price = dec("l_extendedprice", precision=12)
    disc = dec("l_discount", 2, 4)
    rev = price * (F.lit(1) - disc)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
  CAST(strftime(l_shipdate, '%Y') AS INT) AS ship_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cust_nation, supp_nation, ship_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-nation trade volume: the nation dimension
    joins TWICE under different roles (customer's vs supplier's nation) —
    both broadcast; the theta predicate (different nations) filters after
    the equi-joins."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    cn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
        )
    )
    sn = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
        )
    )
    price = dec("l_extendedprice", precision=12)
    disc = dec("l_discount", 2, 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cn, cust.c_nationkey == F.col("cnk"))
        .join(sn, supp.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item revenue ranking: join-agg-topk with
    the returnflag filter pushed to the lineitem scan and the top-20
    taken as TakeOrderedAndProject (never a full sort)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    price = dec("l_extendedprice", precision=12)
    disc = dec("l_discount", 2, 4)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180
)
SELECT c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: aggregate-then-HAVING over
    the fact table produces a small key set that SEMI-joins back to
    orders — the filter-by-aggregate shape. The big-order key list is
    broadcast (post-aggregation it is tiny at any scale)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", precision=12)).alias("qty"))
        .filter(F.col("qty") > 180)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(big), orders.o_orderkey == big.l_orderkey, "semi"
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style scan-heavy filter+agg: every predicate reaches the
    parquet scan (PushedFilters), projection prunes to 4 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", precision=12) * dec("l_discount", 2, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# -- join variants --------------------------------------------------------

@query(
    "join_broadcast_enrich",
    oracle="""
SELECT r_name, count(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact->dim star join with explicit broadcast hints: zero shuffle on
    the join itself (only the final 5-group agg shuffles)."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one big order. Semi joins
    never duplicate the left side — no post-join distinct needed."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders at all."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_outer_counts",
    oracle="""
SELECT c_custkey, count(o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + agg: order count / spend per customer including
    zero-order customers (null-safe count/sum semantics)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice", precision=12)), F.lit(0))
            .cast("double")
            .alias("total_spend"),
        )
    )


# -- window functions -----------------------------------------------------

@query(
    "window_rank_orders",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (deterministic tiebreak).
    At scale this is the grouped-top-k pattern: one hash shuffle on the
    partition key, per-partition sort, no global sort."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_events",
    oracle="""
SELECT user_id, event_id, value,
  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
""",
)
def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event delta via lag()."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend: explicit ROWS frame, exact decimal sum."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", precision=12)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@query(
    "funnel_stages",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS vt FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS pt FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY e.user_id
)
SELECT u.user_id,
  CASE WHEN pt IS NOT NULL THEN 3 WHEN ct IS NOT NULL THEN 2
       WHEN vt IS NOT NULL THEN 1 ELSE 0 END AS reached_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
""",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase) per user: each stage's
    earliest qualifying timestamp must follow the previous stage's. Three
    narrow aggregations on user_id — the same partitioning reused across
    stages, so on a pre-partitioned events table only the first round
    shuffles."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("vt")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("ct")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    stage = (
        F.when(F.col("pt").isNotNull(), 3)
        .when(F.col("ct").isNotNull(), 2)
        .when(F.col("vt").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", stage.alias("reached_stage"))
    )


@query(
    "window_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS spend_30d
FROM orders
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE frame keyed on epoch
    seconds (value-based, unlike the ROWS frame of window_running_sum).
    Decimal sum -> order-insensitive exactness inside the frame."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # NTZ won't cast straight to long; hop via session-TZ timestamp
        # (session is pinned UTC, matching DuckDB's epoch())
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", precision=12)).over(w).cast("double").alias(
            "spend_30d"
        ),
    )


@query(
    "window_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
  ntile(4) OVER w AS price_quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per priority class. The (price, orderkey) total order removes peer
    ties, so the doubles are identical across engines."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM flagged GROUP BY user_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counting with a 30-min inactivity gap — the batch analog of
    streaming session windows (see streaming/). Pure window functions; the
    per-user ordering shuffle is the only exchange."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.floor(F.col("ts").cast("double"))
    new_session = F.when(
        (epoch - F.lag(epoch).over(w) > 1800) | F.lag("ts").over(w).isNull(), 1
    ).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# -- set operations -------------------------------------------------------

_CUST_1995 = (
    "SELECT DISTINCT o_custkey FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
)
_CUST_2000 = (
    "SELECT DISTINCT o_custkey FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"
)


def _cust_year(spark, sf_dir, lo=None, hi=None):
    orders = _t(spark, sf_dir, "orders")
    if lo:
        orders = orders.filter(F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
    if hi:
        orders = orders.filter(F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    return orders.select("o_custkey").distinct()


@query("set_union", oracle=f"{_CUST_1995} UNION {_CUST_2000}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in either year — distinct union of key sets."""
    a = _cust_year(spark, sf_dir, "1995-01-01 00:00:00", "1996-01-01 00:00:00")
    b = _cust_year(spark, sf_dir, "2000-01-01 00:00:00", None)
    return a.union(b).distinct()


@query("set_intersect", oracle=f"{_CUST_1995} INTERSECT {_CUST_2000}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both years — set intersection."""
    a = _cust_year(spark, sf_dir, "1995-01-01 00:00:00", "1996-01-01 00:00:00")
    b = _cust_year(spark, sf_dir, "2000-01-01 00:00:00", None)
    return a.intersect(b)


@query("set_except", oracle=f"{_CUST_1995} EXCEPT {_CUST_2000}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1995 but gone by 2000 — set difference."""
    a = _cust_year(spark, sf_dir, "1995-01-01 00:00:00", "1996-01-01 00:00:00")
    b = _cust_year(spark, sf_dir, "2000-01-01 00:00:00", None)
    return a.exceptAll(b).distinct()


# -- grouping sets / distinct aggs / top-k --------------------------------

@query(
    "agg_rollup",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (priority, then status, then grand total) in
    one Expand + single-shuffle aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "total", 2)
    )


@query(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations of (returnflag, linestatus) — the full
    cube, one Expand + single shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "total_qty", 2)
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (a strict superset of rollup/cube shapes):
    (priority, status), (status), and the grand total in one Expand +
    single-shuffle aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(F.count("*").alias("n"), dsum("o_totalprice", "total", 2))


@query(
    "agg_distinct",
    oracle="""
SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer GROUP BY c_mktsegment
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) alongside plain aggregates (planned as a
    two-phase Expand aggregation)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count_distinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
        dsum("c_acctbal", "total_bal"),
    )


@query("approx_distinct")  # HLL sketches differ across engines -> rows-only
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for distinct
    counting — fixed-size sketch, no exact-distinct shuffle explosion.
    No oracle: DuckDB's approx sketch differs by design; correctness is
    bounded-error vs the exact `agg_distinct` (asserted in unit tests)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n_orders_approx")
    )


@query(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject (per-partition heap
    + driver merge of k rows), not a full distributed sort."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    ).limit(15)


@query(
    "orders_above_cust_avg",
    oracle="""
WITH cavg AS (
  SELECT o_custkey AS k,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice, avg_price
FROM orders JOIN cavg ON o_custkey = k
WHERE o_totalprice > 2 * avg_price
""",
)
def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (orders > 2x their customer's average),
    decorrelated into agg + self-join — the plan Catalyst would produce
    for the subquery form."""
    orders = _t(spark, sf_dir, "orders")
    cavg = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        (F.sum(dec("o_totalprice", precision=12)).cast("double") / F.count("*")).alias(
            "avg_price"
        )
    )
    return (
        orders.join(cavg, orders.o_custkey == cavg.k)
        .filter(F.col("o_totalprice") > 2 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
    )


# -- temporal / json scalar functions -------------------------------------

@query(
    "orders_by_month",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS ym, o_orderpriority, count(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY ym, o_orderpriority
""",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing with date_format — temporal scalar functions
    feeding a grouped aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"), "o_orderpriority"
    ).agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))


@query(
    "events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
  count(*) AS n, count(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY hour, event_type
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregation over the event stream table —
    the batch counterpart of the streaming windowed agg (streaming/)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value", "total_value"),
    )


@query(
    "events_json_extract",
    oracle="""
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  count(*) AS n
FROM events GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload column (the reference
    only ever used JSON as a storage format, never queried it — O15)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count("*").alias("n"),
    )
