"""Subquery-shaped relational suite: EXISTS / NOT EXISTS decorrelation,
scalar subqueries, outer-join histograms, disjunctive predicate pushdown.

The reference has no relational surface at all (SURVEY.md §2.2); these
queries complete the engine's TPC-H-shaped coverage with the query SHAPES
the earlier suite (relational.py) does not exercise:

- correlated EXISTS -> left-semi join with a non-equi component (q4)
- conditional-share aggregation over a 6-way star join (q8)
- left OUTER join + count -> histogram-of-counts (q13)
- aggregate view + scalar MAX subquery (q15)
- correlated scalar AVG subquery against the same fact table (q17)
- OR-of-conjunctions predicate pushed through a join (q19)
- EXISTS + NOT EXISTS on the same fact table (strict-latest, q21)
- scalar subquery threshold + anti-join (q22)

The test tables are reduced TPC-H (no partsupp; no l_commitdate /
l_receiptdate / l_shipmode / c_phone), so the date- and phone-based
predicates of the originals are adapted to the available columns; each
docstring notes the substitution. Queries needing partsupp (q2/q9/q11/
q16/q20) are out of scope of the schema, not skipped work.

Determinism rules (see functions/numeric.py): money sums accumulate in
DECIMAL exactly and surface as DOUBLE; l_quantity is integral-valued so
double sums are order-independent; scalar thresholds (avg) are computed
with the same operation order in Spark and the DuckDB oracle.

Scale notes (100 TB): every dimension join (nation/region/supplier/part)
is broadcast-hinted; semi/anti joins against lineitem shuffle on
l_orderkey only after pushed-down scans; the q17/q15 aggregate views are
partial->final hash aggregates that reuse the fact scan's pruned columns.
Scalar subqueries become 1-row broadcasts, never collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.numeric import dec
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue():
    return dec("l_extendedprice", precision=12) * (
        F.lit(1) - dec("l_discount", 2, 4)
    )


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: correlated EXISTS decorrelated
    to a LEFT SEMI join whose condition mixes the equi key with a non-equi
    date comparison (ships >90 days after order; the original's
    l_commitdate < l_receiptdate is not in this schema).

    Plan: orders scan with the date range pushed down, semi-join on
    l_orderkey (shuffle on the key; the non-equi residual is evaluated
    inside the join), then partial->final count by priority."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q8_ORACLE = """
SELECT o_year,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
    CAST(l_extendedprice AS DECIMAL(12,2))
      * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
    l_suppkey, o_custkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') v
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
GROUP BY o_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: NATION_5's fraction of ECONOMY
    part volume sold into AMERICA, by order year. Exercises a 6-way star
    join with a conditional-sum share (two decimal sums, one division).

    Plan: lineitem scans with only 4 columns; part/customer/nation/region/
    supplier all broadcast; the share division happens after exact DECIMAL
    accumulation so the double quotient is bit-deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = _revenue().alias("volume")
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume,
            "l_suppkey",
            "o_custkey",
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("n2.n_name") == "NATION_5", F.col("volume")).otherwise(
                    F.lit(0)
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    with an ON-clause filter (not WHERE — null-extended rows must survive),
    count per customer including zeros, then a histogram of the counts
    (the original's o_comment NOT LIKE filter becomes a priority filter).

    Plan: outer join shuffles on custkey; both aggregations are
    partial->final; the second groupBy is over ~50 distinct counts so its
    shuffle is trivial."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: revenue view reused twice — once for
    the per-supplier totals, once for the scalar MAX — with equality on the
    EXACT decimal totals (bit-identical in both engines by construction),
    so ties would be returned, as the spec requires.

    Plan: ONE pruned lineitem scan -> partial/final hash agg; the scalar
    MAX is an empty-partition window over the AGGREGATED view (one row
    per supplier — tiny relative to the fact scan), so the view is
    genuinely computed once in a single plan. (The alternative — a
    separate ``revenue.agg(max)`` joined back — reads syntactically like
    reuse but Catalyst plans the aggregate subtree twice: the formatted
    plan showed 2 lineitem scans and no ReusedExchange.) Supplier is
    broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue_dec")
    )
    w_all = Window.partitionBy()
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.withColumn("max_rev", F.max("total_revenue_dec").over(w_all))
        .filter(F.col("total_revenue_dec") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )


_Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * (SUM(l_quantity) / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: correlated scalar AVG
    subquery against the same fact table, decorrelated to a per-part
    aggregate joined back (the original also filters p_container, which
    this schema lacks). l_quantity is integral-valued, so the double
    SUM/COUNT quotient is order-independent and the 0.2x threshold
    comparison is bit-identical across engines.

    Plan: the per-part avg is a partial->final agg over a 2-column scan;
    its result (one row per part) joins the brand-filtered fact on
    l_partkey. part is broadcast into both sides."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count("*"))).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice", precision=12)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive discounted revenue: an OR of three
    brand/size/quantity conjunctions spanning both join sides (the
    original's l_shipmode/l_shipinstruct legs are not in this schema).
    Catalyst extracts the common sub-predicates: the part-only disjunction
    (brand+size) and the lineitem-only disjunction (quantity range) are
    pushed below the join as partial filters, with the full OR kept as the
    join residual — the classic q19 optimization.

    Plan: part filtered+broadcast, lineitem scan keeps only 4 columns."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    legs = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return j.filter(legs).agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )


_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style waiting-supplier ranking: for finished orders with
    more than one supplier, find the supplier whose line shipped STRICTLY
    last — an EXISTS (left-semi) and a NOT EXISTS (left-anti) against the
    same fact table with different residuals (the original's
    receipt-past-commit predicate maps to shipdate ordering here).

    Plan: the semi/anti legs are SHUFFLE-HASH joins on l_orderkey
    (``hint("shuffle_hash")``), never broadcasts. Left to its own size
    estimates at bench scale Spark broadcasts the two lineitem build
    sides, which serializes two fact-sized HashedRelation builds plus
    the whole probe on one core (the testdata is a single row group →
    single scan task); measured 1.5-1.8 s vs ~1.0 s for the shuffled
    plan at sf0.1. At 100 TB the fact table can never broadcast anyway,
    so forcing the shuffle join is both the fast local plan and the
    only viable cluster plan; SHJ over SMJ skips sorting three
    fact-table copies. All three legs project the SAME three columns so
    the scans stay identical (exchange-reuse eligible; the semi leg
    ignores the extra column at probe time). Orders and supplier carry
    NO broadcast hint — both scale with SF (at 100 TB neither fits an
    executor), so AQE decides: it broadcasts them at bench scale and
    falls back to shuffle joins on a cluster. Final top-k is
    TakeOrderedAndProject.

    Measured and rejected (r8): a one-pass aggregate rewrite (per-order
    per-supplier shipdate maxima -> sorted supplier struct list -> the
    unique-argmax winner joined back to its lines) is value-identical
    at every scale but SLOWER — 0.85 -> 1.35 s at sf0.1, 1.51 -> 4.78 s
    at stress: the collect_list machinery plus the join-back re-shuffle
    of lineitem cost more than the three SHJ probes, whose build sides
    AQE sizes correctly. The semi/anti shape stays."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    # r17: push the finished-orders restriction BELOW the self-joins
    # (guide §2.3 — shuffle fewer bytes; the analogue of Q21's original
    # l_receiptdate > l_commitdate prefilter on l1). EXACT because every
    # sibling line l2/l3 shares l1's l_orderkey — the SAME order — so
    # restricting all three legs to F-order lines changes no semi/anti
    # outcome for any l1 row that survives the F restriction itself; and
    # the former final inner join to orders (unique key, no columns
    # consumed) becomes redundant — this semi IS that join, moved below
    # the exchanges. Effect at sf0.1: each self-join exchange carries
    # only F-order lines (~half of lineitem), one join drops out of the
    # plan, executor CPU 2.9 -> 1.9-2.3 interleaved. The orders side
    # stays AQE-decided (broadcast semi at bench scale; on a cluster the
    # semi shuffles by l_orderkey — the same partitioning every
    # downstream SHJ leg needs, so no extra exchange appears at scale).
    lif = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "semi")
    l1 = lif.alias("l1")
    l2 = lif.hint("shuffle_hash").alias("l2")
    l3 = lif.hint("shuffle_hash").alias("l3")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sib = (F.col("l2.l_orderkey") == F.col("l1.l_orderkey")) & (
        F.col("l2.l_suppkey") != F.col("l1.l_suppkey")
    )
    later = (
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") >= F.col("l1.l_shipdate"))
    )
    return (
        l1.join(l2, sib, "left_semi")
        .join(l3, later, "left_anti")
        .join(supp, F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q22_ORACLE = """
WITH eligible AS (
  SELECT CAST(c_custkey % 10 AS INT) AS cntrycode, c_custkey, c_acctbal
  FROM customer WHERE CAST(c_custkey % 10 AS INT) IN (1, 2, 3, 4, 5))
SELECT cntrycode, count(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM eligible
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
    FROM eligible WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY cntrycode
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style global sales opportunity: customers in selected
    "country codes" (custkey mod 10 — this schema has no c_phone) with
    above-average positive balances and no RECENT orders (every synthetic
    customer has at least one order, so the original's no-orders-at-all
    predicate would be vacuous; "none since 2000-01-01" keeps the
    anti-join non-trivial). Exercises a scalar AVG subquery (1-row
    broadcast, never collect()) plus an anti-join.

    The average accumulates in DECIMAL then divides as double with the
    same operand order in both engines, so the threshold comparison is
    bit-deterministic.

    Plan: customer scans once; the scalar avg is a broadcast cross join;
    the anti-join shuffles on custkey against a 1-column orders scan."""
    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 10).cast("int").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    ).filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal", precision=12)).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal", precision=12)).cast("double").alias("totacctbal"),
        )
    )


# -- registered suites -----------------------------------------------------
#
# The eight subquery-shaped TPC-H queries stay as library API above; the
# driver-facing registrations consolidate them into three tagged unions
# (grouped by result shape) so the whole subquery surface fits the
# driver's bounded (~50-query) correctness window. Each branch remains
# fully value-checked via its UNION ALL twin in the SQL.


@query(
    "q15_q17_q19_scalars",
    oracle=f"""
SELECT 'q15_top_supplier' AS metric, s_suppkey, s_name, total_revenue AS value
FROM ({_Q15_ORACLE})
UNION ALL
SELECT 'q17_small_qty_revenue', NULL, NULL, avg_yearly FROM ({_Q17_ORACLE})
UNION ALL
SELECT 'q19_disjunctive', NULL, NULL, revenue FROM ({_Q19_ORACLE})
""",
)
def q15_q17_q19_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-result subquery shapes, tagged: q15 (aggregate view + scalar
    MAX, identity columns populated), q17 (correlated scalar AVG
    decorrelated to a per-part agg), q19 (disjunctive predicate pushdown).
    Same one-tagged-row-per-metric shape as ``q6_q14_revenue``."""
    nulll = F.lit(None).cast("bigint")
    nulls = F.lit(None).cast("string")
    q15 = q15_top_supplier(spark, sf_dir).select(
        F.lit("q15_top_supplier").alias("metric"),
        "s_suppkey",
        "s_name",
        F.col("total_revenue").alias("value"),
    )
    q17 = q17_small_qty_revenue(spark, sf_dir).select(
        F.lit("q17_small_qty_revenue").alias("metric"),
        nulll.alias("s_suppkey"),
        nulls.alias("s_name"),
        F.col("avg_yearly").alias("value"),
    )
    q19 = q19_disjunctive(spark, sf_dir).select(
        F.lit("q19_disjunctive").alias("metric"),
        nulll.alias("s_suppkey"),
        nulls.alias("s_name"),
        F.col("revenue").alias("value"),
    )
    return q15.unionByName(q17).unionByName(q19)


@query(
    "q4_q13_q21_counts",
    oracle=f"""
SELECT 'q4_order_priority' AS metric, o_orderpriority AS k,
       order_count AS n
FROM ({_Q4_ORACLE})
UNION ALL
SELECT 'q13_customer_distribution', CAST(c_count AS VARCHAR), custdist
FROM ({_Q13_ORACLE})
UNION ALL
SELECT 'q21_waiting_suppliers', s_name, numwait FROM ({_Q21_ORACLE})
""",
)
def q4_q13_q21_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-distribution subquery shapes, tagged: q4 (correlated EXISTS
    -> semi join with non-equi residual), q13 (outer-join histogram of
    counts), q21 (EXISTS + NOT EXISTS on the same fact, top-k). All three
    results are (key, count) rows; the tag keeps them separable."""

    def norm(df: DataFrame, metric: str, k, n) -> DataFrame:
        return df.select(
            F.lit(metric).alias("metric"),
            k.cast("string").alias("k"),
            n.cast("bigint").alias("n"),
        )

    return (
        norm(
            q4_order_priority(spark, sf_dir),
            "q4_order_priority",
            F.col("o_orderpriority"),
            F.col("order_count"),
        )
        .unionByName(
            norm(
                q13_customer_distribution(spark, sf_dir),
                "q13_customer_distribution",
                F.col("c_count"),
                F.col("custdist"),
            )
        )
        .unionByName(
            norm(
                q21_waiting_suppliers(spark, sf_dir),
                "q21_waiting_suppliers",
                F.col("s_name"),
                F.col("numwait"),
            )
        )
    )


@query(
    "q8_q22_shares",
    oracle=f"""
SELECT 'q8_market_share' AS metric, o_year AS k, CAST(NULL AS BIGINT) AS numcust,
       mkt_share AS value
FROM ({_Q8_ORACLE})
UNION ALL
SELECT 'q22_inactive_customers', cntrycode, numcust, totacctbal
FROM ({_Q22_ORACLE})
""",
)
def q8_q22_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share/ratio subquery shapes, tagged: q8 (6-way star join with a
    conditional-share division) and q22 (scalar AVG threshold broadcast +
    anti-join). Both produce (int key, double measure) rows; q22 also
    carries its customer count."""
    q8 = q8_market_share(spark, sf_dir).select(
        F.lit("q8_market_share").alias("metric"),
        F.col("o_year").alias("k"),
        F.lit(None).cast("bigint").alias("numcust"),
        F.col("mkt_share").alias("value"),
    )
    q22 = q22_inactive_customers(spark, sf_dir).select(
        F.lit("q22_inactive_customers").alias("metric"),
        F.col("cntrycode").alias("k"),
        "numcust",
        F.col("totacctbal").alias("value"),
    )
    return q8.unionByName(q22)
