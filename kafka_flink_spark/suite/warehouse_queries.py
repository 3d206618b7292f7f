"""Warehouse analytics breadth: the TPC-H query shapes not yet covered
(Q2/Q9/Q11/Q12/Q16/Q20/Q21 adapted to the fixture star schema — there
is no partsupp table, so the part↔supplier relationship derives from
lineitem), plus statistical aggregates, window frames, grouping sets,
and regex scalars.

The reference has no joins or subqueries at all (SURVEY.md §2.6); this
module exists for engine completeness, exercising the decorrelation,
semi/anti-join, and multi-level aggregate paths a warehouse engine
must plan well at 100 TB. Scale notes per query in docstrings.

Float determinism: every cross-engine comparison on money sums uses
the exact scaled-integer trick from relational_queries (sum order is
engine-scheduled; integer partial sums are order-free), and every
threshold/equality comparison happens on integers or exact mins, never
on order-dependent float sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_flink_spark.sources.fixtures import load_table
from kafka_flink_spark.suite import register

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


# --- Q2-adapted: min-price supplier per part ---------------------------------


@register(
    "q_min_price_supplier",
    oracle="""
WITH offers AS (
    SELECT l_partkey, l_suppkey, min(l_extendedprice) AS best_price
    FROM lineitem GROUP BY 1, 2
),
eu AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
),
eu_offers AS (
    SELECT o.l_partkey, o.l_suppkey, o.best_price,
           min(o.best_price) OVER (PARTITION BY o.l_partkey) AS part_min
    FROM offers o JOIN eu s ON o.l_suppkey = s.s_suppkey
)
SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_brand, eo.best_price
FROM eu_offers eo
JOIN eu s ON eo.l_suppkey = s.s_suppkey
JOIN part p ON eo.l_partkey = p.p_partkey
WHERE p.p_size <= 5 AND p.p_type = 'LARGE' AND eo.best_price = eo.part_min
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2-shaped: cheapest EUROPE supplier per qualifying part. "
    "The per-part min is a window aggregate over the offers relation "
    "(one shuffle keyed by part), not a correlated re-scan — the "
    "decorrelated plan a 100 TB run needs. Equality compares exact "
    "min(l_extendedprice) doubles (order-free), never float sums. "
    "partsupp surrogate: distinct (l_partkey, l_suppkey) from lineitem.",
)
def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "LARGE")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    eu_offers = offers.join(F.broadcast(eu), offers.l_suppkey == eu.s_suppkey).withColumn(
        "part_min", F.min("best_price").over(Window.partitionBy("l_partkey"))
    )
    return (
        eu_offers.filter(F.col("best_price") == F.col("part_min"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "best_price")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q9-adapted: product-type profit by nation × year ------------------------


@register(
    "q_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
           - CAST(round(l.l_quantity) AS BIGINT)
             * CAST(round(p.p_retailprice * 100) AS BIGINT) * 50) / 10000.0
           AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%ring%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9-shaped: profit (revenue minus a 50%%-of-retail cost "
    "surrogate for the missing ps_supplycost) by supplier nation × "
    "order year for parts matching a name pattern. One fact-side "
    "shuffle: part/supplier/nation broadcast, orders joined on the "
    "already-partitioned orderkey; profit is one exact integer sum.",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%ring%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit_scaled = F.sum(
        _cents("l_extendedprice") * F.round((1 - F.col("l_discount")) * 100).cast("long")
        - F.round(F.col("l_quantity")).cast("long") * _cents("p_retailprice") * F.lit(50)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((profit_scaled / 10000.0).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --- Q12-adapted: shipping-delay buckets × priority --------------------------


@register(
    "q_shipping_delay_priority",
    oracle="""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'fast'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'normal'
            ELSE 'slow' END AS delay_bucket,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate
GROUP BY 1
ORDER BY delay_bucket
""",
    doc="TPC-H Q12-shaped (l_shipmode/commitdate absent → ship-delay "
    "buckets stand in): conditional aggregation over a single "
    "orderkey-keyed join; the CASE sits map-side so the shuffle "
    "carries 3 groups × 2 longs.",
)
def q_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dd = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(
            F.when(dd <= 30, "fast").when(dd <= 90, "normal").otherwise("slow").alias(
                "delay_bucket"
            )
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


# --- Q11-adapted: important parts by stock value -----------------------------


@register(
    "q_important_parts",
    oracle="""
WITH val AS (
    SELECT l.l_partkey,
           sum(CAST(round(l.l_quantity) AS BIGINT)
               * CAST(round(p.p_retailprice * 100) AS BIGINT)) AS stock_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY 1
)
SELECT l_partkey AS p_partkey, stock_cents / 100.0 AS stock_value
FROM val
WHERE stock_cents * 1000 > (SELECT sum(stock_cents) FROM val)
ORDER BY stock_value DESC, p_partkey
""",
    doc="TPC-H Q11-shaped: parts whose EUROPE-sourced stock value "
    "exceeds 1/1000 of the regional total. The threshold compare is "
    "integer-vs-integer (stock_cents*1000 > total_cents) so partial-agg "
    "order can never flip a boundary row; the total is a broadcast "
    "scalar subquery over the already-aggregated (small) relation.",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    val = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_quantity")).cast("long") * _cents("p_retailprice")
            ).alias("stock_cents")
        )
    )
    total = val.agg(F.sum("stock_cents").alias("t"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("stock_cents") * 1000 > F.col("t"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("stock_cents") / 100.0).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


# --- Q16-adapted: supplier counts per part descriptor ------------------------


@register(
    "q_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16-shaped: distinct supplier count per (brand, type, "
    "size), excluding suppliers flagged by a NOT IN subquery "
    "(negative acctbal stands in for the missing complaints comment). "
    "The distinct (partkey, suppkey) projection pre-shrinks the fact "
    "side before the broadcast part join; NOT IN over a non-nullable "
    "key plans as a broadcast anti join.",
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q20-adapted: suppliers with dominant part share -------------------------


@register(
    "q_dominant_suppliers",
    oracle="""
WITH shipped AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(round(l_quantity) AS BIGINT)) AS q
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
),
tot AS (SELECT l_partkey, sum(q) AS tq, count(*) AS ns FROM shipped GROUP BY 1)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND EXISTS (SELECT 1 FROM shipped sh JOIN tot t ON sh.l_partkey = t.l_partkey
              WHERE sh.l_suppkey = s.s_suppkey AND t.ns > 1 AND sh.q * 5 > t.tq * 4)
ORDER BY s_name
""",
    doc="TPC-H Q20-shaped: EUROPE suppliers who shipped >80%% of some "
    "multi-supplier part's 1996 volume (excess-stock surrogate). "
    "Per-part totals are window aggregates over the per-(part,supp) "
    "aggregate — lineitem scanned once, one partitioning throughout; "
    "integer share compare, EXISTS → left-semi join to supplier.",
)
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q")
    )
    per_part = Window.partitionBy("l_partkey")
    dominant = (
        shipped.select(
            "l_suppkey",
            "q",
            F.sum("q").over(per_part).alias("tq"),
            F.count("*").over(per_part).alias("ns"),
        )
        .filter((F.col("ns") > 1) & (F.col("q") * 5 > F.col("tq") * 4))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- Q21-adapted: suppliers who kept orders waiting --------------------------


@register(
    "q_waiting_suppliers",
    oracle="""
WITH late_flag AS (
    SELECT l.l_orderkey, l.l_suppkey,
           max(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
               THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
),
order_stats AS (
    SELECT l_orderkey,
           count(*) AS n_suppliers,
           sum(is_late) AS n_late_suppliers
    FROM late_flag GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late_flag lf
JOIN order_stats os ON lf.l_orderkey = os.l_orderkey
JOIN supplier s ON s.s_suppkey = lf.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND lf.is_late = 1
  AND os.n_suppliers > 1
  AND os.n_late_suppliers = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    doc="TPC-H Q21-shaped: EUROPE suppliers who were the SOLE late "
    "supplier (ship > order + 60d; commitdate absent) on a "
    "multi-supplier finalized order. The reference EXISTS/NOT-EXISTS "
    "pair is decorrelated into one per-(order, supplier) aggregate "
    "with the per-order counts as window aggregates over it — "
    "lineitem is scanned ONCE and stays partitioned by orderkey "
    "throughout (a self-join formulation re-scans the fact table; "
    "pinned in tests/test_plans.py).",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    late = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, 1
    ).otherwise(0)
    late_flag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = Window.partitionBy("l_orderkey")
    with_stats = late_flag.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count("*").over(per_order).alias("n_suppliers"),
        F.sum("is_late").over(per_order).alias("n_late_suppliers"),
    )
    return (
        with_stats.filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late_suppliers") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- statistical aggregates ---------------------------------------------------


@register(
    "g10_statistical_aggs",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS qty_stddev,
       round(var_samp(l_quantity), 6) AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty_slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_intercept
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="Statistical aggregate surface: stddev/variance, correlation, "
    "covariance, linear-regression slope/intercept — all single-pass "
    "mergeable moment sketches (partial aggregation), the 100 TB-safe "
    "formulation vs any two-pass mean-then-residual approach.",
)
def g10_statistical_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q, e = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp(q), 6).alias("qty_stddev"),
            F.round(F.var_samp(q), 6).alias("qty_var"),
            F.round(F.corr(q, e), 6).alias("qty_price_corr"),
            F.round(F.covar_samp(q, e), 4).alias("qty_price_covar"),
            F.round(F.regr_slope(e, q), 6).alias("price_per_qty_slope"),
            F.round(F.regr_intercept(e, q), 4).alias("price_intercept"),
        )
        .orderBy("l_returnflag")
    )


# --- window frames ------------------------------------------------------------


@register(
    "w4_window_frames",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '{_FMT_DUCK}') AS o_orderdate,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER w3 / 100.0 AS moving_sum3,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total,
       round(percent_rank() OVER wp, 6) AS pr,
       round(cume_dist() OVER wp, 6) AS cd,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       wp AS (PARTITION BY o_custkey ORDER BY o_totalprice)
""",
    doc="Window-frame surface: bounded ROWS frames (3-order moving "
    "sum), running totals, percent_rank/cume_dist, nth_value over the "
    "full-partition frame. Money sums use exact cents so frame "
    "accumulation order can't drift; one shuffle per distinct "
    "partitioning, shared by the two o_orderdate-ordered frames.",
)
def w4_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = by_date.rowsBetween(-2, 0)
    wrun = by_date.rowsBetween(Window.unboundedPreceding, 0)
    wfull = by_date.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", _FMT).alias("o_orderdate"),
        (F.sum(cents).over(w3) / 100.0).alias("moving_sum3"),
        (F.sum(cents).over(wrun) / 100.0).alias("running_total"),
        F.round(F.percent_rank().over(wp), 6).alias("pr"),
        F.round(F.cume_dist().over(wp), 6).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


# --- grouping sets ------------------------------------------------------------


@register(
    "g11_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="Explicit GROUPING SETS (the general form of g3 rollup / g4 "
    "cube) with grouping() indicator columns disambiguating NULL "
    "groups from NULL data — planned as a single Expand + one "
    "aggregate, not one scan per set.",
)
def g11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --- regex scalar functions ---------------------------------------------------


@register(
    "sc6_regex_functions",
    oracle="""
SELECT p_partkey,
       p_name,
       regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
       CAST(regexp_matches(p_name, '^(small|large)') AS BOOLEAN) AS sized
FROM part
WHERE p_size <= 10
""",
    doc="Regex scalar surface: capture-group extract, global replace, "
    "match counting, anchored boolean match — all JVM-side codegen "
    "expressions (no Python UDF in the scan path).",
)
def sc6_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.regexp_count("p_name", F.lit(r"[a-z]+")).cast("long").alias("n_words"),
        F.col("p_name").rlike(r"^(small|large)").alias("sized"),
    )


# --- histogram ----------------------------------------------------------------


@register(
    "g12_histogram",
    oracle="""
SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM orders
GROUP BY 1
ORDER BY bucket
""",
    doc="Fixed-width histogram (the width_bucket pattern): integer "
    "bucketing is a narrow map-side expression, the aggregate shuffles "
    "10 buckets regardless of input size — the constant-output-size "
    "shape that makes histograms free at 100 TB. min/max are exact "
    "parquet doubles (no float summation).",
)
def g12_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "g14_boolean_aggs",
    oracle="""
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'F') AS any_final
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Boolean aggregate surface: count_if / bool_and (every) / "
    "bool_or (any) — single-pass mergeable flags.",
)
def g14_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_big"),
            F.every(F.col("o_totalprice") > 0).alias("all_positive"),
            F.some(F.col("o_orderstatus") == "F").alias("any_final"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "sc8_bitwise_aggs",
    oracle="""
SELECT l_linestatus,
       CAST(bit_and(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_and,
       CAST(bit_or(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_or,
       CAST(bit_xor(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_xor
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    doc="Bitwise aggregate surface (bit_and/bit_or/bit_xor): order-"
    "independent integer reductions — trivially partial-aggregable, "
    "deterministic under any partitioning.",
)
def sc8_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity")).cast("long")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.bit_and(q).cast("long").alias("qty_and"),
            F.bit_or(q).cast("long").alias("qty_or"),
            F.bit_xor(q).cast("long").alias("qty_xor"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "qa2_expectation_checks",
    oracle="""
SELECT 'orders_custkey_fk' AS check_name,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
           AS n_violations
UNION ALL
SELECT 'orders_key_unique',
       CAST((SELECT coalesce(sum(n - 1), 0) FROM
             (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)) AS BIGINT)
UNION ALL
SELECT 'orders_price_positive',
       CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
UNION ALL
SELECT 'orders_priority_domain',
       CAST((SELECT count(*) FROM orders
             WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM',
                                           '4-NOT SPECIFIED','5-LOW')) AS BIGINT)
UNION ALL
SELECT 'customer_name_not_null',
       CAST((SELECT count(*) FROM customer WHERE c_name IS NULL) AS BIGINT)
UNION ALL
SELECT 'lineitem_qty_range',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
""",
    doc="Data-quality expectation suite (the Deequ / dbt-test shape): "
    "referential integrity (orders -> customer FK via anti-join), "
    "key uniqueness (surplus rows per duplicate key), range checks, "
    "domain (accepted-values) checks, not-null checks - each one row "
    "(check_name, n_violations). Every check is a single aggregate "
    "over one scan shape; at 100 TB the checks share table scans "
    "when run through one action (Catalyst common-subexpression "
    "reuse), and violations counts - not violating ROWS - cross the "
    "wire. The fixture is expected to pass all checks with 0 "
    "violations; the shape is what's under test.",
)
def qa2_expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name: str, df) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"),
        )

    fk = one(
        "orders_custkey_fk",
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
            F.count("*").alias("n")
        ),
    )
    uniq = one(
        "orders_key_unique",
        o.groupBy("o_orderkey")
        .count()
        .agg(F.sum(F.col("count") - 1).alias("n")),
    )
    rng = one(
        "orders_price_positive",
        o.filter("o_totalprice <= 0").agg(F.count("*").alias("n")),
    )
    dom = one(
        "orders_priority_domain",
        o.filter(
            ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            )
        ).agg(F.count("*").alias("n")),
    )
    nn = one(
        "customer_name_not_null",
        c.filter(F.col("c_name").isNull()).agg(F.count("*").alias("n")),
    )
    qty = one(
        "lineitem_qty_range",
        li.filter("l_quantity < 1 OR l_quantity > 50").agg(F.count("*").alias("n")),
    )
    return fk.unionByName(uniq).unionByName(rng).unionByName(dom).unionByName(nn).unionByName(qty)


@register(
    "qa4_partition_skew_report",
    oracle="""
WITH per_key AS (
    SELECT o_orderdate AS k, count(*) AS c FROM orders GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       round(avg(c), 6) AS mean_key_rows,
       round(quantile_cont(c, 0.50), 6) AS p50_key_rows,
       round(quantile_cont(c, 0.99), 6) AS p99_key_rows,
       round(max(c) * 1.0 / avg(c), 6) AS skew_factor,
       round(max(c) * 1.0 / sum(c), 6) AS top_key_share
FROM per_key
""",
    doc="Partition-key skew report — the decision input for every "
    "skew mitigation this engine ships (j12 salting, g22 two-phase "
    "agg, AQE skew-join thresholds): per-key row counts of a "
    "candidate partition/join key reduced to the operational scalars "
    "— key count, max/mean (skew factor), p50/p99, hottest-key share. "
    "skew_factor near 1 = safe to hash-partition; >> 1 = salt or "
    "broadcast. Two map-side-combinable aggregations (key counts are "
    "key-cardinality-sized; the summary is one row); at 100 TB this "
    "is the cheap pre-flight you run BEFORE committing a shuffle "
    "strategy, same plan at any scale. round(avg)-boundary audit "
    "(r10): EXACT by construction — avg/percentile inputs are per-key "
    "row COUNTS (integers), whose double sums are exact below 2^53 "
    "regardless of order, so both engines divide identical exact "
    "sums once; no micro-quantize conversion needed.",
)
def qa4_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderdate")
    per_key = o.groupBy("o_orderdate").agg(F.count("*").alias("c"))
    return per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.round(F.avg("c"), 6).alias("mean_key_rows"),
        F.round(F.percentile("c", F.lit(0.50)), 6).alias("p50_key_rows"),
        F.round(F.percentile("c", F.lit(0.99)), 6).alias("p99_key_rows"),
        F.round(F.max("c") * F.lit(1.0) / F.avg("c"), 6).alias("skew_factor"),
        F.round(F.max("c") * F.lit(1.0) / F.sum("c"), 6).alias("top_key_share"),
    )
