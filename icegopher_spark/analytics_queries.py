"""Second wave of relational coverage: correlated subqueries, anti-join
patterns, percentiles, cube, running windows, scalar string/date/array
functions — each oracle-matched against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import SQL_DISC_PRICE, dec, disc_price, load, money, register

# -- correlated scalar subquery (TPC-H Q17 pattern) -------------------------

q17_oracle = """
WITH avg_qty AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) / 7, 2) AS DOUBLE)
         AS avg_yearly
FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < a.half_avg
"""


@register("q17_small_quantity_revenue", q17_oracle, "correlated scalar subquery -> join-agg")
def q17(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")) / 7, 2).cast("double").alias("avg_yearly")
        )
    )


# -- NOT EXISTS anti-join (TPC-H Q21/22 pattern) ----------------------------

q22_oracle = """
WITH cust_avg AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer c, cust_avg
WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * cust_avg.n > cust_avg.bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY 1
"""


@register("q22_global_sales_opportunity", q22_oracle, "NOT EXISTS -> left-anti join")
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    # `bal > avg(bal)` as `bal * n > sum(bal)`: Spark's avg(decimal)
    # rounds the mean at 1e-6 while DuckDB's AVG(decimal) is a full-
    # precision double, so a boundary customer within 5e-7 of the mean
    # could pass on one engine only; the multiplied form is exact
    # integer-scaled decimal arithmetic on both (r6 review)
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("bal_sum"), F.count(F.lit(1)).alias("n")
    )
    rich = c.join(F.broadcast(stats)).filter(
        dec("c_acctbal") * F.col("n") > F.col("bal_sum")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    no_orders = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return no_orders.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        money(F.sum(dec("c_acctbal"))).alias("totacctbal"),
    )


# -- min-cost-per-group (TPC-H Q2 pattern via window) -----------------------

q2_oracle = """
WITH ranked AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name, ps_cost,
         MIN(ps_cost) OVER (PARTITION BY p.p_partkey) AS min_cost
  FROM part p
  JOIN (SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_cost
        FROM lineitem GROUP BY 1, 2) ps ON ps.l_partkey = p.p_partkey
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
)
SELECT p_partkey, s_suppkey, s_name, CAST(ps_cost AS DOUBLE) AS cost
FROM ranked WHERE ps_cost = min_cost AND p_partkey < 200
"""


@register("q2_min_cost_supplier", q2_oracle, "min-per-group via window = correlated MIN subquery")
def q2(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").filter(F.col("p_partkey") < 200)
    s = load(spark, sf, "supplier")
    li = load(spark, sf, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("ps_cost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)
        .withColumn("min_cost", F.min("ps_cost").over(w))
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.col("ps_cost").cast("double").alias("cost"),
        )
    )


# -- percentiles ------------------------------------------------------------

pct_oracle = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
FROM lineitem GROUP BY l_returnflag
"""


@register("percentiles_exact", pct_oracle, "exact interpolated percentiles per group")
def percentiles(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("price_p99"),
    )


# -- cube -------------------------------------------------------------------

cube_oracle = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COALESCE(CAST(EXTRACT(year FROM l_shipdate) AS VARCHAR), 'ALL') AS ship_year,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus, EXTRACT(year FROM l_shipdate))
"""


@register("cube_counts", cube_oracle, "3-D CUBE grouping sets")
def cube_counts(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("bigint")
    )
    return (
        li.cube("l_returnflag", "l_linestatus", "ship_year")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.coalesce(F.col("ship_year").cast("string"), F.lit("ALL")).alias("ship_year"),
            "n_rows",
        )
    )


# -- running / sliding windows ---------------------------------------------

running_oracle = """
WITH daily AS (
  SELECT o_custkey, o_orderdate, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, o_orderdate,
       CAST(ROUND(SUM(spend) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS cum_spend,
       CAST(ROUND(AVG(spend) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
         AS avg_3
FROM daily
WHERE o_custkey < 100
"""


@register("window_running_sum", running_oracle, "cumulative + 3-row moving window")
def running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    daily = o.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(dec("o_totalprice")).alias("spend")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return daily.select(
        "o_custkey",
        "o_orderdate",
        money(F.sum("spend").over(w.rowsBetween(Window.unboundedPreceding, 0))).alias(
            "cum_spend"
        ),
        F.round(F.avg("spend").over(w.rowsBetween(-2, 0)), 4).cast("double").alias("avg_3"),
    )


lag_lead_oracle = """
WITH daily AS (
  SELECT o_custkey, o_orderdate, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, o_orderdate, n,
       LAG(n) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev_n,
       LEAD(n) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS next_n,
       CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY n DESC, o_orderdate) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY n DESC) AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS quartile
FROM daily WHERE o_custkey < 50
"""


@register("window_lag_lead_rank", lag_lead_oracle, "lag/lead/rank/dense_rank/ntile")
def lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").filter(F.col("o_custkey") < 50)
    daily = o.groupBy("o_custkey", "o_orderdate").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    wr = Window.partitionBy("o_custkey").orderBy(F.col("n").desc(), F.col("o_orderdate"))
    wd = Window.partitionBy("o_custkey").orderBy(F.col("n").desc())
    return daily.select(
        "o_custkey",
        "o_orderdate",
        "n",
        F.lag("n").over(wt).alias("prev_n"),
        F.lead("n").over(wt).alias("next_n"),
        F.rank().over(wr).cast("bigint").alias("rnk"),
        F.dense_rank().over(wd).cast("bigint").alias("drnk"),
        F.ntile(4).over(wt).cast("bigint").alias("quartile"),
    )


# -- scalar functions: strings / dates / arrays -----------------------------

scalar_oracle = """
SELECT p_partkey,
       upper(substring(p_name, 1, 3)) AS name3,
       length(p_name) AS name_len,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
       replace(p_name, ' ', '_') AS snake,
       CAST(contains(p_name, 'red') AS BOOLEAN) AS has_red
FROM part WHERE p_partkey <= 500
"""


@register("scalar_string_funcs", scalar_oracle, "substring/upper/length/split/replace/contains")
def scalar_strings(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 3)).alias("name3"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.regexp_replace("p_name", " ", "_").alias("snake"),
        F.col("p_name").contains("red").alias("has_red"),
    )


date_oracle = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(dow FROM o_orderdate) AS dow,
       strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
FROM orders WHERE o_orderkey <= 1000
"""


@register("scalar_date_funcs", date_oracle, "extract/date_add/datediff/dayofweek")
def scalar_dates(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),  # DuckDB dow: Sunday=0
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
    )


array_oracle = """
WITH per_cust AS (
  SELECT o_custkey, list(DISTINCT o_orderpriority ORDER BY o_orderpriority) AS prios,
         list(o_orderkey ORDER BY o_orderkey) AS keys
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(len(prios) AS INTEGER) AS n_prios,
       array_to_string(prios, ',') AS prio_csv,
       CAST(keys[1] AS BIGINT) AS first_key,
       CAST(list_sum(list_transform(keys, k -> CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)) AS BIGINT)
         AS n_even
FROM per_cust WHERE o_custkey < 200
"""


@register("array_funcs", array_oracle, "collect/sort/transform/aggregate array ops")
def array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").filter(F.col("o_custkey") < 200)
    per_cust = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set("o_orderpriority")).alias("prios"),
        F.sort_array(F.collect_list("o_orderkey")).alias("keys"),
    )
    n_even = F.aggregate(
        F.transform("keys", lambda k: F.when(k % 2 == 0, 1).otherwise(0)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return per_cust.select(
        "o_custkey",
        F.size("prios").alias("n_prios"),
        F.concat_ws(",", "prios").alias("prio_csv"),
        F.element_at("keys", 1).alias("first_key"),
        n_even.alias("n_even"),
    )


# -- sketches ---------------------------------------------------------------

sketch_oracle = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       CAST(TRUE AS BOOLEAN) AS hll_within_5pct
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "approx_distinct_sketch",
    sketch_oracle,
    "HLL approx_count_distinct checked within 5% of exact (both computed)",
)
def approx_sketch(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.02) - F.countDistinct("l_orderkey")
            )
            <= F.countDistinct("l_orderkey") * 0.05
        ).alias("hll_within_5pct"),
    )


# -- TPC-H Q8: national market share ----------------------------------------

q8_oracle = f"""
WITH all_nations AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         {SQL_DISC_PRICE} AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 00:00:00'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'CHINA' THEN volume
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM all_nations GROUP BY o_year
"""


@register("q8_national_market_share", q8_oracle, "TPC-H Q8: 8-way join + share ratio")
def q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 adapted to the synthetic schema (region=ASIA,
    p_type=ECONOMY, supplier nation CHINA). Plan shape: big fact joins
    shuffle on orderkey; all dims (part/supplier/customer/nation/region)
    broadcast — at 100 TB only lineitem⋈orders shuffles."""
    p = load(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    vol = disc_price()
    all_nations = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return all_nations.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "CHINA", F.col("volume")).otherwise(zero)).cast(
                "double"
            )
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


# -- TPC-H Q13: customer order-count distribution ---------------------------

q13_oracle = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
"""


@register("q13_customer_distribution", q13_oracle, "TPC-H Q13: outer join + double agg")
def q13(spark: SparkSession, sf: str) -> DataFrame:
    """Left-outer join keeps zero-order customers (COUNT over a null key
    = 0), then a second aggregation over the counts. The orders side is
    pre-filtered (non-URGENT), matching Q13's comment-filter shape."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# -- TPC-H Q15: top supplier by quarterly revenue ---------------------------

q15_oracle = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({SQL_DISC_PRICE}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", q15_oracle, "TPC-H Q15: view + MAX subquery")
def q15(spark: SparkSession, sf: str) -> DataFrame:
    """The scalar MAX subquery is a tree-aggregated 1-row MAX broadcast
    back onto the revenue view — NOT a global rank window, which would
    funnel every supplier row through a single task (suppliers grow
    with SF; at 100 TB that's a serialized multi-GB window). Ties keep
    rank-1 semantics via the equality filter, matching the oracle."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    top = revenue.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev")
    ).drop("_max_rev")
    return (
        top.join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", money(F.col("total_revenue")).alias("total_revenue"))
    )


# -- TPC-H Q19: disjunctive brand/size/quantity predicate -------------------

q19_oracle = f"""
SELECT CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@register("q19_discounted_revenue", q19_oracle, "TPC-H Q19: OR-of-ANDs join predicate")
def q19(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 adapted (p_size ranges stand in for p_container). The
    disjunction stays a single broadcast-hash-join on p_partkey with the
    OR evaluated post-join — Catalyst also derives the implied
    p_brand IN (...) filter pushed to the part scan."""
    p = load(spark, sf, "part")
    li = load(spark, sf, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(money(F.sum(disc_price())).alias("revenue"))
    )


# -- GROUPING SETS (beyond rollup/cube) -------------------------------------

gsets_oracle = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


@register(
    "grouping_sets_qty",
    gsets_oracle,
    "explicit GROUPING SETS (flag), (status), (flag,status)",
)
def grouping_sets_qty(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


# -- scalar math functions ---------------------------------------------------

math_oracle = """
SELECT l_orderkey,
       ROUND(ABS(l_extendedprice - l_quantity * 1000), 2) AS abs_diff,
       ROUND(LN(l_extendedprice + 1), 6) AS log_price,
       ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
       ROUND(POWER(l_discount, 2), 6) AS disc_sq,
       CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price_bucket,
       MOD(l_orderkey, 7) AS okey_mod
FROM lineitem
WHERE l_orderkey <= 200
"""


@register("scalar_math_funcs", math_oracle, "abs/ln/sqrt/power/floor/mod scalar coverage")
def scalar_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias(
            "abs_diff"
        ),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.floor(F.col("l_extendedprice") / 100).alias("price_bucket"),
        (F.col("l_orderkey") % 7).alias("okey_mod"),
    )


# -- SQL-API surface ---------------------------------------------------------

sql_api_oracle = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register(
    "sql_api_orders",
    sql_api_oracle,
    "same engine through spark.sql() text instead of the DataFrame API",
)
def sql_api_orders(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("_sql_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
        FROM _sql_orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Round 4: the remaining TPC-H patterns (q11/q12/q16/q20/q21), adapted to
# the synthetic star schema (no partsupp table — supplier/part inventory
# is derived from lineitem exactly as q2 already does; no
# l_commitdate/l_receiptdate — "late" is shipped >60 days after the
# order date). Completes the 22-query battery: every TPC-H access
# pattern the reference's SQL surface could be pointed at now has a
# Spark-first plan and an independent DuckDB oracle.
# ---------------------------------------------------------------------------

q11_oracle = """
WITH ps AS (
  SELECT l.l_partkey, SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey AS partkey, CAST(ROUND(value, 2) AS DOUBLE) AS value
FROM ps
WHERE value * 1000 > (SELECT SUM(value) FROM ps)
"""


@register(
    "q11_important_stock",
    q11_oracle,
    "TPC-H Q11: scalar-subquery HAVING threshold over a derived partsupp",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    """Group-value vs global-total threshold (the HAVING > scalar
    subquery pattern). The global total is a 1-row aggregate of the
    *already reduced* per-part values — broadcast is scale-invariant
    (one row regardless of SF), so the explicit cross-join broadcast is
    safe at 100 TB. The ``*1000 >`` integer-decimal compare keeps the
    boundary exact in both engines (no double rounding at the cut)."""
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    ps = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("value"))
    )
    total = ps.agg(F.sum("value").alias("total"))
    return (
        ps.join(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            money(F.col("value")).alias("value"),
        )
    )


q12_oracle = """
SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


@register(
    "q12_late_shipment_priority",
    q12_oracle,
    "TPC-H Q12: join + conditional CASE-WHEN pivot aggregation",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    """The Q12 shape (shipmode → priority split) without l_shipmode:
    lines shipped >60 days after the order date, split by order
    priority class per ship year. Join carries only 3 narrow columns
    past the filter; the CASE-WHEN pair folds into one aggregation —
    conditional aggregation, not two passes."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


q16_oracle = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register(
    "q16_supplier_part_types",
    q16_oracle,
    "TPC-H Q16: NOT IN anti-join + COUNT(DISTINCT) over derived partsupp",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    """NOT IN subquery → left-anti join (the excluded-supplier set is a
    filtered dim — broadcast anti-join, no shuffle of the fact side for
    the exclusion). The distinct (part,supp) reduction happens BEFORE
    the part join so the join input is already deduplicated."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#4") & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad_supp), ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


q20_oracle = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END) AS qty_1997
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2
)
SELECT DISTINCT s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_5'
  AND s.s_suppkey IN (SELECT l_suppkey FROM ps WHERE qty_1997 * 2 > total_qty)
"""


@register(
    "q20_promotable_suppliers",
    q20_oracle,
    "TPC-H Q20: nested IN subqueries -> chained semi-joins",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    """Both IN subqueries become left-semi joins: part-name filter
    semi-joins lineitem (fact side never widens), then the qualifying
    supplier set semi-joins the supplier dim. The 1997-vs-total split
    is one conditional aggregation over a single lineitem scan."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_name").startswith("small")).select("p_partkey")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_5")
    in_1997 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    ps = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(dec("l_quantity")).alias("total_qty"),
            F.sum(F.when(in_1997, dec("l_quantity")).otherwise(F.lit(0).cast("decimal(12,2)"))).alias(
                "qty_1997"
            ),
        )
    )
    promotable = ps.filter(F.col("qty_1997") * 2 > F.col("total_qty")).select("l_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(promotable, s.s_suppkey == promotable.l_suppkey, "left_semi")
        .select("s_name")
        .distinct()
    )


q21_oracle = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  JOIN orders o ON o.o_orderkey = l1.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
) w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY 1
"""


@register(
    "q21_waiting_supplier",
    q21_oracle,
    "TPC-H Q21: EXISTS + NOT EXISTS re-expressed as one per-order aggregation",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    """Sole-late-supplier detection. The classic formulation is two
    correlated self-joins of lineitem (EXISTS another supplier / NOT
    EXISTS another LATE supplier) — at 100 TB that's two extra
    shuffles of the biggest fact table. Here the predicate pair
    collapses into ONE pass: reduce to distinct (order, supplier,
    late) pairs, then a window over l_orderkey counts suppliers and
    late suppliers per order in place — a pair "waits" iff it is late,
    n_supp > 1 and n_late == 1. Lineitem is scanned exactly once and
    only the reduced pair set (narrow: two longs + a bit) re-shuffles
    for the window; the oracle keeps the independent EXISTS
    formulation."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf, "supplier")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int")
        .alias("late"),
    )
    pairs = lines.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    w = Window.partitionBy("l_orderkey")
    waiting = (
        pairs.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Round 4: event-analytics battery — gap-filled series (LOCF), ordered
# funnels, cohort retention (operators/timeseries.py).
# ---------------------------------------------------------------------------

gapfill_oracle = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         SUM(CAST(value AS DECIMAL(14,4))) AS total
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds
), grid AS (
  SELECT t.event_type, h.bucket
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN hours h
), j AS (
  SELECT g.event_type, g.bucket, hr.total
  FROM grid g LEFT JOIN hourly hr ON g.event_type = hr.event_type AND g.bucket = hr.bucket
)
SELECT event_type, bucket,
       CAST(ROUND(COALESCE(last_value(total IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket ROWS UNBOUNDED PRECEDING), 0), 2)
            AS DOUBLE) AS value_filled,
       total IS NULL AS was_gap
FROM j
"""


@register(
    "events_gapfill_locf",
    gapfill_oracle,
    "time_bucket_gapfill + locf: dense hourly series, gaps carried forward",
)
def events_gapfill_q(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style gap-filled rollup: the grid is |keys| x |hours|
    (independent of event count) and the LOCF window sorts only the
    bucketed rollup — see operators/timeseries.py."""
    from .operators import timeseries

    ev = load(spark, sf, "events")
    return timeseries.gapfill_locf(ev)


funnel_oracle = """
WITH s0 AS (
  SELECT user_id AS u, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1
), s1 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t1 FROM events e JOIN s0 ON e.user_id = s0.u
  WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY 1
), s2 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM s0) AS n_view,
       (SELECT COUNT(*) FROM s1) AS n_click,
       (SELECT COUNT(*) FROM s2) AS n_purchase
"""


@register(
    "events_funnel",
    funnel_oracle,
    "strictly-ordered view->click->purchase funnel, greedy stage times",
)
def events_funnel_q(spark: SparkSession, sf: str) -> DataFrame:
    """Each stage reduces to one (user, min_ts) row before the next
    join, so stage joins move a row per user, never per event."""
    from .operators import timeseries

    ev = load(spark, sf, "events")
    return timeseries.funnel_counts(ev)


retention_oracle = """
WITH active AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
), first AS (
  SELECT u, MIN(d) AS d0 FROM active GROUP BY 1
), base AS (
  SELECT d0, COUNT(*) AS n_users FROM first GROUP BY 1
), r7 AS (
  SELECT f.d0, COUNT(*) AS n FROM first f JOIN active a ON a.u = f.u AND a.d = f.d0 + 7
  GROUP BY 1
), r14 AS (
  SELECT f.d0, COUNT(*) AS n FROM first f JOIN active a ON a.u = f.u AND a.d = f.d0 + 14
  GROUP BY 1
)
SELECT CAST(base.d0 AS TIMESTAMP) AS cohort_day, base.n_users,
       CAST(COALESCE(r7.n, 0) AS BIGINT) AS n_day7,
       CAST(COALESCE(r14.n, 0) AS BIGINT) AS n_day14
FROM base LEFT JOIN r7 ON base.d0 = r7.d0 LEFT JOIN r14 ON base.d0 = r14.d0
"""


@register(
    "events_retention",
    retention_oracle,
    "cohort retention at day 7/14 via exact-day equi-joins",
)
def events_retention_q(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import timeseries

    ev = load(spark, sf, "events")
    return timeseries.retention_cohorts(ev)


# -- Python UDTF surface (Spark's remaining Python-extension API) -----------

chunk_oracle = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents
), c AS (
  SELECT doc_id, ws,
         unnest(range(CAST(ceil(len(ws) / 32.0) AS BIGINT))) AS chunk_idx
  FROM w
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(least(32, len(ws) - chunk_idx * 32) AS BIGINT) AS n_words,
       ws[chunk_idx * 32 + 1] AS first_word
FROM c
"""


@register(
    "text_chunk_udtf",
    chunk_oracle,
    "Python UDTF + LATERAL join: fixed 32-word context-window chunking",
)
def text_chunk_udtf_q(spark: SparkSession, sf: str) -> DataFrame:
    """Covers the one Python extension API the registry didn't yet
    exercise: a UDTF expanded through a SQL LATERAL join (udf /
    pandas_udf / applyInPandas / mapInPandas / grouped-agg UDAF are
    all gated elsewhere). Row-at-a-time Python by design of the API —
    the hot-path equivalents (vocab_top_tokens, corpus_pack_sequences)
    stay codegen; this gate pins the API's correctness, not its speed.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_words bigint, first_word string")
    class ChunkText:
        def eval(self, text: str):
            words = (text or "").split()
            for i in range(0, len(words), 32):
                chunk = words[i : i + 32]
                yield i // 32, len(chunk), chunk[0]

    spark.udtf.register("ig_chunk_text", ChunkText)
    load(spark, sf, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_words, c.first_word
        FROM _udtf_docs d, LATERAL ig_chunk_text(d.text) c
        """
    )


anomaly_oracle = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         SUM(CAST(value AS DECIMAL(14,4))) AS total_dec
  FROM events GROUP BY 1, 2
), stats AS (
  -- mu/sigma from EXACT decimal sums (order-independent), then the
  -- same IEEE double formula as the Spark side: bit-identical
  SELECT event_type, bucket, CAST(total_dec AS DOUBLE) AS total,
         CAST(SUM(total_dec) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(CAST(total_dec AS DECIMAL(18,4)) * CAST(total_dec AS DECIMAL(18,4)) AS DECIMAL(38,8))) OVER w AS DOUBLE) AS ss,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n
  FROM hourly
  WINDOW w AS (PARTITION BY event_type)
), z AS (
  SELECT event_type, bucket, total,
         s / n AS mu, sqrt((ss - s * s / n) / n) AS sigma
  FROM stats
)
SELECT event_type, bucket, ROUND(total, 2) AS total,
       ROUND((total - mu) / sigma, 4) AS z
FROM z
WHERE sigma > 0 AND abs(total - mu) > 3.0 * sigma
"""


@register(
    "events_anomalies",
    anomaly_oracle,
    "z-score hourly anomaly flags per event type",
)
def events_anomalies_q(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key hourly totals more than 3 population-sigma from the
    key's mean; the window runs over the bucketed rollup, never the
    raw events (operators/timeseries.py:hourly_anomalies)."""
    from .operators import timeseries

    ev = load(spark, sf, "events")
    return timeseries.hourly_anomalies(ev)


events_topk_oracle = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, event_type) AS rnk
  FROM c
)
SELECT bucket, event_type, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
"""


@register(
    "events_windowed_topk",
    events_topk_oracle,
    "exact per-hour heavy hitters: top-3 event types by count",
)
def events_windowed_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed heavy hitters, exactly: one partial-aggregated rollup to
    (hour, type, n) — the window ranks the ROLLUP (|hours|x|types|
    rows), never the events — then rank <= 3 with deterministic
    tie-break. The approximate-sketch version (count-min) is pointless
    below billions of distinct keys; the exact plan's shuffle is the
    rollup's, which partial aggregation collapses map-side."""
    ev = load(spark, sf, "events")
    c = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W_

    w = W_.partitionBy("bucket").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("bucket", "event_type", "n", "rnk")
    )


# ----------------------------------------------------- range joins (r9)

interval_campaigns_oracle = """
WITH t0 AS (SELECT MIN(epoch(ts)) AS t0 FROM events),
camp AS (
    SELECT r.range AS campaign_id,
           t0.t0 + r.range * 7200 AS start_s,
           t0.t0 + r.range * 7200 + ((r.range % 5) + 1) * 3600 AS end_s
    FROM range(50) r, t0
)
SELECT c.campaign_id,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM camp c
JOIN events e ON epoch(e.ts) >= c.start_s AND epoch(e.ts) < c.end_s
GROUP BY c.campaign_id
"""


@register(
    "interval_join_campaigns",
    interval_campaigns_oracle,
    "point-in-interval range join via bucketized equi-join (no BNLJ)",
)
def interval_join_campaigns(spark: SparkSession, sf: str) -> DataFrame:
    """50 synthetic overlapping campaign windows (2h stride, 1-5h
    length) joined to every event whose ts falls inside — the raw
    inequality join Catalyst would run as BroadcastNestedLoop,
    re-expressed as explode-to-buckets + hash join. Bucket width 1h ≈
    the typical interval, so the interval side inflates ≤5×.
    Plan pin: tests/test_plans.py asserts no BNLJ/cartesian."""
    ev = load(spark, sf, "events").select(
        F.col("ts").cast("double").alias("ts_s"), "value"
    )
    t0 = ev.agg(F.min("ts_s").alias("t0"))
    camp = (
        spark.range(50)
        .withColumnRenamed("id", "campaign_id")
        .join(F.broadcast(t0))
        .select(
            "campaign_id",
            (F.col("t0") + F.col("campaign_id") * 7200).alias("start_s"),
            (
                F.col("t0")
                + F.col("campaign_id") * 7200
                + ((F.col("campaign_id") % 5) + 1) * 3600
            ).alias("end_s"),
        )
    )
    from .operators.interval import point_interval_join

    joined = point_interval_join(
        ev, camp, "ts_s", "start_s", "end_s", bucket_width=3600.0
    )
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


overlap_cohorts_oracle = """
WITH spans AS (
    SELECT user_id, user_id % 32 AS cohort,
           MIN(epoch(ts)) AS start_s, MAX(epoch(ts)) AS end_s
    FROM events GROUP BY user_id
)
SELECT a.cohort,
       COUNT(*) AS n_pairs,
       CAST(ROUND(SUM(CAST(
           LEAST(a.end_s, b.end_s) - GREATEST(a.start_s, b.start_s)
           AS DECIMAL(18,6))), 2) AS DOUBLE) AS overlap_s
FROM spans a
JOIN spans b
  ON a.cohort = b.cohort AND a.user_id < b.user_id
 AND a.start_s < b.end_s AND b.start_s < a.end_s
GROUP BY a.cohort
"""


@register(
    "interval_overlap_cohorts",
    overlap_cohorts_oracle,
    "interval-overlap self-join, exactly-once via first-shared-bucket rule",
)
def interval_overlap_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user activity spans [min ts, max ts) self-joined for
    overlapping pairs within a cohort. Each pair meets in every shared
    week-bucket; only the bucket holding greatest(start) survives, so
    the result is exactly-once WITHOUT a distinct — at 100 TB the
    distinct would be a second full shuffle of the pair set."""
    from .operators.interval import interval_overlap_join

    ev = load(spark, sf, "events")
    spans = ev.groupBy("user_id").agg(
        (F.col("user_id") % 32).alias("cohort"),
        F.min(F.col("ts").cast("double")).alias("start_s"),
        F.max(F.col("ts").cast("double")).alias("end_s"),
    )
    left = spans.select(
        F.col("user_id").alias("u1"),
        "cohort",
        F.col("start_s").alias("s1"),
        F.col("end_s").alias("e1"),
    )
    right = spans.select(
        F.col("user_id").alias("u2"),
        "cohort",
        F.col("start_s").alias("s2"),
        F.col("end_s").alias("e2"),
    )
    pairs = interval_overlap_join(
        left,
        right,
        ("s1", "e1"),
        ("s2", "e2"),
        bucket_width=7 * 86400.0,
        on=["cohort"],
        antisymmetric_key=("u1", "u2"),
    )
    return pairs.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(
                (F.least("e1", "e2") - F.greatest("s1", "s2")).cast("decimal(18,6)")
            ),
            2,
        )
        .cast("double")
        .alias("overlap_s"),
    )


# ------------------------------------------------ profiling + drift (r9)

profile_oracle = """
SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_custkey) AS n_nulls,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_value,
       ROUND(AVG(o_custkey), 4) AS mean
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR),
       ROUND(AVG(o_totalprice), 4)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR),
       NULL
FROM orders
"""


@register(
    "profile_columns_exact",
    profile_oracle,
    "one-job column profiler: nulls/distinct/min/max/mean per column",
)
def profile_columns_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact mode (count-distinct via EXPAND, one shuffle); the 100 TB
    default is mode='approx' (HLL++, fully map-combinable) — pinned
    against exact within rsd in tests/test_profile.py."""
    from .operators.profile import profile_columns

    df = load(spark, sf, "orders")
    p = profile_columns(
        df, ["o_custkey", "o_totalprice", "o_orderpriority"], mode="exact"
    )
    return p.select(
        F.col("column").alias("col_name"),
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        "mean",
    )


drift_oracle = """
WITH ref AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
             WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
cur AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ref),
rb AS (SELECT event_type,
              CAST(LEAST(GREATEST(FLOOR((v - lo) / ((hi - lo) / 20.0)), 0), 19) AS INT) AS bin,
              COUNT(*) AS n_ref
       FROM ref, b GROUP BY 1, 2),
cb AS (SELECT event_type,
              CAST(LEAST(GREATEST(FLOOR((v - lo) / ((hi - lo) / 20.0)), 0), 19) AS INT) AS bin,
              COUNT(*) AS n_cur
       FROM cur, b GROUP BY 1, 2),
m AS (SELECT event_type, bin,
             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
      FROM rb FULL OUTER JOIN cb USING (event_type, bin)),
t AS (SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
      FROM m GROUP BY 1)
SELECT m.event_type,
       ROUND(SUM(((n_cur + 0.5) / (t_cur + 10.0) - (n_ref + 0.5) / (t_ref + 10.0))
                 * LN(((n_cur + 0.5) / (t_cur + 10.0))
                      / ((n_ref + 0.5) / (t_ref + 10.0)))), 4) AS psi,
       CAST(SUM(n_ref) AS BIGINT) AS n_ref,
       CAST(SUM(n_cur) AS BIGINT) AS n_cur
FROM m JOIN t USING (event_type)
GROUP BY m.event_type
"""


@register(
    "events_drift_psi",
    drift_oracle,
    "PSI drift per event_type: first vs second half-month, ref-anchored bins",
)
def events_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of `value` per event_type between the
    first 15 days (reference) and the rest (current). Bin edges come
    from the REFERENCE min/max and use only IEEE-exact ops, so DuckDB
    reproduces the binning bit-for-bit; only the final 20-term PSI fold
    touches a transcendental (ln), rounded to 4 decimals."""
    from .operators.profile import drift_psi

    ev = load(spark, sf, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = ev.filter(F.col("ts") < cutoff).select("event_type", "value")
    cur = ev.filter(F.col("ts") >= cutoff).select("event_type", "value")
    return drift_psi(ref, cur, "value", group_cols=["event_type"])


# --------------------------------------------------- fuzzy joins (r9)

_CORRUPT_SQL = """
SELECT p_partkey,
       SUBSTR(p_name, 1, CAST(p_partkey % LENGTH(p_name) AS INT)) ||
       SUBSTR(p_name, CAST(p_partkey % LENGTH(p_name) AS INT) + 2) AS cname
FROM part
"""

fuzzy_match_oracle = f"""
WITH corrupted AS ({_CORRUPT_SQL}),
canon AS (SELECT DISTINCT p_name FROM part)
SELECT c.p_name, COUNT(*) AS n_matched
FROM corrupted x JOIN canon c ON levenshtein(x.cname, c.p_name) <= 1
GROUP BY c.p_name
"""


def _corrupted_names(spark: SparkSession, sf: str) -> DataFrame:
    """Each part's name with ONE char deleted at a key-derived position
    — a deterministic misspelling generator both engines replay."""
    return load(spark, sf, "part").select(
        "p_partkey",
        F.expr(
            "substring(p_name, 1, cast(p_partkey % length(p_name) as int)) || "
            "substring(p_name, cast(p_partkey % length(p_name) as int) + 2)"
        ).alias("cname"),
    )


@register(
    "fuzzy_match_partnames",
    fuzzy_match_oracle,
    "edit-distance join misspelled -> canonical names via q-gram index",
)
def fuzzy_match_partnames(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution: 1-char-deleted part names matched back to the
    canonical vocabulary at levenshtein <= 1. No cartesian product —
    candidates come from a q-gram inverted index over DISTINCT strings
    (vocabulary-scale), verified with JVM levenshtein. The oracle IS
    the naive all-pairs join, so the gate proves recall 1.0."""
    from .operators.linkage import fuzzy_join

    corrupted = _corrupted_names(spark, sf)
    canon = load(spark, sf, "part").select("p_name").distinct()
    m = fuzzy_join(corrupted, canon, "cname", "p_name", max_distance=1, q=2)
    return m.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_matched"))


fuzzy_pairs_oracle = """
WITH canon AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS value_a, b.p_name AS value_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
FROM canon a JOIN canon b
  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 2
"""


@register(
    "fuzzy_name_pairs",
    fuzzy_pairs_oracle,
    "near-duplicate name report: self fuzzy-pairs at distance <= 2",
)
def fuzzy_name_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.linkage import fuzzy_self_pairs

    p = load(spark, sf, "part")
    pairs = fuzzy_self_pairs(p, "p_name", max_distance=2, q=2)
    return pairs.select(
        "value_a", "value_b", F.col("distance").cast("bigint").alias("distance")
    )


# ------------------------------------------------------- pagerank (r9)


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """Unrolled power-iteration CTE chain — DuckDB replays the exact
    fixpoint loop the Spark operator runs, iteration by iteration."""
    head = f"""
WITH edges AS (
    SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""
    blocks = []
    for i in range(1, iterations + 1):
        p = f"r{i-1}"
        blocks.append(f""",
dang{i} AS (
    SELECT COALESCE(SUM(r.rank), 0) AS mass
    FROM {p} r LEFT JOIN outdeg o ON r.node = o.src
    WHERE o.src IS NULL
),
c{i} AS (
    SELECT e.dst AS node, SUM(r.rank / o.deg) AS contrib
    FROM edges e JOIN {p} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
),
r{i} AS (
    SELECT nd.node,
           (1 - {damping}) / nn.n
           + {damping} * (COALESCE(c.contrib, 0) + d.mass / nn.n) AS rank
    FROM nodes nd
    CROSS JOIN nn CROSS JOIN dang{i} d
    LEFT JOIN c{i} c ON nd.node = c.node
)""")
    return (
        head
        + "".join(blocks)
        + f"""
SELECT node, ROUND(rank, 6) AS rank FROM r{iterations}"""
    )


@register(
    "graph_pagerank",
    _pagerank_oracle(),
    "3-iteration PageRank over the customer->supplier purchase graph",
)
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Iterative-algorithm family: per-iteration persist/replace keeps
    lineage O(1); dangling supplier mass redistributes uniformly so
    total rank stays 1 (pytest-pinned). The oracle unrolls the same
    power iteration as a CTE chain."""
    from .operators.graph import pagerank

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return pr.select("node", F.round("rank", 6).alias("rank"))


# ------------------------------------------- hard-negative mining (r9)

hard_neg_oracle = """
WITH c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM c WHERE vec_id < 16
), scored AS (
  SELECT q.query_id, c.vec_id, c.label AS negative_label,
         ROUND(list_dot_product(c.v, q.qv)
               / (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
  FROM c JOIN q ON c.vec_id <> q.query_id AND c.label <> q.qlabel
), ranked AS (
  SELECT query_id, vec_id, negative_label, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, negative_label, cosine_sim, rank
FROM ranked WHERE rank <= 3
"""


@register(
    "sim_hard_negatives",
    hard_neg_oracle,
    "contrastive hard-negative mining: top-k nearest with a DIFFERENT label",
)
def sim_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """The contrastive-training miner: nearest neighbors that the label
    says are wrong — the examples a contrastive loss learns most from.
    Same broadcast + codegen-HOF plan as sim_topk_bruteforce with the
    label inequality pushed into the join."""
    from .operators.similarity import hard_negatives

    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return hard_negatives(emb, q, k=3)


# ------------------------------------------- centroid drift (r9)

centroid_drift_oracle = """
WITH flat AS (
  SELECT label, vec_id % 2 AS half,
         UNNEST(embedding) AS v,
         UNNEST(range(len(embedding))) AS i
  FROM embeddings
), cent AS (
  SELECT label, half, i, AVG(CAST(v AS DOUBLE)) AS c
  FROM flat GROUP BY label, half, i
), paired AS (
  SELECT a.label,
         SUM(a.c * b.c) AS dot,
         SUM(a.c * a.c) AS na,
         SUM(b.c * b.c) AS nb
  FROM cent a JOIN cent b ON a.label = b.label AND a.i = b.i
  WHERE a.half = 0 AND b.half = 1
  GROUP BY a.label
), counts AS (
  SELECT label,
         CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM embeddings GROUP BY label
)
SELECT p.label, c.n_ref, c.n_cur,
       ROUND(p.dot / (sqrt(p.na) * sqrt(p.nb)), 6) AS centroid_cosine
FROM paired p JOIN counts c ON p.label = c.label
"""


@register(
    "sim_centroid_drift",
    centroid_drift_oracle,
    "per-label centroid cosine between two corpus halves (drift monitor)",
)
def sim_centroid_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding drift: cosine between each label's centroid in the
    even-id half (reference) vs the odd-id half (current). Two grouped
    Arrow centroid passes + a label-sized join — nothing pairwise."""
    from .operators.similarity import centroid_drift

    emb = load(spark, sf, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return centroid_drift(ref, cur)


# ------------------------------------------- corpus token budget (r9)

token_budget_oracle = """
WITH t AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
           AS n_tok
  FROM documents
), tot AS (SELECT SUM(n_tok) AS w FROM t)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       ROUND(SUM(n_tok) / tot.w, 6) AS token_share
FROM t CROSS JOIN tot
GROUP BY lang, tot.w
"""


@register(
    "corpus_token_budget",
    token_budget_oracle,
    "token budget per language: the mixture report temperature-mix consumes",
)
def corpus_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """One partial-aggregated pass + a 1-row broadcast for the share
    denominator — the per-source/per-language budget sheet every
    mixture decision starts from (pairs with corpus_temperature_mix,
    which reweights exactly these shares)."""
    from .operators import text as T

    docs = load(spark, sf, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("w"))
    return per.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("w"), 6).alias("token_share"),
    )
