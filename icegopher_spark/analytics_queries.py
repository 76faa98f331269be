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
  SELECT AVG(CAST(c_acctbal AS DECIMAL(12,2))) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer c, cust_avg
WHERE c.c_acctbal > cust_avg.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY 1
"""


@register("q22_global_sales_opportunity", q22_oracle, "NOT EXISTS -> left-anti join")
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg(dec("c_acctbal")).alias("ab")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
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
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
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
