"""Relational operator queries (SURVEY.md §2.B–§2.G).

Every query pairs an idiomatic-PySpark plan with a DuckDB oracle.
Conventions that make the driver's exact value-hash comparison pass:

- money/fixed-point doubles aggregate via exact integer units
  (``functions.fixed_units`` — see its docstring);
- Spark int-typed outputs (``size``/``row_number``/``datediff``…) are
  cast to long where the DuckDB equivalent is BIGINT, and vice versa;
- every computed column is aliased identically on both sides;
- window orderings always carry a unique tiebreak column.

Scale notes are on each query: joins broadcast their dimension side
(part/customer/supplier/nation/region stay orders of magnitude smaller
than the fact tables at any sf), aggregations are all map-side
combinable, and filters/projections sit directly over the parquet scan
so Catalyst pushes them into the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import epoch_ms, fixed_units, revenue_units
from .registry import register

# ---------------------------------------------------------------------------
# §2.B — projection / filter / scalar expressions
# ---------------------------------------------------------------------------


@register(
    "b03_projection_flatten",
    oracle="""
    SELECT o_orderkey AS id, o_custkey AS customer_id, o_orderstatus AS status,
           CAST(o_orderkey AS VARCHAR) AS key_str, 'orders' AS source
    FROM orders
    """,
)
def b03_projection_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct pack → flatten (B3), cast (B1), literal (B6), withColumn (B7),
    alias (B8) — the projection surface of cdc_processor.py:75-98.
    Pure narrow ops: no shuffle, whole-stage codegen over the scan."""
    orders = load_table(spark, sf_dir, "orders")
    packed = orders.select(
        F.struct("o_orderkey", "o_custkey", "o_orderstatus").alias("o")
    )
    return (
        packed.select("o.*")
        .withColumn("key_str", F.col("o_orderkey").cast("string"))
        .withColumn("source", F.lit("orders"))
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderstatus").alias("status"),
            "key_str",
            "source",
        )
    )


@register(
    "b04_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE WHEN o_orderstatus = 'F' THEN -1 ELSE 1 END AS sign
    FROM orders
    """,
)
def b04_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN routing — the op='d' → before/sign branch of
    cdc_processor.py:85-93 expressed over the fixture."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", F.lit(-1)).otherwise(F.lit(1)).alias("sign"),
    )


@register(
    "b09_filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def b09_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter (WHERE status = …, data-generator/main.py:149).
    The predicate and 4-column projection push into the parquet scan
    (PushedFilters + pruned ReadSchema — verified in tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "b10_hash_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 10
    """,
)
def b10_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random sample — ORDER BY RANDOM() LIMIT n
    (data-generator/main.py:95) made reproducible by hashing the key
    (md5 agrees across engines, unlike rand()).  At scale this is a
    total-order sort only of the top-k via Spark's TakeOrdered."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.C — aggregations
# ---------------------------------------------------------------------------


@register(
    "c01_global_sum",
    oracle="""
    SELECT SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS total_revenue
    FROM lineitem
    """,
)
def c01_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total sum, no grouping keys — daily_report.py:17 parity.
    Partial-aggregates map-side; one row crosses the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg((F.sum(revenue_units()) / F.lit(10000.0)).alias("total_revenue"))


@register("c02_count_star", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def c02_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) existence gate (data-generator/main.py:38-39)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "c03_order_totals",
    oracle="""
    SELECT l_orderkey,
           SUM(CAST(round(p_retailprice*100) AS BIGINT) * CAST(l_quantity AS BIGINT)) / 100.0
               AS order_total
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey
    """,
)
def c03_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational form of the generator's imperative basket total
    (total_amount += price*quantity, data-generator/main.py:111-119).
    `part` is broadcast — the fact side never shuffles for the join;
    the groupBy is the single unavoidable shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            (
                F.sum(fixed_units("p_retailprice") * F.col("l_quantity").cast("long"))
                / F.lit(100.0)
            ).alias("order_total")
        )
    )


@register(
    "c05_daily_revenue",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS daily_revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def c05_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily revenue report the reference's Airflow DAG exists to
    produce (dags/trigger_spark_job.py:13, SURVEY §2 C5)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.to_date("o_orderdate").alias("order_day")).agg(
        (F.sum(fixed_units("o_totalprice")) / F.lit(100.0)).alias("daily_revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "c06_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS sum_disc_price,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))
               * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1000000.0 AS sum_charge,
           AVG(l_quantity) AS avg_qty,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_price,
           SUM(CAST(round(l_discount*100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def c06_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-aggregate groupBy with
    sum/avg/count over derived expressions.  Date predicate pushes to
    the scan; 6 groups total so the final exchange is negligible —
    the classic map-side-combine aggregation shape that scales linearly."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(fixed_units("l_extendedprice")) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(revenue_units()) / F.lit(10000.0)).alias("sum_disc_price"),
            (
                F.sum(revenue_units() * (F.lit(100) + fixed_units("l_tax")))
                / F.lit(1000000.0)
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            (
                F.sum(fixed_units("l_extendedprice")) / F.lit(100.0) / F.count(F.lit(1))
            ).alias("avg_price"),
            (F.sum(fixed_units("l_discount")) / F.lit(100.0) / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "c07_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def c07_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase under the hood).
    At 100 TB prefer approx_count_distinct (HLL, no expand) — exposed
    as c07b with a rows-only check since HLL estimates are engine-specific."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("c07b_approx_count_distinct", oracle=None)
def c07b_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for cardinality
    (mergeable sketch, no expand, fixed memory per group).  No SQL oracle
    (estimator internals are engine-specific); invariant-tested instead."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers")
    )


@register(
    "c08_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def c08_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total in one pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"),
    )


@register(
    "c08b_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def c08b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# §2.D — joins
# ---------------------------------------------------------------------------


@register(
    "d1_join_inner_fk",
    oracle="""
    SELECT c_mktsegment,
           SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS segment_revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def d1_join_inner_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi inner join orders ⋈ customers (init-db.sql:28).
    customer is the broadcast side: at sf0.1 it's 15k rows and even at
    100 TB a customer dim is GBs vs the fact's TBs — if it ever outgrows
    the broadcast threshold, AQE falls back to sort-merge on the FK."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            (F.sum(fixed_units("o_totalprice")) / F.lit(100.0)).alias("segment_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "d2_d3_join_three_way",
    oracle="""
    SELECT p_brand, o_orderstatus,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
           SUM(l_quantity) AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part   ON l_partkey = p_partkey
    WHERE p_type IN ('PROMO', 'ECONOMY')
    GROUP BY p_brand, o_orderstatus
    """,
)
def d2_d3_join_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order_items ⋈ orders ⋈ products (init-db.sql:36-37) — the
    fact-to-fact join shuffles both sides on l_orderkey (sort-merge /
    AQE's choice); the part dim is broadcast and its p_type filter is
    applied before broadcast so only matching parts ship to executors."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type").isin("PROMO", "ECONOMY"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "o_orderstatus")
        .agg(
            (F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"),
            F.sum("l_quantity").alias("total_qty"),
        )
    )


@register(
    "d4_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0, 0.0) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def d4_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (and NULL
    total_amount rows, init-db.sql:31 / main.py:103-128)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(fixed_units("o_totalprice")) / F.lit(100.0), F.lit(0.0)
            ).alias("total_spend"),
        )
    )


@register(
    "d5a_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def d5a_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 open order.  Semi joins ship
    only the join key of the right side — at scale, far cheaper than
    inner-join + distinct."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "d5b_join_anti",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def d5b_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: products never ordered."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@register(
    "d6_join_star_snowflake",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           SUM(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def d6_join_star_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join chain fact→dim→dim→dim, all dims broadcast —
    zero shuffles until the final (tiny) aggregation exchange."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg((F.sum(fixed_units("o_totalprice")) / F.lit(100.0)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# §2.E — window functions
# ---------------------------------------------------------------------------


@register(
    "e2a_window_topn",
    oracle="""
    SELECT p_brand, p_partkey, part_revenue, rnk FROM (
      SELECT p_brand, p_partkey, part_revenue,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY part_revenue DESC, p_partkey) AS BIGINT) AS rnk
      FROM (
        SELECT p_brand, p_partkey,
               SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS part_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      )
    ) WHERE rnk <= 3
    """,
)
def e2a_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand (E2 ranking).  Partitioned
    window after a pre-aggregation, so the window input is |parts| rows,
    not |lineitem| — the shape that survives 100×."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg((F.sum(revenue_units()) / F.lit(10000.0)).alias("part_revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("part_revenue").desc(), "p_partkey")
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "part_revenue", "rnk")
    )


@register(
    "e2b_window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey) AS DATE),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def e2b_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days between a customer's consecutive orders."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w)))
        .cast("long")
        .alias("days_since_prev"),
    )


@register(
    "e2c_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(round(o_totalprice*100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_spend
    FROM orders
    """,
)
def e2c_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (frame-bounded window aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(fixed_units("o_totalprice")).over(w) / F.lit(100.0)).alias("cum_spend"),
    )


# ---------------------------------------------------------------------------
# §2.F — sorts / limits / set ops
# ---------------------------------------------------------------------------


@register(
    "f1_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def f1_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by value.  Spark executes as TakeOrderedAndProject
    (per-partition top-k + driver merge) — no global sort materialized."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "f3a_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    """,
)
def f3a_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = customer.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey"))
    return a.union(b).distinct()


@register(
    "f3b_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def f3b_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both finished and open orders."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "f3c_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def f3c_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who never ordered (set-op form of d5b)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.select(F.col("c_custkey").alias("custkey"))
    b = orders.select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# §2.G — scalar function surface
# ---------------------------------------------------------------------------


@register(
    "g1_string_scalars",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           concat_ws('-', p_brand, p_type) AS brand_type,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substring(p_name, 1, 5) AS name_prefix,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           abs(p_size - 25) AS size_dev
    FROM part
    """,
)
def g1_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/number scalar surface (§2.G: concat, length, round-family,
    abs) — all codegen built-ins, no UDFs."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.floor("p_retailprice").alias("price_floor"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
    )


@register(
    "g2_date_scalars",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
               AS days_to_ref,
           CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
)
def g2_date_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (§2.G: to_date, date_trunc, datediff,
    date_add, year/month/day — implied by the daily report C5)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_dom"),
        F.trunc(F.to_date("o_orderdate"), "month").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_ref"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
    )


@register(
    "g3_string_match",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE regexp_matches(p_name, '^(blue|green)\\s') OR p_type LIKE '%PROMO%'
    """,
)
def g3_string_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regexp predicates (string-match filter surface)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").rlike(r"^(blue|green)\s") | F.col("p_type").like("%PROMO%")
    ).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# Flagship (entry() smoke query)
# ---------------------------------------------------------------------------


@register(
    "flagship_revenue_report",
    oracle="""
    SELECT o_orderstatus AS status,
           date_trunc('month', o_orderdate) AS order_month,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
           SUM(l_quantity) AS total_qty,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus, date_trunc('month', o_orderdate)
    """,
)
def flagship_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's daily-revenue purpose generalized —
    monthly revenue by order status over the order_items⋈orders join
    (daily_report.py + C5 + D2 in one plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.trunc(F.to_date("o_orderdate"), "month").alias("order_month"),
        )
        .agg(
            (F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"),
            F.sum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# §2.C/§2.E/§2.G breadth: percentiles, conditional aggs, scalar subquery,
# pivot, frame windows, date arithmetic
# ---------------------------------------------------------------------------


@register(
    "c09_median_percentile",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def c09_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / continuous percentile per group.  Spark's median() and
    percentile() are exact (full sort per group inside the aggregate) —
    same interpolation rule as DuckDB's quantile_cont.  Quantities are
    small integers stored as double, so interpolated midpoints (x.5) are
    exactly representable and hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
    )


@register(
    "c10_conditional_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           SUM(CASE WHEN o_totalprice > 200000
                    THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END)
             / 100.0 AS big_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def c10_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (COUNT FILTER, SUM CASE) — one
    scan, one map-side-combinable aggregate; no self-joins for
    multi-predicate reports."""
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(big).alias("n_big"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        (
            F.sum(F.when(big, fixed_units("o_totalprice", 2)).otherwise(F.lit(0)))
            / F.lit(100.0)
        ).alias("big_total"),
    )


@register(
    "d7_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice FROM part
    WHERE p_retailprice > 1.2 * (
      SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand
    )
    """,
)
def d7_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (price > 1.2× brand average), planned
    as a window average over the brand partition — one shuffle on brand
    instead of the naive per-row subquery re-execution; equivalent to
    the de-correlated aggregate+rejoin Catalyst would produce."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > 1.2 * F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


@register(
    "c11_pivot_status_year",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           SUM(CASE WHEN o_orderstatus='O'
               THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) / 100.0 AS o_total,
           SUM(CASE WHEN o_orderstatus='F'
               THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) / 100.0 AS f_total,
           SUM(CASE WHEN o_orderstatus='P'
               THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) / 100.0 AS p_total
    FROM orders GROUP BY 1
    """,
)
def c11_pivot_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status → columns) per order year.  The pivot values are
    declared explicitly so Spark skips the extra distinct-values job and
    plans a single aggregate — the way to pivot at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(fixed_units("o_totalprice", 2)) / F.lit(100.0))
        .select(
            "order_year",
            F.col("O").alias("o_total"),
            F.col("F").alias("f_total"),
            F.col("P").alias("p_total"),
        )
    )


@register(
    "e2f_moving_window_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_4,
           CAST(COUNT(*) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_4
    FROM lineitem
    """,
)
def e2f_moving_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (moving 4-row sum/count per supplier) — the
    bounded-frame window surface.  Fully ordered by a unique key triple
    so frames are deterministic; one shuffle on l_suppkey."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("long")).over(w).alias("qty_4"),
        F.count(F.lit(1)).over(w).alias("n_4"),
    )


@register(
    "g4_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month_n,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_95
    FROM orders
    """,
)
def g4_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (§2.G: to_date, year/month, last_day,
    date_add, datediff) — all codegen scalar exprs over the scan."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month_n"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
    )


@register(
    "c12_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def c12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond rollup/cube) with grouping_id
    disambiguation — via the SQL entry path over a registered view,
    showing both API surfaces hit the same Catalyst plan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS n,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                 AS gid
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped classics (adapted to the fixture's column subset): the
# recognizable multi-join analytic patterns a warehouse engine must plan
# well — selective filters on both join sides, grouped revenue, top-n.
# ---------------------------------------------------------------------------


@register(
    "d8_tpch_q3_shape",
    oracle="""
    SELECT l_orderkey,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
)
def d8_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective filters on all
    three tables push into their scans; customer broadcasts; top-10 via
    TakeOrdered (no full sort).  Unique tiebreaks make the limit
    deterministic."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "d9_tpch_q5_shape",
    oracle="""
    SELECT n_name,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def d9_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-table join where
    every dimension broadcasts and only lineitem streams; the
    same-nation predicate rides the supplier join condition."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "d10_tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def d10_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): returnflag filter
    pushes into the lineitem scan, quarter filter into orders; top-20
    customers by lost revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "c13_tpch_q6_shape",
    oracle="""
    SELECT SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * CAST(round(l_discount*100) AS BIGINT)) / 10000.0 AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def c13_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure scan-side
    computation — every predicate pushes into the parquet reader, the
    aggregate is a single partial+final sum, no join, no wide shuffle.
    The canonical 'is your scan path fast' query."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (
            F.sum(fixed_units("l_extendedprice", 2) * fixed_units("l_discount", 2))
            / F.lit(10000.0)
        ).alias("revenue_delta")
    )


@register(
    "c14_tpch_q14_shape",
    oracle="""
    SELECT 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%%'
                            THEN CAST(round(l_extendedprice*100) AS BIGINT)
                                 * (100 - CAST(round(l_discount*100) AS BIGINT))
                            ELSE 0 END)
           / SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def c14_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): month filter pushes into the
    lineitem scan, part broadcasts, one conditional-ratio aggregate.
    Integer-unit revenue keeps the ratio bit-exact across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = revenue_units()
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).alias("promo_share")
        )
    )


@register(
    "d11_tpch_q19_shape",
    oracle="""
    SELECT SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def d11_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    the join carries an OR-of-ANDs residual condition spanning both
    sides — the planner must still broadcast the dim and keep the
    disjunction as a post-join filter rather than falling back to a
    cartesian product."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
        | ((b == "Brand#2") & q.between(10, 20) & sz.between(1, 10))
        | ((b == "Brand#3") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            (F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "d12_tpch_q7_shape",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def d12_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between a nation pair): the same
    dimension table joins TWICE under different aliases (supplier's
    nation vs customer's nation) — both broadcast — with an OR-of-ANDs
    pair predicate that must stay a post-join residual, not degrade the
    joins.  Lineitem streams once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(revenue_units()) / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "d13_tpch_q13_shape",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def d13_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with an extra ON-clause predicate (which must filter the right
    side BEFORE the join, never drop unmatched customers), COUNT of a
    nullable column, then a second aggregation over the first's result —
    the distribution-of-counts double-agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "d14_tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def d14_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS with
    a non-equi residual (shipped >60 days after ordering) compiles to a
    LEFT SEMI join — each order counted once no matter how many
    lineitems qualify."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "d15_tpch_q18_shape",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 260
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def d15_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING over a grouped
    sum (integer quantity units — exact), the qualifying-keys set joined
    back to the fact+dim side, deterministic top-100.  The aggregate
    runs BEFORE the joins, so only qualifying orders shuffle onward."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 260)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "d16_tpch_q22_shape",
    oracle="""
    WITH s AS (
      SELECT SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS su, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           COUNT(*) AS n_cust,
           SUM(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM customer
    CROSS JOIN s
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(round(c_acctbal*100) AS BIGINT) * s.cnt > s.su
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
)
def d16_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar aggregate
    threshold (above-average balance — compared in exact integer units,
    ``bal_units * cnt > sum_units``, so no double-ulp boundary flip),
    NOT EXISTS as a LEFT ANTI join against recent orders, grouped
    rollup by nation.  The 1-row aggregate broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(fixed_units("c_acctbal")).alias("__su"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(fixed_units("c_acctbal") * F.col("__cnt") > F.col("__su"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(fixed_units("c_acctbal")) / F.lit(100.0)).alias("total_acctbal"),
        )
    )


@register(
    "c15_tpch_q17_shape",
    oracle="""
    WITH li AS (
      SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice*100) AS BIGINT) AS ep
      FROM lineitem
    ), agg AS (
      SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS cnt FROM li GROUP BY l_partkey
    )
    SELECT SUM(li.ep) / 700.0 AS avg_yearly
    FROM li JOIN agg USING (l_partkey)
            JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND li.q * 5 * agg.cnt < agg.sq
    """,
)
def c15_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated
    per-group average subquery (quantity < 20% of the part's average)
    becomes an aggregate-then-self-join; the 20%-of-average comparison
    is integer-exact (``q*5*cnt < sum``) so both engines agree at the
    boundary.  Part is broadcast; the per-part aggregate reuses the
    lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("q"),
        fixed_units("l_extendedprice").alias("ep"),
    )
    agg = li.groupBy("l_partkey").agg(
        F.sum("q").alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    return (
        li.join(agg, "l_partkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("q") * 5 * F.col("cnt") < F.col("sq"))
        .agg((F.sum("ep") / F.lit(700.0)).alias("avg_yearly"))
    )

# ---------------------------------------------------------------------------
# §2.D/§2.C — remaining TPC-H shapes (Q2, Q8, Q9, Q11, Q12, Q15, Q16, Q20,
# Q21), completing the 22-query family.  The fixture has no partsupp table,
# so the part↔supplier relation is derived from lineitem (the "bridge"):
# every adaptation keeps the original query's *plan shape* — correlated
# min/agg subqueries, nested EXISTS, scalar thresholds — on the tables that
# exist.  All money math is in exact integer units (see functions.fixed_units).
# ---------------------------------------------------------------------------


@register(
    "d17_tpch_q8_shape",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           SUM(CASE WHEN n1.n_name = 'NATION_1'
                    THEN CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))
                    ELSE 0 END)
           / SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def d17_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the widest join tree in
    the family — fact lineitem against five broadcast dimensions, with
    nation joined twice (supplier's for the share numerator, customer's
    for the region filter).  The share is a ratio of two exact
    integer-unit sums computed in ONE aggregate pass (conditional sum),
    so both engines divide identical bigints.  Lineitem streams once;
    only the grouped per-year rows shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    vol = revenue_units()
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0)))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@register(
    "d18_tpch_q9_shape",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))
               - CAST(round(p_retailprice*100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * 100) / 10000.0 AS sum_profit
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def d18_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier-nation
    per year for parts matching a name substring.  The reference query's
    ``ps_supplycost`` has no fixture table, so cost is the part's retail
    price times quantity (same plan shape: a per-row arithmetic of fact
    and dimension columns inside the aggregate).  Profit stays an exact
    1e-4-unit bigint — revenue units minus cents*qty*100 — so partial
    aggregation is order-independent.  The substring filter prunes part
    BEFORE its broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = revenue_units() - (
        fixed_units("p_retailprice") * F.col("l_quantity").cast("long") * F.lit(100)
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit) / F.lit(10000.0)).alias("sum_profit"))
    )


@register(
    "d19_tpch_q12_shape",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def d19_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping mode / priority): join with a
    non-equi lateness residual (shipped >90 days after ordering —
    standing in for the commit/receipt columns the fixture lacks), then
    a conditional two-way count split by order priority.  The category
    and date filters are fact-side and push into the parquet scan; the
    residual evaluates post-join without degrading the equi hash join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "c16_tpch_q11_shape",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS value_units
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey
    ), t AS (SELECT SUM(value_units) AS total_units FROM v)
    SELECT l_partkey, value_units / 100.0 AS value
    FROM v CROSS JOIN t
    WHERE value_units * 1000 > total_units
    """,
)
def c16_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value held by one
    region's suppliers, kept only where the part exceeds a fixed
    fraction (1/1000) of the region's total.  The fraction threshold is
    the Q11 scalar subquery: a 1-row aggregate over the SAME grouped
    result, broadcast back — compared in integer units
    (``value*1000 > total``), so no double-precision boundary flip.
    The grouped value CTE is computed once and reused for both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(fixed_units("l_extendedprice")).alias("value_units"))
    )
    total = v.agg(F.sum("value_units").alias("total_units"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_units") * 1000 > F.col("total_units"))
        .select("l_partkey", (F.col("value_units") / F.lit(100.0)).alias("value"))
    )


@register(
    "c17_tpch_q15_shape",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_units / 10000.0 AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_units = (SELECT MAX(rev_units) FROM rev)
    """,
)
def c17_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    then the supplier(s) achieving the maximum — the Q15 view+scalar-max
    pattern.  The grouped revenue is computed once; the 1-row max
    broadcasts back and the equality compares exact bigints, so ties
    (kept, as in Q15) are engine-independent.  Supplier joins broadcast
    AFTER the aggregate — only ~max-row survivors reach it."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue_units()).alias("rev_units"))
    mx = rev.agg(F.max("rev_units").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_units") == F.col("__mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("rev_units") / F.lit(10000.0)).alias("total_revenue")
        )
    )


@register(
    "d20_tpch_q2_shape",
    oracle="""
    WITH pairs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost_units
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(cost_units) AS min_units FROM pairs GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           cost_units / 100.0 AS min_cost
    FROM pairs
      JOIN best ON pairs.l_partkey = best.l_partkey
              AND pairs.cost_units = best.min_units
      JOIN part ON p_partkey = pairs.l_partkey
      JOIN supplier ON s_suppkey = pairs.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size >= 40 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def d20_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the region's supplier(s) offering the minimum cost — Q2's correlated
    MIN subquery, de-correlated as aggregate-then-join-back on
    ``(part, min_units)``.  Cost is the minimum observed lineitem price
    for the (part, supplier) pair (the fixture's stand-in for
    ``ps_supplycost``), in exact cents so the min and the equality
    join-back are engine-independent.  Part is filtered before its
    broadcast; ties at the minimum are kept, as in Q2."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 40) & (F.col("p_type") == "LARGE")
    )
    pairs = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(fixed_units("l_extendedprice")).alias("cost_units"))
    )
    best = pairs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("cost_units").alias("min_units")
    )
    return (
        pairs.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("cost_units") == F.col("min_units")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            (F.col("cost_units") / F.lit(100.0)).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "d21_tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE NOT (p_brand = 'Brand#1' AND p_type = 'PROMO')
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def d21_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-part relationship count): distinct
    suppliers per (brand, type, size) bucket, excluding one brand/type
    combination and a blocklist of suppliers (negative balance standing
    in for Q16's complaint comment scan) via NOT IN → LEFT ANTI.  The
    part↔supplier relation is the lineitem bridge.  COUNT(DISTINCT)
    expands to a two-level aggregate — partial distinct map-side, so
    the shuffle carries (bucket, suppkey) pairs, not raw lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        ~((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "PROMO"))
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "d22_tpch_q20_shape",
    oracle="""
    WITH pair_qty AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS pq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey
    ), part_qty AS (
      SELECT l_partkey, SUM(pq) AS tq FROM pair_qty GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND EXISTS (
        SELECT 1 FROM pair_qty JOIN part_qty USING (l_partkey)
        WHERE pair_qty.l_suppkey = s_suppkey AND pair_qty.pq * 4 > part_qty.tq
      )
    """,
)
def d22_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (part promotion candidates): suppliers in one
    region who shipped a dominant share (>25%) of some qualifying
    part's yearly volume — Q20's nested-subquery chain (part-name semi
    filter → per-pair quantity vs a per-part threshold → semi join to
    suppliers).  The share test is Q20's ``availqty > 0.5*sum(qty)``
    with the lineitem bridge, compared in integer quantity units.
    The dominant-pair set is tiny, so it broadcasts into the final
    LEFT SEMI."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    pair_qty = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"),
                "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("pq"))
    )
    part_qty = pair_qty.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("pq").alias("tq")
    )
    dominant = (
        pair_qty.join(part_qty, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("pq") * 4 > F.col("tq"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "d23_tpch_q21_shape",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
      JOIN orders   ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F' AND r_name = 'AFRICA'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def d23_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    hardest EXISTS pattern in the family — a fact self-join three ways.
    A late line (shipped >60 days after ordering, the fixture's
    lateness stand-in) on a finished order counts against its supplier
    iff ANOTHER supplier contributed to the order (EXISTS → LEFT SEMI)
    and NO other supplier was also late (NOT EXISTS → LEFT ANTI, with
    the non-equi lateness residual referencing the left side's order
    date).  Both self-joins are equi on l_orderkey, so the three passes
    co-partition — one shuffle key throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    l2 = li.select(F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk"))
    l3 = li.select(
        F.col("l_orderkey").alias("l3_ok"),
        F.col("l_suppkey").alias("l3_sk"),
        F.col("l_shipdate").alias("l3_ship"),
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .join(
            l2,
            (F.col("l2_ok") == F.col("l_orderkey")) & (F.col("l2_sk") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_ok") == F.col("l_orderkey"))
            & (F.col("l3_sk") != F.col("l_suppkey"))
            & (F.col("l3_ship") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "c18_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
)
def c18_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (§2.C at scale): revenue per
    return flag — 3 keys over the whole fact table, the textbook
    hot-key aggregate.  Phase 1 sums per (key, salt) so each hot key
    spreads over 16 reducers; phase 2 merges 3×16 partials.  Exact
    integer units keep both phases order-independent, so the result is
    bit-identical to the naive single-phase oracle.  (Spark's partial
    aggregation handles this case too when combiners fit; explicit
    salting is the pattern for holistic aggregates — collect_set,
    percentile — where map-side combine can't shrink the hot key.)"""
    from ..operators.skew import with_salt

    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        with_salt(li, ("l_orderkey", "l_linenumber"), 16)
        .groupBy("l_returnflag", "__salt")
        .agg(
            F.sum(revenue_units()).alias("__rev"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        (F.sum("__rev") / F.lit(10000.0)).alias("revenue"),
        F.sum("__n").alias("n_items"),
    )


@register(
    "e2g_ntile_quartiles",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
    FROM customer
    """,
)
def e2g_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartile assignment per nation (§2.E2): equal-frequency
    binning over a deterministic total order — the remaining window
    family member (rank/lag/sum/rows-frame/top-n are covered by
    e2a–e2f).  One hash partition on the nation key."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "g5_null_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_returnflag, 'N') AS returned_flag,
           COALESCE(NULLIF(l_returnflag, 'N'), 'kept') AS disposition,
           (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM
            NULLIF(l_linestatus, 'O')) AS flags_same,
           CASE WHEN NULLIF(l_returnflag, 'N') IS NULL
                THEN CAST(NULL AS BIGINT)
                ELSE CAST(l_quantity AS BIGINT) END AS returned_qty
    FROM lineitem
    """,
)
def g5_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface (§2.G): NULLIF / COALESCE /
    null-safe equality (`eqNullSafe` = SQL IS NOT DISTINCT FROM) and a
    NULL-typed CASE branch.  Three-valued logic is where engines
    diverge quietly — the oracle pins Spark's semantics cell by cell
    (the reference inherits the same rules from ClickHouse's Nullable
    columns, init-clickhouse.sql:26,38)."""
    li = load_table(spark, sf_dir, "lineitem")
    returned = F.nullif("l_returnflag", F.lit("N"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        returned.alias("returned_flag"),
        F.coalesce(returned, F.lit("kept")).alias("disposition"),
        returned.eqNullSafe(F.nullif("l_linestatus", F.lit("O"))).alias("flags_same"),
        F.when(returned.isNull(), F.lit(None).cast("long"))
        .otherwise(F.col("l_quantity").cast("long"))
        .alias("returned_qty"),
    )


def _profile_oracle() -> str:
    metrics = {
        "o_orderkey": "o_orderkey",
        "o_custkey": "o_custkey",
        "o_orderstatus": "o_orderstatus",
        "o_totalprice_cents": "CAST(round(o_totalprice * 100) AS BIGINT)",
        "o_orderdate_us": "CAST(epoch_us(o_orderdate) AS BIGINT)",
    }
    parts = [
        f"""
        SELECT '{name}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({expr}) AS n_nulls,
               COUNT(DISTINCT {expr}) AS n_distinct,
               CAST(MIN({expr}) AS VARCHAR) AS min_value,
               CAST(MAX({expr}) AS VARCHAR) AS max_value
        FROM orders
        """
        for name, expr in metrics.items()
    ]
    return " UNION ALL ".join(parts)


@register("c19_table_profile", oracle=_profile_oracle())
def c19_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (data-quality gate): row / null /
    distinct counts and min/max per column of the orders table, floats
    and timestamps projected to exact integer units first.  One scan +
    one aggregate for all five columns — see operators/profile.py."""
    from ..functions import fixed_units
    from ..operators.profile import profile

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        fixed_units("o_totalprice").alias("o_totalprice_cents"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias("o_orderdate_us"),
    )
    return profile(orders)


@register(
    "c21_histogram",
    oracle="""
    SELECT bucket_no,
           0 + bucket_no * 2500000 AS bucket_lo,
           0 + (bucket_no + 1) * 2500000 AS bucket_hi,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_value
    FROM (
      SELECT LEAST(GREATEST(cents // 2500000, 0), 19) AS bucket_no, cents
      FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders)
    )
    GROUP BY bucket_no
    """,
)
def c21_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (ClickHouse ``histogram()``
    surface, exact): 20 buckets of $25k over [$0, $500k) in integer
    cents, outliers clamped to the edge buckets.  One scan + one
    ≤20-group hash aggregate — see operators/profile.py:histogram.
    Bucket arithmetic is integer-exact on both engines (DuckDB ``//``
    is floor division; Spark ``floor(a/b)`` on BIGINT cents), so no
    boundary value can land in different buckets."""
    from ..functions import fixed_units
    from ..operators.profile import histogram

    orders = load_table(spark, sf_dir, "orders").select(
        fixed_units("o_totalprice").alias("cents")
    )
    return histogram(orders, "cents", lo=0, hi=50_000_000, nbuckets=20)


@register(
    "b15_nested_rollup_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def b15_nested_rollup_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested data model round trip (§2.B extension): roll lineitems up
    into one document per order (``collect_list(struct)``, array sorted
    by line number for a deterministic document), then flatten back
    with ``explode`` — parity against the flat relation proves the
    assemble/flatten pair is lossless.  This is the denormalized-
    document shape an LLM-ingest exports (one JSON doc per order) and
    the reference's two-level JSON parse in reverse.  Plan: one shuffle
    (the groupBy on the order key) and a pipelined generate — explode
    adds no exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    docs = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice")
            )
        ).alias("items")
    )
    return docs.select("l_orderkey", F.explode("items").alias("it")).select(
        "l_orderkey", "it.*"
    )


@register(
    "d24_or_equi_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM orders o JOIN customer c
      ON o.o_custkey = c.c_custkey
      OR o.o_orderkey % 997 = c.c_custkey % 997
    GROUP BY 1
    """,
)
def d24_or_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-equalities join (§2.D extension — the entity-resolution
    shape: match on primary key OR legacy key).  Written naively Spark
    plans a BroadcastNestedLoopJoin (O(|A|·|B|)); operators/joins.py
    decomposes it into one hash equi-join per key with null-safe
    exclusion residuals, producing each qualifying pair exactly once —
    the oracle states the plain OR join and parity proves the
    decomposition exact.  Plan-asserted nested-loop-free in
    tests/test_or_join.py."""
    from ..operators.joins import or_equi_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", (F.col("o_orderkey") % 997).alias("o_legacy")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", (F.col("c_custkey") % 997).alias("c_legacy")
    )
    pairs = or_equi_join(
        orders, customer, [("o_custkey", "c_custkey"), ("o_legacy", "c_legacy")]
    )
    return pairs.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


@register("c23_hll_partial_merge", oracle=None)
def c23_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (§2.C extension — the
    DataSketches HLL surface ClickHouse exposes as uniqCombined
    *states*): per-day HLL sketches of the customer key, merged with
    hll_union_agg, estimated — next to the direct whole-table sketch
    and the exact count.  Rows-only by nature (sketch estimates are
    engine-specific); the load-bearing property, asserted in
    tests/test_or_join.py, is MERGE EXACTNESS: the union of 2400 daily
    partial sketches estimates IDENTICALLY to the one-shot sketch —
    which is what lets a 100 TB mart keep per-partition sketch columns
    and answer any-time-range distinct queries by merging, never
    rescanning."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est_direct")
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return merged.crossJoin(F.broadcast(direct)).crossJoin(F.broadcast(exact))


@register(
    "g6_collated_grouping",
    oracle="""
    SELECT MIN(noisy) AS name, COUNT(*) AS n FROM (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_name)
                  ELSE lower(c_name) END AS noisy,
             lower(c_name) AS key
      FROM customer
    ) GROUP BY key
    """,
)
def g6_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (§2.G extension — Spark 4 collations):
    customer names are case-mangled by key residue, then grouped under
    the UTF8_LCASE collation — equality is case-insensitive WITHOUT
    rewriting the column through lower() (at scale that matters: a
    collated comparison works in joins, GROUP BY, and DISTINCT while
    keeping the original bytes for output).  min() picks the
    deterministic representative; the oracle groups by lower() —
    parity proves the collated equality classes are exactly the
    case-insensitive ones."""
    cust = load_table(spark, sf_dir, "customer")
    noisy = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_name")
    ).otherwise(F.lower("c_name"))
    return (
        cust.select(noisy.alias("noisy"))
        .groupBy(F.collate("noisy", "UTF8_LCASE").alias("ckey"))
        .agg(F.min("noisy").alias("name"), F.count(F.lit(1)).alias("n"))
        .select("name", "n")
    )


@register(
    "c24_decimal_exact_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
             AS sum_price_c2,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(6,4))) * 10000
                AS BIGINT) AS sum_disc_price_c4,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(6,4))
                    * CAST(1 + l_tax AS DECIMAL(6,4))) * 1000000
                AS BIGINT) AS sum_charge_c6
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def c24_decimal_exact_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money aggregation (§2.C extension — the
    finance-grade alternative to the fixed_units pattern): prices and
    rate factors are cast to tight decimals BEFORE arithmetic, so every
    product and sum is exact rational arithmetic with identical values
    on any engine and any partition order — no double ulp drift, ever.

    Precision discipline is the load-bearing part at 100 TB:
    DECIMAL(12,2) × DECIMAL(6,4) × DECIMAL(6,4) stays at precision 26
    (exact in Spark, whose lossy truncation kicks in past 38, and legal
    in engines that reject operands wider than 38), and decimal sums
    remain map-side combinable (partial_sum of unscaled longs /
    int128).  The outputs re-scale the exact decimal sums to integer
    units (cents / 1e-4 / 1e-6) — the scaling is exact (it only shifts
    the decimal point) and integer columns are what the driver's
    pandas canonicalizer hashes losslessly.  One scan, one hash
    aggregate, codegen throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(6,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(price) * 100).cast("long").alias("sum_price_c2"),
        (F.sum(price * one_minus_disc) * 10000).cast("long").alias("sum_disc_price_c4"),
        (F.sum(price * one_minus_disc * one_plus_tax) * 1000000)
        .cast("long")
        .alias("sum_charge_c6"),
    )


@register(
    "d25_join_null_skew",
    oracle="""
    WITH f AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 < 2 THEN NULL ELSE o_custkey END AS cust_fk,
             o_totalprice
      FROM orders
    )
    SELECT f.o_orderkey AS o_orderkey, f.cust_fk AS cust_fk,
           c.c_name AS c_name, c.c_mktsegment AS segment,
           CAST(ROUND(f.o_totalprice * 100, 0) AS BIGINT) AS price_cents
    FROM f LEFT JOIN customer c ON f.cust_fk = c.c_custkey
    """,
)
def d25_join_null_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-skew-safe LEFT join (§2.D extension): 40 % of the fact FK
    is NULL (the optional-FK shape — guest checkouts, unattributed
    events).  A shuffle join hashes every NULL row to ONE reducer;
    operators/joins.py:null_skew_left_join routes them around the join
    as a scan-side projection and unions back, which the plain LEFT
    JOIN oracle proves value-exact.  The join subtree here broadcasts
    anyway (customer is a dim) — the decomposition is what keeps the
    plan healthy when the dim outgrows broadcast and the join
    sort-merges."""
    from ..operators.joins import null_skew_left_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 < 2, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        fixed_units("o_totalprice").alias("price_cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_mktsegment").alias("segment")
    )
    return null_skew_left_join(orders, cust, "cust_fk", "c_custkey").select(
        "o_orderkey", "cust_fk", "c_name", "segment", "price_cents"
    )


@register(
    "g7_uri_scalars",
    oracle=r"""
    WITH u0 AS (
      SELECT doc_id,
        'http' || CASE WHEN doc_id % 2 = 0 THEN 's' ELSE '' END || '://' ||
        CASE WHEN doc_id % 3 = 0 THEN 'api.Example.COM:8443'
             ELSE 'www.example.org' END ||
        '/a/b/doc' || CAST(doc_id % 20 AS VARCHAR) ||
        CASE WHEN doc_id % 4 = 0 THEN '?page=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=x'
             WHEN doc_id % 4 = 1 THEN '?ref=y' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url,
        regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1) AS scheme,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS auth,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path
      FROM u0
    )
    SELECT doc_id, scheme,
      regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1) AS host,
      CAST(NULLIF(regexp_extract(auth, ':([0-9]+)$', 1), '') AS INTEGER) AS port,
      path,
      NULLIF(regexp_extract(url, '[?&]page=([^&#]*)', 1), '') AS page,
      NULLIF(regexp_extract(regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1),
                            '\.([A-Za-z0-9\-]+)$', 1), '') AS tld,
      CAST(length(path) - length(replace(path, '/', '')) AS BIGINT) AS path_depth
    FROM parts
    """,
)
def g7_uri_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URI scalar family (§2.G extension — the URL-analytics scalars of
    a crawl pipeline: scheme/host/port/path/param/TLD/depth).  URLs are
    planted in-engine per doc (mixed schemes, an explicit port, query
    mixes, fragments keyed on doc_id residues) and decomposed by
    functions.uri_* — regexp_extract chains in the Java∩RE2 common
    syntax the oracle applies literally, with no-match empties nulled
    before any cast (ANSI-safe).  Pure scan-side codegen projection:
    no shuffle, no Python, filters/pruning unaffected."""
    from ..functions import (
        uri_host,
        uri_path,
        uri_path_depth,
        uri_port,
        uri_query_param,
        uri_scheme,
        uri_tld,
    )

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("s")).otherwise(F.lit("")),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("api.Example.COM:8443"))
        .otherwise(F.lit("www.example.org")),
        F.lit("/a/b/doc"),
        (F.col("doc_id") % 20).cast("string"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("?page="), (F.col("doc_id") % 7).cast("string"), F.lit("&ref=x")),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit("?ref=y"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", url.alias("url")).select(
        "doc_id",
        uri_scheme("url").alias("scheme"),
        uri_host("url").alias("host"),
        uri_port("url").alias("port"),
        uri_path("url").alias("path"),
        uri_query_param("url", "page").alias("page"),
        uri_tld("url").alias("tld"),
        uri_path_depth("url").alias("path_depth"),
    )


@register(
    "b18_unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS value_c2 FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           CAST(ROUND(l_discount * 100, 0) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax',
           CAST(ROUND(l_tax * 100, 0) AS BIGINT) FROM lineitem
    """,
)
def b18_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (§2.B extension — the wide→long reshape feeding
    any metric-per-row store): four lineitem measures unpivoted to
    (key, metric, value) rows via Spark's native ``unpivot``, values in
    exact integer cents.  The oracle states the portable UNION ALL
    form.  Plan: ONE scan with an Expand node (4 projections per input
    row inside codegen) — not four scans like the SQL spelling
    suggests; no shuffle at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        *[fixed_units(c).alias(c) for c in
          ("l_quantity", "l_extendedprice", "l_discount", "l_tax")],
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value_c2",
    )


@register(
    "e2k_rank_distribution",
    oracle="""
    SELECT c_nationkey AS nation, c_custkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def e2k_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution window trio (§2.E extension): percent_rank /
    cume_dist / ntile over account balance per nation.  Both ratios
    are integer-over-integer IEEE divisions ((rank-1)/(n-1), ≤rank/n) —
    engine-exact.  One hash exchange on nation shared by all three
    functions; the unique (balance, custkey) sort key makes every rank
    deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        F.col("c_nationkey").alias("nation"),
        "c_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "g8_array_scalars",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1000) AS INTEGER)) AS q
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(q) AS BIGINT) AS dim,
           CAST(len(list_filter(q, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(list_sum(q) AS BIGINT) AS sum_q,
           list_sort(q)[-1] AS max1,
           list_sort(q)[-2] AS max2,
           list_sort(q)[-3] AS max3,
           (len(list_filter(q, x -> x > 900)) > 0) AS has_gt900,
           CAST(len(list_distinct(q)) AS BIGINT) AS n_distinct
    FROM q
    """,
)
def g8_array_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface (§2.G extension — the
    arrayMap/arrayFilter/arraySum/arraySort/arrayDistinct family the
    reference's ClickHouse backend exposes): per embedding vector, the
    quantized array is transformed, filtered, folded, sorted and
    deduplicated entirely with Spark's lambda expressions — codegen'd
    JVM array loops, zero UDFs, zero explode (no row blow-up; arrays
    stay packed in their Tungsten representation end to end).  The
    quantization to integer units makes every fold exact across
    engines; the oracle is DuckDB's list lambda family computing the
    identical function.  Top-3 values come from one in-place
    array_sort + negative-index element_at — scalar outputs, so the
    driver's pandas canonicalizer never sees a list column."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x * F.lit(1000)).cast("int")
        ).alias("q"),
    )
    sq = q.withColumn("sq", F.array_sort("q"))
    return sq.select(
        "vec_id",
        F.size("q").cast("long").alias("dim"),
        F.size(F.filter("q", lambda x: x > F.lit(0))).cast("long").alias("n_pos"),
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda s, x: s + x.cast("long")
        ).alias("sum_q"),
        F.element_at("sq", -1).alias("max1"),
        F.element_at("sq", -2).alias("max2"),
        F.element_at("sq", -3).alias("max3"),
        F.exists("q", lambda x: x > F.lit(900)).alias("has_gt900"),
        F.size(F.array_distinct("q")).cast("long").alias("n_distinct"),
    )


@register(
    "g9_bitwise_aggregates",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS uid_and,
           CAST(bit_or(user_id)  AS BIGINT) AS uid_or,
           CAST(bit_xor(event_id) AS BIGINT) AS eid_xor,
           CAST(SUM(bit_count(user_id)) AS BIGINT) AS uid_popcount,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def g9_bitwise_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate surface (§2.G extension): BIT_AND / BIT_OR /
    BIT_XOR group aggregates plus the bit_count scalar — the engine
    primitives under bitmap indexes, permission-mask rollups, and
    XOR-checksum reconciliation (a shuffle-free way to compare two
    replicas of a keyset: equal multisets XOR to equal digests).
    All integer-exact, map-side combinable, one 3-group exchange."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("bit_and(user_id)").alias("uid_and"),
        F.expr("bit_or(user_id)").alias("uid_or"),
        F.expr("bit_xor(event_id)").alias("eid_xor"),
        F.sum(F.bit_count("user_id").cast("long")).alias("uid_popcount"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "g10_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(string_split(o_orderpriority, '-')[1] AS INTEGER)
             AS prio_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(round(o_totalprice * 100) AS BIGINT) / (o_orderkey % 3)
           END AS cents_per_bucket,
           string_split(o_orderpriority, '-')[3] AS third_part,
           TRY_CAST(o_orderstatus AS TIMESTAMP) AS status_ts
    FROM orders
    """,
)
def g10_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar surface (§2.G extension — the ANSI-mode
    ingestion contract: malformed cells become NULL, never a job
    abort): ``try_cast`` on parseable and unparseable strings,
    ``try_divide`` with planted zero denominators, ``try_element_at``
    past the array end, ``try_to_timestamp`` on garbage.  The DuckDB
    twins are TRY_CAST, a CASE-guarded division, native NULL
    out-of-range list access, and TRY_CAST-to-TIMESTAMP — different
    mechanisms, same relation.  (Spark's try_add/try_multiply overflow
    family has no DuckDB-1.0 twin — DuckDB raises on overflow with no
    TRY() wrapper — so overflow-safety is pinned in tests/ instead of
    an oracle.)  All codegen'd scalar expressions; no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.try_divide(fixed_units("o_totalprice"), F.col("o_orderkey") % 3).alias(
            "cents_per_bucket"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias(
            "third_part"
        ),
        F.try_to_timestamp(F.col("o_orderstatus")).alias("status_ts"),
    )


@register(
    "f3d_set_ops_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY custkey
    UNION ALL
    SELECT custkey, -COUNT(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY custkey
    """,
)
def f3d_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-operation semantics (§2.F3 completion —
    INTERSECT/EXCEPT keep one row per value; the ALL variants keep
    min/difference MULTIPLICITIES, which is what reconciliation
    between at-least-once feeds actually needs).  Spark compiles both
    to aggregate+generate (count per side, replicate min/diff) — no
    join, two map-side-combined aggregates; the counts-by-key output
    keeps the oracle boundary scalar."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exc = (
        a.exceptAll(b)
        .groupBy("custkey")
        .agg((-F.count(F.lit(1))).alias("n"))
    )
    return inter.unionByName(exc)


@register(
    "c25_boolean_positional_aggs",
    oracle="""
    WITH r AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice, o_orderpriority,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rd,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_orderdate ASC, o_orderkey ASC) AS ra
      FROM orders
    )
    SELECT o_orderstatus,
           bool_and(o_totalprice > 100)  AS all_over_100,
           bool_or(o_totalprice > 90000) AS any_over_90k,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
             AS n_urgent,
           MAX(CASE WHEN rd = 1 THEN o_orderkey END) AS latest_orderkey,
           MAX(CASE WHEN ra = 1 THEN o_orderkey END) AS earliest_orderkey
    FROM r
    GROUP BY o_orderstatus
    """,
)
def c25_boolean_positional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean + positional aggregate surface (§2.C completion):
    bool_and/bool_or (EVERY/ANY), count_if, and max_by/min_by over a
    composite (date, key) ordering — the arg_max family ClickHouse
    users reach for constantly.  The ordering struct includes the
    unique key, so ties are impossible and both engines pick the same
    row deterministically.  All map-side combinable; one 3-group
    exchange."""
    o = load_table(spark, sf_dir, "orders")
    ordkey = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 100).alias("all_over_100"),
        F.some(F.col("o_totalprice") > 90000).alias("any_over_90k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.max_by(F.col("o_orderkey"), ordkey).alias("latest_orderkey"),
        F.min_by(F.col("o_orderkey"), ordkey).alias("earliest_orderkey"),
    )


@register(
    "c26_corr_regression",
    oracle="""
    WITH q AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
             CAST(round(l_quantity) AS BIGINT) AS y
      FROM lineitem
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM q
    )
    SELECT n, sx, sy,
           CAST(ROUND(1000000.0 * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))),
                 0) AS BIGINT) AS corr_ppm,
           CAST(ROUND(1000000.0 * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)),
                 0) AS BIGINT) AS slope_ppm
    FROM s
    """,
)
def c26_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (§2.C completion — corr / regr_slope
    over price vs quantity) in the engine-exact formulation: the five
    integer power sums are exact (order-independent) — the squared-
    cents sum is carried in DECIMAL(38,0), because at sf0.1 it is
    already 2.2·10¹⁹ > 2⁶³ (a BIGINT sum overflows; DuckDB's HUGEINT
    twin is the same 128-bit accumulator) — and Pearson r / OLS slope
    are assembled from them in ONE identical IEEE expression per
    statistic — unlike the built-in ``corr``, whose per-partition
    co-moment recurrence is summation-order-dependent in the last
    ulps and therefore unhashable across engines.  (The built-ins
    agree to ~1e-12; pinned in tests.)  The exact-integer→double cast
    at the boundary is the same correctly-rounded conversion in both
    engines.  Single scan, one map-side-combined aggregate to one
    row."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        fixed_units("l_extendedprice").alias("x"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x").cast("decimal(19,0)") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx"), F.col("sy")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = n * F.col("sxy") - sxd * sy
    var_x = n * F.col("sxx") - sxd * sx
    var_y = n * F.col("syy") - syd * sy
    return s.select(
        "n",
        "sx",
        "sy",
        F.round(F.lit(1000000.0) * (cov_n / F.sqrt(var_x * var_y)), 0)
        .cast("long")
        .alias("corr_ppm"),
        F.round(F.lit(1000000.0) * (cov_n / var_x), 0).cast("long").alias("slope_ppm"),
    )


@register(
    "g11_datetime_scalars",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(date_diff('day', DATE '1992-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           epoch_ms(o_orderdate) AS epoch_millis,
           make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER),
                     CAST(dayofmonth(o_orderdate) AS INTEGER)) AS rebuilt,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def g11_datetime_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar surface (§2.G — the reference's only temporal
    type is TIMESTAMP, init-db.sql:13/29, and its ClickHouse backend
    serves the toStartOf*/toDayOf*/dateDiff family; this is that
    surface natively): calendar truncations (month/ISO-week/quarter),
    month end, the extract family (year→day, day-of-year, ISO week
    and ISO weekday), day arithmetic against an epoch, month
    arithmetic WITH end-of-month clamping (Jan 31 + 3m → Apr 30 —
    pinned by both engines agreeing), epoch-millis, a make_date
    roundtrip from extracted parts, and calendar-bucket formatting.
    ISO-weekday parity: Spark ``weekday()`` is 0=Monday, DuckDB
    ``isodow`` 1=Monday — the +1 shift is in the Spark plan, not the
    oracle.  All codegen'd scalar expressions over one scan; no
    shuffle, nothing for AQE to do."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.date_trunc("week", d).alias("week_start"),
        F.date_trunc("quarter", d).alias("quarter_start"),
        F.last_day(d).alias("month_end"),
        F.year(d).cast("long").alias("y"),
        F.quarter(d).cast("long").alias("q"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("d"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        (F.weekday(d) + F.lit(1)).cast("long").alias("iso_dow"),
        F.datediff(d.cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.add_months(d, 3).alias("plus3m"),
        epoch_ms(d, o.schema["o_orderdate"].dataType).alias("epoch_millis"),
        F.make_date(F.year(d), F.month(d), F.dayofmonth(d)).alias("rebuilt"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "c27_exact_quantiles_mode",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c2,
             CAST(round(l_quantity * 100) AS BIGINT) AS qty_c2
      FROM lineitem),
    cd AS (
      SELECT rf, price_c2,
             cume_dist() OVER (PARTITION BY rf ORDER BY price_c2) AS cd
      FROM v),
    q AS (
      SELECT rf,
             min(CASE WHEN cd >= 0.25 THEN price_c2 END) AS p25_c2,
             min(CASE WHEN cd >= 0.5  THEN price_c2 END) AS p50_c2,
             min(CASE WHEN cd >= 0.75 THEN price_c2 END) AS p75_c2,
             min(CASE WHEN cd >= 0.9  THEN price_c2 END) AS p90_c2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cd GROUP BY rf),
    m AS (
      SELECT rf, arg_max(qty_c2, cnt * 100000 + qty_c2) AS mode_qty_c2
      FROM (SELECT rf, qty_c2, COUNT(*) AS cnt FROM v GROUP BY rf, qty_c2)
      GROUP BY rf)
    SELECT q.rf, p25_c2, p50_c2, p75_c2, p90_c2, mode_qty_c2, n
    FROM q JOIN m ON q.rf = m.rf
    """,
)
def c27_exact_quantiles_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics per group (§2.C extension — ClickHouse's
    quantileExact / topK surface, served without sketches):
    four probability points of the SQL-standard percentile_disc
    (smallest value with cume_dist ≥ p — stated literally as a
    cume_dist window + conditional min on BOTH sides, so neither
    engine's quantile flavor can drift; Spark's own
    ``percentile_disc(...) WITHIN GROUP`` aggregate returns the
    identical values — pinned by test — but BUFFERS every group value
    in its aggregation state, while the window form streams through
    one sort: measured 4.4 s vs 1.1 s at sf0.1, and at 100 TB the
    buffering form simply dies) plus a DETERMINISTIC mode —
    ``max_by(value, count·10⁵ + value)`` over a per-value count (the
    fixed-point value is < 10⁵, so the composite key is a total order
    on (count, value) in one BIGINT — DuckDB's arg_max rejects struct
    ordering keys, and both engines agree on the scalar), because
    bare ``mode()`` breaks ties arbitrarily in both engines and would
    be partition-order-dependent.  Values in integer cents; the
    percentile_disc result is an exact element so the double→long
    cast is lossless.  Shape: one exchange on (rf, value) for the
    mode's inner count (map-side combinable), one on rf for the
    sort-based percentiles — at 100 TB the mode path dominates and
    stays aggregate-only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        fixed_units("l_extendedprice").alias("price_c2"),
        fixed_units("l_quantity").alias("qty_c2"),
    )
    w = Window.partitionBy("rf").orderBy("price_c2")
    cd = li.select("rf", "price_c2", "qty_c2", F.cume_dist().over(w).alias("cd"))
    qs = cd.groupBy("rf").agg(
        *[
            F.min(F.when(F.col("cd") >= p, F.col("price_c2"))).alias(
                f"p{int(p * 100)}_c2"
            )
            for p in (0.25, 0.5, 0.75, 0.9)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    mode = (
        li.groupBy("rf", "qty_c2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("rf")
        .agg(
            F.max_by(
                "qty_c2", F.col("cnt") * F.lit(100000) + F.col("qty_c2")
            ).alias("mode_qty_c2")
        )
    )
    return qs.join(mode, "rf").select(
        "rf", "p25_c2", "p50_c2", "p75_c2", "p90_c2", "mode_qty_c2", "n"
    )


def _pagerank_oracle() -> str:
    from ..operators.graph import pagerank_oracle_sql

    edges = """
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """
    return pagerank_oracle_sql(edges, n_iter=10, damping_pct=85)


@register("e18_graph_pagerank", oracle=_pagerank_oracle())
def e18_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank over the customer↔supplier trade graph (§2
    extension — the iterative-fixpoint analytic beyond connected
    components; ClickHouse cannot express this at all, the reference
    would push it to an external job).  Nodes are customers (2c) and
    suppliers (2s+1); each lineitem contributes both edge directions,
    so the walk is over the undirected trade relation.  Ten damped
    iterations in EXACT scaled-integer arithmetic
    (operators/graph.py:integer_pagerank) — the oracle replays the
    identical recurrence as ten unrolled DuckDB CTE stages, making an
    ITERATIVE algorithm hash-verifiable cross-engine, which the
    float-recurrence textbook form never is."""
    from ..operators.graph import integer_pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cs = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = cs.unionByName(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return integer_pagerank(edges, n_iter=10, damping_pct=85)


@register(
    "g13_string_scalars",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT) AS lev,
           translate(c_name, '#0', '_x') AS tr,
           lpad(c_mktsegment, 12, '.') AS lp,
           rpad(c_mktsegment, 12, '.') AS rp,
           reverse(c_name) AS rev,
           repeat(c_mktsegment, 2) AS rep,
           left(c_name, 5) AS l5,
           right(c_name, 3) AS r3,
           CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
           split_part(c_name, '#', 2) AS num_part,
           CAST(ascii(c_name) AS BIGINT) AS first_byte
    FROM customer
    """,
)
def g13_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface (§2.G — the reference's VARCHAR columns,
    init-db.sql:10-12, served by ClickHouse's string function family):
    edit distance, character translation, padding both ways, reverse,
    repeat, prefix/suffix slices, 1-based find (0 = absent, both
    engines), field extraction by delimiter, and the leading byte.
    Codegen'd JVM string ops over one scan; no shuffle.  The
    Levenshtein here is the same engine primitive the SymSpell fuzzy
    dedup verifies pairs with (operators/dedup.py) — surfaced as a
    scalar."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000001"))
        .cast("long")
        .alias("lev"),
        F.translate("c_name", "#0", "_x").alias("tr"),
        F.lpad("c_mktsegment", 12, ".").alias("lp"),
        F.rpad("c_mktsegment", 12, ".").alias("rp"),
        F.reverse("c_name").alias("rev"),
        F.repeat("c_mktsegment", 2).alias("rep"),
        F.expr("left(c_name, 5)").alias("l5"),
        F.expr("right(c_name, 3)").alias("r3"),
        F.instr("c_name", "1").cast("long").alias("pos1"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("num_part"),
        F.ascii("c_name").cast("long").alias("first_byte"),
    )


@register(
    "d26_lateral_topn",
    oracle="""
    SELECT n.n_name AS nation, c.c_custkey, c.c_acctbal, c.rnk
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal,
             CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
                  AS BIGINT) AS rnk
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3
    ) c
    """,
)
def d26_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (§2.D extension — the SQL-standard
    per-row subquery surface; ClickHouse expresses this as ARRAY JOIN
    over groupArray slices): top-3 customers by balance for EACH
    nation, written as a lateral correlated subquery.  Catalyst
    DECORRELATES it — the executed plan is the same
    rank-filter/WindowGroupLimit shape as the window formulation, not
    |nations| subquery executions: stating it laterally costs nothing,
    which is the point of testing the surface.  Registered through
    spark.sql to exercise the SQL-path parser end-to-end (every other
    query enters through the DataFrame API)."""
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__d26_{t}")
    return spark.sql(
        """
        SELECT n.n_name AS nation, c.c_custkey, c.c_acctbal, c.rnk
        FROM __d26_nation n JOIN LATERAL (
          SELECT c_custkey, c_acctbal,
                 CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
                      AS BIGINT) AS rnk
          FROM __d26_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        ) c
        """
    )


@register(
    "e2l_value_window_family",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w_full AS last_key,
           nth_value(o_orderkey, 3) OVER w_full AS third_key,
           first_value(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END
                       IGNORE NULLS) OVER w_full AS first_f_key,
           lag(o_orderkey, 1, -1) OVER w AS prev_key,
           lead(o_orderkey, 2) OVER w AS next2_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    """,
)
def e2l_value_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-window function family (§2.E completion): first_value /
    last_value / nth_value over the FULL partition frame (the default
    running frame makes last_value a no-op — the classic silent bug,
    avoided explicitly on both sides), IGNORE NULLS navigation to the
    first 'F'-status order, lag with an explicit default, and a
    2-step lead.  One partition sort shared by every function; all
    six run in a single Window operator."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    f_key = F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.nth_value("o_orderkey", 3).over(w_full).alias("third_key"),
        F.first(f_key, ignorenulls=True).over(w_full).alias("first_f_key"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 2).over(w).alias("next2_key"),
    )


@register(
    "c28_filtered_aggregates",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_final,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_c2,
           CAST(MAX(CAST(o_orderdate AS DATE))
                FILTER (WHERE o_orderpriority LIKE '1-%') AS DATE)
             AS last_urgent_day
    FROM orders GROUP BY o_custkey
    """,
)
def c28_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard aggregate FILTER clause (§2.C completion — the
    per-aggregate predicate form; ClickHouse's -If combinator family:
    countIf/sumIf/maxIf): unfiltered and filtered aggregates computed
    side-by-side in ONE grouped pass — the conditional-rollup pattern
    that otherwise forces either N scans or nested CASE expressions.
    Spark evaluates FILTER natively inside the aggregate (same plan
    as the CASE rewrite — one map-side-combined hash aggregate);
    entered through ``F.expr`` to exercise the clause syntax itself.
    A filtered SUM over an empty group yields NULL, a filtered COUNT
    yields 0 — the standard's corner, pinned by parity."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("COUNT(*) FILTER (WHERE o_orderstatus = 'F')").alias("n_final"),
        F.expr(
            "SUM(CAST(round(o_totalprice * 100) AS BIGINT))"
            " FILTER (WHERE o_orderstatus = 'O')"
        ).alias("open_c2"),
        F.expr(
            "MAX(CAST(o_orderdate AS DATE))"
            " FILTER (WHERE o_orderpriority LIKE '1-%')"
        ).alias("last_urgent_day"),
    )


@register(
    "f4_topk_with_ties",
    oracle="""
    SELECT l_orderkey, l_linenumber, qty, rnk FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             CAST(rank() OVER (PARTITION BY l_orderkey
                               ORDER BY round(l_quantity) DESC) AS BIGINT)
               AS rnk
      FROM lineitem
    ) WHERE rnk <= 2
    """,
)
def f4_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (§2.F completion — ANSI FETCH FIRST k WITH
    TIES / ClickHouse LIMIT ... WITH TIES): rank() ≤ k keeps EVERY
    row tying the k-th value, where the row_number() top-n family
    (e2a, j4k) would drop ties arbitrarily — the correct semantics
    whenever the ranking key is coarse (integer quantities here: most
    orders tie somewhere in their top-2).  Same
    WindowGroupLimit-prunable single-sort shape as row_number top-n —
    rank-based filters push the same partial limit below the
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity", 0).cast("long")
    w = Window.partitionBy("l_orderkey").orderBy(qty.desc())
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            qty.alias("qty"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
    )


@register(
    "d27_join_full_outer",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_debt_customers,
             CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS debt_c
      FROM customer WHERE c_acctbal < -800 GROUP BY 1),
    s AS (
      SELECT s_nationkey AS nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_rich_suppliers,
             CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS wealth_c
      FROM supplier WHERE s_acctbal > 8000 GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           n_debt_customers, debt_c, n_rich_suppliers, wealth_c
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def d27_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (§2.D — the last ANSI join type the D family
    lacked): per-nation deeply-indebted customers vs high-balance
    suppliers, where the fixture populates all three categories
    (left-only, right-only, matched nations), so both sides' null-fill
    semantics are actually exercised — an outer join whose unmatched
    sides are empty proves nothing.  Thresholds chosen so sf0.01 has
    5/5/7 of left-only/right-only/matched.  Money in integer cents.
    Shape: two map-side-combined aggregates shrink each side to
    ≤|nations| rows BEFORE the join (aggregate-then-outer-join, never
    outer-join-then-aggregate — at 100 TB the pre-aggregation is the
    difference between joining 25 rows and joining 15 B), then a tiny
    sort-merge/broadcast-nullable join."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -800)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_debt_customers"),
            F.sum(fixed_units("c_acctbal")).alias("debt_c"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_rich_suppliers"),
            F.sum(fixed_units("s_acctbal")).alias("wealth_c"),
        )
    )
    return cust.join(
        supp, cust["c_nk"] == supp["s_nk"], "full_outer"
    ).select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        "n_debt_customers",
        "debt_c",
        "n_rich_suppliers",
        "wealth_c",
    )


@register(
    "c29_percentile_cont",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS rf,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c2,
             CAST(row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY round(l_extendedprice * 100),
                                              l_orderkey, l_linenumber)
                  AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM lineitem)
    SELECT rf, n,
           CAST(SUM(CASE WHEN rn = ((1 * (n-1)) // 4) + 1
                         THEN price_c2 * (4 - ((1 * (n-1)) % 4)) ELSE 0 END)
              + SUM(CASE WHEN rn = ((1 * (n-1)) // 4) + 2
                         THEN price_c2 * ((1 * (n-1)) % 4) ELSE 0 END)
              AS BIGINT) AS p25_qc,
           CAST(SUM(CASE WHEN rn = ((2 * (n-1)) // 4) + 1
                         THEN price_c2 * (4 - ((2 * (n-1)) % 4)) ELSE 0 END)
              + SUM(CASE WHEN rn = ((2 * (n-1)) // 4) + 2
                         THEN price_c2 * ((2 * (n-1)) % 4) ELSE 0 END)
              AS BIGINT) AS p50_qc,
           CAST(SUM(CASE WHEN rn = ((3 * (n-1)) // 4) + 1
                         THEN price_c2 * (4 - ((3 * (n-1)) % 4)) ELSE 0 END)
              + SUM(CASE WHEN rn = ((3 * (n-1)) // 4) + 2
                         THEN price_c2 * ((3 * (n-1)) % 4) ELSE 0 END)
              AS BIGINT) AS p75_qc
    FROM v GROUP BY rf, n
    """,
)
def c29_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentile_cont (linear interpolation — the SQL-standard
    counterpart of c27's percentile_disc) at p ∈ {0.25, 0.5, 0.75},
    computed entirely in INTEGER arithmetic so the result is
    engine-exact: for probability p = k/4 over n ordered values the
    interpolation point is pos = k·(n−1)/4, and the interpolated value
    ×4 is v[⌊pos⌋]·(4−r) + v[⌊pos⌋+1]·r with r = k·(n−1) mod 4 — all
    BIGINT products of cents (reported in QUARTER-cents, ``_qc``), no
    float multiply for either engine to disagree on.  Both sides state
    the same formula literally (both engines' built-in quantile_cont
    flavors interpolate in floating point with unspecified op order —
    exactly what the value-hash gate cannot accept).  Shape: ONE sort
    per group carries both window functions (row_number and the
    partition count reuse the exchange), then one map-side-combinable
    conditional-sum aggregate; the rows that contribute are the ≤6
    bracketing rows per group, everything else sums zeros.  Ordering
    is made total with the (orderkey, linenumber) tiebreak so rn is
    deterministic for equal values — interpolation only reads values,
    but equal-value ties must land on the same rn in both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        fixed_units("l_extendedprice").alias("price_c2"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("rf").orderBy("price_c2", "l_orderkey", "l_linenumber")
    wn = Window.partitionBy("rf")
    v = li.select(
        "rf",
        "price_c2",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def _interp(k: int):
        # integral div/mod end-to-end (no double division anywhere —
        # the whole point of the quarter-cent formulation)
        pos = F.lit(k) * (F.col("n") - 1)
        lo_rn = F.expr(f"div({k} * (n - 1), 4)").cast("long") + 1
        r = pos % 4
        return (
            F.sum(
                F.when(F.col("rn") == lo_rn, F.col("price_c2") * (4 - r)).otherwise(
                    F.lit(0)
                )
            )
            + F.sum(
                F.when(F.col("rn") == lo_rn + 1, F.col("price_c2") * r).otherwise(
                    F.lit(0)
                )
            )
        ).alias(f"p{k * 25}_qc")

    return v.groupBy("rf", "n").agg(_interp(1), _interp(2), _interp(3))


@register(
    "g14_regexp_scalars",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
             AS n_digit_runs,
           regexp_extract(lower(trim(text)), '([a-z]+)', 1) AS first_word,
           CAST(length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
                AS BIGINT) AS devoweled_len,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
             AS n_capitalized
    FROM documents
    """,
)
def g14_regexp_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression scalar family (§2.G — the regexp surface the
    text pipeline leans on, stated as its own parity row): match-count
    (regexp_count), first-group extraction (regexp_extract), global
    class replacement (regexp_replace), and a capitalized-word count.
    Patterns restricted to character classes + groups — semantics
    identical between Java regex (Spark) and RE2 (DuckDB), which is
    exactly the dialect-portable subset a cross-engine pipeline should
    stick to (backreferences and lookarounds differ and are avoided
    on principle).  Pure projection: zero exchanges, codegen'd."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[0-9]+")).cast("long").alias("n_digit_runs"),
        F.regexp_extract(F.lower(F.trim(F.col("text"))), r"([a-z]+)", 1).alias(
            "first_word"
        ),
        F.length(F.regexp_replace(F.lower(F.col("text")), r"[aeiou]", "")).cast(
            "long"
        ).alias("devoweled_len"),
        F.regexp_count("text", F.lit(r"[A-Z][a-z]+")).cast("long").alias(
            "n_capitalized"
        ),
    )


@register(
    "d28_cross_join_grid",
    oracle="""
    WITH months AS (
      SELECT DISTINCT date_trunc('month', o_orderdate) AS month FROM orders
    ), nations AS (
      SELECT n_nationkey, n_name FROM nation
    ), rev AS (
      SELECT n_nationkey AS nk, date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name AS nation, months.month AS month,
           COALESCE(revenue_c, 0) AS revenue_c
    FROM nations CROSS JOIN months
    LEFT JOIN rev ON rev.nk = n_nationkey AND rev.month = months.month
    """,
)
def d28_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN densification (§2.D — the last join type:
    deliberate, bounded cartesian): the |nations| × |months| report
    grid LEFT-joined to actual per-nation-month revenue, zeros filled
    — the dense-grid pattern every BI export needs (a month with no
    orders must appear as 0, not vanish).  The cartesian term is
    dimension × dimension (25 × ~80 rows — both sides BOUNDED
    dimensions by construction; never fact × anything: the fact table
    is pre-aggregated to ≤ |grid| rows before it joins the grid).
    Money in integer cents."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    months = orders.select(
        F.trunc("o_orderdate", "month").alias("month")
    ).distinct()
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_nationkey").alias("nk"),
            F.trunc("o_orderdate", "month").alias("rmonth"),
        )
        .agg(F.sum(fixed_units("o_totalprice")).alias("rev_c"))
    )
    grid = nation.select("n_nationkey", "n_name").crossJoin(months)
    return grid.join(
        rev,
        (grid["n_nationkey"] == rev["nk"]) & (grid["month"] == rev["rmonth"]),
        "left",
    ).select(
        F.col("n_name").alias("nation"),
        "month",
        F.coalesce("rev_c", F.lit(0)).cast("long").alias("revenue_c"),
    )


@register(
    "c30_group_array",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           array_to_string((list(o_orderkey ORDER BY o_orderkey))[1:5], ',')
             AS first_keys,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def c30_group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array / string aggregation (§2.C extension — the
    ClickHouse ``groupArray`` / ``groupUniqArray`` /
    ``arrayStringConcat`` signature family the reference's warehouse
    serves; ANSI ``string_agg``/``listagg``): per group, the first 5
    member keys in key order and the distinct statuses as an ordered
    CSV.  Determinism is the point being tested: a bare
    ``collect_list`` is partition-order-dependent, so both columns
    pin an explicit ORDER — ``array_sort`` after the collect (the
    distributed equivalent of ClickHouse's groupArray + arraySort) —
    making an ordered-aggregation query hash-verifiable cross-engine.
    Map-side-combinable collects; the first_keys slice bounds the
    carried array at 5 keys only AFTER the sort, mirroring
    ``list(...)[1:5]`` exactly."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.concat_ws(
            ",",
            F.slice(F.array_sort(F.collect_list("o_orderkey")), 1, 5).cast(
                "array<string>"
            ),
        ).alias("first_keys"),
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
    )


@register(
    "g16_map_scalars",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS p, l_returnflag AS rf,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), t AS (
      SELECT p, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY p
    )
    SELECT c.p AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COALESCE(SUM(n) FILTER (rf = 'R'), 0) AS BIGINT) AS r_cnt,
           string_agg(rf, ',' ORDER BY rf) AS keys_csv,
           CAST(SUM(n) AS BIGINT) AS total_cnt,
           COALESCE(string_agg(rf, ',' ORDER BY rf)
                      FILTER (n * 3 > t.total), '') AS major_keys,
           CAST(COALESCE(SUM(n * 2) FILTER (rf = 'A'), 0) AS BIGINT)
             AS a_doubled
    FROM c JOIN t ON c.p = t.p
    GROUP BY c.p, t.total
    """,
)
def g16_map_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed scalar/lambda surface (§2.G extension — Spark's map
    function family: map_from_entries / try_element_at / map_keys /
    map_values / map_filter / transform_values + an aggregate fold
    over the values), exercised end-to-end on a real aggregate: per
    order priority, the return-flag→count map, then every output is a
    SCALAR derived through map operations.  Determinism: entries are
    array_sort'ed before map_from_entries, so key order (and
    therefore map_keys/concat_ws output) is pinned.  The oracle
    computes the same VALUES with plain conditional aggregation — the
    contract verifies results, not mechanism, which is exactly what
    lets a map-based plan be checked by a map-less engine.
    try_element_at (not element_at): ANSI mode throws on missing map
    keys.  ``major_keys`` = flags holding >1/3 of the group's rows
    (cross-multiplied integer test)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    c = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_orderpriority").alias("p"), F.col("l_returnflag").alias("rf")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = c.groupBy("p").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("rf", "n")))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    with_total = m.withColumn("total_cnt", total)
    major = F.map_filter(
        F.col("m"), lambda k, v: v * 3 > F.col("total_cnt")
    )
    return with_total.select(
        F.col("p").alias("priority"),
        F.size("m").cast("long").alias("n_keys"),
        F.coalesce(F.try_element_at("m", F.lit("R")), F.lit(0))
        .cast("long")
        .alias("r_cnt"),
        F.concat_ws(",", F.map_keys("m")).alias("keys_csv"),
        F.col("total_cnt"),
        F.concat_ws(",", F.map_keys(major)).alias("major_keys"),
        F.coalesce(
            F.try_element_at(
                F.transform_values(F.col("m"), lambda k, v: v * 2), F.lit("A")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("a_doubled"),
    )
