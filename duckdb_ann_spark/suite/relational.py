"""Driver queries: the relational substrate (SURVEY.md §2.5).

The reference inherits joins/aggregates/windows/top-n from DuckDB core;
our engine inherits them from Spark SQL. These queries pin that substrate
against the DuckDB oracle on the TPC-H-ish driver testdata.

Bit-exactness discipline: cross-row float addition is order-dependent, so
money/value sums go through `CAST(round(x * 100) AS BIGINT)` (identical
double multiply + half-away-from-zero round in both engines, then exact
integer summation in any order). `l_quantity` is integral-valued, so a
plain double sum is exact too, but we cast to BIGINT for a stable dtype.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import read_table as _t_
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t_(spark, sf_dir, name)


def _cents(col):
    return F.round(F.col(col) * 100).cast("bigint")


@register(
    "rel_q1_pricing_summary",
    """
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → partial agg → final agg.

    Scale notes: filter + column pruning push to the parquet scan; the
    groupBy key has tiny cardinality so the shuffle moves only partial
    aggregates (map-side combine), not rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_price_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "rel_join_customer_orders",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_mktsegment
    ORDER BY n_orders DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim⨝fact join + agg + top-n. customer is small → Catalyst broadcasts
    it (no shuffle of the fact side by join key); the top-20 runs as
    TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        F.broadcast(c)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy(F.desc("n_orders"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "rel_window_top_event",
    """
    SELECT user_id, event_id, event_type
    FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY value DESC, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_window_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-1 via window row_number (deterministic tie-break on id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


@register(
    "rel_events_by_type",
    """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "rel_set_ops",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    EXCEPT
    SELECT n_nationkey FROM nation
    ORDER BY custkey
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/UNION/EXCEPT chain with SQL's precedence
    (INTERSECT binds tighter; UNION/EXCEPT left-to-right)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING") \
        .select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F") \
        .select(F.col("o_custkey").alias("custkey"))
    s = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0) \
        .select(F.col("s_suppkey").alias("custkey"))
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("custkey")
    )
    return (
        c.intersect(o).union(s).distinct().exceptAll(n).distinct()
        .orderBy("custkey")
    )


@register(
    "rel_string_date_funcs",
    """
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 3)) AS prio3,
           length(o_orderpriority) AS prio_len,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           concat(o_orderstatus, '-', CAST(o_orderkey % 10 AS VARCHAR)) AS tag
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def q_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.concat(
            F.col("o_orderstatus"), F.lit("-"),
            (F.col("o_orderkey") % 10).cast("string"),
        ).alias("tag"),
    ).orderBy("o_orderkey")


@register(
    "rel_multi_join_region_sales",
    """
    SELECT r.r_name, n.n_name,
           count(*) AS n_lineitems,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def q_multi_join_region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join: three broadcastable dims against the fact table —
    at 100 TB this stays a single scan of lineitem with three broadcast
    hash joins and a low-cardinality agg."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(rev).alias("revenue_cents"),
        )
        .orderBy("r_name", "n_name")
    )
