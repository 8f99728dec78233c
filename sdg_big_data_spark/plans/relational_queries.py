"""Catalog queries — scans, predicates, joins, aggregations, sets, sorts,
sampling (SURVEY.md §2.1-§2.4, §2.6-§2.8).

Every query here runs on the driver's TPC-H-ish tables and has an exact
DuckDB oracle. Scale notes are on the operator wrappers these call
(operators/relational.py, operators/joins.py, operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import joins, relational, sampling
from .catalog import register, table

# --------------------------------------------------------------------------
# A11 — flagship threshold indicator (13-indicator_time_series.Rmd:12-13)
# --------------------------------------------------------------------------


@register(
    "a11_threshold_indicator",
    sql="""
    SELECT year(ts) AS year, month(ts) AS month, event_type,
           count(DISTINCT user_id) AS n_users
    FROM events WHERE value >= 100.0
    GROUP BY 1, 2, 3
    """,
    tags=("A11", "flagship"),
    doc="filter score>=cutoff → group → countDistinct users",
)
def a11_threshold_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return relational.threshold_indicator(
        events.withColumn("year", F.year("ts")).withColumn("month", F.month("ts")),
        score_col="value",
        cutoff=100.0,
        group_cols=["year", "month", "event_type"],
        id_col="user_id",
        out_name="n_users",
    )


# --------------------------------------------------------------------------
# Predicates P1-P14
# --------------------------------------------------------------------------


@register(
    "p_predicate_pushdown",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity BETWEEN 5 AND 45
      AND l_returnflag IN ('A', 'R')
      AND l_discount IS NOT NULL
    """,
    tags=("P1", "P5", "P6", "P7", "P8", "S1"),
    doc="range + IN + null predicates, all pushed to the parquet scan",
)
def p_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_discount").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "p_string_predicates",
    sql="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE contains(p_name, 'red') AND NOT contains(p_name, 'widget')
      AND regexp_matches(p_brand, 'Brand#1[0-9]')
    """,
    tags=("P9", "P10"),
    doc="contains / negated contains / rlike predicates",
)
def p_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.where(
        F.col("p_name").contains("red")
        & ~F.col("p_name").contains("widget")
        & F.col("p_brand").rlike("Brand#1[0-9]")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "p14_dedup_by_subset",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    tags=("P13", "P14"),
    doc="deterministic dropDuplicates(subset): keep first by (date, key)",
)
def p14_dedup_by_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dropDuplicates keeps an ARBITRARY row per key — fine for the
    # reference's use (`build_random_sets.py:38-39`) but not testable;
    # engine's canonical dedup is deterministic via row_number.
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


# --------------------------------------------------------------------------
# Aggregations A1-A10, A14
# --------------------------------------------------------------------------


@register(
    "a1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(max(l_discount), 2) AS max_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A3"),
    doc="TPC-H Q1-style grouped sum/avg/max/count",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "2001-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.max("l_discount"), 2).alias("max_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a2_count_distinct",
    sql="""
    SELECT c.c_nationkey, count(DISTINCT o.o_custkey) AS n_active_cust,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    tags=("A2", "J1"),
    doc="countDistinct over an equi-join",
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("o_custkey").alias("n_active_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "a3_global_agg",
    sql="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 2) AS total_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
    tags=("A3",),
    doc="global no-group aggregate (parquet footer-stats servable)",
)
def a3_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "a5_pivot_orderstatus",
    sql="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A5",),
    doc="pivot wide-reshape (values enumerated → no discovery pass)",
)
def a5_pivot_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    piv = relational.pivot_agg(
        orders,
        ["o_orderpriority"],
        "o_orderstatus",
        ["F", "O", "P"],
        F.sum("o_totalprice"),
    )
    return piv.select(
        "o_orderpriority",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("F", "O", "P")],
    )


@register(
    "a6_weighted_mean",
    sql="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A6",),
    doc="weighted mean as composite aggregate (wbgps/analysis.py:219)",
)
def a6_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(relational.weighted_mean("l_extendedprice", "l_quantity"), 4).alias(
            "wmean_price"
        )
    )


@register(
    "a7_stddev_sem",
    sql="""
    SELECT o_orderpriority,
           count(o_totalprice) AS n,
           round(stddev_samp(o_totalprice), 4) AS sd,
           round(stddev_samp(o_totalprice) / sqrt(count(o_totalprice)), 4) AS sem
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A7",),
    doc="dispersion + standard error of the mean (wbgps/analysis.py:220-224)",
)
def a7_stddev_sem(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("o_totalprice").alias("n"),
        F.round(F.stddev("o_totalprice"), 4).alias("sd"),
        F.round(relational.sem("o_totalprice"), 4).alias("sem"),
    )


@register(
    "a8_count_ratio",
    sql="""
    SELECT l_returnflag,
           round(CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS discounted_share
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A8",),
    doc="selectivity as ONE conditional aggregate (ref does two count() scans)",
)
def a8_count_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(relational.count_ratio(F.col("l_discount") > 0.05), 6).alias(
            "discounted_share"
        )
    )


@register(
    "a9_winsorized_sum",
    sql="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.01) AS lo,
             quantile_cont(o_totalprice, 0.99) AS hi
      FROM orders
    )
    SELECT year(o_orderdate) AS year,
           round(sum(least(greatest(o_totalprice, b.lo), b.hi)), 2) AS wsum_price,
           count(*) AS n_orders
    FROM orders, b
    GROUP BY year(o_orderdate)
    """,
    tags=("A9",),
    doc="winsorize at [p01,p99] then grouped sum (1_import.py:122-127)",
)
def a9_winsorized_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    clipped = relational.winsorize(orders, "o_totalprice", 0.01, 0.99, exact=True)
    return (
        clipped.withColumn("year", F.year("o_orderdate"))
        .groupBy("year")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("wsum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "a10_log_share",
    sql="""
    SELECT c_mktsegment,
           count(*) AS n_cust,
           round(ln(count(*)), 6) AS ln_n_cust,
           round(100.0 * count(*) / sum(count(*)) OVER (), 4) AS pct_cust
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("A10",),
    doc="log / share transforms post-aggregation (1_import.py:131-141)",
)
def a10_log_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    counts = customer.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_cust"))
    return counts.select(
        "c_mktsegment",
        "n_cust",
        F.round(F.log("n_cust"), 6).alias("ln_n_cust"),
        F.round(100.0 * F.col("n_cust") / F.sum("n_cust").over(Window.partitionBy()), 4).alias(
            "pct_cust"
        ),
    )


@register(
    "a14_panel_collapse",
    sql="""
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           round(avg(value), 4) AS value_mean,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    tags=("A14",),
    doc="daily panel collapse: mean + count by (group, day)",
)
def a14_panel_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .groupBy("event_type", "day")
        .agg(
            F.round(F.avg("value"), 4).alias("value_mean"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Joins J2-J5, J8
# --------------------------------------------------------------------------


@register(
    "j2_left_join_counts",
    sql="""
    SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    tags=("J2", "P12"),
    doc="left outer join preserving customers with zero orders",
)
def j2_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "j3_anti_join",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("J3", "U2"),
    doc="left_anti: customers with no orders (canonical form of split_random.py:36)",
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return joins.anti_join(
        customer, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


@register(
    "j4_broadcast_join",
    sql="""
    SELECT p.p_brand, round(sum(l.l_extendedprice), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("J4", "J1"),
    doc="broadcast hash join: fact × small dim, no fact-side shuffle",
)
def j4_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        joins.broadcast_join(li, part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j5_semi_join",
    sql="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
    tags=("J5", "U3"),
    doc="left_semi replacing collect()+isin (wbgps/analysis.py:354-356)",
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    keep = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        joins.semi_join(orders, keep, "o_custkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "j8_multiway_join",
    sql="""
    SELECT r.r_name, year(o.o_orderdate) AS year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, year(o.o_orderdate)
    """,
    tags=("J8", "J1", "J4"),
    doc="5-way join chain; dims broadcast, facts shuffle once on orderkey",
)
def j8_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = joins.multiway_join(
        li,
        [
            (orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner"),
            (F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"), "inner"),
            (F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "inner"),
            (F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "inner"),
        ],
    )
    return (
        joined.withColumn("year", F.year("o_orderdate"))
        .groupBy("r_name", "year")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Sets U1, sorts O2/O4, sampling R1/R2
# --------------------------------------------------------------------------


@register(
    "u1_union",
    sql="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM (
      SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity >= 45
      UNION ALL
      SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity <= 5
    ) GROUP BY l_returnflag
    """,
    tags=("U1",),
    doc="unionByName of two slices (stop_locations_append.py:128-129 pattern)",
)
def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    hi = li.where(F.col("l_quantity") >= 45)
    lo = li.where(F.col("l_quantity") <= 5)
    return (
        hi.unionByName(lo)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@register(
    "o2_global_topk",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey DESC
    LIMIT 10
    """,
    tags=("O2", "W4"),
    doc="global top-k via TakeOrderedAndProject (no full sort, no single-partition window)",
)
def o2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import global_topk

    orders = table(spark, sf_dir, "orders")
    return global_topk(orders, ["o_totalprice", "o_orderkey"], 10).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@register(
    "o4_uncertainty_band",
    sql="""
    SELECT event_id, round(value, 2) AS value
    FROM events
    ORDER BY abs(value - 250.0) ASC, event_id ASC
    LIMIT 20
    """,
    tags=("O4",),
    doc="nsmallest around a pivot score (uncertainty sampling at 0.5)",
)
def o4_uncertainty_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.withColumn("__d", F.abs(F.col("value") - 250.0))
        .orderBy(F.col("__d").asc(), F.col("event_id").asc())
        .limit(20)
        .select("event_id", F.round("value", 2).alias("value"))
    )


@register(
    "r1_hash_sample",
    sql="""
    SELECT doc_id, lang
    FROM documents
    WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 < 858993459
    """,
    tags=("R1",),
    doc="deterministic Bernoulli sample (20%) — stable across partitionings/engines",
)
def r1_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, "doc_id", 0.2).select("doc_id", "lang")


@register(
    "r2_stratified_sample",
    sql="""
    WITH n AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN n ON d.lang = n.lang
    WHERE (CAST(d.doc_id AS HUGEINT) * 2654435761) % 4294967296
          < CAST(floor(least(1.0, 40.0 / n.cnt) * 4294967296) AS BIGINT)
    """,
    tags=("R2",),
    doc="stratified sample, n≈40/stratum, fraction table broadcast (not collected)",
)
def r2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return sampling.stratified_hash_sample(docs, "lang", "doc_id", 40).select(
        "doc_id", "lang"
    )


@register(
    "tpch_q3_shipping",
    sql="""
    SELECT l.l_orderkey,
           ((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15'
      AND l.l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    tags=("tpch", "q3", "join", "topk"),
    doc="TPC-H Q3 shape (shipping-priority): 3-way "
    "customer->orders->lineitem join with date predicates on both fact "
    "sides, revenue aggregate, top-10. The selective c_mktsegment + "
    "date filters push to the scans; lineitem-orders is the one real "
    "shuffle (customer broadcast-eligible); TakeOrdered replaces a "
    "global sort",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1998-06-15"
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    )
    return (
        j.groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("__units")
        )
        .withColumn(
            # integer DIV keeps the half-up exact even past 2^53 units
            "revenue",
            F.expr("CAST((__units + 50) DIV 100 AS DOUBLE) / 100.0"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_local_volume",
    sql="""
    SELECT n.n_name,
           ((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT)) + 50) // 100) / 100.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
    tags=("tpch", "q5", "join"),
    doc="TPC-H Q5 shape (local-supplier volume): 6-table star join with "
    "the same-nation customer/supplier condition; every dimension "
    "(customer, supplier, nation, region) broadcast so the plan is one "
    "lineitem-orders shuffle plus broadcast hash joins — the canonical "
    "100 TB star-join shape",
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("__units")
        )
        .withColumn(
            # integer DIV keeps the half-up exact even past 2^53 units
            "revenue",
            F.expr("CAST((__units + 50) DIV 100 AS DOUBLE) / 100.0"),
        )
        .select("n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "a_unpivot_melt",
    sql="""
    WITH piv AS (
      SELECT o_orderpriority,
             round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F,
             round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O,
             round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, total
    FROM piv
    UNPIVOT (total FOR status IN (F, O, P))
    """,
    tags=("reshape", "unpivot"),
    doc="long-reshape / melt (Spark's native unpivot, the inverse of "
    "A5's pivot): the wide status columns fold back to (key, status, "
    "total) rows — a pure NARROW projection-explosion, zero shuffle "
    "beyond the feeding aggregate; UNPIVOT drops NULL cells in both "
    "engines (here none exist: the pivot coalesces to 0)",
)
def a_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import relational

    orders = table(spark, sf_dir, "orders")
    piv = relational.pivot_agg(
        orders,
        ["o_orderpriority"],
        "o_orderstatus",
        ["F", "O", "P"],
        F.sum("o_totalprice"),
    )
    wide = piv.select(
        "o_orderpriority",
        *[
            F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c)
            for c in ("F", "O", "P")
        ],
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="total",
    )


@register(
    "o_group_topk",
    sql="""
    SELECT user_id, event_id, rnk, value FROM (
      SELECT user_id, event_id, value,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC
             ) AS BIGINT) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
    tags=("topk", "window"),
    doc="per-group top-k (top-3 events by value per user): ONE keyed "
    "window shuffle with a rank filter Spark pushes into the sort "
    "(WindowGroupLimit — each partition keeps k rows per key BEFORE the "
    "exchange, so the shuffle carries ~k x groups rows, not the corpus); "
    "the per-key sibling of O2's global TakeOrdered",
)
def o_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk", "value")
    )


@register(
    "a_gini",
    sql="""
    WITH r AS (
      SELECT o_orderpriority AS prio, o_totalprice AS x,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC
             ) AS BIGINT) AS i
      FROM orders
    )
    SELECT prio, CAST(count(*) AS BIGINT) AS n,
           round(
             2.0 * sum(CAST(i AS DOUBLE) * x)
               / (count(*) * sum(x))
               - (count(*) + 1.0) / count(*),
             6
           ) AS gini
    FROM r GROUP BY prio
    """,
    tags=("aggregation", "inequality", "gini"),
    doc="per-group Gini coefficient (the SDG inequality measure the "
    "reference's wealth-index work points at; W6's cumulative-share "
    "binning is the Lorenz-curve sibling): exact rank formulation "
    "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over the within-group "
    "ascending rank — one keyed window shuffle + one aggregate; for a "
    "single corpus-sized group swap the window for windows.global_rank "
    "(same formula, no single-partition sort)",
)
def a_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    r = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    return r.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            2.0
            * F.sum(F.col("i").cast("double") * F.col("x"))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@register(
    "dq_profile",
    sql="""
    SELECT 'l_quantity' AS col,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           round(min(l_quantity), 4) AS min_v,
           round(max(l_quantity), 4) AS max_v,
           round(avg(l_quantity), 4) AS mean_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           round(min(l_discount), 4), round(max(l_discount), 4),
           round(avg(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
           round(avg(l_extendedprice), 4)
    FROM lineitem
    """,
    tags=("data-quality", "profiling"),
    doc="column profile (the data-quality first pass: null rate, distinct "
    "count, min/max/mean per column) — ONE aggregation computes every "
    "column's stats simultaneously (count(DISTINCT a), count(DISTINCT b) "
    "in one agg = Spark's expand-based multi-distinct), then a narrow "
    "unpivot to one row per column; the corpus is scanned once, not "
    "once per column",
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    # r11: the three countDistincts moved OUT of the shared aggregate —
    # multiple distinct aggregates plan as an Expand that replicates
    # every input row (1 + n_distinct_cols)×, then shuffles the widened
    # frame (measured 2x the whole query at sf0.1). Each countDistinct
    # now runs as its own two-phase hash aggregate (partial distinct
    # map-side) over a single-column pruned scan, attached to the 1-row
    # stats frame by broadcast crossJoin — same values, no Expand; at
    # scale, 3 single-column parquet scans cost less than 4x-replicating
    # the corpus through one shuffle.
    base_aggs = []
    for c in cols:
        base_aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__null"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
        ]
    g = li.agg(*base_aggs)
    for c in cols:
        nd = li.agg(F.countDistinct(c).cast("long").alias(f"{c}__nd"))
        g = g.crossJoin(F.broadcast(nd))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
                F.col(f"{c}__mean").alias("mean_v"),
            )
            for c in cols
        ]
    )
    return g.select(F.explode(rows).alias("__r")).select("__r.*")


@register(
    "tpch_q10_returns",
    sql="""
    SELECT c.c_custkey, c.c_name,
           ((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    tags=("tpch", "q10", "join", "topk"),
    doc="TPC-H Q10 shape (returned-item reporting): 4-way "
    "customer->orders->lineitem->nation join, quarter date window + "
    "returnflag predicate pushed to both fact scans, revenue per "
    "customer, top-20. Nation broadcasts; lineitem-orders is the one "
    "big shuffle; TakeOrdered replaces the global sort. Revenue "
    "accumulates in exact integer 1e-4 units (per-row product rounded "
    "once) and the 2dp half-up happens in INTEGER space — float round() "
    "semantics at .xx5 differ between engines (decimal-string vs binary "
    "double), so no float ever meets a rounding boundary here",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("__units")
        )
        .withColumn(
            # integer DIV keeps the half-up exact even past 2^53 units
            "revenue",
            F.expr("CAST((__units + 50) DIV 100 AS DOUBLE) / 100.0"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q18_big_orders",
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 210
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
    tags=("tpch", "q18", "join", "semi", "topk"),
    doc="TPC-H Q18 shape (large-volume customer): the HAVING subquery "
    "becomes a selective key frame (lineitem groupBy orderkey, "
    "sum(qty) > 210) that SEMI-joins orders before the wide joins — the "
    "classic filter-early plan; customer joins after the fact side has "
    "shrunk; TakeOrdered top-100",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 210)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = table(spark, sf_dir, "customer")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).join(
        li, F.col("o_orderkey") == li["l_orderkey"]
    )
    return (
        j.groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# --------------------------------------------------------------------------
# TPC-H classic shapes, round 5 — the remaining canonical OLAP patterns
# (existence semi-join, pure-scan aggregate, conditional-sum pivot, promo
# ratio, anti-join + distinct-count, disjunctive join predicates,
# NOT-EXISTS + scalar subquery). Columns the TPC-H-ish fixture lacks
# (l_shipmode, l_commitdate, p_container, c_phone) are substituted with
# in-schema analogues that preserve each query's PLAN shape.
# --------------------------------------------------------------------------


@register(
    "tpch_q4_priority_count",
    sql="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("tpch", "q4", "semi-join"),
    doc="TPC-H Q4 shape (order-priority checking): EXISTS correlated "
    "subquery -> left-semi join with a NON-equi conjunct (late "
    "shipment: l_shipdate > o_orderdate + 90 days; the fixture lacks "
    "l_commitdate/l_receiptdate). The semi-join keeps each order at "
    "most once regardless of how many lines are late — a plain inner "
    "join + distinct would shuffle the multiplicity; the semi stops "
    "probing a key at first match",
)
def tpch_q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_forecast_revenue",
    sql="""
    SELECT ((sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
             + 50) // 100) / 100.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "q6", "scan-agg"),
    doc="TPC-H Q6 shape (forecasting revenue change): zero-join "
    "scan-aggregate whose entire cost is the parquet scan — all four "
    "predicates and the 3-column projection must reach the reader "
    "(PushedFilters + ReadSchema; the plan gate for pushdown is "
    "test_plans.py::test_filter_pushdown_reaches_scan). Revenue in "
    "integer 1e-4 units, half-up to cents at the end — float-sum-order "
    "proof like the other tpch_* entries",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000)
                .cast("long")
            ).alias("__units")
        )
        .select(
            F.expr("CAST((__units + 50) DIV 100 AS DOUBLE) / 100.0").alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q12_priority_by_flag",
    sql="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("tpch", "q12", "conditional-agg"),
    doc="TPC-H Q12 shape (shipping modes / order priority): fact-fact "
    "equi-join with the date filter pushed to the lineitem scan, then "
    "conditional sums pivoting priority into columns (the fixture "
    "lacks l_shipmode; l_returnflag plays the mode dimension). The "
    "CASE-sum form aggregates in one pass — no second groupBy per "
    "priority class",
)
def tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q14_promo_effect",
    sql="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                 * 10000) AS BIGINT) ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 10000) AS BIGINT)),
             6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
    tags=("tpch", "q14", "ratio"),
    doc="TPC-H Q14 shape (promotion effect): one-month lineitem slice "
    "joined to the part dimension (broadcast-eligible), promo share of "
    "revenue as a conditional-sum ratio in a single aggregate pass. "
    "Integer 1e-4 revenue units keep numerator and denominator exact, "
    "so the ratio is engine-portable at 6dp",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", units).otherwise(0)).alias(
                "__promo"
            ),
            F.sum(units).alias("__total"),
        )
        .select(
            F.round(
                100.0 * F.col("__promo") / F.col("__total"), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16_supplier_variety",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 50
    """,
    tags=("tpch", "q16", "anti-join"),
    doc="TPC-H Q16 shape (parts/supplier relationship): lineitem stands "
    "in for partsupp (the fixture has no partsupp table) — part-attr "
    "filters pushed to the broadcast dimension, NOT IN complaint "
    "suppliers as a left-anti join (negative s_acctbal plays the "
    "'Customer Complaints' comment filter), then count(DISTINCT "
    "suppkey) per (brand, type, size). The anti side is "
    "dimension-sized and broadcast; the distinct-agg is the one "
    "corpus shuffle",
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad_supp = table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            li["l_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            "p_brand",
            "p_type",
            "p_size",
        )
        .limit(50)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    sql="""
    SELECT ((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT)) + 50) // 100) / 100.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "q19", "disjunctive"),
    doc="TPC-H Q19 shape (discounted revenue): three OR'd "
    "brand/size/quantity conjunction branches spanning BOTH join sides "
    "(p_container/l_shipmode substituted by in-schema columns). The "
    "join stays a hash equi-join on partkey with the disjunction as a "
    "post-join filter; per-side prefixes (quantity <= 30, size >= 1) "
    "are what the optimizer can factor out and push to the scans",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    b = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        j.where(b)
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("__units")
        )
        .select(
            F.expr("CAST((__units + 50) DIV 100 AS DOUBLE) / 100.0").alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q22_idle_customers",
    sql="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / count(*) AS a_cents
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT c.c_nationkey,
           count(*) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.a_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("tpch", "q22", "anti-join", "scalar-subquery"),
    doc="TPC-H Q22 shape (global sales opportunity): scalar-subquery "
    "average balance (1-row broadcast crossJoin), NOT EXISTS orders as "
    "a left-anti join on custkey, grouped by nation (standing in for "
    "the c_phone country prefix the fixture lacks). The anti-join is "
    "the one real shuffle; the average rides in as a literal-like "
    "1-row frame. Both the average-balance threshold and the final sum "
    "run in integer cents (exact bigint summation) so the comparison "
    "and the 2dp total are summation-order-proof between engines — the "
    "same float-order pinning as the other tpch_* entries",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(nations)
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents).cast("double") / F.count(F.lit(1))).alias("__a_cents")
    )
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(cents > F.col("__a_cents"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "tpch_q7_nation_volume",
    sql="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           ((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT)) + 50) // 100) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "q7", "join"),
    doc="TPC-H Q7 shape (volume shipping between nations): 6-table join "
    "where the selective predicate is a DISJUNCTION over a PAIR of "
    "dimension attributes on opposite sides of the fact — each nation "
    "filter prunes its dimension scan, but the cross-side pairing can "
    "only apply after both joins; grouped by (supp_nation, cust_nation, "
    "ship year). All dimensions broadcast; lineitem-orders is the one "
    "real shuffle",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_3", "NATION_7")
    nation = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(*pair)
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("__sk"),
            F.col("n_name").alias("supp_nation"),
        )),
        F.col("s_nationkey") == F.col("__sk"),
    ).select("s_suppkey", "supp_nation")
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("__ck"),
            F.col("n_name").alias("cust_nation"),
        )),
        F.col("c_nationkey") == F.col("__ck"),
    ).select("c_custkey", "cust_nation")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("__units")
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.expr("CAST((__units + 50) DIV 100 AS DOUBLE) / 100.0").alias(
                "revenue"
            ),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- round 6: the remaining TPC-H classics (Q2/Q8/Q9/Q11/Q13/Q15/Q17/Q20/
# Q21), completing all 22 query shapes. The fixture has no partsupp table,
# no l_commitdate/l_receiptdate and no comment columns, so the standard
# substitutions documented per query stand in (the SHAPE — correlated
# min, nested semi/anti joins, two-level aggregation — is what each query
# exercises). All money/quantity aggregates run in integer cents/units
# (exact long summation) so no hash can flip on engine summation order.


@register(
    "tpch_q2_min_cost_supplier",
    sql="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
               AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT o.l_partkey, o.cost_cents, s.s_name, s.s_acctbal, n.n_name
      FROM offers o
      JOIN supplier s ON o.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN part p ON o.l_partkey = p.p_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_size = 15 AND p.p_type = 'ECONOMY'
    )
    SELECT l_partkey AS p_partkey,
           CAST(cost_cents AS DOUBLE) / 100.0 AS min_cost,
           s_name, s_acctbal, n_name
    FROM (
      SELECT *, row_number() OVER (PARTITION BY l_partkey
                                   ORDER BY cost_cents, s_name) AS rn
      FROM eligible
    ) WHERE rn = 1
    """,
    tags=("tpch", "q2", "correlated-min"),
    doc="TPC-H Q2 shape (min-cost supplier): the correlated "
    "min-subquery resolved as a per-part argmin window with a "
    "deterministic s_name tiebreak. partsupp is substituted by the "
    "observed (part, supplier) offer table aggregated from lineitem "
    "(unit price pinned to integer cents BEFORE the min, so the "
    "correlated minimum is an exact integer in both engines). Join "
    "order: offers shuffle-join part (pruned by size/type scan "
    "filters); supplier->nation->region ride in as broadcasts",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    parts = table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    # r11: the selective part filter now prunes lineitem BEFORE the
    # (partkey, suppkey) aggregate (broadcast semi-join — guide §3.2's
    # reduce-the-big-side; filtering on the group key commutes with the
    # groupBy, so results are unchanged and the aggregate shuffles only
    # the eligible parts' offers). The old shape aggregated every pair,
    # then threw most of them away at the part join.
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    ).join(
        F.broadcast(parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast(
                "long"
            )
        ).alias("cost_cents")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = offers.join(
        F.broadcast(supp), offers["l_suppkey"] == supp["s_suppkey"]
    )
    w = Window.partitionBy("l_partkey").orderBy("cost_cents", "s_name")
    return (
        eligible.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("cost_cents").cast("double") / 100.0).alias("min_cost"),
            "s_name", "s_acctbal", "n_name",
        )
    )


@register(
    "tpch_q8_market_share",
    sql="""
    WITH vol AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS v_cents,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE rc.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                               THEN v_cents ELSE 0 END) AS DOUBLE)
                 / sum(v_cents), 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch", "q8", "market-share"),
    doc="TPC-H Q8 shape (national market share): NATION_5's share of "
    "PROMO-part revenue sold into ASIA-region customers, by order "
    "year. Six-table join where every dimension (part/customer/nation/"
    "region/supplier) broadcasts and only lineitem-orders shuffles; "
    "numerator and denominator are exact cent sums, the ratio rounds "
    "identically in both engines",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    parts = table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    nat = table(spark, sf_dir, "nation")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    v_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    vol = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_semi")
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.year("o_orderdate").alias("o_year"),
            v_cents.alias("v_cents"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("v_cents"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum("v_cents"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    sql="""
    SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)
                    - CAST(round(p.p_retailprice * 50) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY ns.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year
    """,
    tags=("tpch", "q9", "profit"),
    doc="TPC-H Q9 shape (product-type profit): per supplier-nation and "
    "order-year profit on parts matching a name pattern. ps_supplycost "
    "is substituted by 0.5 x p_retailprice (a deterministic per-part "
    "cost, pinned to integer cents) so profit = revenue_cents - "
    "cost_cents x qty is exact long arithmetic end-to-end. The name "
    "filter prunes part BEFORE the join; dimensions broadcast",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    parts = table(spark, sf_dir, "part").where(
        F.col("p_name").contains("red")
    ).select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 50).cast("long").alias("cost_cents"),
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        - F.col("cost_cents") * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(profit).cast("double") / 100.0).alias("sum_profit")
        )
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q11_important_stock",
    sql="""
    WITH val AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS v_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT CAST(sum(v_cents) AS BIGINT) AS t_cents FROM val)
    SELECT v.l_partkey AS p_partkey,
           CAST(v.v_cents AS DOUBLE) / 100.0 AS stock_value
    FROM val v, tot
    WHERE v.v_cents * 1000 > tot.t_cents
    ORDER BY p_partkey
    """,
    tags=("tpch", "q11", "scalar-subquery"),
    doc="TPC-H Q11 shape (important stock): parts whose NATION_3-"
    "supplied value exceeds 0.1% of the national total. partsupp value "
    "is substituted by observed lineitem value. The HAVING-vs-scalar-"
    "subquery comparison is v*1000 > total in exact longs — no float "
    "fraction can flip a boundary part between engines. One shuffle "
    "(part aggregate); the 1-row total broadcasts back",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("v_cents")
        )
    )
    tot = val.agg(F.sum("v_cents").alias("t_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("v_cents") * 1000 > F.col("t_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("v_cents").cast("double") / 100.0).alias("stock_value"),
        )
        .orderBy("p_partkey")
    )


@register(
    "tpch_q13_order_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "q13", "outer-join-histogram"),
    doc="TPC-H Q13 shape (customer order distribution): two-level "
    "aggregate over a filtered LEFT join — customers with zero "
    "qualifying orders must appear in the c_count=0 bucket, which is "
    "why the filter lives in the JOIN CONDITION, not a WHERE (the "
    "classic outer-join-filter trap). o_orderpriority stands in for "
    "the o_comment pattern the fixture lacks. Pure integer counts",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                           AS BIGINT)) AS BIGINT) AS units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT max(units) AS m FROM revenue)
    SELECT s.s_suppkey, s.s_name,
           CAST((r.units + 50) // 100 AS DOUBLE) / 100.0 AS total_revenue
    FROM revenue r JOIN supplier s ON r.supplier_no = s.s_suppkey, mx
    WHERE r.units = mx.m
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "q15", "view-max"),
    doc="TPC-H Q15 shape (top supplier): quarterly revenue per supplier "
    "(the CREATE VIEW of the spec inlined as a CTE), then the suppliers "
    "matching the MAX. The max-equality is over exact integer 1e-4 "
    "units — the one comparison the float form cannot be trusted with, "
    "since ANY summation-order wobble changes membership. Aggregate "
    "shuffle + 1-row broadcast back",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long")
        ).alias("units")
    )
    mx = revenue.agg(F.max("units").alias("m"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("units") == F.col("m"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.expr("CAST((units + 50) DIV 100 AS DOUBLE) / 100.0").alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    sql="""
    WITH pq AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#4' AND p.p_type = 'SMALL'
      GROUP BY l.l_partkey
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN pq ON l.l_partkey = pq.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * pq.cnt < pq.sum_qty
    """,
    tags=("tpch", "q17", "correlated-avg"),
    doc="TPC-H Q17 shape (small-quantity-order revenue): lineitems "
    "below 20% of their part's average quantity. The correlated AVG "
    "subquery is decorrelated into one per-part aggregate joined back "
    "(what Catalyst/DuckDB both do to the spec form), and the "
    "qty < 0.2*avg comparison is cross-multiplied into exact integers "
    "(qty*5*cnt < sum_qty) — no division, no float boundary. "
    "p_container is substituted by p_type",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(pq, "l_partkey")
        .where(F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("double") / 100.0 / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_part_promotion",
    sql="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                            AND l_shipdate < TIMESTAMP '1998-01-01'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS qty_1997,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_all
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    hot AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh
      JOIN part p ON sh.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'small%' AND sh.qty_1997 * 2 > sh.qty_all
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN hot ON s.s_suppkey = hot.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "q20", "nested-semi-join"),
    doc="TPC-H Q20 shape (part promotion candidates): NATION_7 "
    "suppliers who concentrated >half of a 'small%'-part's lifetime "
    "shipments into 1997 (ps_availqty > 0.5*qty_shipped substituted by "
    "the in-fixture qty_1997 > 0.5*qty_all, same nested semi-join "
    "chain: lineitem agg -> part name filter -> supplier -> nation). "
    "Integer quantity sums; the half threshold is the exact "
    "cross-multiplied 2*qty_1997 > qty_all",
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_1997 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.when(in_1997, F.col("l_quantity").cast("long")).otherwise(F.lit(0))
        ).alias("qty_1997"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_all"),
    )
    parts = table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    hot = (
        shipped.join(F.broadcast(parts),
                     F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .where(F.col("qty_1997") * 2 > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_7")
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(hot, supp["s_suppkey"] == hot["l_suppkey"], "left_semi")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_waiting_suppliers",
    sql="""
    WITH l AS (
      SELECT li.l_orderkey, li.l_suppkey,
             CASE WHEN li.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem li
      JOIN orders o ON li.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per AS (
      SELECT l_orderkey, l_suppkey, max(late) AS late
      FROM l GROUP BY l_orderkey, l_suppkey
    ),
    ord AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_supp,
             CAST(sum(late) AS BIGINT) AS n_late
      FROM per GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per
    JOIN ord ON per.l_orderkey = ord.l_orderkey
    JOIN supplier s ON per.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE per.late = 1 AND ord.n_supp > 1 AND ord.n_late = 1
      AND n.n_name = 'NATION_1'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    tags=("tpch", "q21", "exists-not-exists"),
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): NATION_1 "
    "suppliers who were the SOLE late supplier on a multi-supplier "
    "finished order. The spec's EXISTS(other supplier) AND NOT "
    "EXISTS(other late supplier) pair is decorrelated into one "
    "per-(order,supplier) lateness aggregate + one per-order rollup "
    "(n_supp>1, n_late=1) — two shuffles total instead of two "
    "correlated self-join probes, the form that survives a 100x "
    "lineitem. 'Late' = shipped >90 days after order date "
    "(receipt/commit dates are not in the fixture); counts only",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    ord_stats = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_1")
        .select("s_suppkey", "s_name")
    )
    return (
        per.where(F.col("late") == 1)
        .join(ord_stats, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), per["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
