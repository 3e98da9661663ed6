"""Layer-B query corpus: the delegated query surface of the reference.

Each entry re-expresses one row of SURVEY.md §2.2 (the Polars
operations the reference's README/docs/examples exercise downstream of
its Zarr scan) as an idiomatic Spark DataFrame query over the driver's
TPC-H-ish tables, paired with DuckDB oracle SQL.

Scale notes (100 TB design stance), applied throughout:

* Aggregations are expressed as single ``groupBy().agg()`` — Spark
  plans partial (map-side) aggregation automatically, so the shuffle
  carries one row per (partition × group), not per input row.
* Joins against the small dimension tables (`region`, `nation`,
  `supplier`) are explicitly ``broadcast()`` — no shuffle of the fact
  table on those keys at any scale. Fact-fact joins (orders⋈lineitem)
  shuffle on the join key, which AQE re-plans at runtime.
* Filters are applied before joins/aggregations so Catalyst pushes
  them into the parquet scan (verify: `PushedFilters` in
  ``.explain("formatted")``).
* Window functions partition by bounded-cardinality keys; nothing is
  ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cae_polars_tools_spark.functions import dsum, dsum_sql
from cae_polars_tools_spark.io import read_table
from cae_polars_tools_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation after scan+filter — the reference's headline pattern
# (README.md group_by/agg examples; SURVEY §2.2 "Group-by aggregation").
# TPC-H Q1 shape: the flagship query.
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            SUM(l_quantity) AS sum_qty,
            {sum_base} AS sum_base_price,
            {sum_disc} AS sum_disc_price,
            {sum_charge} AS sum_charge,
            ROUND(AVG(l_quantity), 4) AS avg_qty,
            ROUND(AVG(l_extendedprice), 4) AS avg_price,
            ROUND(AVG(l_discount), 4) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_base=dsum_sql("l_extendedprice"),
        sum_disc=dsum_sql("l_extendedprice * (1 - l_discount)", scale=4),
        sum_charge=dsum_sql(
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)", scale=6
        ),
    ),
    tags=("agg", "filter", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→hash-agg→(sort): filter + group_by + sum/mean/count.

    Reference pattern: README.md:85-89 group_by().agg() after scan;
    filter-before-agg per docs/user_guide/performance_tips.md:146-188.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projection + column derivation (SURVEY §2.2 rows "Projection",
# "Column derivation", "Rename/alias": with_columns arithmetic
# -273.15 / ** / % / // patterns, examples/basic_usage.py:80-82, 382-384).
# ---------------------------------------------------------------------------

@register(
    "q02_projection_arith",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            l_quantity - 25.0 AS qty_centered,
            l_extendedprice * (1 - l_discount) AS disc_price,
            CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
            CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_div7,
            POWER(l_quantity, 2) AS qty_sq,
            -l_discount AS neg_disc
        FROM lineitem
    """,
    tags=("projection",),
)
def q02_projection_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select + withColumns arithmetic (+ - * / % // ** unary-minus).

    Per-row IEEE arithmetic is deterministic across engines, so no
    rounding is needed. Catalyst prunes the scan to the 5 referenced
    columns (check ReadSchema in explain).
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") - 25.0).alias("qty_centered"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        (-F.col("l_discount")).alias("neg_disc"),
    )


# ---------------------------------------------------------------------------
# Filters & predicates (is_between / is_in / boolean combinators /
# null-checks; SURVEY §2.2 "Filter / predicates").
# ---------------------------------------------------------------------------

@register(
    "q03_filter_predicates",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('A', 'N')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND (l_discount > 0.05 OR l_tax < 0.02)
          AND l_extendedprice IS NOT NULL
    """,
    tags=("filter",),
)
def q03_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """between / isin / &,| / isNotNull predicate stack, pushed to scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.02))
        & F.col("l_extendedprice").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount")


# ---------------------------------------------------------------------------
# Conditional when/then/otherwise (examples/basic_usage.py:253-263).
# ---------------------------------------------------------------------------

@register(
    "q04_conditional_case",
    oracle="""
        SELECT
            CASE WHEN o_totalprice < 100000 THEN 'small'
                 WHEN o_totalprice < 300000 THEN 'medium'
                 ELSE 'large' END AS bucket,
            COUNT(*) AS n_orders,
            {tp} AS total_price
        FROM orders
        GROUP BY 1
    """.format(tp=dsum_sql("o_totalprice")),
    tags=("conditional", "agg"),
)
def q04_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/when/otherwise + lit, then aggregate by the derived label."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, F.lit("small"))
        .when(F.col("o_totalprice") < 300000, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Global (no-key) aggregation (examples/basic_usage.py:355-366).
# ---------------------------------------------------------------------------

@register(
    "q05_global_agg",
    oracle="""
        SELECT
            COUNT(*) AS n_rows,
            SUM(l_quantity) AS sum_qty,
            MIN(l_extendedprice) AS min_price,
            MAX(l_extendedprice) AS max_price,
            ROUND(AVG(l_extendedprice), 4) AS avg_price,
            ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price
        FROM lineitem
    """,
    tags=("agg",),
)
def q05_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-frame mean/max/min/std/count — a single partial-agg pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev("l_extendedprice"), 4).alias("std_price"),
    )


@register(
    "q06_groupby_stats",
    oracle="""
        SELECT
            event_type,
            COUNT(*) AS n_events,
            ROUND(AVG(value), 4) AS avg_value,
            MIN(value) AS min_value,
            MAX(value) AS max_value,
            ROUND(STDDEV_SAMP(value), 4) AS std_value,
            COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
    tags=("agg",),
)
def q06_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_by().agg(mean,min,max,std,count,n_unique) on the events table."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(F.stddev("value"), 4).alias("std_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Correlation aggregate (docs/examples/index.md:63-67 pl.corr).
# ---------------------------------------------------------------------------

@register(
    "q07_corr",
    oracle="""
        SELECT
            l_returnflag,
            ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q07_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pl.corr equivalent: F.corr inside a grouped aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr")
    )


# ---------------------------------------------------------------------------
# Distinct (test_polars_converter.py:335-337 .unique()).
# ---------------------------------------------------------------------------

@register(
    "q08_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def q08_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unique() → distinct(); map-side combine keeps the shuffle tiny."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Sort + limit = top-k (examples/basic_usage.py:399-400 sort+head).
# ---------------------------------------------------------------------------

@register(
    "q09_sort_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q09_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans orderBy+limit as TakeOrderedAndProject — each
    partition keeps only k rows, no global sort shuffle. Deterministic
    tie-break on the key column."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Equi-joins (README.md:141-148 multi-variable join; TPC-H Q3/Q5 shapes).
# ---------------------------------------------------------------------------

@register(
    "q10_join_shipping_priority",
    oracle="""
        SELECT
            l.l_orderkey AS o_key,
            {rev} AS revenue,
            o.o_orderdate,
            o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_key ASC
        LIMIT 10
    """.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)", scale=4)),
    tags=("join", "agg", "sort"),
)
def q10_join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered fact⋈fact⋈dim join then agg + top-k.

    orders⋈lineitem is a key-shuffle join (both sides large at scale);
    the filtered customer side is small after the segment filter, so
    AQE converts it to broadcast at runtime.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            li.l_orderkey.alias("o_key"), o.o_orderdate, o.o_orderpriority
        )
        .agg(F.sum(rev.cast("decimal(18,4)")).cast("double").alias("revenue"))
        .select("o_key", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_key").asc())
        .limit(10)
    )


@register(
    "q11_join_regional_revenue",
    oracle="""
        SELECT
            n.n_name,
            {rev} AS revenue,
            COUNT(*) AS n_lineitems
        FROM region r
        JOIN nation n ON r.r_regionkey = n.n_regionkey
        JOIN customer c ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)", scale=4)),
    tags=("join", "agg", "broadcast"),
)
def q11_join_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with explicitly broadcast dimensions.

    region/nation are broadcast (no fact shuffle on their keys);
    customer⋈orders and orders⋈lineitem shuffle on their join keys —
    the two unavoidable shuffles at 100 TB.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == n.n_nationkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev.cast("decimal(18,4)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Window patterns: anomaly-vs-group-mean, argmax, lag/diff
# (docs/examples/index.md:28-41, 93-99; examples/basic_usage.py:238-244).
# ---------------------------------------------------------------------------

@register(
    "q12_window_anomaly",
    oracle="""
        SELECT
            event_id,
            event_type,
            ROUND(value - AVG(value) OVER (PARTITION BY event_type), 4)
                AS value_anomaly
        FROM events
    """,
    tags=("window",),
)
def q12_window_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly = value − group mean. The reference does this as a
    self-join on its group_by (docs/examples/index.md:28-41); the
    idiomatic Spark form is an unbounded window — one shuffle on the
    partition key instead of agg + join."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.avg("value").over(w), 4).alias("value_anomaly"),
    )


@register(
    "q13_argmax_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (
            SELECT MAX(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
    """,
    tags=("window", "filter"),
)
def q13_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter(col == col.max() over group) — max-equality selection
    (examples/basic_usage.py:238-244), via a window max + filter."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("max_tp", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("max_tp"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q14_lag_diff",
    oracle="""
        SELECT
            event_id,
            user_id,
            value - LAG(value) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
            ) AS value_diff
        FROM events
    """,
    tags=("window",),
)
def q14_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """.sort().diff() equivalent: value − lag(value) per user over time
    (docs/examples/index.md:93-99 lapse-rate pattern)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_diff"),
    )


# ---------------------------------------------------------------------------
# Date/time functions (README.md:111-115; docs/examples/index.md:209-213).
# ---------------------------------------------------------------------------

@register(
    "q15_datetime_parts",
    oracle="""
        SELECT
            CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
            CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
            COUNT(*) AS n_orders,
            {tp} AS total_price
        FROM orders
        WHERE EXTRACT(doy FROM o_orderdate) <= 180
        GROUP BY 1, 2
    """.format(tp=dsum_sql("o_totalprice")),
    tags=("datetime", "agg"),
)
def q15_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dt.year()/dt.month()/dt.day_of_year() equivalents + agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.dayofyear("o_orderdate") <= 180)
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Math scalar functions (docs/examples/index.md:113-116 sqrt/**/arctan2).
# ---------------------------------------------------------------------------

@register(
    "q16_math_funcs",
    oracle="""
        SELECT
            p_partkey,
            ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
            ROUND(ATAN2(p_size, p_retailprice), 6) AS size_angle,
            ROUND(LN(p_retailprice), 6) AS price_ln,
            ABS(p_size - 25) AS size_dev
        FROM part
    """,
    tags=("math",),
)
def q16_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt / atan2 / ln / abs scalar math, JVM-side codegen."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.col("p_retailprice")), 6).alias("size_angle"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
    )


# ---------------------------------------------------------------------------
# Casting (docs/user_guide/performance_tips.md:124-143).
# ---------------------------------------------------------------------------

@register(
    "q17_casts",
    oracle="""
        SELECT
            l_orderkey,
            CAST(l_quantity AS INT) AS qty_int,
            CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date_str,
            CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
            CAST(l_linenumber AS VARCHAR) AS line_str
        FROM lineitem
        WHERE l_orderkey <= 100
    """,
    tags=("cast",),
)
def q17_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast() fidelity: double→int, timestamp→date, double→decimal,
    int→string. Date/decimal results are re-cast to string so the
    cross-engine comparison is representation-stable (pandas renders
    DATE/DECIMAL differently per engine)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 100).select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date_str"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("l_linenumber").cast("string").alias("line_str"),
    )


# ---------------------------------------------------------------------------
# Concat / union-all (pl.concat; polars_converter.py:303 chunk concat).
# ---------------------------------------------------------------------------

@register(
    "q18_union_concat",
    oracle="""
        SELECT o_orderkey, o_totalprice, 'high' AS tier
        FROM orders WHERE o_totalprice >= 400000
        UNION ALL
        SELECT o_orderkey, o_totalprice, 'low' AS tier
        FROM orders WHERE o_totalprice < 20000
    """,
    tags=("union",),
)
def q18_union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pl.concat → unionByName; Spark unions are metadata-only (no
    shuffle) — partitions of both children are simply concatenated."""
    o = _t(spark, sf_dir, "orders")
    high = (
        o.filter(F.col("o_totalprice") >= 400000)
        .select("o_orderkey", "o_totalprice", F.lit("high").alias("tier"))
    )
    low = (
        o.filter(F.col("o_totalprice") < 20000)
        .select("o_orderkey", "o_totalprice", F.lit("low").alias("tier"))
    )
    return high.unionByName(low)


# ---------------------------------------------------------------------------
# Binning (examples/basic_usage.py:382-384 (col // 10 * 10) bins).
# ---------------------------------------------------------------------------

@register(
    "q19_binning",
    oracle="""
        SELECT
            CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS price_bin,
            COUNT(*) AS n_orders,
            ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "binning"),
)
def q19_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col // w * w) histogram binning + per-bin stats."""
    o = _t(spark, sf_dir, "orders")
    bin_col = (F.floor(F.col("o_totalprice") / 50000) * 50000).alias("price_bin")
    return o.groupBy(bin_col).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Data-quality report (docs/examples/index.md:238-252 null/inf counting).
# ---------------------------------------------------------------------------

@register(
    "q20_quality_report",
    oracle="""
        SELECT
            COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
            CAST(SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_value,
            CAST(SUM(CASE WHEN value = 'Infinity'::DOUBLE
                      OR value = '-Infinity'::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS n_inf_value,
            CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
            CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user
        FROM events
    """,
    tags=("agg", "quality"),
)
def q20_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_null / is_nan / is_infinite / range-violation counts —
    the reference's data-quality report pattern. NaN≠null semantics
    (SURVEY §2.3.5) are preserved: separate counters."""
    from cae_polars_tools_spark.functions import is_infinite

    ev = _t(spark, sf_dir, "events")
    as_int = lambda c: c.cast("int")  # noqa: E731
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(as_int(F.col("value").isNull())).alias("n_null_value"),
        F.sum(as_int(F.isnan("value"))).alias("n_nan_value"),
        F.sum(as_int(is_infinite("value"))).alias("n_inf_value"),
        F.sum(as_int(F.col("value") < 0)).alias("n_negative"),
        F.sum(as_int(F.col("user_id").isNull())).alias("n_null_user"),
    )


# ---------------------------------------------------------------------------
# Weighted mean (docs/examples/index.md:185-189).
# ---------------------------------------------------------------------------

@register(
    "q21_weighted_mean",
    oracle="""
        SELECT
            l_returnflag,
            CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE)
              / SUM(l_quantity) AS weighted_avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q21_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w·x).sum()/w.sum() computed in one aggregation pass."""
    li = _t(spark, sf_dir, "lineitem")
    wx = (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        (F.sum(wx).cast("double") / F.sum("l_quantity")).alias("weighted_avg_price")
    )


# ---------------------------------------------------------------------------
# Quantiles — exact percentiles (examples/basic_usage.py:106-114 uses
# quantile(0.05)/quantile(0.95); exact, not approx, per SURVEY §2.2).
# ---------------------------------------------------------------------------

@register(
    "q22_quantiles",
    oracle="""
        SELECT
            l_returnflag,
            ROUND(quantile_cont(l_extendedprice, 0.05), 4) AS p05,
            ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
            ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "quantile"),
)
def q22_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (F.percentile ==
    quantile_cont), all three from ONE aggregation buffer (array of
    percentages) instead of three independent sort-buffers — same
    values, one pass. percentile_approx exists as the scale path but
    the oracle-checked corpus uses the exact form."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.percentile(
        "l_extendedprice", F.array(F.lit(0.05), F.lit(0.50), F.lit(0.95))
    )
    return li.groupBy("l_returnflag").agg(p.alias("p")).select(
        "l_returnflag",
        F.round(F.col("p")[0], 4).alias("p05"),
        F.round(F.col("p")[1], 4).alias("p50"),
        F.round(F.col("p")[2], 4).alias("p95"),
    )


@register(
    "q84_quantile_approx",
    oracle="""
        SELECT
            l_returnflag,
            ROUND(quantile_cont(l_extendedprice, 0.05), 4) AS p05,
            ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
            ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
            TRUE AS approx_within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "quantile", "approx", "scale-path", "extension"),
    window_rank=1,
)
def q84_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB plan for q22's percentiles, itself verified — the
    q78_profile_approx contract applied to quantiles: q22's exact
    ``percentile`` buffers every group value on one reducer per group
    (memory O(group size) — the cost that breaks first at scale),
    while ``approx_percentile`` (Greenwald-Khanna sketch) holds
    fixed-size mergeable state. This entry runs BOTH from one buffer
    each, emits the exact values (hash-checked against quantile_cont)
    plus ``approx_within_tol`` — every sketch estimate must land
    within 2% relative error of its exact twin (far looser than GK's
    configured 1e-4 rank accuracy, far tighter than any plausible
    regression), so a drifting sketch flips the boolean and fails the
    gate."""
    li = _t(spark, sf_dir, "lineitem")
    ps = F.array(F.lit(0.05), F.lit(0.50), F.lit(0.95))
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", ps).alias("p"),
        F.percentile_approx("l_extendedprice", ps, 10_000).alias("a"),
    )
    within = F.lit(True)
    for i in range(3):
        within = within & (
            F.abs(F.col("a")[i] - F.col("p")[i]) / F.col("p")[i] <= 0.02
        )
    return agg.select(
        "l_returnflag",
        F.round(F.col("p")[0], 4).alias("p05"),
        F.round(F.col("p")[1], 4).alias("p50"),
        F.round(F.col("p")[2], 4).alias("p95"),
        within.alias("approx_within_tol"),
    )


# ---------------------------------------------------------------------------
# Batch tumbling window on event time (Structured-Streaming-compatible
# form; the streaming variant lives in streaming/events.py).
# ---------------------------------------------------------------------------

@register(
    "q23_tumbling_window",
    oracle="""
        SELECT
            date_trunc('day', ts) AS window_start,
            event_type,
            COUNT(*) AS n_events,
            {sv} AS sum_value
        FROM events
        GROUP BY 1, 2
    """.format(sv=dsum_sql("value")),
    tags=("window", "datetime", "streaming-compatible"),
)
def q23_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window aggregation via F.window — identical code
    runs under readStream with a watermark (see streaming/events.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Anti/semi joins — extensions beyond the reference surface (reference
# has inner equi-join only, SURVEY §2.2 "ABSENT"); a complete engine
# needs them and Catalyst plans them natively.
# ---------------------------------------------------------------------------

@register(
    "q26_sessionization",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   event_id,
                   epoch_us(ts) AS t,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             > 30 * 60 * 1000000
                          OR LAG(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, t,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_idx
            FROM g
        )
        SELECT user_id,
               session_idx,
               COUNT(*) AS n_events,
               MIN(t) AS session_start_us,
               MAX(t) AS session_end_us,
               (MAX(t) - MIN(t)) / 1000000 AS duration_s
        FROM s
        GROUP BY user_id, session_idx
    """,
    tags=("window", "sessionization", "extension"),
)
def q26_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap sessionization (30-min inactivity gap): lag → session
    flag → running sum → per-session aggregate. Two window passes over
    one user-partitioned shuffle, then a hash agg — the classic
    sessionization plan. The streaming counterpart (explicit state via
    applyInPandasWithState) lives in streaming/events.py; timestamps
    are compared as integer microseconds for cross-engine exactness.
    Both window passes order by (t, event_id) so the running sum is
    deterministic under duplicate (user_id, ts) rows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    gap_us = 30 * 60 * 1_000_000
    new_session = (
        (t - F.lag(t).over(w) > gap_us) | F.lag(t).over(w).isNull()
    ).cast("int")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.select(
        "user_id", "event_id", t.alias("t"), new_session.alias("new_session")
    ).withColumn("session_idx", F.sum("new_session").over(wsum))
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t").alias("session_start_us"),
        F.max("t").alias("session_end_us"),
        ((F.max("t") - F.min("t")) / 1_000_000).alias("duration_s"),
    )


ANTI_JOIN_PRICE = 350_000


@register(
    "q24_anti_join",
    oracle=f"""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > {ANTI_JOIN_PRICE}
        )
    """,
    tags=("join", "extension"),
)
def q24_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order — left_anti join (extension:
    the reference only has inner joins). The price filter keeps the
    result non-empty at every SF (every customer has *some* order in
    the synthetic data, so an unfiltered anti-join would pass
    vacuously)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > ANTI_JOIN_PRICE
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q25_semi_join",
    oracle="""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
    """,
    tags=("join", "extension"),
)
def q25_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers having at least one near-max-quantity lineitem —
    left_semi join (extension beyond the reference's inner-only joins)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q27_sliding_window",
    oracle="""
        WITH w AS (
            SELECT event_type,
                   value,
                   date_trunc('day', ts) - INTERVAL (k) DAY AS window_start
            FROM events, unnest([0, 1]) AS u(k)
        )
        SELECT window_start,
               event_type,
               COUNT(*) AS n_events,
               {sv} AS sum_value
        FROM w
        GROUP BY 1, 2
    """.format(sv=dsum_sql("value")),
    tags=("window", "datetime", "streaming-compatible"),
)
def q27_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-day windows sliding by 1 day: every event lands in exactly two
    windows (F.window duration/slide form — runs unchanged under
    readStream). The oracle fans each event into its two window starts
    with unnest."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q28_sql_interface",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               {tp} AS total_price
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
        GROUP BY o_orderpriority
    """.format(tp=dsum_sql("o_totalprice")),
    tags=("sql", "extension"),
)
def q28_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql string interface over registered temp views — free
    with Catalyst (the reference has no SQL parser, SURVEY §2.2
    'ABSENT'); identical plan to the DataFrame form."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
        GROUP BY o_orderpriority
        """
    )


# Documented sketch-accuracy bound checked below: default HLL++
# precision has rsd 0.05, so 0.15 is a ~3-sigma bound. (Tightening
# the sketch instead is a trap: rsd 0.01 inflates the generated HLL
# update code ~100x — measured 0.8 s → 105 s at sf0.1 with a codegen
# OOM risk — because the high-precision register bank defeats
# whole-stage codegen.)
APPROX_REL_TOL = 0.15


@register(
    "q29_approx_aggregates",
    oracle="""
        WITH per_order AS (
            SELECT l_returnflag, l_orderkey, {op} AS order_price
            FROM lineitem
            GROUP BY l_returnflag, l_orderkey
        )
        SELECT l_returnflag,
               COUNT(*) AS exact_orders,
               ROUND(quantile_cont(order_price, 0.5), 4) AS exact_p50,
               TRUE AS approx_within_tol
        FROM per_order
        GROUP BY l_returnflag
    """.format(op=dsum_sql("l_extendedprice")),
    tags=("agg", "approx", "scale-path"),
)
def q29_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based scale path for q08/q22-style questions:
    approx_count_distinct (HLL++) and percentile_approx (KLL-ish),
    both single-pass, fixed-memory, and mergeable across partitions —
    what production uses at 100 TB when exactness isn't required.

    Sketch values aren't reproducible across engines, so the oracle is
    a *bounds* check carried through the hash gate: the entry outputs
    the exact aggregates (equality-checked against SQL) plus a boolean
    asserting every sketch landed within ``APPROX_REL_TOL`` of its
    exact twin; the oracle emits ``TRUE`` — a sketch drifting out of
    tolerance flips the boolean and fails the hash match.

    ONE lineitem scan feeds everything: the shared
    ``(flag, orderkey)``-level aggregate (map-side partials, exact
    decimal per-order price) makes exact_orders a plain ``count`` —
    no COUNT(DISTINCT) Expand, no second scan, no join — and both
    percentiles run over the per-order prices. The HLL twin is built
    from the deduplicated keys, which is the SAME sketch it would see
    over raw rows (HLL is duplication-insensitive), so the
    approx-vs-exact tolerance contract is unchanged. (Earlier shapes
    measured here: COUNT(DISTINCT) stacked into one agg → 3× Expand +
    a whole-stage-codegen function taking ~30 s of first-run JIT;
    two separate scans + join → 1.5 s but double the scan cost;
    persisting the projection → slower still, 2.1 s.)"""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_returnflag", "l_orderkey").agg(
        dsum("l_extendedprice").alias("order_price")
    )
    agg = per_order.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_orders"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile("order_price", F.lit(0.5)).alias("raw_p50"),
        F.percentile_approx("order_price", 0.5, 1000).alias("approx_p50"),
    )
    rel = lambda a, e: F.abs(a.cast("double") - e) / e  # noqa: E731
    within = (
        rel(F.col("approx_orders"), F.col("exact_orders").cast("double"))
        <= APPROX_REL_TOL
    ) & (rel(F.col("approx_p50"), F.col("raw_p50")) <= APPROX_REL_TOL)
    return agg.select(
        "l_returnflag",
        "exact_orders",
        F.round("raw_p50", 4).alias("exact_p50"),
        within.alias("approx_within_tol"),
    )


# ---------------------------------------------------------------------------
# Grouping sets (rollup / cube) — extensions beyond the reference
# surface (SURVEY §2.2 "ABSENT": no grouping sets of any kind); both
# plan as a single expanded hash aggregate in Catalyst (one shuffle,
# map-side partials per grouping set), not one job per set.
# ---------------------------------------------------------------------------

@register(
    "q31_rollup",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               GROUPING(l_returnflag, l_linestatus) AS gid,
               COUNT(*) AS n_rows,
               {sq} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(sq=dsum_sql("l_quantity")),
    tags=("agg", "grouping-sets", "extension"),
)
def q31_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag, status), (flag), and grand total.
    grouping_id() disambiguates subtotal rows from genuine null keys;
    Spark's bit order matches DuckDB's GROUPING(a, b).

    Pre-aggregated: Spark plans grouping sets as Expand BEFORE the
    aggregate, so a direct rollup pushes levels× the input rows
    through the hash agg. Summing to the finest (flag, status) level
    first and rolling up THE PARTIALS expands 6 rows instead of the
    fact table — exact for these algebraic aggregates (decimal sums
    are associative; counts sum), bit-identical output, measured
    ~2× at sf0.1 and levels× the win at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_s"),
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.sum("_n").alias("n_rows"),
        F.sum("_s").cast("double").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")


@register(
    "q32_cube",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               GROUPING(l_returnflag, l_linestatus) AS gid,
               COUNT(*) AS n_rows,
               {sp} AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """.format(sp=dsum_sql("l_extendedprice")),
    tags=("agg", "grouping-sets", "extension"),
)
def q32_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping-set combinations — adds the (status)-only
    marginals rollup omits. Pre-aggregated to the finest level before
    the cube Expand, same reasoning and exactness argument as q31
    (there: levels× = 3; here: 2^k = 4)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_s"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.sum("_n").alias("n_rows"),
        F.sum("_s").cast("double").alias("sum_price"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_price")


@register(
    "q33_outer_join",
    oracle="""
        SELECT c.c_custkey,
               c.c_name,
               o.o_orderkey,
               o.o_totalprice
        FROM customer c
        FULL OUTER JOIN (
            SELECT * FROM orders WHERE o_totalprice > 400000
        ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "extension"),
)
def q33_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (extension: the reference is inner-only) —
    customers × their high-value orders, keeping order-less customers
    AND (after the filter pushes below the join) any orphaned orders.
    Catalyst plans a sort-merge join; AQE handles skew splitting."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q35_cross_join",
    oracle="""
        SELECT r.r_name, n.n_name, n.n_nationkey
        FROM region r CROSS JOIN nation n
    """,
    tags=("join", "extension"),
)
def q35_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two dim tables (region × nation) —
    the last join type the reference lacks. Only ever sane between
    bounded dims: Catalyst plans a broadcast nested-loop join, so no
    shuffle; anything × a fact table should be a broadcast of the
    small side instead (see q10/q11)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name", "n_nationkey")


@register(
    "salted_hot_key_agg",
    # the oracle is the PLAIN aggregation: salting changes the
    # physical route, not the algebra. sum_qty is exact (integral
    # doubles), count/min/max are exact selections; the double average
    # rounds to 4 (the q01 convention — accumulation order differs
    # between the salted two-phase merge and DuckDB)
    oracle="""
        SELECT l_returnflag,
               SUM(l_quantity) AS sum_qty,
               COUNT(l_orderkey) AS cnt,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               ROUND(AVG(l_discount), 4) AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("skew", "extension"),
    window_rank=1,
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over lineitem keyed by
    l_returnflag — 3 group keys for ~600M rows/TB at full scale, the
    exact shape where one reducer per key stalls a 1000-executor
    cluster and map-side combine stops helping (every mapper still
    emits one partial PER KEY into the same 3 reducers). The salt
    fans each key over 16 buckets; the merge aggregation is 48 rows.
    See operators/skew.py for the decomposability contract; bit-level
    equality vs the UNSALTED Spark agg is additionally asserted in
    tests/test_operators.py::test_salted_agg_equals_plain_agg."""
    from cae_polars_tools_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "cnt": ("l_orderkey", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
            "avg_disc": ("l_discount", "avg"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "sum_qty",
        "cnt",
        "min_price",
        "max_price",
        F.round("avg_disc", 4).alias("avg_disc"),
    ).orderBy("l_returnflag")

@register(
    "skew_join_salted",
    oracle="""
        SELECT p.p_brand,
               SUM(l.l_quantity) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 25
        GROUP BY p.p_brand
    """,
    tags=("skew", "join", "extension"),
    window_rank=1,
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (lineitem ⋈ part on partkey) + brand rollup —
    the hot-key JOIN twin of ``salted_hot_key_agg``. The rewrite is
    algebra-neutral (one salt per big row meets exactly one replica of
    each matching part row), so the oracle is the PLAIN join: the
    driver hash-checks that salting never changes results. At 100 TB
    this is the shape for a popular-product key that AQE cannot split
    (e.g. when the join feeds a downstream agg reusing the exchange);
    part here stands in for a dimension too big to broadcast. See
    ``operators/skew.py::salted_join`` for the equivalence contract
    and the ``salt_buckets``× small-side replication cost."""
    from cae_polars_tools_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") <= 25).select(
        "p_partkey", "p_brand"
    )
    joined = salted_join(
        li.select(F.col("l_partkey").alias("p_partkey"), "l_quantity"),
        p,
        on=["p_partkey"],
        salt_buckets=8,
    )
    return joined.groupBy("p_brand").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Set operations beyond concat (SURVEY §2.2 lists intersect/except as
# ABSENT from the reference — filled here, like the join-type gaps).
# ---------------------------------------------------------------------------

@register(
    "q36_intersect_except",
    oracle="""
        SELECT 'both' AS src, k AS o_custkey FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
        )
        UNION ALL
        SELECT 'urgent_only' AS src, k AS o_custkey FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
        )
    """,
    tags=("set-op", "extension"),
    window_rank=1,
)
def q36_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (distinct set semantics) — customers who
    placed both urgent and low-priority orders vs urgent-only.
    Completes the §2.2 set-op list (the reference only has concat).
    Both set ops plan as a single hash aggregate over the union with
    per-side existence flags — one shuffle each, no join."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey")
    )
    both = urgent.intersect(low).select(
        F.lit("both").alias("src"), "o_custkey"
    )
    only = urgent.subtract(low).select(
        F.lit("urgent_only").alias("src"), "o_custkey"
    )
    return both.unionByName(only)


@register(
    "q37_scalar_subquery",
    oracle="""
        SELECT p_partkey, p_brand, p_retailprice
        FROM part
        WHERE p_retailprice > (
            SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(p_retailprice)
            FROM part
        )
    """,
    tags=("subquery", "extension"),
    window_rank=1,
)
def q37_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: parts priced above the global mean.
    DataFrame form: the 1-row global aggregate is broadcast and
    cross-joined — the fact side never shuffles, the comparison is a
    map-side filter at any scale (the idiomatic Spark translation of
    an uncorrelated scalar subquery)."""
    from cae_polars_tools_spark.functions import davg

    p = _t(spark, sf_dir, "part")
    # exact decimal mean (order-independent) — a raw double F.avg is
    # partition-order dependent and could flip a boundary row vs the
    # sequential oracle when used UNROUNDED in a predicate
    mean = p.agg(davg("p_retailprice").alias("mean_price"))
    return (
        p.crossJoin(F.broadcast(mean))
        .filter(F.col("p_retailprice") > F.col("mean_price"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot — long↔wide reshaping. Directly relevant to the
# reference's data model (its zarr scan emits LONG format; users pivot
# to wide grids downstream, e.g. one column per variable/station).
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q38_pivot_wide",
    oracle="""
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY user_id
    """,
    tags=("pivot", "extension"),
    window_rank=1,
)
def q38_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-user event counts, one column per event
    type. The pivot values are DECLARED (not discovered), so Spark
    skips the extra distinct-values job and plans a single hash
    aggregate — same shuffle shape as a plain groupBy at any scale.
    Missing (user, type) combos surface as count 0 (coalesced —
    Spark's pivot yields null there, DuckDB's conditional count 0)."""
    e = _t(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


@register(
    "q39_unpivot_long",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               l_quantity AS val
        FROM lineitem WHERE l_orderkey < 200
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 200
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 200
    """,
    tags=("pivot", "extension"),
    window_rank=1,
)
def q39_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): three measure columns become
    (measure, val) rows — the inverse of q38 and exactly the long
    format the reference's zarr scan emits. Spark's ``unpivot`` is a
    zero-shuffle per-row expansion (Generate node); the filter pushes
    into the scan below it."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Window ranking + frame specs (SURVEY §2.2 notes the reference has no
# ranking functions and no frame specs — only lag/diff and max-over-
# group patterns; filled here).
# ---------------------------------------------------------------------------

@register(
    "q40_window_ranking",
    oracle="""
        SELECT c_custkey,
               c_mktsegment,
               c_acctbal,
               RANK() OVER w AS bal_rank,
               DENSE_RANK() OVER w AS bal_dense_rank,
               ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS bal_cume_dist,
               NTILE(4) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS bal_quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
    tags=("window", "ranking", "extension"),
    window_rank=1,
)
def q40_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family per market segment: rank,
    dense_rank, percent_rank, cume_dist, ntile. rank-family ties are
    deterministic under the value ordering alone; ntile assigns by row
    POSITION, so its window adds c_custkey as a total-order
    tie-breaker (engine-portable by construction). One shuffle on the
    5-value partition key; at 100 TB segment-level windows need
    bounded per-key cardinality or a salting pre-pass (see
    operators/skew.py)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.ntile(4).over(wt).alias("bal_quartile"),
    )


@register(
    "q41_window_frames",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               o_orderdate,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                   AS BIGINT) AS trailing3_cents,
               MIN(o_totalprice) OVER w AS trailing3_min,
               MAX(o_totalprice) OVER w AS trailing3_max,
               COUNT(*) OVER w AS trailing3_n
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
        )
    """,
    tags=("window", "frame", "extension"),
    window_rank=1,
)
def q41_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: trailing-3-order rolling sum/min/max/count
    per priority class, ordered by (date, key) — a total order, so the
    frame contents are engine-portable. The rolling sum runs on exact
    integer cents: a double sliding sum is accumulation-order-
    dependent (Spark re-adds the frame, other engines subtract-on-
    slide) and may drift in the last ulp; min/max/count are
    order-free. Same single-shuffle shape as q40."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.sum(cents).over(w).alias("trailing3_cents"),
        F.min("o_totalprice").over(w).alias("trailing3_min"),
        F.max("o_totalprice").over(w).alias("trailing3_max"),
        F.count(F.lit(1)).over(w).alias("trailing3_n"),
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction: the events table carries a JSON props
# column — a training-data pipeline constantly pulls typed fields out
# of such payloads (crawl metadata, provenance tags).
# ---------------------------------------------------------------------------

@register(
    "q42_json_extract",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               COUNT(DISTINCT k) AS n_distinct_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        WHERE k >= 10
        GROUP BY event_type
    """,
    tags=("json", "extension"),
    window_rank=1,
)
def q42_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from a JSON string column, then
    aggregate. ``get_json_object`` is a JVM-side expression — the
    extraction never leaves codegen, no Python involved; the filter on
    the extracted value applies map-side before the single group-by
    shuffle."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count_distinct(F.col("k")).alias("n_distinct_k"),
        )
    )


@register(
    "q43_global_sort",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        WHERE o_totalprice > 350000
        ORDER BY o_orderdate ASC, o_orderkey ASC
    """,
    tags=("sort", "extension"),
    window_rank=1,
)
def q43_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order sort of a filtered fact table — the one sort shape
    q09's top-k doesn't cover (limit short-circuits the exchange).
    Spark plans a RANGE exchange: sampled split points, then
    partition-local sorts — the only scalable global sort (a single-
    reducer sort dies at 100 TB; range partitioning keeps every
    reducer's slice bounded). The tie-breaking (date, key) order is
    total, so output is engine-portable; the filter pushes to the
    scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 350000)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    )


@register(
    "q44_first_last",
    oracle="""
        SELECT DISTINCT
               o_orderpriority,
               FIRST_VALUE(o_orderkey) OVER w AS first_key,
               LAST_VALUE(o_orderkey) OVER w AS last_key,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    tags=("window", "extension"),
    window_rank=1,
)
def q44_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit unbounded
    frame — the positional window family (rank/lag/frames are covered
    by q40/q14/q41). The default frame would stop at CURRENT ROW and
    make last_value vary row-by-row; the explicit unbounded frame and
    the total (date, key) order make all three engine-portable. One
    shuffle on the 5-value priority key, then DISTINCT collapses to
    one row per partition key."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderpriority",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .distinct()
    )


@register(
    "q45_range_frame",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               o_orderdate,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                   AS BIGINT) AS win7_cents,
               COUNT(*) OVER w AS win7_n,
               MIN(o_totalprice) OVER w AS win7_min
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY datediff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) ASC
            RANGE BETWEEN 7 PRECEDING AND CURRENT ROW
        )
    """,
    tags=("window", "frame", "extension"),
    window_rank=1,
)
def q45_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: per-priority trailing-7-DAY rolling
    sum/count/min — the value-based frame q41's ROWS frame cannot
    express (a RANGE frame spans whatever number of rows falls in the
    interval, and all peers of the current order value are included,
    which is what makes it engine-portable WITHOUT a tie-breaker:
    frame membership depends on values, never on arbitrary tie
    order). The ordering key is the integer day number so Spark's
    ``rangeBetween`` and DuckDB's ``RANGE ... PRECEDING`` agree
    exactly; the rolling sum runs on exact integer cents (q41's
    rationale). One shuffle on the partition key, frame evaluated in
    a single partition-local sorted pass."""
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(day.asc())
        .rangeBetween(-7, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.sum(cents).over(w).alias("win7_cents"),
        F.count(F.lit(1)).over(w).alias("win7_n"),
        F.min("o_totalprice").over(w).alias("win7_min"),
    )


@register(
    "q46_exists_subq",
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
    tags=("subquery", "extension"),
    window_rank=1,
)
def q46_exists_subq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL interface —
    Catalyst decorrelates both into semi/anti joins (the same physical
    shapes q24/q25 build with the DataFrame API), so the subquery
    surface costs nothing extra at scale: one pass over orders per
    branch, both join sides shuffle-pruned by their pushed
    predicates."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
        """
    )


@register(
    "q47_array_agg",
    oracle="""
        SELECT n_regionkey,
               count(*) AS n_nations,
               array_to_string(list(n_name ORDER BY n_name), ',')
                   AS nations_csv
        FROM nation
        GROUP BY n_regionkey
    """,
    tags=("agg", "array", "extension"),
    window_rank=1,
)
def q47_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with an engine-portable ORDER: collect_list
    has no deterministic order across partitions/engines, so the
    contract is sort-then-serialize — ``sort_array(collect_list())``
    joined to CSV matches DuckDB's ``list(... ORDER BY ...)`` exactly.
    One partial-aggregated shuffle on the group key; at scale the
    array payload per group must be bounded (here: nations per
    region), the same discipline every collect_list use needs."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.array_join(
            F.sort_array(F.collect_list("n_name")), ","
        ).alias("nations_csv"),
    )


@register(
    "q48_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_type) AS type_upper,
               lower(p_brand) AS brand_lower,
               length(p_name) AS name_len,
               substr(p_type, 1, 5) AS type_head,
               replace(p_name, ' ', '_') AS name_snake,
               concat_ws('|', p_brand, p_type) AS brand_type,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
               CAST(strpos(p_name, 'e') AS INTEGER) AS first_e,
               reverse(p_brand) AS brand_rev,
               trim(concat(' ', p_brand, ' ')) AS brand_trim,
               CASE WHEN p_type LIKE '%BRUSHED%' THEN 1 ELSE 0 END
                   AS is_brushed
        FROM part
        WHERE p_partkey <= 500
    """,
    tags=("string", "extension"),
    window_rank=1,
)
def q48_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-function surface a reference user leans on daily:
    case mapping, length, substring, replace, multi-arg concat,
    padding, find-position, reverse, trim, LIKE. All JVM-side codegen
    expressions — zero shuffle, fully pushed projection."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_head"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias(
            "key_padded"
        ),
        F.instr("p_name", "e").alias("first_e"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trim"
        ),
        F.when(F.col("p_type").like("%BRUSHED%"), 1)
        .otherwise(0)
        .alias("is_brushed"),
    )


@register(
    "q49_array_funcs",
    oracle="""
        WITH t AS (
            SELECT p_partkey,
                   string_split(p_name, ' ') AS words
            FROM part WHERE p_partkey <= 2000
        )
        SELECT p_partkey,
               len(words) AS n_words,
               words[1] AS first_word,
               words[len(words)] AS last_word,
               list_sort(list_distinct(words)) AS uniq_sorted,
               CAST(list_contains(words, 'steel') AS BOOLEAN) AS has_steel,
               list_transform(
                   list_sort(list_distinct(words)), w -> length(w)
               ) AS uniq_lens,
               CAST(list_sum(
                   list_transform(words, w -> length(w))
               ) AS BIGINT) AS total_chars,
               array_to_string(words[1:3], '_') AS first3
        FROM t
    """,
    tags=("array", "extension"),
    window_rank=1,
)
def q49_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array/higher-order-function surface: size, element access,
    distinct+sort, membership, transform (lambda), aggregate (fold),
    slice, join-to-string. All Catalyst HOF expressions — zero
    shuffle, no UDFs; at scale this is the zero-copy path for the
    list-typed columns a training pipeline carries (token arrays,
    embedding shards)."""
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    uniq = F.array_sort(F.array_distinct(words))
    return p.filter(F.col("p_partkey") <= 2000).select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        uniq.alias("uniq_sorted"),
        F.array_contains(words, "steel").alias("has_steel"),
        F.transform(uniq, lambda w: F.length(w)).alias("uniq_lens"),
        F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.length(w)
        ).cast("long").alias("total_chars"),
        F.array_join(F.slice(words, 1, 3), "_").alias("first3"),
    )


@register(
    "q50_date_arithmetic",
    # NOTE the 90-day/4-month pairing is deliberate: DuckDB compares
    # intervals with months normalized to 30 days, so INTERVAL '3
    # months' EQUALS INTERVAL '90 days' — and its common-subexpression
    # elimination then collapses `d + 90 days` and `d + 3 months` into
    # ONE expression (reproduced on 1.0.0). Unequal intervals dodge
    # the collapse. Dates serialize through strftime so both engines
    # compare as plain strings (pandas would otherwise widen DuckDB's
    # DATE to midnight timestamps).
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d')
                   AS due_date,
               strftime(o_orderdate + INTERVAL 4 MONTH, '%Y-%m-%d')
                   AS review_month,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
                   AS month_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate)
                    AS INTEGER) AS days_since_95,
               CAST(date_diff('month', DATE '1995-01-01',
                              date_trunc('month', o_orderdate))
                    AS INTEGER) AS months_since_95
        FROM orders
        WHERE o_orderkey <= 2000
    """,
    tags=("datetime", "extension"),
    window_rank=1,
)
def q50_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date ARITHMETIC (q15 covers part extraction): interval add,
    add_months, month truncation, last_day, day/month differences
    against an epoch. Engine-portable by construction — all integer
    day/month math, no timezone dependence; pure codegen, zero
    shuffle. Output dates serialize as yyyy-MM-dd strings so the
    cross-engine compare is type-free."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    fmt = "yyyy-MM-dd"
    return o.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.date_format(F.date_add(d, 90), fmt).alias("due_date"),
        F.date_format(F.add_months(d, 4), fmt).alias("review_month"),
        F.date_format(F.trunc(d, "month"), fmt).alias("month_start"),
        F.date_format(F.last_day(d), fmt).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        (
            (F.year(d) - 1995) * 12 + F.month(d) - 1
        ).alias("months_since_95"),
    )


@register(
    "q51_regexp_extract",
    oracle=r"""
        SELECT p_partkey,
               regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
               CAST(regexp_matches(p_name, '^[a-z]+ ') AS BOOLEAN)
                   AS starts_lower_word,
               len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
               regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled
        FROM part
        WHERE p_partkey <= 2000
    """,
    tags=("string", "regexp", "extension"),
    window_rank=1,
)
def q51_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface over the portable pattern subset (character
    classes, anchors, capture groups — identical semantics in Java
    regex and RE2-style engines, the same dialect discipline
    text_pii_redact pins): capture-group extract, boolean match,
    match counting, global replace. Pure codegen, zero shuffle."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") <= 2000).select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.col("p_name").rlike(r"^[a-z]+ ").alias("starts_lower_word"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]"), 0)).alias(
            "n_vowels"
        ),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
    )


@register(
    "q52_conditional_agg",
    oracle="""
        SELECT user_id,
               count(*) FILTER (event_type = 'click') AS n_clicks,
               count(*) FILTER (event_type = 'purchase') AS n_purchases,
               ROUND(COALESCE(
                   sum(value) FILTER (event_type = 'purchase'), 0
               ), 4) AS purchase_value,
               max(value) FILTER (event_type = 'error') AS max_error_value,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events
        GROUP BY user_id
        HAVING count(*) FILTER (event_type = 'click') > 0
    """,
    tags=("agg", "conditional", "extension"),
    window_rank=1,
)
def q52_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (filtered) aggregation — the poor man's pivot every
    analytics user writes: per-predicate counts/sums/maxes in ONE
    hash aggregate over one scan (no joins, no separate passes), plus
    a distinct count. Spark expresses the FILTER clause as
    sum/count over CASE; one shuffle on the group key."""
    e = _t(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", 1)
    purch = F.when(F.col("event_type") == "purchase", F.col("value"))
    err = F.when(F.col("event_type") == "error", F.col("value"))
    return (
        e.groupBy("user_id")
        .agg(
            F.count(click).alias("n_clicks"),
            F.count(
                F.when(F.col("event_type") == "purchase", 1)
            ).alias("n_purchases"),
            F.round(F.coalesce(F.sum(purch), F.lit(0.0)), 4).alias(
                "purchase_value"
            ),
            F.max(err).alias("max_error_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .filter(F.col("n_clicks") > 0)
    )


@register(
    "q53_null_semantics",
    oracle="""
        WITH t AS (
            SELECT l_orderkey, l_linenumber,
                   nullif(l_discount, 0.0) AS disc_n,
                   nullif(l_tax, 0.0) AS tax_n
            FROM lineitem WHERE l_orderkey <= 1000
        )
        SELECT l_orderkey, l_linenumber,
               COALESCE(disc_n, tax_n, -1.0) AS first_present,
               CAST(disc_n IS NULL AS BOOLEAN) AS disc_missing,
               CAST(disc_n IS NOT DISTINCT FROM tax_n AS BOOLEAN)
                   AS null_safe_eq,
               CASE WHEN disc_n IS NULL AND tax_n IS NULL THEN 'neither'
                    WHEN disc_n IS NULL THEN 'tax_only'
                    WHEN tax_n IS NULL THEN 'disc_only'
                    ELSE 'both' END AS presence
        FROM t
    """,
    tags=("null", "extension"),
    window_rank=1,
)
def q53_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling semantics pinned across engines: NULLIF
    null-injection, multi-arg COALESCE, IS NULL, null-safe equality
    (Spark ``<=>`` ≡ SQL IS NOT DISTINCT FROM), and CASE over null
    states. Pure codegen, zero shuffle — but semantically the
    trickiest corner of any engine migration."""
    li = _t(spark, sf_dir, "lineitem")
    disc_n = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax_n = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(disc_n, tax_n, F.lit(-1.0)).alias("first_present"),
        disc_n.isNull().alias("disc_missing"),
        disc_n.eqNullSafe(tax_n).alias("null_safe_eq"),
        F.when(disc_n.isNull() & tax_n.isNull(), "neither")
        .when(disc_n.isNull(), "tax_only")
        .when(tax_n.isNull(), "disc_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "q54_correlated_scalar",
    # TPC-H Q17's shape: per-row comparison against the ROW'S GROUP
    # aggregate. The threshold (0.5 * decimal-exact avg) is rounded to
    # 6 before the comparison in BOTH engines so a boundary row cannot
    # flip on double accumulation order.
    oracle="""
        WITH t AS (
            SELECT l_partkey,
                   ROUND(0.5 * (
                       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                            AS DOUBLE) / COUNT(l_quantity)
                   ), 6) AS threshold
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l.l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_small,
               SUM(l.l_quantity) AS small_qty
        FROM lineitem l JOIN t ON l.l_partkey = t.l_partkey
        WHERE l.l_quantity < t.threshold
        GROUP BY l.l_partkey
    """,
    tags=("subquery", "correlated", "extension"),
    window_rank=1,
)
def q54_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subquery (TPC-H Q17's core): each lineitem
    row compares against half the average quantity OF ITS OWN PART.
    Expressed in SQL so Catalyst performs the decorrelation — the
    correlated subquery rewrites to a per-key aggregate joined back,
    exactly the plan the hand-written DataFrame version would build;
    q37 covers the uncorrelated (broadcast one-row) case. One
    aggregate shuffle + one equi-join on the same key — AQE reuses
    the partitioning. Threshold math is decimal-exact then rounded,
    so the boundary comparison is engine-portable."""
    from cae_polars_tools_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_partkey,
               COUNT(*) AS n_small,
               SUM(l.l_quantity) AS small_qty
        FROM lineitem l
        WHERE l.l_quantity < (
            SELECT ROUND(0.5 * (
                       CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                            AS DOUBLE) / COUNT(l2.l_quantity)
                   ), 6)
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        """
    )


@register(
    "q55_funnel",
    oracle="""
        WITH m AS (
            SELECT user_id,
                   min(ts) FILTER (event_type = 'signup') AS t_signup,
                   min(ts) FILTER (event_type = 'click') AS t_click,
                   min(ts) FILTER (event_type = 'purchase') AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(CASE
                   WHEN t_signup IS NULL THEN 0
                   WHEN t_click IS NULL OR t_click <= t_signup THEN 1
                   WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
                   ELSE 3
               END AS INTEGER) AS funnel_stage
        FROM m
    """,
    tags=("analytics", "funnel", "extension"),
    window_rank=1,
)
def q55_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup → click → purchase, each stage
    STRICTLY after the previous): per-user first-occurrence times in
    ONE conditional-min aggregate, stage resolution as a CASE — the
    classic product-analytics query as a single hash-agg shuffle, no
    joins, no per-user event sorting."""
    e = _t(spark, sf_dir, "events")

    def first_ts(ev: str):
        return F.min(F.when(F.col("event_type") == ev, F.col("ts")))

    m = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    stage = (
        F.when(F.col("t_signup").isNull(), 0)
        .when(
            F.col("t_click").isNull()
            | (F.col("t_click") <= F.col("t_signup")),
            1,
        )
        .when(
            F.col("t_purchase").isNull()
            | (F.col("t_purchase") <= F.col("t_click")),
            2,
        )
        .otherwise(3)
    )
    return m.select("user_id", stage.cast("int").alias("funnel_stage"))


@register(
    "q56_retention_cohort",
    oracle="""
        WITH f AS (
            SELECT user_id,
                   CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
            FROM events GROUP BY user_id
        ),
        a AS (
            SELECT e.user_id, f.cohort_day,
                   date_diff('day', f.cohort_day,
                             CAST(date_trunc('day', e.ts) AS DATE))
                       AS day_offset
            FROM events e JOIN f USING (user_id)
        )
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(day_offset AS INTEGER) AS day_offset,
               CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        FROM a
        WHERE day_offset BETWEEN 0 AND 7
        GROUP BY cohort_day, day_offset
    """,
    tags=("analytics", "cohort", "extension"),
    window_rank=1,
)
def q56_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, distinct
    active users per (cohort, day-offset) for the first week. Two
    aggregates and one equi-join on user_id — the cohort frame is
    per-user (small) and broadcastable at any realistic user count;
    day math is integer differences of truncated days, so the output
    is timezone-free and engine-portable (cohort serialized as a
    yyyy-MM-dd string)."""
    e = _t(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    f = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    joined = e.join(F.broadcast(f), "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(day, F.col("cohort_day")).alias("day_offset"),
    )
    return (
        joined.filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("int").alias("day_offset"),
            "active_users",
        )
    )


@register(
    "q57_bag_set_ops",
    oracle="""
        SELECT 'inter_all' AS src, k AS o_custkey FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT ALL
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
        )
        UNION ALL
        SELECT 'except_all' AS src, k AS o_custkey FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT ALL
            SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
        )
    """,
    tags=("set-op", "bag", "extension"),
    window_rank=1,
)
def q57_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — BAG semantics (multiplicity
    min/difference), the half of the set-op family q36's distinct
    variants don't cover. Both plan as one hash aggregate over the
    union with per-side counts and a generate of min/residual copies —
    one shuffle each, no join."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    inter = urgent.intersectAll(low).select(
        F.lit("inter_all").alias("src"), "o_custkey"
    )
    exc = urgent.exceptAll(low).select(
        F.lit("except_all").alias("src"), "o_custkey"
    )
    return inter.unionByName(exc)


@register(
    "q58_grouping_sets",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders
        GROUP BY GROUPING SETS (
            (o_orderpriority, o_orderstatus),
            (o_orderpriority),
            ()
        )
    """,
    tags=("agg", "grouping-sets", "extension"),
    window_rank=1,
)
def q58_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT grouping sets (q31/q32 cover the rollup/cube sugar):
    a custom lattice — (priority, status), (priority), grand total —
    in ONE Expand + hash aggregate pass over a single scan. Money
    totals in decimal (exact, order-independent) so the hash compare
    is engine-exact at any partitioning."""
    from cae_polars_tools_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders
        GROUP BY GROUPING SETS (
            (o_orderpriority, o_orderstatus),
            (o_orderpriority),
            ()
        )
        """
    )


@register(
    "q59_latest_per_key",
    oracle="""
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_type
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("window", "dedup-idiom", "extension"),
    window_rank=1,
)
def q59_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single most common production dedup idiom: keep the LATEST
    record per key (``row_number() = 1`` under a total order — the
    event_id tie-break makes simultaneous timestamps deterministic
    across engines and partitionings). One shuffle on the key; at
    scale this is the CDC-compaction / upsert-view pattern.
    Timestamps serialize as epoch microseconds for a type-free
    cross-engine compare."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
        )
    )


@register(
    "q60_share_of_total",
    oracle="""
        WITH rev AS (
            SELECT n.n_regionkey, c.c_nationkey,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS nation_rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_regionkey, c.c_nationkey
        )
        SELECT n_regionkey, c_nationkey, nation_rev,
               ROUND(nation_rev / SUM(nation_rev)
                   OVER (PARTITION BY n_regionkey), 6) AS region_share
        FROM rev
    """,
    tags=("window", "analytics", "extension"),
    window_rank=1,
)
def q60_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (percent-of-group): each nation's revenue as a
    fraction of its region's — the aggregate-then-window composition
    every BI layer generates. Decimal-exact sums make the numerators
    engine-identical; the ratio rounds to 1e-6 (division ulps). One
    aggregate shuffle + one window shuffle on the (already small)
    aggregate frame; the orders fact joins its dims via broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "c_nationkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("nation_rev")
        )
    )
    w = Window.partitionBy("n_regionkey")
    return rev.select(
        "n_regionkey",
        "c_nationkey",
        "nation_rev",
        F.round(
            F.col("nation_rev") / F.sum("nation_rev").over(w), 6
        ).alias("region_share"),
    )


@register(
    "q61_topk_per_group",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC,
                                l_orderkey, l_linenumber
                   ) AS rn
            FROM lineitem
        ) WHERE rn <= 3
    """,
    tags=("window", "topk", "extension"),
    window_rank=1,
)
def q61_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PER GROUP (k = 3 priciest items per return flag) — the
    generalization of q13's argmax. The (orderkey, linenumber)
    tie-break gives a total order, so the selection is deterministic
    across engines and partitionings. One shuffle on the group key;
    at scale Spark's WindowGroupLimit pushes the rank filter into the
    sort, so each partition keeps only k rows per group."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
        )
    )


# ---------------------------------------------------------------------------
# Gaps & islands — the classic interval-analytics shape (activity
# streaks, outage windows, contiguous id ranges).
# ---------------------------------------------------------------------------

@register(
    "q62_gaps_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT
                   user_id,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS day_nr
            FROM events
        ),
        tagged AS (
            SELECT user_id,
                   day_nr,
                   day_nr - row_number() OVER (
                       PARTITION BY user_id ORDER BY day_nr
                   ) AS island
            FROM days
        )
        SELECT user_id,
               MIN(day_nr) AS island_start,
               MAX(day_nr) AS island_end,
               COUNT(*) AS n_days
        FROM tagged
        GROUP BY user_id, island
    """,
    tags=("window", "islands", "extension"),
    window_rank=1,
)
def q62_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps & islands: per user, maximal runs of CONSECUTIVE active
    days (an island breaks at every missing day). The classic
    day_nr − row_number() trick: inside a consecutive run both grow
    by 1 per row, so their difference is a constant island id — no
    self-join, no iteration. Day numbers are exact integers (epoch
    days), so the comparison is type- and timezone-free.

    Scale shape: ONE exchange for the whole query (plan-pinned). The
    explicit ``repartition(user_id)`` satisfies every downstream
    distribution at once: a hash partitioning on user_id clusters the
    (user, day) distinct (ClusteredDistribution accepts a key
    subset), the island window, and the final group-by — without it,
    Catalyst shuffles on (user, day) for the distinct and AGAIN on
    user for the window. Per-user distinct-day cardinality is bounded
    by the calendar span, so the user partitioning cannot blow up on
    a hot user the way raw-event partitioning could; the map-side
    partial distinct still collapses duplicate (user, day) rows
    before the exchange."""
    ev = _t(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day_nr"),
        )
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_nr")
    tagged = days.withColumn(
        "island", F.col("day_nr") - F.row_number().over(w)
    )
    return tagged.groupBy("user_id", "island").agg(
        F.min("day_nr").alias("island_start"),
        F.max("day_nr").alias("island_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("island")


# ---------------------------------------------------------------------------
# Linear-regression aggregates — the regr_* family (trend fitting
# inside the engine instead of exporting to a stats stack).
# ---------------------------------------------------------------------------

@register(
    "q63_regression_aggs",
    oracle="""
        SELECT l_returnflag,
               ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 6)
                   AS intercept,
               ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               regr_count(l_extendedprice, l_quantity) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "regression", "extension"),
    window_rank=1,
)
def q63_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares aggregates per group: slope, intercept,
    R² and pair count of price vs quantity — the SQL-standard
    ``regr_*`` family, one partial-aggregable pass (each is a ratio
    of co-moment sums, so the shuffle carries a handful of doubles
    per group at any scale). Rounded to 6 decimals on both engines:
    the co-moment accumulation order differs between engines, so the
    raw last-ulp is not contractual — the rounded value is."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope"
        ),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 6
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


# ---------------------------------------------------------------------------
# Native session windows — Spark's built-in session_window operator,
# cross-checking the hand-rolled gap sessionization (q26).
# ---------------------------------------------------------------------------

@register(
    "q64_native_session_window",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   event_id,
                   epoch_us(ts) AS t,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             >= 30 * 60 * 1000000
                          OR LAG(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, t,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_idx
            FROM g
        )
        SELECT user_id,
               MIN(t) AS session_start_us,
               MAX(t) + 30 * 60 * 1000000 AS session_end_us,
               COUNT(*) AS n_events
        FROM s
        GROUP BY user_id, session_idx
    """,
    tags=("window", "sessionization", "native", "extension"),
    window_rank=1,
)
def q64_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` (the Structured-Streaming
    stateful operator, batch form) with a 30-minute gap —
    cross-checking q26's hand-rolled lag/cumsum sessionization.
    Semantics difference the oracle mirrors exactly: the native
    operator starts a NEW session when the gap is ≥ the timeout
    (an event at precisely window-end does not merge), where q26's
    rule is strictly >; and the native window's END is last event +
    gap, not the last event itself. One shuffle on the session keys;
    at scale this is the operator whose streaming twin holds
    watermark-bounded state."""
    ev = _t(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("session_window.end")).alias(
                "session_end_us"
            ),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Adversarial multi-join composition (TPC-H Q21 shape): 4-way fact join
# + EXISTS + NOT EXISTS over the SAME fact table — the classic planner
# trap (every join type existed individually in q23-q35; this stresses
# their composition).
# ---------------------------------------------------------------------------

Q65_LATE_DAYS = 60
Q65_NATION_PREFIX = "NATION_1"  # NATION_1 + NATION_10..19 (11 of 25)
Q65_TOPK = 10


@register(
    "q65_waiting_suppliers",
    oracle=f"""
        WITH late AS (
            SELECT l.l_orderkey, l.l_suppkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL {Q65_LATE_DAYS} DAY
        )
        SELECT s.s_name AS s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
                     AND n.n_name LIKE '{Q65_NATION_PREFIX}%'
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey != l1.l_suppkey
              )
          AND NOT EXISTS (
                SELECT 1 FROM late l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey != l1.l_suppkey
              )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT {Q65_TOPK}
    """,
    tags=("join", "subquery", "adversarial", "extension"),
    window_rank=1,
)
def q65_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted to this schema (no commit/receipt dates:
    "late" = shipped > {Q65_LATE_DAYS} days after the order date on a
    finalized order): suppliers in the target nations who were the
    SOLE late supplier on a multi-supplier order, ranked by how often.

    The planner trap is the composition: the fact table appears three
    times (base, EXISTS, NOT EXISTS over the derived `late` set), and
    a naive plan re-derives `late` twice or degenerates the non-equi
    "different supplier" conjunct into a nested loop. Spark shape:

    * `late` (lineitem ⨝ filtered orders) is built ONCE and persisted
      — both the EXISTS probe side and the NOT-EXISTS build side read
      the materialized bytes, the manual form of the CTE reuse other
      engines apply to Q21.
    * EXISTS → left_semi, NOT EXISTS → left_anti, each a HASH join on
      the l_orderkey equi-component with the supplier inequality as a
      post-probe filter (plan-pinned: no nested-loop/cartesian).
    * supplier ⨝ nation is a broadcast dim (100 × 25 rows at any SF);
      the top-k is a TakeOrdered, never a global sort.

    At 100 TB: two shuffles of the late subset (orderkey-keyed
    semi/anti) + one fact-orders join; the late set is a small
    fraction of lineitem, and nothing driver-side exceeds the top-k."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q65_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .persist()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    ex = late.join(
        l2,
        (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2),
        "left_semi",
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = ex.join(
        l3,
        (ex.l_orderkey == l3.o3) & (ex.l_suppkey != l3.s3),
        "left_anti",
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name").startswith(Q65_NATION_PREFIX)
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    result = (
        sole_late.join(
            F.broadcast(s), sole_late.l_suppkey == s.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(Q65_TOPK)
    )
    from cae_polars_tools_spark.operators.dedup import _release_on_gc

    # unpersist the late set when the plan handle is dropped, but keep
    # it alive while the caller can still execute the plan
    return _release_on_gc(result, late)


@register(
    "q66_scd2_history",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE prev_type IS NULL OR event_type != prev_type
        )
        SELECT user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
               event_type AS attr,
               epoch_us(ts) AS valid_from_us,
               epoch_us(LEAD(ts) OVER w) AS valid_to_us,
               LEAD(ts) OVER w IS NULL AS is_current
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "warehouse", "extension"),
    window_rank=1,
)
def q66_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build — THE warehouse
    idiom for turning a change log into versioned validity intervals:
    consecutive runs of the same attribute value collapse to one
    version row with ``[valid_from, valid_to)`` and an ``is_current``
    flag (q59's latest-per-key is this table's terminal rows).

    Scale shape: both windows (run-collapse lag, interval lead +
    version numbering) share ONE ``(user_id)`` partitioning, so the
    whole build is a single key shuffle; no self-join, no iteration.
    Epoch-microsecond outputs keep the cross-engine compare
    type/timezone-free (the q64 convention); the total order
    ``(ts, event_id)`` makes every interval engine-deterministic."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .drop("prev_type")
    )
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("event_type").alias("attr"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "q67_distribution_ranks",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey
        )
    """,
    tags=("window", "ranking", "extension"),
    window_rank=1,
)
def q67_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank window family (ntile / percent_rank /
    cume_dist) — quartile bucketing and relative standing of every
    order within its priority class, the standard percentile-bucketing
    idiom (q40 covers the positional ranks; these are the
    distributional ones).

    One (priority) partitioning serves all three functions — a single
    shuffle; the ``(o_totalprice, o_orderkey)`` total order makes
    ntile's bucket boundaries engine-deterministic under price ties,
    and the 1e-6 rounding absorbs the division's representational
    quirks between engines."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q68_transitive_closure",
    oracle="""
        WITH RECURSIVE edges AS (
            SELECT p_partkey AS node, p_partkey // 5 AS parent
            FROM part
            WHERE p_partkey // 5 >= 1 AND p_partkey // 5 != p_partkey
        ),
        anc AS (
            SELECT node, parent AS ancestor, 1 AS depth FROM edges
            UNION ALL
            SELECT a.node, e.parent, a.depth + 1
            FROM anc a JOIN edges e ON e.node = a.ancestor
        )
        SELECT node, ancestor, CAST(depth AS BIGINT) AS depth FROM anc
    """,
    tags=("iterative", "hierarchy", "extension"),
    window_rank=1,
)
def q68_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening / transitive closure — the recursive-SQL
    surface (org-chart ancestors, BOM explosion; DuckDB restates it
    as ``WITH RECURSIVE``). The part forest is built deterministically
    (parent = p_partkey DIV 5, roots 1–4), giving chains of depth
    ~log5(|part|); output is every (node, ancestor, depth) pair.

    Scale shape: PATH DOUBLING, not per-level iteration — round r
    composes the closure-so-far with itself (anc-to-node equi-join),
    doubling the reachable depth, so depth-D closure needs only
    ceil(log2 D) joins: 4 rounds cover depth 16, i.e. forests of up
    to 5^16 ≈ 152 billion parts — beyond 100 TB scale (a deeper
    hierarchy costs one more round, not 2x the work). Each round
    is one key-partitioned shuffle join + a distinct (a pair's depth
    decomposes into several split points — distinct collapses them);
    the lineage is a LINEAR chain of Spark plans with NO driver-side
    loop actions (nothing collects until the caller does) and no
    cartesian anywhere."""
    p = _t(spark, sf_dir, "part").select("p_partkey")
    edges = p.select(
        F.col("p_partkey").alias("node"),
        F.expr("p_partkey DIV 5").alias("parent"),
    ).filter(
        (F.col("parent") >= 1) & (F.col("parent") != F.col("node"))
    )
    paths = edges.select(
        "node",
        F.col("parent").alias("ancestor"),
        F.lit(1).cast("long").alias("depth"),
    )
    # ``jump`` holds each node's EXACT 2^r-th ancestor (≤ 1 row per
    # node — the parent function makes this a forest, so the pointer
    # is unique). Round r composes it with the closure-so-far: a new
    # pair at depth d ∈ (2^r, 2^(r+1)] decomposes UNIQUELY as the
    # fixed 2^r-step jump plus a ≤ 2^r-deep tail, so the union can
    # never create a duplicate row and the per-round ``distinct`` —
    # a full shuffle of the ENTIRE closure every round in the
    # closure-squaring form this replaces — is unnecessary by
    # construction. Per round the closure now crosses the wire once
    # (join key) instead of three times (both join sides + the
    # distinct), and the other join side is the 1-row-per-node jump
    # table, not the closure itself.
    jump = paths.select("node", F.col("ancestor").alias("mid"))
    for r in range(4):  # depth ≤ 2^4 = 16; |part| ≤ 5^16 ≈ 152e9
        composed = jump.join(
            paths.select(
                F.col("node").alias("mid"), "ancestor", "depth"
            ),
            "mid",
        ).select(
            "node",
            "ancestor",
            (F.col("depth") + F.lit(2 ** r).cast("long")).alias("depth"),
        )
        paths = paths.unionAll(composed)
        if r < 3:
            jump = (
                jump.select("node", F.col("mid").alias("m"))
                .join(jump.select(F.col("node").alias("m"), "mid"), "m")
                .select("node", "mid")
            )
    return paths


@register(
    "q69_gap_fill",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
                   ROUND(avg(value), 6) AS obs
            FROM events GROUP BY 1, 2
        ),
        rng AS (SELECT min(slot) AS lo, max(slot) AS hi FROM daily),
        scaffold AS (
            SELECT t.event_type, d.slot
            FROM (SELECT DISTINCT event_type FROM daily) t,
                 (SELECT unnest(generate_series(lo, hi)) AS slot
                  FROM rng) d
        ),
        g AS (
            SELECT s.event_type, s.slot, daily.obs,
                   last_value(daily.obs IGNORE NULLS)
                       OVER w_prev AS pv,
                   last_value(CASE WHEN daily.obs IS NOT NULL
                                   THEN s.slot END IGNORE NULLS)
                       OVER w_prev AS pd,
                   first_value(daily.obs IGNORE NULLS)
                       OVER w_next AS nv,
                   first_value(CASE WHEN daily.obs IS NOT NULL
                                    THEN s.slot END IGNORE NULLS)
                       OVER w_next AS nd
            FROM scaffold s LEFT JOIN daily USING (event_type, slot)
            WINDOW w_prev AS (
                PARTITION BY s.event_type ORDER BY s.slot
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (
                PARTITION BY s.event_type ORDER BY s.slot
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, slot,
               ROUND(CASE WHEN obs IS NOT NULL THEN obs
                          WHEN pv IS NULL THEN nv
                          WHEN nv IS NULL THEN pv
                          ELSE pv + (nv - pv) * (slot - pd) / (nd - pd)
                     END, 6) AS value,
               obs IS NULL AS interpolated
        FROM g
    """,
    tags=("timeseries", "window", "extension"),
    window_rank=1,
)
def q69_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with linear interpolation — the
    resample/upsample surface (Polars ``upsample`` +
    ``interpolate``; SQL restates it with generate_series +
    IGNORE NULLS window walks). Hourly mean `value` per event_type,
    densified over the observed global hour range; interior gaps
    interpolate linearly between the bracketing observations, edges
    carry forward/backward.

    Scale shape: the scaffold is dims x sequence (the hour axis
    explodes from a 1-row min/max aggregate and broadcast-joins the
    tiny type dimension — never a row-per-gap shuffle of the fact
    table); the forward and backward IGNORE-NULLS walks share ONE
    per-type partitioning. Means are rounded to 6 decimals BEFORE
    interpolating so both engines interpolate the same doubles."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            (F.unix_timestamp("ts") / 3600).cast("long").alias("slot"),
            "value",
        )
        .groupBy("event_type", "slot")
        .agg(F.round(F.avg("value"), 6).alias("obs"))
    )
    rng = daily.agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
    slots = rng.select(F.explode(F.sequence("lo", "hi")).alias("slot"))
    types = daily.select("event_type").distinct()
    scaffold = types.join(F.broadcast(slots), how="cross")
    g = scaffold.join(daily, ["event_type", "slot"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_slot = F.when(F.col("obs").isNotNull(), F.col("slot"))
    g2 = (
        g.withColumn("pv", F.last("obs", ignorenulls=True).over(w_prev))
        .withColumn("pd", F.last(obs_slot, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("obs", ignorenulls=True).over(w_next))
        .withColumn("nd", F.first(obs_slot, ignorenulls=True).over(w_next))
    )
    filled = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("slot") - F.col("pd"))
            / (F.col("nd") - F.col("pd"))
        )
    )
    return g2.select(
        "event_type",
        "slot",
        F.round(filled, 6).alias("value"),
        F.col("obs").isNull().alias("interpolated"),
    )


@register(
    "q70_window_distinct",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN ROW_NUMBER() OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) = 1
                        THEN 1 ELSE 0 END AS is_first
            FROM events
        )
        SELECT user_id, event_id,
               CAST(SUM(is_first) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS distinct_types
        FROM flagged
    """,
    tags=("window", "extension"),
    window_rank=1,
)
def q70_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — per user, how many
    distinct event types seen so far at each event. Spark has no
    distinct window aggregate; the scalable formulation is the
    FIRST-OCCURRENCE FLAG trick: row_number()==1 within (user, type)
    marks each type's first sighting, and a running SUM of the flags
    is the running distinct count. O(1) window state per row — a
    collect_set-based version would carry the whole distinct set in
    every row's window state and die on high-cardinality keys.
    Both windows order by the (ts, event_id) total order.

    ONE exchange serves both windows: an explicit (user_id) hash
    repartition satisfies the (user_id, event_type) window's
    clustering requirement too (subset rule), so the flag and the
    running sum differ only by an in-partition re-sort — plan-pinned
    single hashpartitioning exchange."""
    ev = _t(spark, sf_dir, "events").repartition("user_id")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "is_first",
            (F.row_number().over(w_first) == 1).cast("long"),
        )
        .withColumn("distinct_types", F.sum("is_first").over(w_run))
        .select("user_id", "event_id", "distinct_types")
    )


@register(
    "q71_dict_encode",
    oracle="""
        SELECT doc_id, source,
               CAST(DENSE_RANK() OVER (ORDER BY source) - 1
                    AS BIGINT) AS source_code
        FROM documents
    """,
    tags=("encoding", "storage", "extension"),
    window_rank=1,
)
def q71_dict_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary encoding — the engine's answer to the reference's
    ``.cast(pl.Categorical)`` (reference performance_tips.md:124-143,
    previously a documented deviation): dense integer codes for a
    low-cardinality string column via an explicit, persistable
    ``(value, code)`` dictionary (``storage.dict_encode``). The
    window that assigns codes runs over the DICTIONARY (bounded by
    the column's cardinality — the premise of categorical encoding),
    never the corpus; the corpus side is one broadcast join, no
    reshuffle. The oracle restates the same dense codes with
    DENSE_RANK over the value order."""
    from cae_polars_tools_spark.storage import dict_encode

    docs = _t(spark, sf_dir, "documents")
    encoded, _dictionary = dict_encode(docs, "source")
    return encoded.select("doc_id", "source", "source_code")


@register(
    "q72_union_by_name",
    oracle="""
        SELECT o_orderkey AS k, o_totalprice AS price,
               o_orderpriority AS priority, NULL AS qty
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL BY NAME
        SELECT l_orderkey AS k, NULL AS priority,
               CAST(l_quantity AS DOUBLE) AS qty,
               l_extendedprice AS price
        FROM lineitem WHERE l_orderkey % 11 = 0
    """,
    tags=("setops", "schema-evolution", "extension"),
    window_rank=1,
)
def q72_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — combining frames whose columns differ
    in ORDER and PRESENCE (the daily reality of unioning yesterday's
    and today's extract): ``unionByName(allowMissingColumns=True)``
    aligns by NAME and null-fills the gaps, where positional UNION
    would silently zip mismatched columns. DuckDB restates it as
    ``UNION ALL BY NAME``. Zero shuffle — a union is plan-level
    concatenation; both inputs keep their scan partitioning."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = o.filter((F.col("o_orderkey") % 7) == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    b = li.filter((F.col("l_orderkey") % 11) == 0).select(
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "q73_map_roundtrip",
    oracle="""
        SELECT user_id, event_type, count(*) AS cnt FROM events
        GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    tags=("map", "hof", "extension"),
    window_rank=1,
)
def q73_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAP-type surface end to end: per-user ``event_type →
    count`` maps built with ``map_from_entries(collect_list(struct))``,
    pruned with the ``map_filter`` higher-order function (JVM-side
    lambda, stays in codegen), then exploded back to rows. The map is
    the intermediate representation — the round trip means any drift
    in map construction, HOF filtering, or map explosion changes the
    row set and fails the (plain relational) oracle. One aggregation
    shuffle; the per-user regroup reuses the same key partitioning."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    kept = maps.select(
        "user_id", F.map_filter("m", lambda _k, v: v >= 2).alias("m")
    )
    return kept.select(
        "user_id", F.explode("m").alias("event_type", "cnt")
    )


@register(
    "q74_posexplode_tokens",
    oracle="""
        SELECT doc_id, CAST(i - 1 AS INT) AS pos, parts[i] AS word
        FROM (
            SELECT doc_id, string_split(text, ' ') AS parts,
                   unnest(generate_series(
                       1, len(string_split(text, ' ')))) AS i
            FROM documents WHERE doc_id < 20
        )
    """,
    tags=("lateral", "explode", "extension"),
    window_rank=1,
)
def q74_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional lateral view — ``posexplode(split(...))`` turning
    each document into (doc_id, pos, word) rows with the ordinal
    preserved (the tokenize-with-offsets shape every span-level text
    op needs; DuckDB restates it as unnest over generate_series since
    it lacks WITH ORDINALITY). Zero shuffle: the explode is a
    row-local Generate; the filter pushes to the scan."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 20).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@register(
    "q75_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ), pairs AS (
            SELECT prev_type, event_type, COUNT(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        )
        SELECT prev_type, event_type, n,
               ROUND(CAST(n AS DOUBLE)
                     / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
        FROM pairs
    """,
    tags=("window", "markov", "extension"),
    window_rank=1,
)
def q75_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the session-model / next-event-prediction shape:
    lag(event_type) under the (ts, event_id) total order per user,
    pair counts, then row-normalized transition probabilities. The
    probability window runs over the AGGREGATED pair frame (bounded by
    |event_type|², not the corpus), so the expensive partitioning is
    the one (user_id) lag shuffle and the pair groupBy; 1e-6 rounding
    is the cross-engine division contract."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp), 6
        ).alias("p"),
    )


@register(
    "q76_robust_outliers",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ), mad AS (
            SELECT e.event_type,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type
        )
        SELECT e.event_type,
               COUNT(*) AS n_rows,
               ROUND(m.med, 6) AS med,
               ROUND(d.mad, 6) AS mad,
               CAST(SUM(CASE WHEN d.mad = 0
                             THEN CASE WHEN e.value <> m.med
                                       THEN 1 ELSE 0 END
                             WHEN abs((e.value - m.med)
                                      / (1.4826 * d.mad)) > 3.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        GROUP BY e.event_type, m.med, d.mad
    """,
    tags=("agg", "quality", "extension"),
    window_rank=1,
)
def q76_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group — median/MAD z-scores (the
    1.4826 normal-consistency constant), the data-quality screen that,
    unlike mean/stddev, doesn't let the outliers move their own
    threshold. Three passes over events, each reducing to per-type
    partials, with the tiny per-type model frames BROADCAST back
    between them (no corpus reshuffle). Exact interpolated medians
    match DuckDB's quantile_cont; the z expression is the same double
    arithmetic in both engines, so the >3.5 cut lands identically.
    At 100 TB the exact percentile buffers per group —
    ``percentile_approx`` is the drop-in scale path (q29's contract);
    exact here so the oracle can be value-level."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    scored = dev.join(F.broadcast(mad), "event_type")
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    # mad = 0 (a >50%-constant group) must be cut identically in both
    # engines: Spark's x/0.0 is ±Inf (|z|>3.5 true for any deviation)
    # while DuckDB's is NULL (CASE falls to 0) — define it explicitly
    # as "any row off the median is an outlier" on both sides.
    is_outlier = F.when(
        F.col("mad") == 0, (F.col("value") != F.col("med")).cast("int")
    ).otherwise(F.when(F.abs(z) > 3.5, 1).otherwise(0))
    return scored.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(is_outlier).alias("n_outliers"),
    ).select(
        "event_type",
        "n_rows",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )


@register(
    "q80_json_roundtrip",
    # the JSON document is the intermediate representation (the q73
    # MAP contract): any drift in construction, schema-parse, or
    # nested-array explosion changes the relational row set
    oracle="""
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_type,
               value
        FROM events
        WHERE user_id < 20
    """,
    tags=("json", "nested", "extension"),
    window_rank=1,
)
def q80_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NESTED JSON surface end to end: per-user event histories
    serialize into one JSON document each (``to_json`` over a struct
    holding a sorted array of event structs — the event-log export
    shape), then parse back with an explicit ``from_json`` schema and
    explode the nested array into rows. Construction, schema-driven
    parsing, and nested-array explosion are all JVM-side codegen —
    no Python touches a byte of JSON. Timestamps ride as epoch
    micros (JSON has no timestamp type; the integer keeps the round
    trip and the cross-engine compare exact). One aggregation
    shuffle to pack; the unpack is a row-local Generate."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    event_struct = F.struct(
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("event_type"),
        F.col("value").alias("value"),
    )
    docs = ev.groupBy("user_id").agg(
        F.to_json(
            F.struct(
                F.col("user_id").alias("user_id"),
                F.sort_array(F.collect_list(event_struct)).alias("events"),
            )
        ).alias("doc")
    )
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField(
                "events",
                ArrayType(
                    StructType(
                        [
                            StructField("ts_us", LongType()),
                            StructField("event_type", StringType()),
                            StructField("value", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    parsed = docs.select(F.from_json("doc", schema).alias("j"))
    return parsed.select(
        F.col("j.user_id").alias("user_id"),
        F.explode("j.events").alias("e"),
    ).select(
        "user_id",
        F.col("e.ts_us").alias("ts_us"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
    )


@register(
    "q81_rolling_median",
    oracle="""
        SELECT event_type, event_id,
               ROUND(quantile_cont(value, 0.5) OVER (
                   PARTITION BY event_type
                   ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ), 6) AS med7
        FROM events
    """,
    tags=("window", "median", "extension"),
    window_rank=1,
)
def q81_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a trailing 7-row frame per event type —
    the robust smoother time-series pipelines prefer over rolling
    means (one spike can't move it). Exact interpolated percentile as
    a WINDOW aggregate under the (ts, event_id) total order; DuckDB's
    quantile_cont uses the same interpolation, so values match to the
    1e-6 rounding contract. One key-partitioned window shuffle;
    per-frame work is O(frame log frame) — constant per row."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_type",
        "event_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med7"),
    )


@register(
    "q83_impute_mean",
    # nulls are INJECTED deterministically (the q53 convention — the
    # synthetic corpus is clean) so the impute path has real work
    oracle="""
        WITH base AS (
            SELECT event_id, event_type,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        ELSE value END AS v
            FROM events
        ), m AS (
            SELECT event_type,
                   ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                         / COUNT(v), 6) AS mean_v
            FROM base GROUP BY event_type
        )
        SELECT b.event_id, b.event_type,
               ROUND(COALESCE(b.v, m.mean_v), 6) AS value_filled,
               b.v IS NULL AS was_imputed
        FROM base b JOIN m USING (event_type)
    """,
    tags=("quality", "imputation", "extension"),
    window_rank=1,
)
def q83_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean imputation — the feature-prep step between the
    q20 null census and model training: missing values fill with
    their group's mean (computed over the NON-null rows, exact
    decimal sum so engines agree), plus the was_imputed flag
    downstream quality tracking needs. The per-type mean frame is
    tiny and BROADCASTS back onto the corpus — one aggregation
    shuffle total, the fill itself is a map-side coalesce. Means are
    rounded BEFORE filling (the q69 convention) so both engines fill
    the same doubles."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    means = base.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.count("v"),
            6,
        ).alias("mean_v")
    )
    return base.join(F.broadcast(means), "event_type").select(
        "event_id",
        "event_type",
        F.round(F.coalesce(F.col("v"), F.col("mean_v")), 6).alias(
            "value_filled"
        ),
        F.col("v").isNull().alias("was_imputed"),
    )


@register(
    "q79_string_agg",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               string_agg(DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR),
                          ',' ORDER BY CAST(CAST(ts AS DATE) AS VARCHAR))
                   AS active_days
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "string-agg", "extension"),
    window_rank=1,
)
def q79_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg / GROUP_CONCAT
    — the report-building shape every SQL dialect spells differently):
    per event type, the comma-joined sorted list of distinct active
    days. Spark has no ordered string_agg, so the portable composition
    is collect_set → array_sort → array_join, which the q47 array-agg
    contract already proved engine-stable: sorting BEFORE serializing
    makes the string deterministic under any partitioning. One
    aggregation shuffle; per-group payload bounded by distinct days
    (the caller's contract, as with q47). n_days is ``size`` of the
    SAME collected set — a separate count_distinct in the aggregate
    would make Catalyst Expand the whole event stream for the
    distinct rewrite (the q78 trap) to recount what the set already
    holds."""
    ev = _t(spark, sf_dir, "events")
    day = F.to_date("ts").cast("string")
    arr = F.array_sort(F.collect_set(day))
    return ev.groupBy("event_type").agg(
        F.size(arr).cast("long").alias("n_days"),
        F.array_join(arr, ",").alias("active_days"),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q78_profile_columns",
    oracle="""
        WITH s AS (
            SELECT 'l_quantity' AS col_name,
                   CAST(l_quantity AS DOUBLE) AS value FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT 'l_tax', l_tax FROM lineitem
        )
        SELECT col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT(value) AS n_null,
               COUNT(DISTINCT value) AS n_distinct,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(value), 6) AS mean_value
        FROM s GROUP BY col_name
    """,
    tags=("diagnostics", "profiling", "extension"),
    window_rank=1,
)
def q78_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan — the ``describe()`` every
    engine's users reach for first, re-expressed distributed: the
    numeric columns unpivot into (col_name, value) rows (a row-local
    Generate, no shuffle), then a single map-side-combined aggregate
    keyed on col_name yields rows / nulls / exact distincts / min /
    max / decimal-exact mean per column. At 100 TB this is ONE pass
    over the table instead of a query per column; the distinct count
    is the only memory-heavy piece (swap in approx_count_distinct at
    scale — q29's contract). The mean goes through an exact decimal
    sum so engines can't disagree in the last ulp.

    Plan shape: the unpivot is itself an Expand (that IS how Spark
    melts — row-local, pre-shuffle); the trap is mixing
    count_distinct with plain aggregates in one groupBy, which makes
    Catalyst Expand the stream a SECOND time for the distinct
    rewrite (measured 2.9 s at sf0.1). Instead the stream
    pre-aggregates to (col_name, value, cnt) — one map-side-combined
    shuffle bounded by per-column cardinality — and every statistic
    falls out of a tiny weighted final aggregate (0.5 s warm). Same
    exact results: the decimal mean weights each distinct value by
    its count."""
    li = _t(spark, sf_dir, "lineitem")
    stack = li.unpivot(
        [], list(_PROFILE_COLS), "col_name", "value"
    )
    pre = stack.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    nn = F.col("value").isNotNull()
    return pre.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(~nn, F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_null"
        ),
        F.count(F.when(nn, F.lit(1))).alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(
            F.sum(
                F.col("value").cast("decimal(18,6)") * F.col("cnt")
            ).cast("double")
            / F.sum(F.when(nn, F.col("cnt"))),
            6,
        ).alias("mean_value"),
    )


@register(
    "q78_profile_approx",
    oracle="""
        WITH s AS (
            SELECT 'l_quantity' AS col_name,
                   CAST(l_quantity AS DOUBLE) AS value FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT 'l_tax', l_tax FROM lineitem
        )
        SELECT col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT(value) AS n_null,
               COUNT(DISTINCT value) AS n_distinct,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(value), 6) AS mean_value,
               TRUE AS approx_within_tol
        FROM s GROUP BY col_name
    """,
    tags=("diagnostics", "profiling", "approx", "scale-path", "extension"),
    window_rank=1,
)
def q78_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB plan for q78's column profiler, itself verified.
    q78's exact distinct counts ride a (col_name, value) pre-aggregate
    whose shuffle key set is corpus-sized for continuous columns; its
    docstring recommends ``approx_count_distinct`` at scale — THIS
    entry registers that recommendation so the scale path goes through
    the hash gate instead of staying prose (q29's invariant-frame
    contract).

    Because the exact-distinct twin must run anyway (it judges the
    sketch), the whole profile rides the twin's (col_name, value, cnt)
    pre-aggregate: one corpus scan, one Expand, one value-keyed
    shuffle, then a single col_name aggregate computes the exact
    statistics AND the HLL side by side — HLL registers are
    duplicate-insensitive, so the sketch over distinct values is
    byte-identical to the raw-row sketch, and counts/means weight by
    cnt exactly as q78_profile_columns does. The entry emits the EXACT
    statistics (hash-checked against SQL) plus ``approx_within_tol``,
    pinned TRUE — an HLL drifting past ``APPROX_REL_TOL`` flips the
    boolean and fails the gate. (Standalone, HLL-only profiling would
    skip the value-keyed shuffle entirely; that one-aggregate shape is
    what the docstring of q78_profile_columns already prescribes at
    scale.)"""
    li = _t(spark, sf_dir, "lineitem")
    stack = li.unpivot([], list(_PROFILE_COLS), "col_name", "value")
    nn = F.col("value").isNotNull()
    # ONE (col_name, value, cnt) pre-aggregate feeds EVERY statistic —
    # exact and approx — in a single second-stage aggregate: one corpus
    # scan, one Expand, one value-keyed shuffle, no join (the old shape
    # scanned and Expanded the corpus twice: once for the raw-row
    # approx aggregate, once for the exact-distinct pre-aggregate, then
    # broadcast-joined the two 4-row profiles). Every approx-side
    # statistic is recoverable from the pre-aggregate without drift:
    # HLL registers are duplicate-insensitive, so approx_count_distinct
    # over the distinct values IS the raw-row sketch; counts weight by
    # cnt; the mean multiplies exact decimals by exact longs. The
    # weighted shape matches q78_profile_columns, whose oracle already
    # pins its equivalence.
    pre = stack.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    approx = pre.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(~nn, F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_null"
        ),
        F.approx_count_distinct("value").alias("approx_distinct"),
        F.count(F.when(nn, F.lit(1))).alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(
            F.sum(
                F.col("value").cast("decimal(18,6)") * F.col("cnt")
            ).cast("double")
            / F.sum(F.when(nn, F.col("cnt"))),
            6,
        ).alias("mean_value"),
    )
    within = (
        F.abs(
            F.col("approx_distinct").cast("double")
            - F.col("n_distinct").cast("double")
        )
        / F.col("n_distinct")
        <= APPROX_REL_TOL
    )
    return approx.select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_value",
        "max_value",
        "mean_value",
        within.alias("approx_within_tol"),
    )


SKEW_PROFILE_TOP = 20


@register(
    "q77_skew_profile",
    oracle=f"""
        WITH c AS (
            SELECT l_suppkey AS key, COUNT(*) AS n
            FROM lineitem GROUP BY l_suppkey
        ), t AS (
            SELECT SUM(n) AS total,
                   CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_n
            FROM c
        )
        SELECT c.key, c.n,
               ROUND(c.n / t.avg_n, 6) AS skew_x,
               ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share
        FROM c, t
        ORDER BY c.n DESC, c.key ASC
        LIMIT {SKEW_PROFILE_TOP}
    """,
    tags=("diagnostics", "skew", "extension"),
    window_rank=1,
)
def q77_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew profile — the instrument you run BEFORE deciding
    to salt (operators/skew.py) or lean on AQE's skew join: per-key
    frequency of the join/agg key, each hot key's multiple of the
    mean key load (``skew_x``) and share of all rows. One map-side-
    combined count aggregation; the global (total, mean) is a 1-row
    aggregate OF THE COUNTS frame, broadcast back; TakeOrdered keeps
    the top-{SKEW_PROFILE_TOP} under a total order. At 1000 executors
    a skew_x of 50 on one key means one reducer doing 50× the mean —
    this is the number that predicts it from a cheap scan."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_n"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("avg_n"), 6).alias("skew_x"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(SKEW_PROFILE_TOP)
    )
