"""Q6-Q30 — the relational/analytics surface (SURVEY.md §2C).

The reference has none of this (SURVEY §2B: joins/grouping/windows/set
ops/scalar functions all ❌) — it is the north-star value-add, expressed
entirely with built-in Spark operators so Catalyst plans it: filters and
projections push into the parquet scan, small dimension tables broadcast,
aggregates get map-side partial combine, top-k becomes
TakeOrderedAndProject.

Determinism conventions (module docstring in ``hoard_spark.queries``):
- every floating SUM over many rows accumulates in DECIMAL(38,6)
  (``dsum``) so parallel summation order cannot drift vs DuckDB;
- computed integer outputs are cast to BIGINT on BOTH sides (DuckDB
  widens int sums to HUGEINT, returns DOUBLE for ceil/floor, BIGINT for
  EXTRACT — explicit casts pin one common type);
- total ORDER BY everywhere; top-k ties broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hoard_spark.queries import (
    davg,
    dround,
    dsum,
    dsum10,
    load,
    present_sorted,
    query,
    spread,
    track_cache,
)


# --------------------------------------------------------------------------
# filters / projections
# --------------------------------------------------------------------------


@query(
    "q06_filter",
    "conjunctive predicates: range + IN + date comparison, pushed to scan",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= DATE '1995-01-01'
    ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q6",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .where(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q07_projection_math",
    "projection with scalar arithmetic (net price with discount and tax)",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(25,10)), 4) AS DOUBLE) AS net
    FROM lineitem ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q7",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    net = (
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * (F.lit(1) + F.col("l_tax"))
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", dround(net).alias("net"))
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# joins (all kinds)
# --------------------------------------------------------------------------


@query(
    "q08_inner_join_agg",
    "inner equi-join orders⋈customer (broadcast dim) + grouped aggregate",
    """
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4)
               AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    "SURVEY.md §2C Q8",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(dsum(F.col("o_totalprice")), 4).alias("total"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q09_left_join",
    "left outer join: customers with their order counts (0 for none)",
    """
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    "SURVEY.md §2C Q9",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


@query(
    "q10_full_join",
    "full outer join nation⟗supplier with NULLS FIRST ordering",
    """
    SELECT n.n_name, s.s_suppkey
    FROM nation n FULL JOIN supplier s ON s.s_nationkey = n.n_nationkey
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
    """,
    "SURVEY.md §2C Q10",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    return (
        nation.join(supplier, supplier.s_nationkey == nation.n_nationkey, "full")
        .select("n_name", "s_suppkey")
        .orderBy(
            F.col("n_name").asc_nulls_first(), F.col("s_suppkey").asc_nulls_first()
        )
    )


@query(
    "q11_semi_join",
    "left semi join: parts with any high-quantity lineitem",
    """
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    ORDER BY 1
    """,
    "SURVEY.md §2C Q11",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    big = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        part.join(big, big.l_partkey == part.p_partkey, "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "q12_anti_join",
    "left anti join: customers with no orders",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY 1
    """,
    "SURVEY.md §2C Q12",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q13_cross_join",
    "cross join region × nation (tiny-side cartesian)",
    """
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q13",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return (
        region.crossJoin(F.broadcast(nation))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "q14_theta_join",
    "equi key + non-equi residual (l_quantity > p_size stays a hash join)",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    ORDER BY 1, 2, 3
    """,
    "SURVEY.md §2C Q14",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (lineitem.l_partkey == part.p_partkey) & (
        lineitem.l_quantity > part.p_size
    )
    return (
        lineitem.join(F.broadcast(part), cond, "inner")
        .select("l_orderkey", "l_linenumber", "p_partkey")
        .orderBy("l_orderkey", "l_linenumber", "p_partkey")
    )


@query(
    "q15_multiway_join",
    "TPC-H Q3 shape: customer⋈orders⋈lineitem, filtered, top-10 revenue",
    """
    SELECT o.o_orderkey,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(38,6))) AS DOUBLE), 4) AS rev
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1 ORDER BY rev DESC, o_orderkey LIMIT 10
    """,
    "SURVEY.md §2C Q15",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    rev_term = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        lineitem.join(
            F.broadcast(
                orders.join(
                    F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey,
                    "inner",
                ).select("o_orderkey")
            ),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "inner",
        )
        .groupBy("o_orderkey")
        .agg(F.round(dsum(rev_term), 4).alias("rev"))
        .orderBy(F.col("rev").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# distinct / grouping sets / rollup / cube / stats aggregates
# --------------------------------------------------------------------------


@query(
    "q16_exact_distinct",
    "exact multi-column COUNT(DISTINCT)",
    """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
    FROM orders
    """,
    "SURVEY.md §2C Q16",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


_GROUPED_AGG_SQL = """
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4)
               AS sum_qty
    FROM lineitem GROUP BY {clause}
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
"""


def _grouped_agg(df: DataFrame, grouped) -> DataFrame:
    return grouped.agg(
        F.count("*").alias("n"),
        F.round(dsum(F.col("l_quantity")), 4).alias("sum_qty"),
    ).orderBy(
        F.col("l_returnflag").asc_nulls_first(),
        F.col("l_linestatus").asc_nulls_first(),
    )


@query(
    "q17_grouping_sets",
    "GROUPING SETS ((flag,status),(flag),())",
    _GROUPED_AGG_SQL.format(
        clause="GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"
    ),
    "SURVEY.md §2C Q17",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem")
    grouped = df.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    )
    return _grouped_agg(df, grouped)


@query(
    "q18_rollup",
    "GROUP BY ROLLUP (flag, status)",
    _GROUPED_AGG_SQL.format(clause="ROLLUP (l_returnflag, l_linestatus)"),
    "SURVEY.md §2C Q18",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem")
    return _grouped_agg(df, df.rollup("l_returnflag", "l_linestatus"))


@query(
    "q19_cube",
    "GROUP BY CUBE (flag, status)",
    _GROUPED_AGG_SQL.format(clause="CUBE (l_returnflag, l_linestatus)"),
    "SURVEY.md §2C Q19",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem")
    return _grouped_agg(df, df.cube("l_returnflag", "l_linestatus"))


@query(
    "q20_stats_aggs",
    "count/avg/stddev_samp/min/max/sum battery per group",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,10)))
                                AS DOUBLE) / COUNT(*)
                           AS DECIMAL(25,10)), 4) AS DOUBLE) AS avg_qty,
           CAST(ROUND(CAST(SQRT((CAST(SUM(CAST(l_quantity * l_quantity
                                             AS DECIMAL(38,6))) AS DOUBLE)
                                 - POWER(CAST(SUM(CAST(l_quantity
                                             AS DECIMAL(38,6))) AS DOUBLE), 2)
                                   / COUNT(*)) / (COUNT(*) - 1))
                           AS DECIMAL(25,10)), 4) AS DOUBLE) AS sd_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4)
               AS sum_price
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "SURVEY.md §2C Q20",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            davg("l_quantity").alias("avg_qty"),
            dround(
                F.sqrt(
                    (
                        dsum(F.col("l_quantity") * F.col("l_quantity"))
                        - F.pow(dsum(F.col("l_quantity")), 2) / F.count("*")
                    )
                    / (F.count("*") - 1)
                )
            ).alias("sd_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.round(dsum(F.col("l_extendedprice")), 4).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


@query(
    "q21_ranking_windows",
    "row_number/rank/dense_rank over per-customer price order",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
    "SURVEY.md §2C Q21",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rk"),
            F.dense_rank().over(w).cast("long").alias("drk"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "q22_lag_delta",
    "lag with default: per-type value delta in ingest order",
    """
    SELECT event_type, event_id,
           CAST(ROUND(CAST(value - LAG(value, 1, 0.0)
                 OVER (PARTITION BY event_type ORDER BY event_id)
                 AS DECIMAL(25,10)), 4) AS DOUBLE) AS delta
    FROM events ORDER BY event_type, event_id
    """,
    "SURVEY.md §2C Q22",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            dround(F.col("value") - F.lag("value", 1, 0.0).over(w)).alias(
                "delta"
            ),
        )
        .orderBy("event_type", "event_id")
    )


@query(
    "q23_moving_avg",
    "frame spec: 4-row trailing moving average per event type",
    """
    SELECT event_type, event_id,
           CAST(ROUND(CAST(AVG(value) OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 AS DECIMAL(25,10)), 4) AS DOUBLE) AS mavg
    FROM events ORDER BY event_type, event_id
    """,
    "SURVEY.md §2C Q23",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            dround(F.avg("value").over(w)).alias("mavg"),
        )
        .orderBy("event_type", "event_id")
    )


@query(
    "q24_ntile",
    "ntile(4) quartiles over a total price order",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
               AS quartile
    FROM orders ORDER BY o_orderkey
    """,
    "SURVEY.md §2C Q24",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NTILE without the single-partition global window.

    ``ntile().over(Window.orderBy(...))`` moves the ENTIRE table to one
    partition (WindowExec warns; fatal at 100 TB). Instead: range-
    partition on the (unique) order key, per-partition ``row_number``,
    add broadcast cumulative partition offsets to get the exact global
    rank, then apply SQL NTILE's bucket arithmetic (first n%k buckets
    get one extra row) as a plain expression. Same values, fully
    parallel sort — the standard distributed global-ranking two-pass.

    The offsets are derived IN-PLAN (r14): a prefix-sum window over the
    #partitions-row count aggregate, broadcast-joined back — the prior
    form collected the counts to the driver and rebuilt them as a
    literal frame, paying an extra action barrier plus a JVM->Python
    row round-trip per invocation (~0.3-0.5 s at sf0.1; guide §5: the
    driver should do no data work). The single-partition prefix window
    is bounded by #partitions rows, never data rows. The broadcast
    subtree materializes first and fills the cache, so the final pass
    reads the same materialized range partitioning — the cache remains
    CORRECTNESS-critical (the range partitioner samples boundaries per
    execution).
    """
    from pyspark.sql import Window

    k = 4
    npart = spark.sparkContext.defaultParallelism
    parts = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(npart, "o_totalprice", "o_orderkey")
        .withColumn("_pid", F.spark_partition_id())
        .transform(track_cache)
    )
    cw = Window.orderBy("_pid")
    offs = (
        parts.groupBy("_pid")
        .agg(F.count("*").alias("cnt"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("cnt").over(
                    cw.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ).alias("_off"),
            F.sum("cnt")
            .over(
                cw.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("_total"),
        )
    )
    w = Window.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    r = F.col("_off") + F.row_number().over(w)
    base = F.floor(F.col("_total") / F.lit(k))
    rem = F.col("_total") % F.lit(k)
    big = rem * (base + F.lit(1))  # rows living in the size-(base+1) buckets
    quartile = (
        F.when(r <= big, F.ceil(r / (base + F.lit(1))))
        .otherwise(rem + F.ceil((r - big) / F.greatest(base, F.lit(1))))
        .cast("long")
    )
    return (
        parts.join(F.broadcast(offs), "_pid")
        .select("o_orderkey", quartile.alias("quartile"))
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# top-k / set ops
# --------------------------------------------------------------------------


@query(
    "q25_topk",
    "top-20 orders by price (TakeOrderedAndProject, unique tie-break)",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "SURVEY.md §2C Q25",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q26_set_ops",
    "INTERSECT / EXCEPT / UNION / UNION ALL in one labelled result",
    """
    SELECT 'intersect' AS op, CAST(k AS BIGINT) AS k FROM
        (SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, CAST(k AS BIGINT) AS k FROM
        (SELECT c_nationkey AS k FROM customer
         EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_n' AS op, CAST(COUNT(*) AS BIGINT) AS k FROM
        (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_all_n' AS op, CAST(COUNT(*) AS BIGINT) AS k FROM
        (SELECT c_nationkey FROM customer
         UNION ALL SELECT s_nationkey FROM supplier)
    ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q26",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").cast("long").alias("k"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").cast("long").alias("k"))
    )
    labelled = [
        cust.intersect(supp).select(F.lit("intersect").alias("op"), "k"),
        cust.subtract(supp).select(F.lit("except").alias("op"), "k"),
        cust.union(supp)
        .distinct()
        .agg(F.count("*").alias("k"))
        .select(F.lit("union_n").alias("op"), "k"),
        cust.union(supp)
        .agg(F.count("*").alias("k"))
        .select(F.lit("union_all_n").alias("op"), "k"),
    ]
    out = labelled[0]
    for part in labelled[1:]:
        out = out.union(part)
    return out.orderBy("op", "k")


# --------------------------------------------------------------------------
# scalar function batteries
# --------------------------------------------------------------------------


@query(
    "q27_string_fns",
    "upper/lower/substring/length/replace/trim/lpad/concat battery",
    """
    SELECT p_partkey, UPPER(p_brand) AS up, LOWER(p_type) AS lo,
           SUBSTRING(p_name, 1, 8) AS sub,
           CAST(LENGTH(p_name) AS BIGINT) AS len,
           REPLACE(p_type, ' ', '_') AS rep, TRIM(p_name) AS trm,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS pad,
           CONCAT(p_brand, ':', p_type) AS cat
    FROM part ORDER BY 1
    """,
    "SURVEY.md §2C Q27",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("up"),
            F.lower("p_type").alias("lo"),
            F.substring("p_name", 1, 8).alias("sub"),
            F.length("p_name").cast("long").alias("len"),
            F.replace("p_type", F.lit(" "), F.lit("_")).alias("rep"),
            F.trim("p_name").alias("trm"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("pad"),
            F.concat("p_brand", F.lit(":"), "p_type").alias("cat"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q28_date_fns",
    "extract/date_trunc/interval arithmetic battery",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30
    FROM orders ORDER BY 1
    """,
    "SURVEY.md §2C Q28",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DATE on both sides: DuckDB's date_trunc('month', DATE) yields DATE
    # while Spark's date_trunc yields TIMESTAMP, and DuckDB's DATE+INTERVAL
    # yields TIMESTAMP — trunc()/date_add() pin everything to DATE.
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.trunc("o_orderdate", "month").alias("mstart"),
            F.date_add("o_orderdate", 30).alias("plus30"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q29_math_fns",
    "abs/ceil/floor/sqrt/power/ln/exp/log10/modulo battery",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 4) AS ad,
           CAST(CEIL(l_quantity) AS BIGINT) AS cl,
           CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
           ROUND(SQRT(l_extendedprice), 4) AS sq,
           ROUND(POWER(l_tax + 1, 2), 4) AS pw,
           ROUND(LN(l_extendedprice), 4) AS lg,
           ROUND(EXP(l_discount), 4) AS ex,
           ROUND(LOG10(l_extendedprice), 4) AS l10,
           CAST(CAST(l_quantity AS INT) % 7 AS BIGINT) AS md
    FROM lineitem ORDER BY 1, 2
    """,
    "SURVEY.md §2C Q29",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spread() before the 9-function battery: the small-file scan reads
    as 3 splits, which would serialize both the projection and the
    range-sort's input on 3 cores (measured 2.9s → 1.1s warm at sf0.1;
    a many-split production scan makes it a no-op)."""
    return (
        spread(load(spark, sf_dir, "lineitem"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("ad"),
            F.ceil("l_quantity").cast("long").alias("cl"),
            F.floor("l_quantity").cast("long").alias("fl"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
            F.round(F.pow(F.col("l_tax") + 1, 2), 4).alias("pw"),
            F.round(F.log(F.col("l_extendedprice")), 4).alias("lg"),
            F.round(F.exp("l_discount"), 4).alias("ex"),
            F.round(F.log10("l_extendedprice"), 4).alias("l10"),
            (F.col("l_quantity").cast("int") % 7).cast("long").alias("md"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q30_conditional",
    "CASE/COALESCE/NULLIF battery",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status
    FROM orders ORDER BY 1
    """,
    "SURVEY.md §2C Q30",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
    )
    status = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", bucket.alias("bucket"), status.alias("status"))
        .orderBy("o_orderkey")
    )


@query(
    "q48_sessionize",
    "gaps-and-islands sessionization: per-user sessions split at >30 min "
    "idle, session counts and mean duration",
    """
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS us FROM events
    ),
    marked AS (
        SELECT user_id, us,
               CASE WHEN us - LAG(us) OVER w > 1800000000 OR
                         LAG(us) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    sess AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    ),
    agg AS (
        SELECT user_id, sid,
               COUNT(*) AS n_events,
               (MAX(us) - MIN(us)) / 1000000.0 AS dur_s
        FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(ROUND(CAST(CAST(SUM(CAST(dur_s AS DECIMAL(25,10)))
                AS DOUBLE) / COUNT(*) AS DECIMAL(25,10)), 4) AS DOUBLE)
               AS avg_dur_s
    FROM agg GROUP BY user_id ORDER BY user_id
    """,
    "streaming-parity analytics: batch sessionization (session_window's "
    "batch twin; see tests/test_streaming_windows.py for the stream side)",
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via one per-user window (lag → gap flag
    → running sum = session id). One shuffle + one sort.

    Skew: one user's whole history sorts in a single task under the
    default plan. For a pathological key (bot with 10⁸ events), the
    library operator this query delegates to implements the skew-split
    (hoard_spark/sessionize.py: range-bucketed per-(user, bucket)
    windows + boundary-merged session ids, ``skew_buckets`` parameter,
    hot-key equality pinned by tests/test_sessionize.py). Streaming
    twin: tests/test_streaming_windows.py pins session_window
    convergence to this batch result.
    """
    from hoard_spark.queries import dround, dsum10
    from hoard_spark.sessionize import sessionize

    t = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    sess = sessionize(t, ["user_id"], "us", gap=1_800_000_000).withColumnRenamed(
        "session_id", "sid"
    )
    agg = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        ((F.max("us") - F.min("us")) / 1_000_000.0).alias("dur_s"),
    )
    return (
        agg.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            dround(dsum10(F.col("dur_s")) / F.count("*")).alias("avg_dur_s"),
        )
        .orderBy("user_id")
    )


@query(
    "q50_asof_join",
    "as-of join: each click matched to the user's most recent preceding "
    "(or simultaneous) view — union-marker window, no join",
    """
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value
        FROM events
    ),
    v AS (
        SELECT user_id, us, max_by(value, event_id) AS v_value
        FROM e WHERE event_type = 'view' GROUP BY 1, 2
    ),
    c AS (
        SELECT event_id, user_id, us FROM e WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, v.v_value AS asof_value,
           ((c.us - v.us + 50) // 100) / 10000.0 AS gap_s
    FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.us >= v.us
    ORDER BY event_id
    """,
    "timeseries-pipeline op: as-of join (DuckDB native ASOF as the oracle)",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin wrapper over the library operator (hoard_spark/asof.py) —
    the union-marker window: one shuffle + one sort, no join operator.
    A same-microsecond view matches its click (ASOF's ``>=`` bound);
    views are pre-deduped to one per (user, us) by highest event_id so
    ties are engine-independent. Scale notes live on ``asof_backward``.

    ``gap_s`` rounds half-up at 4dp through INTEGER arithmetic
    (``(gap_us + 50) div 100`` hundred-microsecond units, then one
    double division by 1e4): the gap is an exact integer and at
    microsecond magnitudes (~1e11) a double holds it only to ~6e-11, so
    the usual dround discipline — cast the double to DECIMAL(25,10) and
    round — diverges between engines exactly at true 4dp midpoints
    (found by the sf0.1 full-suite value check: one row at
    577549.43335 s rounded .4334 on Spark's shortest-repr cast and
    .4333 on DuckDB's exact-binary cast). Integer half-up has no double
    intermediate, and the final k/1e4 division produces bit-identical
    doubles in both engines.
    """
    from hoard_spark.asof import ASOF_ORDER, asof_backward

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        "user_id",
        "event_type",
        "value",
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "us")
        .agg(F.max_by("value", "event_id").alias("v_value"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "us"
    )
    j = asof_backward(
        clicks, views, keys=["user_id"], order="us", carry=["v_value"]
    )
    gap4 = F.expr(f"(us - {ASOF_ORDER} + 50) div 100")
    return j.select(
        "event_id",
        "user_id",
        F.col("v_value").alias("asof_value"),
        (gap4 / F.lit(10_000.0)).alias("gap_s"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# reshaping: pivot / unpivot (declared round 3)
# --------------------------------------------------------------------------


@query(
    "q54_pivot",
    "pivot: lineitem measures spread over l_linestatus columns",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                FILTER (l_linestatus = 'F') AS BIGINT) AS qty_F,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                FILTER (l_linestatus = 'O') AS BIGINT) AS qty_O,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                FILTER (l_linestatus = 'F') AS DOUBLE) AS price_F,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                FILTER (l_linestatus = 'O') AS DOUBLE) AS price_O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "SURVEY.md §2C extended: pivot operator (DataFrame.groupBy().pivot() "
    "with explicit value list so no extra distinct-scan job is planned; "
    "oracle = conditional aggregation, the portable twin)",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot values ⇒ single-pass plan (no values-discovery scan);
    the pivot lowers to one hash aggregate with pivot-filtered agg
    expressions — map-side combinable, scale-safe."""
    wide = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            dsum(F.col("l_extendedprice")).alias("price"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.col("F_qty").cast("long").alias("qty_F"),
        F.col("O_qty").cast("long").alias("qty_O"),
        F.col("F_price").alias("price_F"),
        F.col("O_price").alias("price_O"),
    ).orderBy("l_returnflag")


@query(
    "q55_unpivot",
    "unpivot/melt: part numeric measures to long form, per-brand stats",
    """
    WITH long AS (
        SELECT p_partkey, p_brand, 'p_retailprice' AS measure,
               p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, p_brand, 'p_size' AS measure,
               CAST(p_size AS DOUBLE) AS val FROM part
    )
    SELECT p_brand, measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM long GROUP BY p_brand, measure ORDER BY p_brand, measure
    """,
    "SURVEY.md §2C extended: unpivot/melt operator (DataFrame.unpivot — "
    "Spark's Expand node, one pass, no join; oracle = UNION ALL twin)",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot lowers to Expand (each input row emitted once per measure
    inside the same stage) — strictly better than the UNION ALL twin,
    which scans the table once per measure."""
    long = (
        load(spark, sf_dir, "part")
        .withColumn("p_size", F.col("p_size").cast("double"))
        .unpivot(
            ["p_partkey", "p_brand"],
            ["p_retailprice", "p_size"],
            "measure",
            "val",
        )
    )
    return (
        long.groupBy("p_brand", "measure")
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("val")).alias("total"),
        )
        .orderBy("p_brand", "measure")
    )


# --------------------------------------------------------------------------
# exact percentiles / range join / skew-safe aggregation (declared round 3)
# --------------------------------------------------------------------------


@query(
    "q56_percentiles",
    "exact continuous percentiles (p25/median/p75/p90) per return flag",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.25)
                AS DECIMAL(25,10)), 4) AS DOUBLE) AS p25,
           CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.5)
                AS DECIMAL(25,10)), 4) AS DOUBLE) AS p50,
           CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.75)
                AS DECIMAL(25,10)), 4) AS DOUBLE) AS p75,
           CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.9)
                AS DECIMAL(25,10)), 4) AS DOUBLE) AS p90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "SURVEY.md §2C extended: exact percentile aggregation (Spark "
    "percentile() == DuckDB quantile_cont(), both linear-interpolating; "
    "approx_percentile is the documented 100 TB path — t-digest sketch, "
    "mergeable, no full sort — pinned engine-side in tests)",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile is a per-group sort — fine per-group at any scale
    when groups are bounded (3 flags); for high-cardinality groups switch
    to approx_percentile (t-digest, map-side mergeable).

    All four percentiles come from ONE ``percentile(col, array(...))``
    aggregate (one value buffer + one sort per group, not four identical
    ones) and the scan is ``spread`` so partial aggregation parallelizes
    from a single-file input (4.2 s -> 1.7 s at sf0.1, same exact
    values)."""
    li = spread(load(spark, sf_dir, "lineitem"))
    ps = F.expr(
        "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.9D))"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), ps.alias("ps"))
        .select(
            "l_returnflag",
            "n",
            dround(F.col("ps")[0]).alias("p25"),
            dround(F.col("ps")[1]).alias("p50"),
            dround(F.col("ps")[2]).alias("p75"),
            dround(F.col("ps")[3]).alias("p90"),
        )
        .transform(present_sorted, "l_returnflag")
    )


@query(
    "q57_range_join",
    "range/band join: parts bucketed into price bands via interval join",
    """
    SELECT b.band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(CAST(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(25,10)))
                AS DOUBLE) / COUNT(*) AS DECIMAL(25,10)), 4) AS DOUBLE)
               AS avg_price
    FROM part p JOIN (VALUES ('b0_lt925', 0.0, 925.0),
                             ('b1_925_950', 925.0, 950.0),
                             ('b2_950_975', 950.0, 975.0),
                             ('b3_975_990', 975.0, 990.0),
                             ('b4_ge990', 990.0, 1e18)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
    "SURVEY.md §2C extended: non-equi interval join (broadcast the tiny "
    "band dimension ⇒ BroadcastNestedLoopJoin, linear in the fact side; "
    "oracle = VALUES-list range join)",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band dim is broadcast ⇒ the range join is a linear scan of part
    with an O(bands) probe per row — the 100 TB shape for banding /
    histogram-bucket joins. (Equi-bucketing via width_bucket would also
    work; the point here is the general interval-join operator.)"""
    bands = spark.createDataFrame(
        [
            ("b0_lt925", 0.0, 925.0),
            ("b1_925_950", 925.0, 950.0),
            ("b2_950_975", 950.0, 975.0),
            ("b3_975_990", 975.0, 990.0),
            ("b4_ge990", 990.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    p = load(spark, sf_dir, "part")
    joined = p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            davg("p_retailprice").alias("avg_price"),
        )
        .orderBy("band")
    )


@query(
    "q58_salted_agg",
    "skew-safe two-phase (salted) aggregation == plain group-by",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "SURVEY.md §2C extended: salting discipline for skewed keys — "
    "explicit two-phase aggregate (salt -> partial -> merge) that the "
    "oracle's plain GROUP BY must hash-match exactly (decimal "
    "accumulation makes the merge order immaterial)",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 group keys over the whole table is the canonical skew shape: a
    naive shuffle lands each key's entire volume on one reducer. Phase 1
    aggregates (key, salt) — 32-way spread, map-side combinable — phase 2
    merges the 32 partials per key. Exact DECIMAL(38,6) accumulation in
    both phases keeps the result independent of merge order, so the
    salted plan hash-matches the plain GROUP BY oracle. (Spark's own AQE
    skew handling covers joins, not aggregations — this is the agg-side
    recipe.)"""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(32)).alias(
            "salt"
        ),
    )
    partial = li.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("psum"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").cast("long").alias("n"),
            F.sum("psum").cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q69/q70: weighted median, map functions
# --------------------------------------------------------------------------


@query(
    "q69_weighted_median",
    "exact weighted median: l_extendedprice-weighted median of "
    "l_quantity per return flag (cumulative-weight window)",
    # Pre-aggregating weights per (flag, quantity) makes the cumulative
    # order unique (quantity is the sort key), so the scan order never
    # affects the answer; DECIMAL weight sums make the >= tot/2
    # comparison exact in both engines.
    """
    WITH wq AS (
        SELECT l_returnflag, l_quantity,
               SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, l_quantity, w,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM wq
    )
    SELECT l_returnflag, MIN(l_quantity) AS wmedian_qty
    FROM c WHERE cw >= tot / 2 GROUP BY 1 ORDER BY 1
    """,
    "relational surface: weighted quantiles (Spark has no built-in "
    "weighted percentile — expressed as codegen windows, no UDAF)",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight pre-aggregation bounds the window input to one row per
    (group, value) — the window then runs over the DISTINCT value
    domain, not the raw rows, so a 100 TB fact table cumsums over at
    most |groups|x|value domain| rows. All codegen; no UDAF needed."""
    from pyspark.sql import Window

    wq = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("w")
        )
    )
    part = Window.partitionBy("l_returnflag")
    c = wq.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(part.orderBy("l_quantity")).alias("cw"),
        F.sum("w").over(part).alias("tot"),
    )
    return (
        c.where(F.col("cw") >= F.col("tot") / 2)
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("wmedian_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "q70_map_fns",
    "map scalar functions: per-user event-type histogram as a MAP "
    "column, scalars extracted (size/element_at/map_keys)",
    # The oracle computes the same scalars relationally — hash-match is
    # on results, not SQL text (MAP literals aren't portable).
    """
    SELECT user_id,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS n_click,
           MIN(event_type) AS first_type
    FROM events GROUP BY 1 ORDER BY 1
    """,
    "relational surface: map construction + lookup (map_from_entries, "
    "element_at, map_keys — SURVEY §2B scalar-function family)",
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a real MAP column (map_from_entries over a sorted entry
    list — sorting makes the map's key order deterministic), then
    extracts scalars from it. The map stays executor-side; nothing
    collects. One aggregate to histogram, one to build the map."""
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    m = ev.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0))
        .cast("long")
        .alias("n_click"),
        F.array_min(F.map_keys("m")).alias("first_type"),
    ).orderBy("user_id")


@query(
    "q75_scalar_subquery",
    "correlated scalar subquery: orders priced above their customer's "
    "average order price",
    # DECIMAL-exact comparison (price*n > sum instead of price > avg):
    # avg would be one inexact division per group whose last bit could
    # differ with summation order; the cross-multiplied form is exact in
    # both engines, so the boundary rows are deterministic.
    """
    SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 4) AS price
    FROM orders o
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
          (SELECT COUNT(*) FROM orders o2
           WHERE o2.o_custkey = o.o_custkey)
          > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o.o_orderkey
    """,
    "relational surface: correlated scalar subqueries (SURVEY §2B query "
    "language). Catalyst decorrelates the SQL form into a join + "
    "aggregate; the DataFrame twin uses one partitioned window instead — "
    "a single scan of the fact table, the plan the decorrelation would "
    "have to rediscover",
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window form of the correlated scalar subquery: per-customer count
    and DECIMAL sum via one ``Window.partitionBy``, filter by the exact
    cross-multiplied predicate. One shuffle on o_custkey, no self-join,
    no division."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("n", F.count("*").over(w))
        .withColumn("s", F.sum("p").over(w))
        .where(F.col("p") * F.col("n") > F.col("s"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q76_value_windows",
    "value window functions: first_value / last_value / nth_value over "
    "an unbounded frame",
    # No arithmetic — the values pass through untouched, so the
    # cross-engine hash is stable without rounding gymnastics.
    """
    SELECT event_type, event_id,
           ROUND(FIRST_VALUE(value) OVER w, 4) AS first_v,
           ROUND(LAST_VALUE(value) OVER w, 4) AS last_v,
           ROUND(NTH_VALUE(value, 3) OVER w, 4) AS third_v
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
    ORDER BY event_type, event_id
    """,
    "relational surface: value window family (first/last/nth_value with "
    "explicit frames — completes SURVEY §2B window coverage beyond "
    "ranking/offset/frame aggregates of Q21-Q24)",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole-partition frame makes first/last/nth deterministic
    (orderBy event_id is a total order within the frame); one window
    spec shared by all three expressions, one shuffle on event_type."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.round(F.first("value").over(w), 4).alias("first_v"),
            F.round(F.last("value").over(w), 4).alias("last_v"),
            F.round(F.nth_value("value", 3).over(w), 4).alias("third_v"),
        )
        .orderBy("event_type", "event_id")
    )


@query(
    "q77_funnel",
    "ordered funnel: users who viewed, then clicked after the first "
    "view, then purchased after that click",
    # The sequential "after" constraint is the funnel contract: a click
    # BEFORE the user's first view doesn't advance the funnel. Strict >
    # makes ts-tie behavior explicit and identical in both engines.
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
    "relational surface: event funnel analysis (staged min-after-min "
    "aggregates — the product-analytics workload class over `events`)",
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every stage aggregates and joins on user_id, so one hash
    partitioning is reused across the whole funnel (AQE reuses the
    exchange); each stage's input is pre-filtered to its event type
    before the join — the corpus never shuffles unfiltered. The three
    final counts are 1-row aggregates; their crossJoins broadcast."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


@query(
    "q78_cohort_retention",
    "weekly cohort retention: distinct active users per (first-activity "
    "week, week offset)",
    # Both engines truncate 'week' to Monday 00:00; offsets are exact
    # multiples of 7 days (UTC, no DST), so day-diff/7 is integral.
    """
    WITH first_seen AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
        FROM events GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT e.user_id, f.cohort,
               CAST(date_trunc('week', e.ts) AS DATE) AS w
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT cohort,
           CAST(date_diff('day', cohort, w) / 7 AS INT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM act GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "relational surface: cohort retention analysis (the second classic "
    "product-analytics shape; Spark `datediff` vs DuckDB `date_diff` is "
    "a declared dialect divergence — hash-match is on results)",
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first-activity aggregate + fact join share the user_id
    partitioning; the distinct collapses to (user, week) BEFORE the
    cohort count, so the final aggregate reads |users|x|weeks| rows,
    not raw events."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    act = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            F.to_date(F.date_trunc("week", "ts")).alias("w"),
        )
        .distinct()
    )
    return (
        act.groupBy(
            "cohort",
            F.expr("CAST(datediff(w, cohort) / 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort", "week_offset")
    )


# ---------------------------------------------------------------------------
# q80: deterministic sorted collect (array_agg with a defined order)
# ---------------------------------------------------------------------------


@query(
    "q80_sorted_collect",
    "per-(nation, segment) sorted customer-key arrays: deterministic "
    "array_agg",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           array_to_string(list_sort(list(c_custkey)), ',') AS custkeys
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000.0)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "relational surface: deterministic collect (VERDICT r5 item 8 — "
    "collect_list order is undefined in both engines; array_sort after "
    "the fact is the portable determinism contract; projected to a "
    "joined string per VERDICT r6 item 1 so the result is scalar-typed "
    "and hashable by any harness)",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``collect_list`` is partition-order-dependent in Spark (and
    ``list()`` likewise in DuckDB); the deterministic form sorts the
    built array JVM-side, then joins it to a string so downstream
    consumers (and result hashers) see a scalar column. The filter keeps
    arrays bounded (the rule for ANY collect at 100 TB: collect only
    provably small groups — an unbounded collect_list is a scale bug,
    not an operator)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("c_custkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("custkeys"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q81: MERGE-shaped upsert (matched update / unmatched insert), as a query
# ---------------------------------------------------------------------------


@query(
    "q81_merge_upsert",
    "MERGE INTO semantics over orders: lineitem-derived updates upsert "
    "into the order table (update matched, insert unmatched)",
    """
    WITH upd AS (
        SELECT CASE WHEN l_orderkey % 7 = 0 THEN -l_orderkey
                    ELSE l_orderkey END AS okey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,10))) AS DOUBLE)
                   AS new_price
        FROM lineitem GROUP BY 1 HAVING COUNT(*) > 4
    ),
    base AS (SELECT o_orderkey AS okey, o_totalprice, o_orderstatus
             FROM orders)
    SELECT COALESCE(b.okey, u.okey) AS okey,
           CAST(ROUND(CAST(COALESCE(u.new_price, b.o_totalprice)
                           AS DECIMAL(25,10)), 2) AS DOUBLE) AS price,
           CASE WHEN b.okey IS NULL THEN 'I'
                WHEN u.okey IS NULL THEN b.o_orderstatus
                ELSE 'U' END AS status
    FROM base b FULL JOIN upd u ON b.okey = u.okey
    ORDER BY okey
    """,
    "engine write surface: MERGE-shaped upsert twin of the LWW pipeline "
    "(VERDICT r5 item 8) — matched rows take the update's value, "
    "unmatched updates insert, untouched base rows ride through",
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO expressed as the query it compiles to — a full outer
    join on the merge key + per-branch CASE — the exact plan a Delta/
    Iceberg MERGE runs, and the batch twin of the engine's LWW upsert
    (hoard_spark/ingest.py resolves matched rows by seq instead of
    update-wins). Scale shape: one shuffle on the merge key for each
    side; AQE handles the skewed-okey case; the update side is
    pre-aggregated so the join is key-unique on both sides."""
    li = load(spark, sf_dir, "lineitem")
    upd = (
        li.groupBy(
            F.when(
                F.col("l_orderkey") % 7 == 0, -F.col("l_orderkey")
            )
            .otherwise(F.col("l_orderkey"))
            .alias("okey")
        )
        .agg(
            dsum10("l_extendedprice").alias("new_price"),
            F.count("*").alias("_n"),
        )
        .where(F.col("_n") > 4)
        .drop("_n")
    )
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_totalprice", "o_orderstatus"
    )
    b, u = base.alias("b"), upd.alias("u")
    j = b.join(u, F.col("b.okey") == F.col("u.okey"), "full_outer")
    return j.select(
        F.coalesce(F.col("b.okey"), F.col("u.okey")).alias("okey"),
        F.round(
            F.coalesce(F.col("u.new_price"), F.col("b.o_totalprice")).cast(
                "decimal(25,10)"
            ),
            2,
        )
        .cast("double")
        .alias("price"),
        F.when(F.col("b.okey").isNull(), F.lit("I"))
        .when(F.col("u.okey").isNull(), F.col("b.o_orderstatus"))
        .otherwise(F.lit("U"))
        .alias("status"),
    ).orderBy("okey")


# ---------------------------------------------------------------------------
# q82: mergeable quantile-sketch state (equi-depth histogram), oracle-pinned
# ---------------------------------------------------------------------------


@query(
    "q82_quantile_sketch",
    "per-event_type histogram sketch state (4 exact-quartile bins) built "
    "daily and MERGED — the mergeable percentile scale path, cross-"
    "engine-pinned",
    """
    WITH b AS (
        SELECT ROUND(quantile_cont(value, 0.25), 4) AS b1,
               ROUND(quantile_cont(value, 0.50), 4) AS b2,
               ROUND(quantile_cont(value, 0.75), 4) AS b3
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(value), 4) AS vmin,
           ROUND(MAX(value), 4) AS vmax,
           CAST(SUM(CASE WHEN value <= b1 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           CAST(SUM(CASE WHEN value > b1 AND value <= b2 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN value > b2 AND value <= b3 THEN 1 ELSE 0 END)
                AS BIGINT) AS c2,
           CAST(SUM(CASE WHEN value > b3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
    FROM events, b WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    "approximate-query surface: mergeable quantile sketch state "
    "(hoard_spark/sketches.py; the q56 scale path, round 6)",
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds the DAILY histogram table then merges to event_type grain
    — so the driver pins the *merged* sketch state against the oracle's
    direct computation, on top of tests' merge==direct pin. The grid
    uses exact quartiles (one small job, literals inlined) so DuckDB
    can replicate it; production grids use percentile_approx
    (quantile_boundaries) where cross-engine bit-parity isn't needed.
    """
    from hoard_spark.sketches import merge_quantile, quantile_sketch_table

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    brow = ev.where(F.col("value").isNotNull()).select(
        F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))").alias("b")
    ).first()
    bounds = [round(float(x), 4) for x in brow["b"]]
    daily = quantile_sketch_table(
        ev, ["event_type", "day"], "value", boundaries=bounds
    )
    m = merge_quantile(daily, ["event_type"])
    return m.select(
        "event_type",
        F.col("rows").alias("n_rows"),
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax"),
        *[
            F.try_element_at("counts", F.lit(i + 1)).alias(f"c{i}")
            for i in range(4)
        ],
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q84: bounded-lookback EWMA (exponentially-decayed moving average)
# ---------------------------------------------------------------------------

_EWMA_DECAY = 0.7  # (1 - alpha)
_EWMA_K = 8  # lookback depth: weight beyond 8 lags < 6% of the head


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE(LAG(value, {j}) OVER w, 0) * {_EWMA_DECAY ** j!r}"
        for j in range(_EWMA_K)
    )
    den = " + ".join(
        f"(CASE WHEN LAG(value, {j}) OVER w IS NULL THEN 0 ELSE "
        f"{_EWMA_DECAY ** j!r} END)"
        for j in range(_EWMA_K)
    )
    return f"""
    SELECT event_type, event_id,
           CAST(ROUND(CAST(({num}) / ({den}) AS DECIMAL(25,10)), 4)
                AS DOUBLE) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
    ORDER BY event_type, event_id
    """


@query(
    "q84_ewma",
    "bounded-lookback EWMA per metric: decay-weighted average of the "
    "last 8 points, null-aware normalization at the series head",
    _ewma_sql(),
    "relational surface: exponential smoothing (round 6) — the "
    "recursive EWMA is not a window aggregate; the K-term truncation "
    "(tail weight 0.7^8 < 6%) makes it one, identical SQL in both "
    "engines",
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked LAG terms share ONE window spec, so Catalyst plans a
    single Window operator (one shuffle + sort per metric) — the same
    rule as q21's ranking battery. The truncated form is the scale
    answer to recursive smoothing: exact EWMA needs sequential state
    per key (a single-task scan or applyInPandasWithState); eight
    codegen lags cost nothing and bound the error by the dropped tail
    mass."""
    from pyspark.sql import Window

    from hoard_spark.queries import dround

    w = Window.partitionBy("event_type").orderBy("event_id")
    num = sum(
        (
            F.coalesce(F.lag("value", j).over(w), F.lit(0.0))
            * F.lit(_EWMA_DECAY**j)
            for j in range(_EWMA_K)
        ),
        start=F.lit(0.0),
    )
    den = sum(
        (
            F.when(F.lag("value", j).over(w).isNull(), 0.0).otherwise(
                F.lit(_EWMA_DECAY**j)
            )
            for j in range(_EWMA_K)
        ),
        start=F.lit(0.0),
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            dround(num / den).alias("ewma"),
        )
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# q85: big x big interval-overlap join via grid bucketing
# ---------------------------------------------------------------------------


@query(
    "q85_interval_join",
    "same-supplier overlapping shipping windows among high-quantity "
    "lineitems: big x big interval join, grid-bucketed",
    """
    WITH li AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               date_diff('day', DATE '1992-01-01', l_shipdate) AS s,
               date_diff('day', DATE '1992-01-01', l_shipdate)
                 + CAST(l_quantity AS INT) % 14 + 1 AS e
        FROM lineitem WHERE l_quantity > 45
    )
    SELECT a.l_suppkey AS suppkey,
           a.l_orderkey AS a_ok, a.l_linenumber AS a_ln,
           b.l_orderkey AS b_ok, b.l_linenumber AS b_ln,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS BIGINT)
               AS overlap_days
    FROM li a JOIN li b
      ON a.l_suppkey = b.l_suppkey
     AND (a.l_orderkey < b.l_orderkey
          OR (a.l_orderkey = b.l_orderkey
              AND a.l_linenumber < b.l_linenumber))
     AND a.s <= b.e AND b.s <= a.e
    ORDER BY 1, 2, 3, 4, 5
    """,
    "relational surface: interval-overlap join (round 6) — both sides "
    "data-sized, so the plan grid-buckets instead of theta-joining "
    "(hoard_spark/intervals.py); oracle = the quadratic theta twin. "
    "Spark `datediff` vs DuckDB `date_diff` is the declared dialect "
    "divergence (hash-match on results).",
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intervals: [ship_day, ship_day + qty%14 + 1] (synthetic end —
    the testdata carries no receipt date). Both sides are the same
    data-sized set, so the library operator explodes each interval to
    14-day grid cells, equi-joins on (suppkey, cell), verifies the
    exact predicate, and keeps each pair only at its first shared cell
    — work ∝ overlaps, no per-supplier nested loop, no distinct."""
    from hoard_spark.intervals import interval_overlap_join

    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "l_orderkey",
            "l_linenumber",
            F.datediff("l_shipdate", F.lit("1992-01-01").cast("date")).alias(
                "s"
            ),
            (
                F.datediff("l_shipdate", F.lit("1992-01-01").cast("date"))
                + F.col("l_quantity").cast("int") % 14
                + 1
            ).alias("e"),
        )
    )
    a = li.select(
        "suppkey",
        F.col("l_orderkey").alias("a_ok"),
        F.col("l_linenumber").alias("a_ln"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = li.select(
        "suppkey",
        F.col("l_orderkey").alias("b_ok"),
        F.col("l_linenumber").alias("b_ln"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    pairs = interval_overlap_join(
        a, b, ["suppkey"], ("a_s", "a_e"), ("b_s", "b_e"), bucket_width=14
    ).where(
        (F.col("a_ok") < F.col("b_ok"))
        | ((F.col("a_ok") == F.col("b_ok")) & (F.col("a_ln") < F.col("b_ln")))
    )
    return pairs.select(
        "suppkey",
        "a_ok",
        "a_ln",
        "b_ok",
        "b_ln",
        (
            F.least("a_e", "b_e") - F.greatest("a_s", "b_s") + 1
        )
        .cast("long")
        .alias("overlap_days"),
    ).orderBy("suppkey", "a_ok", "a_ln", "b_ok", "b_ln")


# ---------------------------------------------------------------------------
# q86: distinct count over a sliding window frame
# ---------------------------------------------------------------------------


@query(
    "q86_window_distinct",
    "distinct users over each metric's trailing 10-event frame",
    """
    SELECT event_type, event_id,
           CAST(COUNT(DISTINCT user_id) OVER
                (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS uniq_users
    FROM events
    ORDER BY event_type, event_id
    """,
    "relational surface: windowed distinct count (round 6) — Spark has "
    "no DISTINCT window aggregate; size(collect_set) over the frame is "
    "the standard workaround, pinned here against DuckDB's native "
    "COUNT(DISTINCT ...) OVER",
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``size(collect_set(...))`` over a bounded ROWS frame: per-row
    state is the ≤10-element set, so memory is frame-bounded and the
    plan stays one Window operator (one shuffle + sort per metric).
    Safe ONLY with a bounded frame — over an unbounded frame the set
    grows with the partition; that shape belongs to the HLL sketch
    table (hoard_spark/sketches.py), not a window."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-9, 0)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.size(F.collect_set("user_id").over(w))
            .cast("long")
            .alias("uniq_users"),
        )
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# q87: keyed snapshot diff (added / removed / changed reconciliation)
# ---------------------------------------------------------------------------


@query(
    "q87_snapshot_diff",
    "diff two deterministic order snapshots by key: dropped (key%17=0), "
    "price-bumped (key%13=0), synthesized adds (negative keys, key%19=0)",
    """
    WITH old AS (
        SELECT o_orderkey AS okey, o_totalprice AS price,
               o_orderstatus AS status
        FROM orders
    ),
    new AS (
        SELECT okey, CASE WHEN okey % 13 = 0 THEN price + 100.0
                          ELSE price END AS price, status
        FROM old WHERE okey % 17 <> 0
        UNION ALL
        SELECT -okey, price, 'N' FROM old WHERE okey % 19 = 0
    )
    SELECT COALESCE(o.okey, n.okey) AS okey,
           CASE WHEN o.okey IS NULL THEN 'added'
                WHEN n.okey IS NULL THEN 'removed'
                WHEN o.price <> n.price OR o.status <> n.status
                     THEN 'changed' END AS change,
           o.price AS old_price, n.price AS new_price,
           o.status AS old_status, n.status AS new_status
    FROM old o FULL JOIN new n ON o.okey = n.okey
    WHERE o.okey IS NULL OR n.okey IS NULL
       OR o.price <> n.price OR o.status <> n.status
    ORDER BY okey
    """,
    "pipeline reconciliation: keyed snapshot diff (round 6, "
    "hoard_spark/diff.py) — added/removed/changed in one full outer "
    "join, |delta|-sized output",
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The library operator compares value STRUCTS with eqNullSafe (one
    codegen comparison regardless of column count); the query flattens
    the structs for the oracle. Synthetic second snapshot keeps the
    test deterministic: +100.0 stays exact in 2dp decimal-valued
    doubles, so no rounding stabilization is needed."""
    from hoard_spark.diff import table_diff

    old = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    new = (
        old.where(F.col("okey") % 17 != 0)
        .select(
            "okey",
            F.when(F.col("okey") % 13 == 0, F.col("price") + 100.0)
            .otherwise(F.col("price"))
            .alias("price"),
            "status",
        )
        .unionByName(
            old.where(F.col("okey") % 19 == 0).select(
                (-F.col("okey")).alias("okey"),
                "price",
                F.lit("N").alias("status"),
            )
        )
    )
    d = table_diff(old, new, ["okey"])
    return d.select(
        "okey",
        "change",
        F.col("old_vals")["price"].alias("old_price"),
        F.col("new_vals")["price"].alias("new_price"),
        F.col("old_vals")["status"].alias("old_status"),
        F.col("new_vals")["status"].alias("new_status"),
    ).orderBy("okey")


# ---------------------------------------------------------------------------
# q88: SCD-2 validity intervals from a change log
# ---------------------------------------------------------------------------


@query(
    "q88_scd2_intervals",
    "slowly-changing-dimension build: per user the validity interval of "
    "each observed value (valid_from = event ts, valid_to = next event "
    "ts, open tail NULL)",
    """
    WITH log AS (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               LEAD(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM events WHERE event_type = 'signup'
    )
    SELECT user_id, CAST(rn AS BIGINT) AS version, ts AS valid_from,
           valid_to, ROUND(value, 4) AS value,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM log ORDER BY user_id, version
    """,
    "temporal surface: SCD-2 interval build (round 6) — the warehouse "
    "dimension-versioning staple; the intervals feed asof_backward "
    "(hoard_spark/asof.py) for point-in-time joins",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One window per key (ROW_NUMBER + LEAD share the spec → a single
    Window operator, one shuffle+sort). The open-tail row is flagged
    is_current; event_id breaks ts ties so versions are total. At scale
    this is the incremental-build shape too: a new batch only touches
    each key's current row plus its own rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    log = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .select(
            "user_id",
            "ts",
            "value",
            "event_id",
        )
    )
    return (
        log.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.round("value", 4).alias("value"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# q89: fuzzy probe matching (edit distance, broadcast probe set)
# ---------------------------------------------------------------------------

_FUZZY_PROBES = [
    "smal ring", "red wdget", "blue blot", "hot gearz", "grene gizmo",
]


@query(
    "q89_fuzzy_probe",
    "entity-resolution-lite: for each misspelled probe name, the "
    "closest part by Levenshtein distance (ties by partkey)",
    f"""
    WITH probes(probe) AS (
        VALUES {", ".join(f"('{p}')" for p in _FUZZY_PROBES)}
    ),
    scored AS (
        SELECT probe, p_partkey, p_name,
               levenshtein(probe, p_name) AS dist,
               ROW_NUMBER() OVER
                 (PARTITION BY probe
                  ORDER BY levenshtein(probe, p_name), p_partkey) AS rn
        FROM probes CROSS JOIN part
    )
    SELECT probe, p_partkey AS best_partkey, p_name AS best_name,
           CAST(dist AS BIGINT) AS dist
    FROM scored WHERE rn = 1 ORDER BY probe
    """,
    "text surface: fuzzy matching (round 6) — JVM levenshtein over a "
    "BROADCAST probe set (work = |corpus| x |probes|, one scan, no "
    "corpus self-join); both engines implement standard edit distance",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probe set broadcasts, so the plan is one linear scan of part
    with an O(|probes|) codegen edit-distance battery per row — the
    right shape when probes ≪ corpus. (Corpus×corpus fuzzy dedup would
    instead block/LSH first — the q35/q79 machinery.) Deterministic
    tie-break on partkey via the shared window."""
    from pyspark.sql import Window

    probes = spark.createDataFrame(
        [(p,) for p in _FUZZY_PROBES], "probe string"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    scored = part.crossJoin(F.broadcast(probes)).select(
        "probe",
        "p_partkey",
        "p_name",
        F.levenshtein("probe", "p_name").alias("dist"),
    )
    w = Window.partitionBy("probe").orderBy("dist", "p_partkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "probe",
            F.col("p_partkey").alias("best_partkey"),
            F.col("p_name").alias("best_name"),
            F.col("dist").cast("long").alias("dist"),
        )
        .transform(present_sorted, "probe")
    )


# --------------------------------------------------------------------------
# data quality: profiling + constraint validation (hoard_spark/quality.py)
# --------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]
_PROFILE_NUM = {"o_orderkey", "o_custkey", "o_totalprice"}


def _profile_oracle() -> str:
    stats = ["COUNT(*) AS _n"]
    arms = []
    for i, c in enumerate(_PROFILE_COLS):
        stats += [f"COUNT({c}) AS c{i}", f"COUNT(DISTINCT {c}) AS d{i}"]
        if c in _PROFILE_NUM:
            stats += [
                f"CAST(MIN({c}) AS DOUBLE) AS mn{i}",
                f"CAST(MAX({c}) AS DOUBLE) AS mx{i}",
                f"CAST(ROUND(CAST(CAST(SUM(CAST({c} AS DECIMAL(25,10)))"
                f" AS DOUBLE) / COUNT({c}) AS DECIMAL(25,10)), 4)"
                f" AS DOUBLE) AS av{i}",
            ]
            mn, mx, av = f"mn{i}", f"mx{i}", f"av{i}"
        else:
            mn = mx = av = "CAST(NULL AS DOUBLE)"
        arms.append(
            f"SELECT '{c}' AS col, _n - c{i} AS n_nulls,"
            f" d{i} AS n_distinct, {mn} AS min_num, {mx} AS max_num,"
            f" {av} AS mean_num FROM w"
        )
    return (
        "WITH w AS (SELECT " + ", ".join(stats) + " FROM orders)\n"
        "SELECT * FROM (" + " UNION ALL ".join(arms) + ") ORDER BY col"
    )


@query(
    "q101_profile",
    "single-pass per-column table profile: nulls, exact distinct, "
    "numeric min/max/mean",
    _profile_oracle(),
    "training-data pipeline: dataset-version gating (deequ-style "
    "analyzer battery, hoard_spark/quality.py) — profile every column "
    "in ONE scan",
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin wrapper over ``quality.profile_columns`` (the q38 pattern:
    conformance twin of the library surface). ONE aggregate node over
    the table: Catalyst rewrites the multi-column exact-distinct
    battery into a single Expand + two-phase aggregate — one scan, no
    per-column jobs — and the bounded wide row explodes to long form.
    Exact distinct is the conformance semantics; ``approx=True`` (HLL)
    is the declared extreme-cardinality scale path, pinned within 5% by
    tests (the q56 exact-twin/approx-path split)."""
    from hoard_spark.quality import profile_columns

    return profile_columns(
        load(spark, sf_dir, "orders"), _PROFILE_COLS
    ).transform(present_sorted, "col")


_INTEGRITY_ORACLE = """
SELECT * FROM (
  SELECT 'unique(o_orderkey)' AS chk,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS violations
  FROM orders WHERE o_orderkey IS NOT NULL
  UNION ALL
  SELECT 'not_null(o_custkey)', COUNT(*) FROM orders
  WHERE o_custkey IS NULL
  UNION ALL
  SELECT 'references(o_custkey->c_custkey)', COUNT(*) FROM orders o
  WHERE o_custkey IS NOT NULL AND NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'references(l_orderkey->o_orderkey)', COUNT(*) FROM lineitem l
  WHERE l_orderkey IS NOT NULL AND NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'in_range(l_quantity,1,50)', COUNT(*) FROM lineitem
  WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50)
  UNION ALL
  SELECT 'in_range(c_acctbal,0,10000)', COUNT(*) FROM customer
  WHERE c_acctbal IS NOT NULL AND (c_acctbal < 0 OR c_acctbal > 10000)
  UNION ALL
  SELECT 'net_price_positive', COUNT(*) FROM lineitem
  WHERE NOT COALESCE(l_extendedprice * (1 - l_discount) > 0, FALSE)
) ORDER BY chk
"""


@query(
    "q102_integrity",
    "declarative constraint checklist: uniqueness, nullability, "
    "referential integrity, ranges — one violation count per check",
    _INTEGRITY_ORACLE,
    "training-data pipeline: dataset contract validation (deequ-style "
    "verification suite, hoard_spark/quality.py)",
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin wrapper over ``quality.validate``: each check is a plain
    filter/aggregate; the referential checks are key anti joins (the
    q12 shape — shuffle-partitioned at scale, broadcast when the parent
    side is bounded, Catalyst/AQE's call). The union of 1-row
    aggregates executes as one plan."""
    from hoard_spark.quality import (
        in_range,
        not_null,
        references,
        satisfies,
        unique,
        validate,
    )

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    checks = [
        unique(orders, "o_orderkey"),
        not_null(orders, "o_custkey"),
        references(
            orders, "o_custkey", customer, "c_custkey",
            name="references(o_custkey->c_custkey)",
        ),
        references(
            lineitem, "l_orderkey", orders, "o_orderkey",
            name="references(l_orderkey->o_orderkey)",
        ),
        in_range(lineitem, "l_quantity", 1, 50),
        in_range(customer, "c_acctbal", 0, 10000),
        satisfies(
            lineitem,
            "net_price_positive",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))) > 0,
        ),
    ]
    return (
        validate(checks)
        .select(F.col("constraint").alias("chk"), "violations")
        .transform(present_sorted, "chk")
    )
