"""Relational operator surface over the TPC-H-ish star schema.

The reference is single-table (SURVEY §2.6) — joins/sets/windows come free
with Spark and are part of the engine's surface so a user gets the full
query capability alongside the text pipeline. Plans are written for scale:

- fact-to-fact joins (lineitem ⋈ orders) shuffle on the join key and rely
  on AQE for skew splitting;
- dimension joins (customer, nation, region, supplier) stay under the
  broadcast threshold at any SF — dimensions grow ~linearly in TPC-H but
  region/nation are constant and we broadcast explicitly where it matters;
- top-k compiles to TakeOrderedAndProject (no global sort);
- money sums are rounded to 2dp AFTER aggregation so the DuckDB oracle
  matches despite summation-order differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q1_pricing_summary",
    sql="""
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "flagship"),
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates. Partial
    (map-side) aggregation collapses 100 TB to 6 groups before the single
    tiny shuffle; the shipdate filter pushes into the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= "2000-12-01 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(F.sum(_revenue() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    sql="""
SELECT l.l_orderkey AS o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    tags=("relational",),
)
def q_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension (customer, broadcast) → fact ⋈
    fact on the order key → grouped revenue → top-10 heap."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01 00:00:00"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01 00:00:00"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(l.l_orderkey.alias("o_orderkey"), "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    sql="""
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("relational",),
)
def q_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join. region/nation/supplier/customer are
    broadcast (constant or ~linear dimensions); the only shuffle joins are
    the two fact keys. Catalyst reorders the dimension filters first."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "2000-01-01 00:00:00")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "top_orders_per_customer",
    sql="""
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 3
""",
    tags=("relational", "window"),
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (SURVEY T2/T3 shape on relational data): rank window
    + filter. AQE handles per-customer skew; no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "semi_join_active_customers",
    sql="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
GROUP BY c_mktsegment
""",
    tags=("relational", "join"),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). At scale this is a broadcast of the
    distinct keys or a shuffled semi — Catalyst decides; no row duplication
    ever reaches the aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "anti_join_idle_customers",
    sql="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("relational", "join"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "rollup_orders",
    sql="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "agg"),
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §7.2 M7 fill-in). Spark executes one
    Expand + single aggregation pass — no N-pass re-scan."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "cube_lineitem_flags",
    sql="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       round(avg(l_quantity), 6) AS avg_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("relational", "agg"),
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two status dims — all 2^2 grouping sets in one pass."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.avg("l_quantity"), 6).alias("avg_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "avg_qty",
        )
    )


@register(
    "pivot_status_by_priority",
    sql="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_finished,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_pending
FROM orders
GROUP BY o_orderpriority
""",
    tags=("relational", "agg"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregate). Explicit value list so the plan
    is a single pass, never a distinct-scan to discover pivot columns."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("cnt_open"),
        F.coalesce("F", F.lit(0)).alias("cnt_finished"),
        F.coalesce("P", F.lit(0)).alias("cnt_pending"),
    )


@register(
    "custkeys_set_ops",
    sql="""
WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     fin_c  AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM fin_c)
UNION ALL
SELECT 'open_only' AS tag, o_custkey FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM fin_c)
""",
    tags=("relational", "setops"),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface (absent from the reference, SURVEY §2.6
    'free in Spark' row)."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both = open_c.intersect(fin_c).select(F.lit("both").alias("tag"), "o_custkey")
    only = open_c.exceptAll(fin_c).select(F.lit("open_only").alias("tag"), "o_custkey")
    return both.unionAll(only)


@register(
    "part_supplier_join",
    sql="""
SELECT p.p_brand, s.s_name, count(*) AS n_lines,
       round(sum(l.l_quantity), 2) AS total_qty
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size >= 25
GROUP BY p.p_brand, s.s_name
""",
    tags=("relational", "join"),
)
def q_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ two dims, both explicitly broadcast — zero shuffle joins; the
    only exchange is the final small aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "q6_forecast_revenue",
    sql="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("relational", "pushdown"),
)
def q_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown showcase — every filter
    is a parquet-pushable range predicate on scan columns, so the scan
    reads 4 columns and row groups outside the ranges are skipped via
    min/max statistics. No shuffle at all: partial sums → one scalar."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q10_returned_items",
    sql="""
SELECT c.c_custkey,
       c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(max(c.c_acctbal), 2) AS c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("relational",),
)
def q_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: date-windowed orders ⋈ returned lineitems ⋈
    customer ⋈ nation, top-20 by lost revenue. Join order matters at scale:
    filter orders FIRST (3-month window cuts the fact early), join lineitem
    on the orderkey, and only then attach the wide customer columns —
    nation is broadcast everywhere."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    sql="""
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
)
SELECT c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=("relational",),
)
def q_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as an IN-subquery
    (Catalyst plans it as a left-semi join), then the fact re-joins only
    the qualifying orders. The `big` aggregate and the semi-join reuse the
    same orderkey partitioning — one shuffle serves both."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "price_distribution",
    sql="""
SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(quantile_cont(l_extendedprice, 0.90), 6) AS p90,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_cov
FROM lineitem
""",
    tags=("relational", "stats"),
)
def q_price_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution aggregates: exact interpolated percentiles + Pearson
    correlation/covariance in one pass. ``percentile`` is exact here to
    match the oracle; at 100 TB swap to ``approx_percentile`` (t-digest,
    mergeable sketch) — same query shape, bounded memory."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.90)"), 6).alias("p90"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_cov"
        ),
    )


def _range_partitioned_row_numbers(
    df: DataFrame, order_cols: list, memo_key: tuple
) -> tuple[DataFrame, int]:
    """Exact 1-based row numbers under a TOTAL order without a global-order
    window (the distributed sort-rank idiom; sibling of
    ``quality_model._value_frac_ranks``, which ranks distinct values —
    this ranks rows, so the order columns must be unique together).

    (1) range-partition on the order columns so partition i holds rows
    strictly earlier in the order than partition i+1 (persisted through
    the memo registry: the offsets collect and the ranked path must see
    the identical row->pid mapping); (2) row_number within each
    partition — a PARTITIONED window, every partition ranks in parallel;
    (3) per-partition counts (≤ one long per shuffle partition) are
    prefix-summed on the driver and broadcast back as offsets. Returns
    (df + ``rn``/``pid`` columns, total row count).

    The partition COUNT is passed explicitly (r9 ADVICE): persist() is
    best-effort, and on block eviction the recompute re-runs
    repartitionByRange — with an implicit count, AQE shuffle coalescing
    could remap rows to different pids than the offsets were computed
    from. AQE never coalesces a user-specified count, so the eviction
    recompute reproduces the identical row->pid mapping (range
    boundaries come from a deterministic bounded sample of the same
    input)."""
    from ..cache import memo

    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = memo(
        spark,
        memo_key,
        lambda: df.repartitionByRange(n_part, *order_cols).withColumn(
            "pid", F.spark_partition_id()
        ),
        persist=True,
    )
    totals = sorted(
        part.groupBy("pid").agg(F.count("*").alias("c")).collect(),
        key=lambda row: row["pid"],
    )
    offs, acc = [], 0
    for row in totals:
        offs.append((row["pid"], acc))
        acc += row["c"]
    off_df = spark.createDataFrame(offs, "pid int, off long")
    w = Window.partitionBy("pid").orderBy(*order_cols)
    out = part.join(F.broadcast(off_df), "pid").withColumn(
        "rn", F.col("off") + F.row_number().over(w)
    ).drop("off")
    return out, acc


@register(
    "customer_value_quartiles",
    sql="""
WITH ranked AS (
    SELECT c_custkey, c_acctbal,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
)
SELECT quartile,
       count(*) AS n,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 6) AS avg_bal
FROM ranked
GROUP BY quartile
""",
    tags=("relational", "window"),
)
def q_customer_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile banding + per-band stats — WITHOUT the global-order
    window. ntile(n) is a pure function of the exact 1-based row number
    under the total order (c_acctbal DESC, c_custkey): with N rows,
    q = N div 4 and r = N mod 4, buckets 1..r hold q+1 rows and buckets
    r+1..4 hold q, so quartile(rn) is one integer-DIV CASE expression.
    Exact row numbers come from the two-phase range-partitioned rank
    (the ``_value_frac_ranks`` idiom, quality_model.py): range-partition
    on the sort key (the order is total — c_custkey is unique — so ranks
    are exact), row_number WITHIN each partition (partitioned window,
    parallel), then add per-partition offsets prefix-summed on the
    driver (one long per shuffle partition — model-sized). Bit-identical
    to ntile(4) OVER (ORDER BY ...) with no single-task global sort."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n_rows = _range_partitioned_row_numbers(
        c,
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        memo_key=("cvq_ranked", sf_dir),
    )
    q, r = divmod(n_rows, 4)
    if q == 0:  # fewer rows than buckets: ntile gives row_number itself
        bucket = F.col("rn").cast("int")
    else:
        cut = r * (q + 1)
        bucket = F.expr(
            f"CAST(CASE WHEN rn <= {cut} THEN (rn - 1) DIV {q + 1} + 1 "
            f"ELSE {r} + (rn - {cut} - 1) DIV {q} + 1 END AS INT)"
        )
    return ranked.select("c_acctbal", bucket.alias("quartile")).groupBy(
        "quartile"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
    )


# --------------------------------------------------- TPC-H fill-ins, wave 2
# The remaining classic TPC-H query shapes expressible over this schema
# (no partsupp / shipmode / phone columns — each query notes its
# adaptation). All exact-oracle-checked.


@register(
    "q2_min_cost_supplier",
    sql="""
WITH unit AS (
    SELECT l_partkey, l_suppkey,
           avg(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
ranked AS (
    SELECT u.l_partkey, u.l_suppkey, u.unit_price,
           row_number() OVER (PARTITION BY u.l_partkey
                              ORDER BY u.unit_price, u.l_suppkey) AS rk
    FROM unit u
)
SELECT p.p_partkey, p.p_name, s.s_name, round(s.s_acctbal, 2) AS s_acctbal,
       round(r.unit_price, 6) AS unit_price
FROM ranked r
JOIN part p ON p.p_partkey = r.l_partkey
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rk = 1 AND p.p_size <= 10 AND p.p_type = 'LARGE'
ORDER BY s_acctbal DESC, p.p_partkey
""",
    tags=("relational", "join", "window"),
)
def q_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table: supply cost ≈ observed avg unit
    price per (part, supplier) from lineitem): cheapest supplier per part,
    restricted to one size/type band. The min-cost-per-part correlated
    subquery becomes a rank window over the aggregated unit prices — one
    shuffle keyed on partkey serves both the aggregate and the window."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = unit.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.round("unit_price", 6).alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
    )


@register(
    "q11_important_stock",
    sql="""
WITH natsupp AS (
    SELECT s.s_suppkey
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
),
val AS (
    SELECT l.l_partkey AS ps_partkey, sum(l.l_extendedprice) AS v
    FROM lineitem l
    JOIN natsupp ns ON l.l_suppkey = ns.s_suppkey
    GROUP BY l.l_partkey
),
tot AS (SELECT sum(v) AS total FROM val)
SELECT val.ps_partkey, round(val.v, 2) AS stock_value
FROM val, tot
WHERE round(val.v, 2) > round(0.001 * tot.total, 2)
ORDER BY stock_value DESC, ps_partkey
""",
    tags=("relational", "join"),
)
def q_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock; no partsupp table, so a part's
    stock value ≈ total extended price supplied for it by one nation's
    suppliers): grouped value per part HAVING value above a fixed fraction
    of the nation-wide total — the classic scalar-subquery-vs-groups query.

    Scale plan: the nation's supplier keys are a broadcast (constant-sized
    dim chain), so lineitem shuffles ONCE on l_partkey for the grouped sum;
    `val` is memo-persisted (parts-sized, never lineitem-sized) because both
    the group list and the scalar total consume it — Spark's ReuseExchange
    does NOT fire across the crossJoin sides, so without the persist the
    lineitem scan+shuffle would run twice. The total re-aggregates cached
    `val` (a tiny shuffle over |parts| rows) and joins back as a broadcast
    1-row scalar. Both compare sides round to 2dp so the threshold grid is
    identical across engines/partitionings."""
    from ..cache import memo

    def build_val() -> DataFrame:
        n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
        s = load_table(spark, sf_dir, "supplier").join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        l = load_table(spark, sf_dir, "lineitem")
        return (
            l.join(
                F.broadcast(s.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey")
            )
            .groupBy(F.col("l_partkey").alias("ps_partkey"))
            .agg(F.sum("l_extendedprice").alias("v"))
        )

    # eager: `tot` below is a concurrently-prepared BROADCAST subtree —
    # an unmaterialized lazy persist would recompute the lineitem
    # scan+shuffle in the broadcast thread while the probe side computes
    # it again (the memo contract's documented race; gate line measured
    # 16.2 s lazy -> 9.3 s eager at sf0.01, the residual being the
    # honest scan+shuffle once)
    val = memo(spark, ("q11_val", sf_dir), build_val, persist=True, eager=True)
    tot = val.agg(F.round(0.001 * F.sum("v"), 2).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.round(F.col("v"), 2) > F.col("threshold"))
        .select("ps_partkey", F.round(F.col("v"), 2).alias("stock_value"))
        .orderBy(F.desc("stock_value"), F.asc("ps_partkey"))
    )


@register(
    "q4_priority_count",
    sql="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("relational", "join"),
)
def q_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (late-shipment EXISTS; commit/receipt dates absent, so
    "late" = any line shipped >60 days after the order date): date-windowed
    orders LEFT SEMI JOIN lineitem on orderkey + the theta condition, then a
    tiny priority rollup. The semi-join keeps only order columns flowing —
    nothing from lineitem survives the probe."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_nation_volume",
    sql="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("relational", "join"),
)
def q_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    The one fact-to-fact shuffle is lineitem ⋈ orders on orderkey;
    customer/supplier/nation are broadcast, and the nation-pair predicate
    prunes rows before the expensive join via the broadcast hash lookup."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    sql="""
WITH allrev AS (
    SELECT year(o.o_orderdate) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM allrev
GROUP BY o_year
ORDER BY o_year
""",
    tags=("relational", "join"),
)
def q_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's purchase volume per
    year — the share is a conditional-sum ratio inside ONE aggregation, not
    two scans. Region/nation prune customers before the fact join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nc = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nc_key")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"), "inner")
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    sql="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'PROMO'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
""",
    tags=("relational", "join"),
)
def q_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp supplycost → profit ≈ discounted
    revenue; part filter by type instead of LIKE on name): profit by
    supplier nation × order year. The part filter broadcasts and prunes
    the fact before the orderkey shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_revenue()), 2).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q12_priority_by_flag",
    sql="""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    tags=("relational", "join"),
)
def q_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode column → grouped by returnflag):
    conditional counts split by order priority over a one-year ship
    window. The date filter pushes to the parquet scan; the single
    shuffle is the orderkey join."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_revenue",
    sql="""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""",
    tags=("relational", "join"),
)
def q_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month — conditional-sum
    ratio in a single pass, part broadcast, month filter on the scan."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01 00:00:00")
        & (F.col("l_shipdate") < "1997-10-01 00:00:00")
    )
    p = load_table(spark, sf_dir, "part")
    rev = _revenue()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
    )


@register(
    "q16_supplier_variety",
    sql="""
SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20, 25, 30)
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
""",
    tags=("relational", "join"),
)
def q_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier variety from lineitem, no partsupp):
    distinct suppliers per (brand, size) with brand/size exclusions.
    COUNT(DISTINCT) expands to a two-phase aggregate — partial distinct
    within partitions, exact merge after one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


@register(
    "q17_small_quantity_revenue",
    sql="""
WITH avgq AS (
    SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_floor
    FROM lineitem
    GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avgq a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2' AND l.l_quantity < a.qty_floor
""",
    tags=("relational", "join"),
)
def q_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity order revenue for one brand. The
    correlated per-part average becomes an aggregate joined back to the
    fact; at scale both sides share the partkey partitioning so the join
    adds no extra shuffle beyond the aggregate's own."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avgq = l.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_floor")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_floor"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_revenue",
    sql="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("relational", "join"),
)
def q_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicate across
    the join. Catalyst extracts the common join key so the OR evaluates
    post-probe on the broadcast hash join — one fact scan, no union of
    three subqueries."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_idle_rich_customers",
    sql="""
WITH floor_bal AS (
    SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, count(*) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c CROSS JOIN floor_bal
WHERE c.c_acctbal > floor_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    tags=("relational", "join"),
)
def q_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (grouped by nation — no phone column to derive
    country codes): above-average-balance customers with no orders since 2000 (the synthetic data gives
    every customer at least one historical order). The
    scalar average broadcasts as a 1-row cross join; the NOT EXISTS is a
    left-anti join probing only the slim o_custkey column."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01 00:00:00")
        .select("o_custkey")
    )
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q13_customer_distribution",
    sql="""
WITH c_orders AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                      AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("relational", "join"),
)
def q_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (no o_comment column, so the excluded-orders
    predicate filters a priority class instead of a comment pattern):
    order-count-per-customer histogram via LEFT OUTER JOIN — customers with
    zero qualifying orders must appear in the c_count=0 bucket, which an
    inner join would silently drop. Two hash aggregations; the second one
    is over at most |distinct counts| keys (tiny)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    sql="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
    tags=("relational", "agg"),
)
def q_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the max. The
    reference query's view becomes a reused DataFrame; the scalar max
    broadcasts as a 1-row cross join (no second scan of lineitem — the
    per-supplier aggregate is tiny and feeds both the max and the filter).
    Comparison happens on the 2dp-rounded revenue in BOTH engines so float
    association order can't flip the winner."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-04-01 00:00:00")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q20_excess_suppliers",
    sql="""
WITH shipped AS (
    SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_2'
  AND EXISTS (
      SELECT 1
      FROM shipped sh
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE sh.l_suppkey = s.s_suppkey
        AND p.p_name LIKE 'small%'
        AND sh.qty > 60
  )
ORDER BY s.s_suppkey
""",
    tags=("relational", "join"),
)
def q_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp table, so "excess availability" becomes
    a shipped-quantity threshold over the same nested aggregate): suppliers
    in one nation who moved >60 units of any 'small%' part in a year. The
    inner aggregate runs once over the date-pruned lineitem scan; part is a
    broadcast filter on its result; the outer EXISTS is a left-semi join
    against the (tiny) qualifying-supplier set."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01 00:00:00")
        & (F.col("l_shipdate") < "1999-01-01 00:00:00")
    )
    shipped = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qualifying = (
        shipped.join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    sql="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    tags=("relational", "join"),
)
def q_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no commit/receipt dates, so "kept the order
    waiting" = was the strictly-latest shipper on a multi-supplier 'F'
    order): the signature EXISTS + NOT-EXISTS double correlation becomes a
    left-semi then left-anti join against two more lineitem instances —
    both probe only (orderkey, suppkey, shipdate) slim projections, and all
    three lineitem scans shuffle on the same l_orderkey key so AQE can
    reuse the exchange."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lslim = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = lslim.alias("l1")
    l2 = lslim.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lslim.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    base = l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
    multi = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("k2"))
        & (F.col("l1.l_suppkey") != F.col("s2")),
        "left_semi",
    )
    latest = multi.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("k3"))
        & (F.col("l1.l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        latest.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
