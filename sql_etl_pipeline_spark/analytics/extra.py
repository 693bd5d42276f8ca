"""Second analytics wave: the remaining SURVEY.md §2 operator inventory.

Covers (by SURVEY id): A4 conditional aggregates, A5 ordered string-agg,
A7 UNION-ALL quality report, A9 rollup, W9 whole-partition allocation
windows, W10 percent-of-total (scale-safe scalar cross-join, not an empty
window), W11 first/last per group, W12 window over a derived partition
key, F1-F6/F14-F17 scalar transforms (the reference's pandas
``_transform_customers`` re-expressed), F18 JSON extraction, J7 orphan
anti-joins, D5/D6 business-rule checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .queries import dsum, load_table, money, register

# --------------------------------------------------------------------------
# A7/J7/D5/D6: UNION-ALL data quality report — the reference's integrity
# suite (/root/reference/sql/etl_transformations.sql:199-228) over the
# driver tables.
# --------------------------------------------------------------------------


@register(
    "quality_report",
    """
    SELECT 'orphaned_lineitems' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders_without_lines',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
      ON o.o_orderkey = l.l_orderkey
    WHERE l.l_orderkey IS NULL
    UNION ALL
    SELECT 'non_positive_quantity', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'negative_price', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_extendedprice < 0
    UNION ALL
    SELECT 'discount_out_of_range', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_discount < 0 OR l_discount > 1
    ORDER BY check_name
    """,
    "UNION-ALL integrity report: orphans, ranges, business rules",
)
def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
        )

    checks = [
        one(
            "orphaned_lineitems",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        one(
            "orders_without_lines",
            orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti"),
        ),
        one("non_positive_quantity", li.filter(F.col("l_quantity") <= 0)),
        one("negative_price", li.filter(F.col("l_extendedprice") < 0)),
        one(
            "discount_out_of_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


# --------------------------------------------------------------------------
# W9: whole-partition aggregate window — pro-rated per-line allocation of
# the order total (/root/reference/sql/etl_transformations.sql:117-127).
# --------------------------------------------------------------------------


@register(
    "order_line_allocation",
    """
    WITH lines AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) AS net
        FROM lineitem
    ),
    alloc AS (
        SELECT l_orderkey, l_linenumber,
               CAST(net AS DOUBLE) AS line_net,
               CAST(SUM(net) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_net,
               CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_lines
        FROM lines
    )
    SELECT l_orderkey, l_linenumber, line_net, order_net, n_lines,
           ROUND(CASE WHEN order_net <> 0 THEN line_net / order_net END, 6)
               AS line_share
    FROM alloc
    ORDER BY l_orderkey, l_linenumber LIMIT 1000
    """,
    "per-line share of order total via unbounded partition window",
)
def order_line_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    w = Window.partitionBy("l_orderkey")
    alloc = li.select(
        "l_orderkey",
        "l_linenumber",
        net.cast("double").alias("line_net"),
        F.sum(net).over(w).cast("double").alias("order_net"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_lines"),
    )
    return (
        alloc.withColumn(
            "line_share",
            F.round(
                F.when(F.col("order_net") != 0, F.col("line_net") / F.col("order_net")),
                6,
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# W10: percent-of-total. An `OVER ()` window funnels ALL rows into one
# partition — fatal at scale. The scale-safe idiom: aggregate the total
# separately and broadcast it back via cross join.
# --------------------------------------------------------------------------


@register(
    "segment_share",
    """
    WITH seg AS (
        SELECT c.c_mktsegment,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    ),
    tot AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total FROM seg)
    SELECT s.c_mktsegment, s.revenue, s.n_orders,
           ROUND(100.0 * s.revenue / t.total, 6) AS pct_of_total
    FROM seg s CROSS JOIN tot t
    ORDER BY s.c_mktsegment
    """,
    "percent-of-total via broadcast scalar, not a single-partition window",
)
def segment_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum(money("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    tot = seg.agg(dsum(F.col("revenue").cast("decimal(18,4)")).alias("total"))
    return (
        seg.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "revenue",
            "n_orders",
            F.round(100.0 * F.col("revenue") / F.col("total"), 6).alias("pct_of_total"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# W11: FIRST_VALUE / LAST_VALUE per group, deterministic via unique
# (date, orderkey) ordering; row_number keeps both engines identical.
# --------------------------------------------------------------------------


@register(
    "customer_first_last_order",
    """
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_last
        FROM orders
    )
    SELECT o_custkey AS c_custkey,
           MAX(CASE WHEN rn_first = 1 THEN o_orderkey END) AS first_orderkey,
           MAX(CASE WHEN rn_first = 1 THEN o_totalprice END) AS first_total,
           MAX(CASE WHEN rn_last = 1 THEN o_orderkey END) AS last_orderkey,
           MAX(CASE WHEN rn_last = 1 THEN o_totalprice END) AS last_total,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM ranked GROUP BY o_custkey
    ORDER BY c_custkey
    """,
    "first/last order per customer (W11) via dual row_number",
)
def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wf = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wl = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    return (
        ranked.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.when(F.col("rn_first") == 1, F.col("o_orderkey"))).alias(
                "first_orderkey"
            ),
            F.max(F.when(F.col("rn_first") == 1, F.col("o_totalprice"))).alias(
                "first_total"
            ),
            F.max(F.when(F.col("rn_last") == 1, F.col("o_orderkey"))).alias(
                "last_orderkey"
            ),
            F.max(F.when(F.col("rn_last") == 1, F.col("o_totalprice"))).alias(
                "last_total"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# W12: window over a DERIVED partition key (month-of-year seasonality).
# --------------------------------------------------------------------------


@register(
    "month_seasonality",
    """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY DATE_TRUNC('month', o_orderdate)
    )
    SELECT month, revenue,
           ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER
                    (PARTITION BY EXTRACT(MONTH FROM month)) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY EXTRACT(MONTH FROM month)), 6)
               AS same_month_avg,
           CAST(COUNT(*) OVER (PARTITION BY EXTRACT(MONTH FROM month)) AS BIGINT)
               AS n_years
    FROM monthly ORDER BY month
    """,
    "seasonality: window partitioned by derived month-of-year key",
)
def month_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(dsum(money("o_totalprice")).alias("revenue"))
    w = Window.partitionBy(F.month("month"))
    return monthly.select(
        "month",
        "revenue",
        F.round(
            F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("same_month_avg"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_years"),
    ).orderBy("month")


# --------------------------------------------------------------------------
# A5: ordered string aggregation (STRING_AGG / collect_set+sort).
# --------------------------------------------------------------------------


@register(
    "part_suppliers_agg",
    """
    WITH ps AS (
        SELECT DISTINCT l.l_partkey, s.s_name
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           string_agg(s_name, ',' ORDER BY s_name) AS supplier_list
    FROM ps GROUP BY l_partkey
    ORDER BY l_partkey LIMIT 500
    """,
    "sorted supplier list per part (deterministic STRING_AGG)",
)
def part_suppliers_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    ps = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select("l_partkey", "s_name")
        .distinct()
    )
    return (
        ps.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.sort_array(F.collect_set("s_name")), ",").alias(
                "supplier_list"
            ),
        )
        .orderBy("l_partkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# F1-F6/F14-F17: the reference's customer transform re-expressed
# (/root/reference/src/etl_pipeline.py:247-266: concat full name, lower
# email, digits-only phone, strip/''->NULL, validation regex flags).
# --------------------------------------------------------------------------


@register(
    "customer_clean",
    """
    SELECT c_custkey,
           upper(substr(replace(lower(c_name), '#', ' '), 1, 1))
             || substr(replace(lower(c_name), '#', ' '), 2) AS display_name,
           lower(c_name) || '@example.com' AS email,
           regexp_replace(c_name, '[^0-9]', '', 'g') AS account_digits,
           CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$')
                THEN TRUE ELSE FALSE END AS valid_name,
           CAST(CAST(abs(c_acctbal) AS DECIMAL(18,2)) AS DOUBLE) AS abs_balance,
           CASE WHEN c_acctbal < 0 THEN 'delinquent'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'medium'
                ELSE 'high' END AS balance_tier,
           CASE WHEN trim(c_mktsegment) = '' THEN NULL
                ELSE trim(c_mktsegment) END AS segment
    FROM customer ORDER BY c_custkey
    """,
    "scalar-function transform suite (concat/lower/initcap/regex/abs/tier)",
)
def customer_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # initcap on 'customer 000000001' == portable first-char-upper (single
    # alpha word); asserted equal to the SQL emulation by the oracle gate.
    lowered = F.replace(F.lower("c_name"), F.lit("#"), F.lit(" "))
    return cust.select(
        "c_custkey",
        F.initcap(lowered).alias("display_name"),
        F.concat(F.lower("c_name"), F.lit("@example.com")).alias("email"),
        F.regexp_replace("c_name", "[^0-9]", "").alias("account_digits"),
        F.col("c_name").rlike("^Customer#[0-9]{9}$").alias("valid_name"),
        F.abs("c_acctbal").cast("decimal(18,2)").cast("double").alias("abs_balance"),
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "medium")
        .otherwise("high")
        .alias("balance_tier"),
        F.when(F.trim("c_mktsegment") == "", None)
        .otherwise(F.trim("c_mktsegment"))
        .alias("segment"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# F18: JSON extraction from the events.props payload.
# --------------------------------------------------------------------------


@register(
    "events_json_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "JSON field extraction + aggregation over semi-structured props",
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("long").alias("sum_k"),
            F.min(k).cast("long").alias("min_k"),
            F.max(k).cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A9: ROLLUP — subtotals per (year, segment), year, and grand total.
# --------------------------------------------------------------------------


@register(
    "sales_rollup",
    """
    SELECT COALESCE(CAST(EXTRACT(YEAR FROM o.o_orderdate) AS VARCHAR), '(all)')
               AS year,
           COALESCE(c.c_mktsegment, '(all)') AS segment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY ROLLUP (EXTRACT(YEAR FROM o.o_orderdate), c.c_mktsegment)
    ORDER BY year, segment
    """,
    "ROLLUP subtotals: (year, segment) -> year -> grand total",
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        j.rollup(F.year("o_orderdate").alias("y"), F.col("c_mktsegment").alias("s"))
        .agg(
            dsum(money("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("y").cast("string"), F.lit("(all)")).alias("year"),
            F.coalesce(F.col("s"), F.lit("(all)")).alias("segment"),
            "revenue",
            "n_orders",
        )
        .orderBy("year", "segment")
    )


# --------------------------------------------------------------------------
# J8/J11 idiom: consecutive-order gaps via lag windows — the scalable
# replacement for the reference's self-join / NOT EXISTS pair detection
# (/root/reference/docs/SQL_EXAMPLES.md:502-551).
# --------------------------------------------------------------------------


@register(
    "customer_order_gaps",
    """
    WITH seq AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
               LAG(CAST(o_orderdate AS DATE)) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS prev_d
        FROM orders
    ),
    gaps AS (
        SELECT o_custkey, CAST(DATE_DIFF('day', prev_d, d) AS BIGINT) AS gap_days
        FROM seq WHERE prev_d IS NOT NULL
    )
    SELECT o_custkey AS c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           ROUND(AVG(gap_days), 6) AS avg_gap,
           CAST(SUM(CASE WHEN gap_days = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS same_day_pairs
    FROM gaps GROUP BY o_custkey
    ORDER BY c_custkey
    """,
    "consecutive-order gap stats per customer (lag window, not self-join)",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_d"),
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        "o_custkey", F.datediff("d", "prev_d").cast("long").alias("gap_days")
    )
    return (
        gaps.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").alias("min_gap"),
            F.max("gap_days").alias("max_gap"),
            F.round(F.avg("gap_days"), 6).alias("avg_gap"),
            F.sum(F.when(F.col("gap_days") == 0, 1).otherwise(0))
            .cast("long")
            .alias("same_day_pairs"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# P7: deterministic hash sampling. rand()-based TABLESAMPLE is not
# reproducible across runs/engines; hashing the key is — and at 100 TB a
# hash-sample is also consistent across tables (sample the same doc ids
# everywhere). md5 keeps it portable to the oracle.
# --------------------------------------------------------------------------


@register(
    "documents_hash_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    ORDER BY doc_id
    """,
    "deterministic 25% hash-sample (reproducible TABLESAMPLE substitute)",
)
def documents_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "documents_random_sample",
    None,  # Bernoulli sampling is partitioning-dependent -> rows-only gate;
    # the reproducible, oracle-matchable variant is documents_hash_sample.
    "true df.sample (P7): seeded Bernoulli 20% sample with a sanity band",
)
def documents_random_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 P7 — the reference's random sampling
    (``/root/reference/docs/TECHNICAL_GUIDE.md:917-920``) as Spark's native
    ``df.sample`` (per-partition Bernoulli XORShift, no shuffle, no global
    pass — the only sampling shape that works at 100 TB). Seeded for
    repeatability within a fixed partitioning; exact membership is
    partitioning-dependent, hence no value oracle. The returned frame
    carries the observed fraction and an in-band flag so even the weaker
    rows-only gate asserts the sampler's statistical contract."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    got = docs.sample(fraction=0.2, seed=42).count()
    frac = got / max(total, 1)
    return spark.createDataFrame(
        [(total, got, round(frac, 4), 0.12 <= frac <= 0.28)],
        "n_total long, n_sampled long, observed_fraction double, within_band boolean",
    )


# --------------------------------------------------------------------------
# A2 at scale: approx_count_distinct (HLL). Sketches differ across engines,
# so the oracle checks the EXACT count plus a tolerance flag: the query
# asserts |approx - exact| / exact <= 10% (HLL rsd=2%) and emits the
# boolean — TRUE on both engines iff the sketch behaves.
# --------------------------------------------------------------------------


@register(
    "events_users_approx",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_10pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "approx_count_distinct vs exact, verified via tolerance flag",
)
def events_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.10
            ).alias("approx_within_10pct"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Materialized-view refresh as a first-class, oracle-gated path (S13).
# Reference: daily_sales_summary rebuilt by staged DELETE+INSERT
# (/root/reference/sql/etl_transformations.sql:281-306); here the summary
# lives in a LakeTable and `maintain.refresh_summary` swaps its full
# contents in ONE atomic commit. The gated query runs the real engine path:
# create summary table -> refresh from the orders aggregation (twice, to
# prove refresh replaces rather than appends) -> read the table back.
# --------------------------------------------------------------------------
@register(
    "daily_sales_summary_mv",
    """
    SELECT CAST(o_orderdate AS DATE) AS sale_date,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ORDER BY sale_date
    """,
    "daily sales summary table maintained via atomic MV refresh",
)
def daily_sales_summary_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql.types import (
        DateType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..lakehouse import LakeTable
    from ..lakehouse.maintain import refresh_summary

    schema = StructType(
        [
            StructField("sale_date", DateType(), False),
            StructField("order_count", LongType(), True),
            StructField("revenue", DoubleType(), True),
            StructField("unique_customers", LongType(), True),
        ]
    )

    def summarize(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderdate").cast("date").alias("sale_date")).agg(
            F.count("*").alias("order_count"),
            dsum(money("o_totalprice")).alias("revenue"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )

    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="mv-q-")
    shutil.rmtree(f"{tmp}/table", ignore_errors=True)
    table = LakeTable.create(
        f"{tmp}/table", schema, key_cols=["sale_date"], num_buckets=4
    )
    try:
        # first refresh from a stale partial input, second from the full
        # table: the gate only matches the oracle if refresh REPLACES
        refresh_summary(table, spark, summarize(orders.limit(1000)))
        refresh_summary(table, spark, summarize(orders))
        final = f"{tmp}/final"
        table.read(spark).drop("last_lsn", "deleted").write.mode(
            "overwrite"
        ).parquet(final)
        shutil.rmtree(f"{tmp}/table", ignore_errors=True)
        return spark.read.parquet(final).orderBy("sale_date")
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


# --------------------------------------------------------------------------
# U2: recursive CTE — hierarchy traversal. The reference documents this
# shape but never executes it (/root/reference/docs/SQL_EXAMPLES.md:316-423,
# employee/category trees); closing it here makes §2 coverage 87/87.
# The hierarchy is derived deterministically from customer: parent(k) =
# k DIV 10, a forest rooted at the single-digit custkeys — shallow (depth
# = key width), cycle-free by construction, no synthetic side tables.
# --------------------------------------------------------------------------


@register(
    "customer_hierarchy",
    """
    WITH RECURSIVE hier AS (
        SELECT c_custkey AS custkey, c_custkey AS root_custkey,
               0 AS level, CAST(c_custkey AS VARCHAR) AS path
        FROM customer WHERE c_custkey <= 9
        UNION ALL
        SELECT c.c_custkey, h.root_custkey, h.level + 1,
               h.path || ' > ' || CAST(c.c_custkey AS VARCHAR)
        FROM customer c JOIN hier h ON c.c_custkey // 10 = h.custkey
        WHERE c.c_custkey > 9
    )
    SELECT h.custkey, h.root_custkey, h.level, h.path,
           COALESCE(d.n, 0) AS direct_reports
    FROM hier h
    LEFT JOIN (
        SELECT c_custkey // 10 AS pk, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer WHERE c_custkey > 9 GROUP BY 1
    ) d ON d.pk = h.custkey
    ORDER BY h.custkey
    """,
    "recursive CTE: custkey DIV 10 forest, level + path + direct reports",
)
def customer_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 via Spark 4's NATIVE recursive CTE (Catalyst ``UnionLoop``) —
    declarative, not a driver loop: each recursion step is a distributed
    hash join against the frontier, and the depth is bounded by the key's
    digit count (log10 of the keyspace), so at 100 TB this is a handful
    of joins, each shuffle-partitioned, with the scan pruned to the two
    referenced columns. Reference analogue (docs-only there):
    /root/reference/docs/SQL_EXAMPLES.md:316-361.
    """
    p = f"{sf_dir}/customer.parquet"
    return spark.sql(f"""
        WITH RECURSIVE hier AS (
            SELECT c_custkey AS custkey, c_custkey AS root_custkey,
                   0 AS level, CAST(c_custkey AS STRING) AS path
            FROM parquet.`{p}` WHERE c_custkey <= 9
            UNION ALL
            SELECT c.c_custkey, h.root_custkey, h.level + 1,
                   CONCAT(h.path, ' > ', CAST(c.c_custkey AS STRING))
            FROM parquet.`{p}` c JOIN hier h ON c.c_custkey DIV 10 = h.custkey
            WHERE c.c_custkey > 9
        )
        SELECT h.custkey, h.root_custkey, h.level, h.path,
               COALESCE(d.n, CAST(0 AS BIGINT)) AS direct_reports
        FROM hier h
        LEFT JOIN (
            SELECT c_custkey DIV 10 AS pk, CAST(COUNT(*) AS BIGINT) AS n
            FROM parquet.`{p}` WHERE c_custkey > 9
            GROUP BY c_custkey DIV 10
        ) d ON d.pk = h.custkey
        ORDER BY h.custkey
    """)
