"""The reference's analytics suite, re-expressed Spark-first.

Each reference query (``/root/reference/src/sql_query_executor.py:78-531``,
``/root/reference/sql/complex_queries.sql``) maps to a DataFrame pipeline
over the driver test tables, paired with an ANSI-SQL oracle that DuckDB runs
on the same parquet — the correctness gate of SURVEY.md §5.2.

Cross-engine determinism conventions (these ARE the spec for every query in
this package; violating one shows up as a value-hash mismatch):

* every ORDER BY that feeds a LIMIT or a window carries a unique tiebreak
  key, so ranked/limited row SETS are identical across engines;
* **money aggregation goes through DECIMAL**: per-row cast to
  ``DECIMAL(18,s)`` (source values are s-decimal by construction, so the
  cast is exact), SUM in decimal (exact, order-independent), final CAST to
  DOUBLE (deterministic nearest-double). Never SUM raw doubles (engines
  disagree on addition order), never ROUND a double (engines disagree on
  half-way behavior at representation boundaries);
* averages/ratios divide two already-identical doubles — IEEE division is
  bit-deterministic;
* time arithmetic uses integer microseconds (``unix_micros`` /
  ``epoch_us``), not second-truncated timestamps;
* ``CURRENT_DATE``-style anchors are replaced by in-data anchors
  (``max(o_orderdate)``) — the reference's wall-clock recency
  (``sql/complex_queries.sql:291``) is frozen for reproducibility
  (SURVEY.md §7.2 "byte-identical replay determinism");
* count-like outputs are explicitly BIGINT (DuckDB SUM(int) is HUGEINT);
* no NULLs in sort keys (engines disagree on default NULL placement).

Catalyst handles the physical side: small-side broadcast for the agg-to-agg
joins, partial aggregation, TakeOrderedAndProject for every ORDER BY+LIMIT
(true top-k — no global sort materializes; SURVEY.md §2.6 O1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def money(col: str, scale: int = 2):
    """Exact per-row decimal view of a money-ish double column."""
    return F.col(col).cast(f"decimal(18,{scale})")


def dsum(expr) -> F.Column:
    """Order-independent sum: decimal-exact, surfaced as double."""
    return F.sum(expr).cast("double")


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, description=description)
        return fn

    return deco


# --------------------------------------------------------------------------
# Q1. Customer lifetime value — reference "customer analytics"
# (/root/reference/src/sql_query_executor.py:78-150): LEFT join keeps
# zero-order customers (J1/P3), multi-window ranking (W1/W2/W4), CASE
# tiering (P5), top-k (O1).
# --------------------------------------------------------------------------
@register(
    "customer_ltv",
    """
    WITH valid_orders AS (
        SELECT * FROM orders WHERE o_orderstatus <> 'P' OR o_orderstatus IS NULL
    ), agg AS (
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_count,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS ltv,
               CASE WHEN COUNT(o.o_orderkey) > 0
                    THEN CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         / COUNT(o.o_orderkey)
                    ELSE 0.0 END AS avg_order_value
        FROM customer c LEFT JOIN valid_orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    )
    SELECT c_custkey, c_name, c_mktsegment, order_count, ltv, avg_order_value,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY ltv DESC, c_custkey) AS segment_rank,
           NTILE(10) OVER (ORDER BY ltv DESC, c_custkey) AS ltv_decile,
           CASE WHEN ltv >= 300000 THEN 'Platinum'
                WHEN ltv >= 150000 THEN 'Gold'
                WHEN ltv >= 50000 THEN 'Silver'
                ELSE 'Bronze' END AS value_tier
    FROM agg
    ORDER BY ltv DESC, c_custkey LIMIT 100
    """,
    "customer LTV with segment rank, decile, tier",
)
def customer_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    valid = orders.filter(
        (F.col("o_orderstatus") != "P") | F.col("o_orderstatus").isNull()
    )
    agg = (
        cust.join(valid, cust.c_custkey == valid.o_custkey, "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(dsum(money("o_totalprice")), F.lit(0.0)).alias("ltv"),
            F.when(
                F.count("o_orderkey") > 0,
                dsum(money("o_totalprice")) / F.count("o_orderkey"),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_order_value"),
        )
    )
    from .ranking import with_exact_ntile

    w_seg = Window.partitionBy("c_mktsegment").orderBy(F.desc("ltv"), F.asc("c_custkey"))
    # global decile via scale-safe exact NTILE (bucketed row numbers +
    # broadcast offsets — no single-partition WindowExec stage); the
    # upstream agg is persisted because the helper runs one counting job.
    agg = agg.persist()
    tiled = with_exact_ntile(agg, 10, [("ltv", False), ("c_custkey", True)], "ltv_decile")
    return (
        tiled.withColumn("segment_rank", F.rank().over(w_seg))
        .withColumn(
            "value_tier",
            F.when(F.col("ltv") >= 300000, "Platinum")
            .when(F.col("ltv") >= 150000, "Gold")
            .when(F.col("ltv") >= 50000, "Silver")
            .otherwise("Bronze"),
        )
        .select(
            "c_custkey", "c_name", "c_mktsegment", "order_count", "ltv",
            "avg_order_value", "segment_rank", "ltv_decile", "value_tier",
        )
        .orderBy(F.desc("ltv"), F.asc("c_custkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q2. Product performance — reference :152-232: 3-way LEFT join (J2),
# agg-to-agg INNER join on brand metrics (J3, broadcast), safe division
# (F8), CASE categorization. Revenue = exact decimal product
# price(2dp) * (1 - discount(2dp)) summed in decimal.
# --------------------------------------------------------------------------
_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _revenue_col():
    return money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))


@register(
    "product_performance",
    f"""
    WITH part_sales AS (
        SELECT p.p_partkey, p.p_name, p.p_brand, p.p_type,
               CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS total_qty,
               CAST(COALESCE(SUM({_REVENUE_SQL}), 0) AS DOUBLE) AS revenue,
               CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS order_count
        FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
        GROUP BY p.p_partkey, p.p_name, p.p_brand, p.p_type
    ), brand_metrics AS (
        SELECT p_brand,
               CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS brand_revenue,
               CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS brand_avg_revenue
        FROM part_sales GROUP BY p_brand
    )
    SELECT ps.p_partkey, ps.p_name, ps.p_brand, ps.p_type, ps.total_qty,
           ps.revenue, ps.order_count, bm.brand_revenue, bm.brand_avg_revenue,
           CASE WHEN bm.brand_revenue <> 0
                THEN 100.0 * ps.revenue / bm.brand_revenue END AS pct_of_brand,
           CASE WHEN ps.revenue >= 2 * bm.brand_avg_revenue THEN 'Star'
                WHEN ps.revenue >= bm.brand_avg_revenue THEN 'Above Average'
                WHEN ps.revenue > 0 THEN 'Below Average'
                ELSE 'No Sales' END AS performance_category
    FROM part_sales ps JOIN brand_metrics bm ON ps.p_brand = bm.p_brand
    ORDER BY ps.revenue DESC, ps.p_partkey LIMIT 100
    """,
    "per-part revenue vs brand benchmark",
)
def product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .groupBy("p_partkey", "p_name", "p_brand", "p_type")
        .agg(
            F.coalesce(F.sum(F.col("l_quantity").cast("long")), F.lit(0))
            .cast("long")
            .alias("total_qty"),
            F.coalesce(dsum(_revenue_col()), F.lit(0.0)).alias("revenue"),
            F.countDistinct("l_orderkey").alias("order_count"),
        )
    )
    bm = ps.groupBy(F.col("p_brand").alias("bm_brand")).agg(
        dsum(F.col("revenue").cast("decimal(18,4)")).alias("brand_revenue"),
        (dsum(F.col("revenue").cast("decimal(18,4)")) / F.count("*")).alias(
            "brand_avg_revenue"
        ),
    )
    # brand_metrics is tiny (one row per brand) — broadcast explicitly.
    joined = ps.join(F.broadcast(bm), ps.p_brand == bm.bm_brand)
    return (
        joined.select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "total_qty",
            "revenue",
            "order_count",
            "brand_revenue",
            "brand_avg_revenue",
            F.when(
                F.col("brand_revenue") != 0,
                100.0 * F.col("revenue") / F.col("brand_revenue"),
            ).alias("pct_of_brand"),
            F.when(F.col("revenue") >= 2 * F.col("brand_avg_revenue"), "Star")
            .when(F.col("revenue") >= F.col("brand_avg_revenue"), "Above Average")
            .when(F.col("revenue") > 0, "Below Average")
            .otherwise("No Sales")
            .alias("performance_category"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q3. Sales trends — reference :234-319: monthly rollup + LAG MoM (W5),
# long-offset LAG(12) YoY (reference sql/complex_queries.sql:167-173),
# LEAD next-month (W6, docs/SQL_EXAMPLES.md:137), 3-month moving average
# (W7), per-year running total (W8), DENSE_RANK of months within year (W3,
# sql/complex_queries.sql:191). Window sums go through decimal too:
# sliding-frame double sums are NOT order-stable across engines (DuckDB
# uses segment trees). The global ORDER BY month windows are safe at any
# table size: the frame has one row per month (bounded by calendar time),
# unlike per-customer/per-part frames which scale with the data.
# --------------------------------------------------------------------------
@register(
    "sales_trends",
    """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               CAST(COUNT(*) AS BIGINT) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
        FROM orders GROUP BY DATE_TRUNC('month', o_orderdate)
    )
    SELECT month, order_count, revenue, unique_customers,
           LAG(revenue) OVER (ORDER BY month) AS prev_month_revenue,
           CASE WHEN LAG(revenue) OVER (ORDER BY month) <> 0
                THEN 100.0 * (revenue - LAG(revenue) OVER (ORDER BY month))
                     / LAG(revenue) OVER (ORDER BY month) END AS mom_growth_pct,
           LAG(revenue, 12) OVER (ORDER BY month) AS prev_year_revenue,
           CASE WHEN LAG(revenue, 12) OVER (ORDER BY month) <> 0
                THEN 100.0 * (revenue - LAG(revenue, 12) OVER (ORDER BY month))
                     / LAG(revenue, 12) OVER (ORDER BY month) END AS yoy_growth_pct,
           LEAD(revenue) OVER (ORDER BY month) AS next_month_revenue,
           CAST(DENSE_RANK() OVER (PARTITION BY EXTRACT(YEAR FROM month)
                                   ORDER BY revenue DESC) AS BIGINT)
               AS month_rank_in_year,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER
                    (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg_3m,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER
                    (PARTITION BY EXTRACT(YEAR FROM month) ORDER BY month
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS ytd_revenue
    FROM monthly ORDER BY month
    """,
    "monthly revenue with MoM growth, moving avg, YTD running total",
)
def sales_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.count("*").alias("order_count"),
        dsum(money("o_totalprice")).alias("revenue"),
        F.countDistinct("o_custkey").alias("unique_customers"),
    )
    # Single-partition window — deliberately acceptable HERE ONLY: it runs
    # over the monthly AGGREGATE, whose row count is bounded by calendar
    # months (~80 at sf0.1, ~tens even at 100x), not by data volume. Never
    # use this shape over a fact table. The partition key is a constant
    # DERIVED FROM the column (year*0) rather than lit(0): semantically
    # one partition holding all rows, but Catalyst cannot constant-fold it
    # out of the partition spec, so WindowExec keeps a non-empty spec and
    # does not emit its "No Partition Defined" WARN once per expression
    # per evaluation — round 3's bench tail was ~10 repeats of it
    # (VERDICT item #3; lit(0) alone gets folded away and still warns).
    w = Window.partitionBy(F.year("month") * F.lit(0)).orderBy("month")
    w3 = w.rowsBetween(-2, 0)
    wy = Window.partitionBy(F.year("month")).orderBy("month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rev_dec = F.col("revenue").cast("decimal(18,2)")
    return (
        monthly.withColumn("prev_month_revenue", F.lag("revenue").over(w))
        .withColumn(
            "mom_growth_pct",
            F.when(
                F.col("prev_month_revenue") != 0,
                100.0
                * (F.col("revenue") - F.col("prev_month_revenue"))
                / F.col("prev_month_revenue"),
            ),
        )
        .withColumn("prev_year_revenue", F.lag("revenue", 12).over(w))
        .withColumn(
            "yoy_growth_pct",
            F.when(
                F.col("prev_year_revenue") != 0,
                100.0
                * (F.col("revenue") - F.col("prev_year_revenue"))
                / F.col("prev_year_revenue"),
            ),
        )
        .withColumn("next_month_revenue", F.lead("revenue").over(w))
        .withColumn(
            "month_rank_in_year",
            F.dense_rank()
            .over(Window.partitionBy(F.year("month")).orderBy(F.desc("revenue")))
            .cast("long"),
        )
        .withColumn(
            "moving_avg_3m",
            F.sum(rev_dec).over(w3).cast("double") / F.count("*").over(w3),
        )
        .withColumn("ytd_revenue", F.sum(rev_dec).over(wy).cast("double"))
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Q4. Part supply status — reference "inventory optimization" :321-415:
# CASE stock status (P5) + computed-priority ORDER BY (O2).
# --------------------------------------------------------------------------
@register(
    "part_supply_status",
    """
    WITH sold AS (
        SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice,
               CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS total_sold,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_count
        FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
        GROUP BY p.p_partkey, p.p_name, p.p_size, p.p_retailprice
    )
    SELECT *,
           CASE WHEN total_sold = 0 THEN 'Dead Stock'
                WHEN total_sold < 50 THEN 'Slow Moving'
                WHEN total_sold < 200 THEN 'Steady'
                ELSE 'Fast Moving' END AS velocity,
           CASE WHEN total_sold = 0 THEN 1
                WHEN total_sold < 50 THEN 2
                WHEN total_sold < 200 THEN 3
                ELSE 4 END AS restock_priority
    FROM sold
    ORDER BY CASE WHEN total_sold = 0 THEN 1
                  WHEN total_sold < 50 THEN 2
                  WHEN total_sold < 200 THEN 3
                  ELSE 4 END,
             total_sold DESC, p_partkey
    LIMIT 100
    """,
    "part velocity classification with computed-priority ordering",
)
def part_supply_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sold = (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .groupBy("p_partkey", "p_name", "p_size", "p_retailprice")
        .agg(
            F.coalesce(F.sum(F.col("l_quantity").cast("long")), F.lit(0))
            .cast("long")
            .alias("total_sold"),
            F.countDistinct("l_suppkey").alias("supplier_count"),
        )
    )
    velocity = (
        F.when(F.col("total_sold") == 0, "Dead Stock")
        .when(F.col("total_sold") < 50, "Slow Moving")
        .when(F.col("total_sold") < 200, "Steady")
        .otherwise("Fast Moving")
    )
    priority = (
        F.when(F.col("total_sold") == 0, 1)
        .when(F.col("total_sold") < 50, 2)
        .when(F.col("total_sold") < 200, 3)
        .otherwise(4)
    )
    return (
        sold.withColumn("velocity", velocity)
        .withColumn("restock_priority", priority)
        .orderBy(F.col("restock_priority"), F.desc("total_sold"), F.asc("p_partkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q5. RFM segmentation — reference :417-510: recency anchored to in-data
# max date (deterministic replacement for CURRENT_DATE), NTILE(5) scores
# (W4), score concat (F15), CASE segments.
# --------------------------------------------------------------------------
@register(
    "rfm_segmentation",
    """
    WITH anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
    rfm AS (
        SELECT o.o_custkey AS c_custkey,
               CAST(DATE_DIFF('day', CAST(MAX(o.o_orderdate) AS DATE),
                              CAST(MAX(a.max_date) AS DATE)) AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM orders o CROSS JOIN anchor a
        GROUP BY o.o_custkey
    ), scored AS (
        SELECT *,
               NTILE(5) OVER (ORDER BY recency_days ASC, c_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency DESC, c_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary DESC, c_custkey) AS m_score
        FROM rfm
    )
    SELECT c_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS rfm_cell,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'Champion'
                WHEN r_score <= 2 THEN 'Recent'
                WHEN f_score <= 2 THEN 'Loyal'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'At Risk'
                ELSE 'Regular' END AS segment
    FROM scored ORDER BY monetary DESC, c_custkey LIMIT 100
    """,
    "RFM scores and segments per customer",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("max_date"))
    rfm = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.datediff(
                F.max("max_date").cast("date"), F.max("o_orderdate").cast("date")
            )
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            dsum(money("o_totalprice")).alias("monetary"),
        )
    )
    from .ranking import with_exact_ntiles

    # three scale-safe exact NTILE(5)s (bucketed row numbers + broadcast
    # offsets; zero single-partition windows) — reference semantics
    # (/root/reference/src/sql_query_executor.py:471-479) at cluster scale.
    # FUSED: all three scores share ONE bucket-count action, one window
    # pass over the unpivoted long frame and one join back — vs the round-2
    # form (one with_exact_ntile per score = 3 eager count jobs + 3 joins,
    # measured ~2x wall on sf0.1).
    rfm = rfm.persist()
    scored = with_exact_ntiles(
        rfm,
        5,
        [
            ("r_score", "recency_days", True),
            ("f_score", "frequency", False),
            ("m_score", "monetary", False),
        ],
        ["c_custkey"],
    )
    return (
        scored.withColumn(
            "rfm_cell",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
        .withColumn(
            "segment",
            F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "Champion")
            .when(F.col("r_score") <= 2, "Recent")
            .when(F.col("f_score") <= 2, "Loyal")
            .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "At Risk")
            .otherwise("Regular"),
        )
        .orderBy(F.desc("monetary"), F.asc("c_custkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q6/Q7. Event-stream analytics: tumbling windows and sessionization —
# the batch faces of the streaming surface (SURVEY.md §2.10).
# --------------------------------------------------------------------------
@register(
    "events_hourly",
    """
    SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users
    FROM events GROUP BY DATE_TRUNC('hour', ts), event_type
    ORDER BY hour, event_type
    """,
    "tumbling hourly aggregates per event type",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(money("value")).alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy("hour", "event_type")
    )


@register(
    "events_sessionized",
    """
    WITH seq AS (
        SELECT user_id, ts, event_id, EPOCH_US(ts) AS us,
               LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL
                         OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM seq
    ), sessions AS (
        SELECT user_id, ts, event_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
    FROM sessions GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    "30-min-gap sessionization via lag + running sum (microsecond-exact)",
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        # parquet timestamps load as TIMESTAMP_NTZ; session TZ is UTC so the
        # cast is an identity relabel, and unix_micros needs TIMESTAMP.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull() | ((F.col("us") - F.col("prev_us")) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max("us") - F.min("us")).cast("long").alias("duration_us"),
        )
        .orderBy("user_id", "session_seq")
    )


# --------------------------------------------------------------------------
# Q8. Date dimension row generator — reference generate_series seed
# (/root/reference/sql/etl_transformations.sql:74-98, S9).
# --------------------------------------------------------------------------
@register(
    "date_dim",
    """
    SELECT CAST(STRFTIME(d, '%Y%m%d') AS INTEGER) AS date_key,
           CAST(d AS DATE) AS full_date,
           CAST(EXTRACT(YEAR FROM d) AS INTEGER) AS year,
           CAST(EXTRACT(QUARTER FROM d) AS INTEGER) AS quarter,
           CAST(EXTRACT(MONTH FROM d) AS INTEGER) AS month,
           CAST(DAYOFWEEK(d) + 1 AS INTEGER) AS day_of_week,
           STRFTIME(d, '%B') AS month_name,
           STRFTIME(d, '%A') AS day_name,
           CASE WHEN DAYOFWEEK(d) IN (0, 6) THEN TRUE ELSE FALSE END AS is_weekend
    FROM (SELECT UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-12-31',
                                        INTERVAL 1 DAY)) AS d)
    ORDER BY date_key
    """,
    "calendar dimension seeded by a row generator",
)
def date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.sql(
        "SELECT explode(sequence(to_date('2024-01-01'), to_date('2024-12-31'), "
        "interval 1 day)) AS d"
    )
    return days.select(
        F.date_format("d", "yyyyMMdd").cast("int").alias("date_key"),
        F.col("d").alias("full_date"),
        F.year("d").cast("int").alias("year"),
        F.quarter("d").cast("int").alias("quarter"),
        F.month("d").cast("int").alias("month"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday.
        F.dayofweek("d").cast("int").alias("day_of_week"),
        # F11's TO_CHAR(d,'Month')/'Day' variant (reference
        # sql/etl_transformations.sql:85,90 for dim_date month_name/day_name).
        # Postgres blank-pads 'Month' to 9 chars; the engine emits the trimmed
        # form (what TO_CHAR('FMMonth') gives) — date_format 'MMMM'/'EEEE'
        # matches DuckDB strftime %B/%A exactly.
        F.date_format("d", "MMMM").alias("month_name"),
        F.date_format("d", "EEEE").alias("day_name"),
        F.dayofweek("d").isin(1, 7).alias("is_weekend"),
    ).orderBy("date_key")


# --------------------------------------------------------------------------
# Q9-Q12. Join-shape coverage: anti-join orphan check (J7), same-day
# multi-order detection (J8 idiom), market basket self theta-join (J9),
# top-N per group via window instead of LATERAL (J10).
# --------------------------------------------------------------------------
@register(
    "orders_without_lineitems",
    """
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    ORDER BY o.o_orderkey
    """,
    "anti-join integrity check (orphan orders)",
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "multi_order_days",
    """
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day,
           CAST(COUNT(*) AS BIGINT) AS orders_that_day
    FROM orders
    GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    HAVING COUNT(*) > 1
    ORDER BY o_custkey, order_day
    """,
    "customers with multiple same-day orders (HAVING)",
)
def multi_order_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey", F.col("o_orderdate").cast("date").alias("order_day")
        )
        .agg(F.count("*").alias("orders_that_day"))
        .filter(F.col("orders_that_day") > 1)
        .orderBy("o_custkey", "order_day")
    )


@register(
    "market_basket_pairs",
    """
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS times_together
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 2
    ORDER BY times_together DESC, part_a, part_b LIMIT 100
    """,
    "co-purchase pairs via self theta-join",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("times_together"))
        .filter(F.col("times_together") >= 2)
        .orderBy(F.desc("times_together"), "part_a", "part_b")
        .limit(100)
    )


@register(
    "top_parts_per_brand",
    f"""
    WITH revenue AS (
        SELECT p.p_brand, p.p_partkey, p.p_name,
               CAST(COALESCE(SUM({_REVENUE_SQL}), 0) AS DOUBLE) AS revenue
        FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, p.p_partkey, p.p_name
    ), ranked AS (
        SELECT *, RANK() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
        FROM revenue
    )
    SELECT p_brand, p_partkey, p_name, revenue, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey
    """,
    "top-3 parts per brand (window replaces LATERAL/LIMIT)",
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.coalesce(dsum(_revenue_col()), F.lit(0.0)).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        revenue.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy("p_brand", "rnk", "p_partkey")
    )


# populate the registry with the second wave (imports at bottom to avoid a
# circular import: extra.py imports register/helpers from this module)
from . import extra  # noqa: E402,F401
