"""Query registry: every operator from SURVEY.md §2 as a (spark_fn, oracle_sql) pair.

Each Spark callable takes (spark, sf_dir) and returns a DataFrame; the
matching SQL string is ANSI SQL for DuckDB over the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Column names/aliases match exactly on both sides;
double-typed aggregates are rounded identically so the driver's
order-insensitive value hash is stable across engines.

Kernel-backed queries (sparse coding — not SQL-expressible) have no oracle
entry; the driver records a rows-only check and pytest carries the numpy
parity gate instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lyssandra_spark.operators import windows as W
from lyssandra_spark.operators.asof import asof_join

SPARK_QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# B9/B19: grouped aggregation + scalar functions (TPC-H Q1 flavor)
# ---------------------------------------------------------------------------

@q(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                              AS sum_qty,
           round(sum(l_extendedprice), 2)                         AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           round(avg(l_quantity), 4)                              AS avg_qty,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B8: top-k per group
# ---------------------------------------------------------------------------

@q(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders) t
    WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# B7: dedup / latest-per-key
# ---------------------------------------------------------------------------

@q(
    "dedup_latest_event_per_user",
    """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_latest_event_per_user(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return W.dedup_latest(e, "user_id", ["ts", "event_id"], desc=True)


# ---------------------------------------------------------------------------
# B3: lag/lead
# ---------------------------------------------------------------------------

@q(
    "window_lag_lead_rolling",
    """
    SELECT event_id,
           lag(value)  OVER w AS lag1_value,
           lead(value) OVER w AS lead1_value,
           round(avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
             AS roll_avg5,
           count(*) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_n5,
           round(avg(value) OVER wr, 4) AS roll_avg_30m,
           count(value)     OVER wr     AS roll_n_30m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_lag_lead_rolling(spark, sf_dir):
    """B3 lag/lead + B6 rolling (row frame + time-RANGE frame) in one pass:
    all six window functions share one user_id hash partitioning (single
    Exchange; the range frame adds only a second local sort on the
    microsecond epoch)."""
    e = _t(spark, sf_dir, "events")
    out = W.with_lag(e, "value", part="user_id", order=["ts", "event_id"])
    out = W.with_lead(out, "value", part="user_id", order=["ts", "event_id"])
    out = W.rolling(out, "value", 5, part="user_id", order=["ts", "event_id"],
                    aggs=("avg",))
    # "last 30 minutes" time-based frame (B6 RANGE): exact integer
    # microseconds on both engines, so the boundary cannot flicker
    out = W.rolling_range(out, "value", 1800, part="user_id", order="ts",
                          aggs=("avg", "count"))
    # roll_n5 is a ROW count (count(*), matching the oracle), not a
    # non-null count of `value` — W.rolling's count aggregates the column
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return out.select(
        "event_id", "lag1_value", "lead1_value",
        F.round("avg_value_5", 4).alias("roll_avg5"),
        F.count("*").over(wf).alias("roll_n5"),
        F.round("avg_value_1800s", 4).alias("roll_avg_30m"),
        F.col("count_value_1800s").alias("roll_n_30m"),
    )


# ---------------------------------------------------------------------------
# B4: sessionize on ts gaps
# ---------------------------------------------------------------------------

@q(
    "sessionize_events",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                  THEN 1 ELSE 0 END AS flag
      FROM events),
    s AS (
      SELECT user_id,
             sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g)
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    flag = F.when(gap > 1800.0, 1).otherwise(0)
    s = e.withColumn(
        "session_id",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# B5: forward-fill (nulls injected deterministically: error events)
# ---------------------------------------------------------------------------

@q(
    "ffill_bfill_event_value",
    """
    SELECT event_id,
           last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           first_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                       IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value_bfill
    FROM events
    """,
)
def ffill_bfill_event_value(spark, sf_dir):
    """B5 forward- AND backward-fill of the same deterministically-nulled
    column (error events), both directions in one query."""
    nulled = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    e = (
        _t(spark, sf_dir, "events")
        .withColumn("value_ffill", nulled)
        .withColumn("value_bfill", nulled)
    )
    out = W.ffill(e, "value_ffill", part="user_id", order=["ts", "event_id"])
    out = W.bfill(out, "value_bfill", part="user_id", order=["ts", "event_id"])
    return out.select("event_id", "value_ffill", "value_bfill")


# ---------------------------------------------------------------------------
# B1/B2: as-of joins (events as facts, per-customer order history as dim)
# ---------------------------------------------------------------------------

_ASOF_DIM_SQL = """
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders) t WHERE rn = 1"""


def _asof_dim(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    # Cluster by the as-of equi-key ONCE (guide §2.4): hashpartitioning on
    # o_custkey alone satisfies every downstream window requirement — the
    # dedup row_number windows over (o_custkey, o_orderdate) here and in
    # asof_join's _dedup_dim, AND the broadcast strategy's lead() interval
    # window over (o_custkey) — so the whole dim prep runs off this single
    # exchange instead of hashpartitioning(custkey, orderdate) followed by a
    # second hashpartitioning(custkey). Results are unaffected (row_number
    # ties are broken by the explicit ORDER BY, not by partition layout).
    o = o.repartition("o_custkey")
    return W.dedup_latest(o, ["o_custkey", "o_orderdate"], "o_orderkey", desc=True)


def _asof_backward(spark, sf_dir, strategy: str):
    e = _t(spark, sf_dir, "events").withColumnRenamed("user_id", "o_custkey")
    if strategy == "broadcast":
        # Scale-adaptive probe parallelism (guide §2.5, "input skew: one
        # huge unsplittable file"): the events parquet ships as a single
        # row group at the bench scales, so the scan — and with it the
        # whole broadcast-hash-probe pipeline, which has no exchange of
        # its own by design — would run as ONE task regardless of cores.
        # Repartition only when the scan cannot feed the cores; at real
        # scale (many splits) the branch does not fire and no exchange is
        # added. The union strategy needs nothing: its window exchange
        # already redistributes the facts.
        sc = spark.sparkContext
        if e.rdd.getNumPartitions() < sc.defaultParallelism:
            e = e.repartition(sc.defaultParallelism)
    dim = _asof_dim(spark, sf_dir)
    out = asof_join(
        e, dim, on="o_custkey", ts_col="ts", valid_col="o_orderdate",
        direction="backward", strategy=strategy,
    )
    return out.select("event_id", "o_orderkey", "o_totalprice")


def asof_backward_latest_order(spark, sf_dir):
    """UNREGISTERED bench workload: the broadcast-strategy backward
    as-of alone (bench.py's `asof_backward` timing key measures this
    same work every round; the driver row moved to the tagged two-
    strategy union `asof_backward_strategies` in round 6, which would
    double the timed work and fake a 2x regression)."""
    return _asof_backward(spark, sf_dir, "broadcast")


@q(
    "asof_backward_strategies",
    f"""
    WITH dim AS ({_ASOF_DIM_SQL}),
    j AS (
      SELECT e.event_id, d.o_orderkey, d.o_totalprice
      FROM events e
      ASOF LEFT JOIN dim d
        ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate)
    SELECT 'broadcast' AS strategy, * FROM j
    UNION ALL
    SELECT 'union' AS strategy, * FROM j
    """,
)
def asof_backward_strategies(spark, sf_dir):
    """B1 backward as-of through BOTH physical strategies in one tagged
    row: the broadcast path and the shuffle/union path must each
    hash-match the single DuckDB ASOF JOIN (strategy equivalence is the
    point — the historical asof_backward_latest_order +
    asof_union_strategy_equivalence rows merged in round 6 to free a
    driver slot for an oracled LLM-op row)."""
    b = _asof_backward(spark, sf_dir, "broadcast").select(
        F.lit("broadcast").alias("strategy"), "*"
    )
    u = _asof_backward(spark, sf_dir, "union").select(
        F.lit("union").alias("strategy"), "*"
    )
    return b.unionByName(u)


@q(
    "asof_forward_first_event",
    """
    WITH dim AS (
      SELECT user_id, ts AS ets, event_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT o.o_orderkey, d.event_id AS next_event_id
    FROM orders o
    ASOF LEFT JOIN dim d
      ON o.o_custkey = d.user_id AND o.o_orderdate <= d.ets
    """,
)
def asof_forward_first_event(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    dim = _t(spark, sf_dir, "events").select("user_id", F.col("ts").alias("ets"), "event_id")
    dim = W.dedup_latest(dim, ["user_id", "ets"], "event_id", desc=False)
    out = asof_join(
        o, dim, on="user_id", ts_col="o_orderdate", valid_col="ets",
        direction="forward", strategy="broadcast",
    )
    return out.select("o_orderkey", F.col("event_id").alias("next_event_id"))


@q(
    "asof_tolerance_30d",
    f"""
    WITH dim AS ({_ASOF_DIM_SQL})
    SELECT event_id,
           CASE WHEN e.ts <= d.o_orderdate + INTERVAL 10950 DAY
                THEN d.o_orderkey END AS o_orderkey
    FROM events e
    ASOF LEFT JOIN dim d
      ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    """,
)
def asof_tolerance_30d(spark, sf_dir):
    """Backward as-of with a tolerance: matches older than ~30y are nulled
    (events are 2024, orders 1995-2001, so the tolerance has bite).
    Routed through strategy='auto' so the probe-and-choose planner path
    (dim fits the broadcast row limit here -> broadcast) has driver
    coverage; `tests/test_asof.py` pins that auto flips to union past the
    limit."""
    e = _t(spark, sf_dir, "events").withColumnRenamed("user_id", "o_custkey")
    dim = _asof_dim(spark, sf_dir)
    out = asof_join(
        e, dim, on="o_custkey", ts_col="ts", valid_col="o_orderdate",
        direction="backward", strategy="auto",
        tolerance=F.expr("INTERVAL 10950 DAYS"),
    )
    return out.select("event_id", "o_orderkey")


@q(
    "asof_nearest_sampled_order",
    """
    WITH dim AS (
      SELECT o_custkey, valid_date, near_orderkey FROM (
        SELECT o_custkey, o_orderdate AS valid_date, o_orderkey AS near_orderkey,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders WHERE o_orderkey % 10 = 0) t WHERE rn = 1),
    f AS (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
          WHERE o_orderkey % 10 <> 0),
    b AS (
      SELECT f.o_orderkey, f.o_orderdate, d.near_orderkey AS bk, d.valid_date AS bd
      FROM f ASOF LEFT JOIN dim d
        ON f.o_custkey = d.o_custkey AND f.o_orderdate >= d.valid_date),
    fw AS (
      SELECT f.o_orderkey, d.near_orderkey AS fk, d.valid_date AS fd
      FROM f ASOF LEFT JOIN dim d
        ON f.o_custkey = d.o_custkey AND f.o_orderdate <= d.valid_date)
    SELECT b.o_orderkey,
           CASE WHEN fd IS NULL OR (bd IS NOT NULL AND
                     epoch(b.o_orderdate) - epoch(bd) <= epoch(fd) - epoch(b.o_orderdate))
                THEN bk ELSE fk END AS near_orderkey
    FROM b JOIN fw ON fw.o_orderkey = b.o_orderkey
    """,
)
def asof_nearest_sampled_order(spark, sf_dir):
    """B2 nearest direction: each non-sampled order matched to the closest
    (in either time direction) sampled order of the same customer; ties
    break backward — mirrored exactly in the DuckDB oracle."""
    o = _t(spark, sf_dir, "orders")
    facts = o.where(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    dim = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_custkey",
            F.col("o_orderdate").alias("valid_date"),
            F.col("o_orderkey").alias("near_orderkey"),
        )
    )
    dim = W.dedup_latest(dim, ["o_custkey", "valid_date"], "near_orderkey", desc=True)
    out = asof_join(
        facts, dim, on="o_custkey", ts_col="o_orderdate", valid_col="valid_date",
        direction="nearest",
    )
    return out.select("o_orderkey", "near_orderkey")


@q(
    "distinct_counts_exact",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT date_trunc('day', ts)) AS n_days
    FROM events GROUP BY event_type
    """,
)
def distinct_counts_exact(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
    )


@q("approx_distinct_users")  # no oracle: HLL++ sketch, rows-only check
def approx_distinct_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n"),
    )


@q(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS price_o,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS price_f,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS price_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("price_o"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("price_f"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("price_p"),
    )


# ---------------------------------------------------------------------------
# B12: equi joins, semi/anti
# ---------------------------------------------------------------------------

@q(
    "join_customer_nation_region",
    """
    SELECT r.r_name, count(*) AS n_customers, round(avg(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_customer_nation_region(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@q(
    "anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "semi_customers_with_1995_orders",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                    AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def semi_customers_with_1995_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@q(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 flavor: 3-way join + agg + top-10 (join reordering/AQE demo)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# (The historical q5_region_revenue row — a 6-way TPC-H Q5 join chain —
# was retired in round 6: its join/broadcast coverage fully overlaps
# q3_shipping_priority + join_customer_nation_region, and the freed
# driver slot went to an oracled LLM-pipeline row. The multi-dim
# broadcast-chain shape stays pytest-covered in tests/test_plans.py.)


# ---------------------------------------------------------------------------
# B13: range / interval join
# ---------------------------------------------------------------------------

@q(
    "range_join_ship_window",
    """
    SELECT o.o_orderpriority, count(*) AS n_lineitems
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def range_join_ship_window(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(o, cond).groupBy("o_orderpriority").agg(F.count("*").alias("n_lineitems"))
    )


# ---------------------------------------------------------------------------
# B14: set operations
# ---------------------------------------------------------------------------

@q(
    "setops_partkeys",
    """
    SELECT 'except' AS op, partkey FROM (
      SELECT l_partkey AS partkey FROM lineitem
      EXCEPT
      SELECT p_partkey AS partkey FROM part WHERE p_size > 25)
    UNION ALL
    SELECT 'intersect' AS op, partkey FROM (
      SELECT l_partkey AS partkey FROM lineitem
      INTERSECT
      SELECT p_partkey AS partkey FROM part WHERE p_size <= 25)
    """,
)
def setops_partkeys(spark, sf_dir):
    """B14 set operations: except + intersect + union all, tagged."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    p = _t(spark, sf_dir, "part")
    big = p.where(F.col("p_size") > 25).select(F.col("p_partkey").alias("partkey"))
    small = p.where(F.col("p_size") <= 25).select(F.col("p_partkey").alias("partkey"))
    exc = li.distinct().exceptAll(big.distinct()).select(
        F.lit("except").alias("op"), "partkey"
    )
    inter = li.intersect(small).select(F.lit("intersect").alias("op"), "partkey")
    return exc.unionByName(inter)


# ---------------------------------------------------------------------------
# B10: rollup / cube / grouping sets (cube over 2 cols == the full grouping
# set lattice; rollup is the prefix subset — one query covers the family,
# pivot is covered separately by pivot_status_by_priority)
# ---------------------------------------------------------------------------

@q(
    "rollup_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def rollup_cube_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [
            ["o_orderstatus", "o_orderpriority"],
            ["o_orderstatus"],
            ["o_orderpriority"],
            [],
        ],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price")
    )


# ---------------------------------------------------------------------------
# B19: scalar functions (string / date / JSON-ish extraction)
# ---------------------------------------------------------------------------

_SCALAR_SUITE_SQL = r"""
    SELECT 'events' AS src, event_id AS id,
           upper(event_type) AS str_a,
           CAST(NULL AS VARCHAR) AS str_b,
           date_trunc('day', ts) AS ts_a,
           TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS lng_a,
           CAST(length(props) AS BIGINT) AS lng_b,
           CAST(NULL AS BIGINT) AS lng_c,
           CAST(NULL AS DOUBLE) AS dbl_a, CAST(NULL AS DOUBLE) AS dbl_b,
           CAST(NULL AS DOUBLE) AS dbl_c, CAST(NULL AS DOUBLE) AS dbl_d,
           CAST(NULL AS DOUBLE) AS dbl_e, CAST(NULL AS DOUBLE) AS dbl_f,
           CAST(NULL AS DOUBLE) AS dbl_g
    FROM events
    UNION ALL
    SELECT 'part', p_partkey,
           substring(p_name, 1, 8),
           upper(p_brand) || '|' || lpad(CAST(p_size AS VARCHAR), 4, '0'),
           CAST(NULL AS TIMESTAMP),
           CAST(instr(p_type, 'a') AS BIGINT),
           CAST(levenshtein(p_brand, p_type) AS BIGINT),
           CAST(length(p_name || '-' || p_brand) AS BIGINT),
           NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM part
    UNION ALL
    SELECT 'lineitem', CAST(l_orderkey * 100 + l_linenumber AS BIGINT),
           CASE WHEN l_discount > 0.05 THEN 'deep'
                WHEN l_discount > 0 THEN 'some' ELSE 'none' END,
           coalesce(nullif(l_returnflag, 'N'), 'kept'),
           CAST(NULL AS TIMESTAMP),
           CAST(ceil(l_tax * 100) AS BIGINT),
           CAST(floor(l_quantity / 7.0) AS BIGINT),
           CAST(NULL AS BIGINT),
           round(sqrt(l_quantity), 6),
           round(pow(1.0 + l_discount, 3), 6),
           round(ln(1.0 + l_extendedprice), 6),
           abs(l_quantity - 25.0),
           round(mod(l_extendedprice, 97.0), 6),
           greatest(l_tax, l_discount),
           least(l_quantity, 10.0)
    FROM lineitem
    """

_NULL_DBL = ("dbl_a", "dbl_b", "dbl_c", "dbl_d", "dbl_e", "dbl_f", "dbl_g")


@q("scalar_function_suite", _SCALAR_SUITE_SQL)
def scalar_function_suite(spark, sf_dir):
    """B19 scalar-function library in ONE driver row: the historical
    scalar_props_extract (regex/JSON-ish extraction + date_trunc + string
    casing over events), scalar_string_funcs (substring/lpad/instr/
    levenshtein/concat over part) and scalar_math_conditional (sqrt/pow/
    ln/abs/mod/ceil/floor + CASE/greatest/least/nullif/coalesce over
    lineitem) rows union-typed into a shared (src, id, str_*, ts_*,
    lng_*, dbl_*) schema — every scalar function stays hash-checked
    against DuckDB, three registry slots become one (freed for the
    oracled LLM-pipeline rows below). Map-only projections + a
    plan-level union: zero shuffles."""
    e = _t(spark, sf_dir, "events")
    nd = [F.lit(None).cast("double").alias(c) for c in _NULL_DBL]
    ev = e.select(
        F.lit("events").alias("src"),
        F.col("event_id").alias("id"),
        F.upper("event_type").alias("str_a"),
        F.lit(None).cast("string").alias("str_b"),
        F.date_trunc("day", "ts").alias("ts_a"),
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("long").alias("lng_a"),
        F.length("props").cast("long").alias("lng_b"),
        F.lit(None).cast("long").alias("lng_c"),
        *nd,
    )
    p = _t(spark, sf_dir, "part")
    pt = p.select(
        F.lit("part").alias("src"),
        F.col("p_partkey").alias("id"),
        F.substring("p_name", 1, 8).alias("str_a"),
        F.concat_ws(
            "|", F.upper("p_brand"),
            F.lpad(F.col("p_size").cast("string"), 4, "0"),
        ).alias("str_b"),
        F.lit(None).cast("timestamp").alias("ts_a"),
        F.instr("p_type", "a").cast("long").alias("lng_a"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("lng_b"),
        F.length(F.concat_ws("-", "p_name", "p_brand")).cast("long").alias("lng_c"),
        *nd,
    )
    li = _t(spark, sf_dir, "lineitem")
    ln = li.select(
        F.lit("lineitem").alias("src"),
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).cast("long").alias("id"),
        F.when(F.col("l_discount") > 0.05, "deep")
        .when(F.col("l_discount") > 0, "some")
        .otherwise("none").alias("str_a"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("kept")).alias("str_b"),
        F.lit(None).cast("timestamp").alias("ts_a"),
        F.ceil(F.col("l_tax") * 100).cast("long").alias("lng_a"),
        F.floor(F.col("l_quantity") / 7.0).cast("long").alias("lng_b"),
        F.lit(None).cast("long").alias("lng_c"),
        F.round(F.sqrt("l_quantity"), 6).alias("dbl_a"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 3), 6).alias("dbl_b"),
        F.round(F.log(F.lit(1.0) + F.col("l_extendedprice")), 6).alias("dbl_c"),
        F.abs(F.col("l_quantity") - 25.0).alias("dbl_d"),
        F.round(F.col("l_extendedprice") % 97.0, 6).alias("dbl_e"),
        F.greatest("l_tax", "l_discount").alias("dbl_f"),
        F.least(F.col("l_quantity"), F.lit(10.0)).alias("dbl_g"),
    )
    return ev.unionByName(pt).unionByName(ln)


@q(
    "text_chunking",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    c AS (SELECT doc_id, toks, n,
            CASE WHEN n <= 64 THEN 1
                 ELSE 1 + CAST(ceil((n - 64) * 1.0 / 56) AS INTEGER)
            END AS n_chunks FROM n),
    e AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM c)
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * 56 AS BIGINT) AS start_tok,
           CAST(len(toks[i*56+1 : i*56+64]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[i*56+1 : i*56+64], ' ') AS chunk_text
    FROM e
    """,
)
def text_chunking(spark, sf_dir):
    """Fixed-size overlapping token windows (64 tokens, 8 overlap ->
    stride 56) over the documents table — the context-window chunker
    every pretraining/RAG ingestion pipeline runs. Map-only array
    expressions, zero shuffles (see operators/chunk.py; the historical
    scalar_date_funcs slot — date functions stay hash-covered via
    scalar_props_extract's date_trunc and the as-of/rolling suites)."""
    from lyssandra_spark.operators.chunk import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=64, overlap=8)


@q(
    "scalar_array_funcs",
    """
    WITH t AS (
      SELECT doc_id,
             list_sort(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '')) AS toks
      FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           CAST(list_contains(toks, 'the') AS INTEGER) AS has_the,
           len(list_distinct(toks)) AS n_distinct
    FROM t
    """,
)
def scalar_array_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.array_sort(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    )
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.array_contains("toks", "the").cast("int").alias("has_the"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# B8: rank / ntile / cume_dist / percent_rank window suite
# ---------------------------------------------------------------------------

@q(
    "window_rank_suite",
    """
    SELECT s_suppkey, s_nationkey,
           ntile(4) OVER w AS quartile,
           round(cume_dist() OVER w, 6) AS cume,
           round(percent_rank() OVER w, 6) AS prank,
           dense_rank() OVER (PARTITION BY s_nationkey
                              ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
)
def window_rank_suite(spark, sf_dir):
    """B8: global ntile/cume_dist/percent_rank + per-nation dense_rank."""
    s = _t(spark, sf_dir, "supplier")
    wg = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    wn = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_suppkey", "s_nationkey",
        F.ntile(4).over(wg).alias("quartile"),
        F.round(F.cume_dist().over(wg), 6).alias("cume"),
        F.round(F.percent_rank().over(wg), 6).alias("prank"),
        F.dense_rank().over(wn).alias("rnk"),
    )


# ---------------------------------------------------------------------------
# B16: salted two-phase aggregation (== plain groupBy, by construction)
# ---------------------------------------------------------------------------

@q(
    "salted_agg_lineitem",
    """
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
           max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_agg_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = W.salted_agg(
        li,
        "l_returnflag",
        {
            "n": ("count", "l_orderkey"),
            "sum_qty_raw": ("sum", "l_quantity"),
            "max_price": ("max", "l_extendedprice"),
        },
        n_buckets=16,
        salt_cols=("l_orderkey", "l_linenumber"),
    )
    return out.select(
        "l_returnflag", "n",
        F.round(F.col("sum_qty_raw"), 2).alias("sum_qty"), "max_price",
    )


@q(
    "grouped_sequence_stats",
    """
    WITH o AS (
      SELECT user_id, ts, event_type,
             epoch(ts) - epoch(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_type)) AS gap,
             CASE WHEN event_type <> lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_type) THEN 1 ELSE 0 END AS chg
      FROM events)
    SELECT user_id, count(*) AS n_rows,
           round(avg(gap), 4) AS mean_gap_sec,
           round(max(gap), 4) AS max_gap_sec,
           CAST(sum(chg) AS BIGINT) AS n_label_changes
    FROM o GROUP BY user_id
    """,
)
def grouped_sequence_stats(spark, sf_dir):
    """B20-iii applyInPandas per-group operator vs a pure-SQL oracle."""
    from lyssandra_spark.operators.grouped import group_sequence_stats

    return group_sequence_stats(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Training-data ops: exact dedup (hash-groupBy) over documents
# ---------------------------------------------------------------------------

@q(
    "dedup_exact_documents",
    """
    WITH ingested AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0)
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_doc_id
    FROM ingested
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
)
def dedup_exact_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    ingested = d.unionByName(dup)
    return (
        ingested.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# Text analysis: token counts / quality / language heuristic over documents
# ---------------------------------------------------------------------------

@q(
    "text_token_quality",
    r"""
    WITH t AS (
      SELECT doc_id, text, lang, length(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           n_chars,
           round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                 / greatest(n_chars, 1), 4) AS punct_ratio,
           round(len(list_filter(toks,
                 x -> x IN ('the','a','of','and','to','in','is')))
                 / greatest(len(toks), 1), 4) AS stop_ratio,
           round(least(1.0, len(toks) / 100.0), 4) AS length_score,
           lang,
           CASE WHEN len(list_filter(toks, x -> x IN ('the','and','of','a','to'))) >= 1
                THEN 'en' ELSE 'other' END AS pred_lang,
           md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
    FROM t
    """,
)
def text_token_quality(spark, sf_dir):
    """Token counting + quality scoring (length/punct/stopword ratios) +
    n-gram language-ID heuristic + whitespace-normalized fingerprint over
    the documents table, one projection — all JVM-side expressions (the
    three historical rows text_token_quality / text_lang_id /
    text_fingerprint merged; same operators, one scan)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    stop = F.filter(
        toks,
        lambda x: x.isin("the", "a", "of", "and", "to", "in", "is"),
    )
    en = F.filter(toks, lambda x: x.isin("the", "and", "of", "a", "to"))
    punct_removed = F.regexp_replace(F.col("text"), "[.,;:!?]", "")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            (F.length("text") - F.length(punct_removed))
            / F.greatest(F.length("text"), F.lit(1)),
            4,
        ).alias("punct_ratio"),
        F.round(F.size(stop) / F.greatest(F.size(toks), F.lit(1)), 4).alias("stop_ratio"),
        F.round(F.least(F.lit(1.0), F.size(toks) / F.lit(100.0)), 4).alias("length_score"),
        "lang",
        F.when(F.size(en) >= 1, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fingerprint"),
    )


@q(
    "quality_repetition_filters",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents),
    f AS (
      SELECT doc_id, toks, len(toks) AS n_tokens,
             CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(len(toks) - 1),
                                      i -> toks[i+1] || ' ' || toks[i+2]) END AS g2
      FROM t)
    SELECT doc_id,
           n_tokens,
           round((n_tokens - len(list_distinct(toks))) / greatest(n_tokens, 1), 4)
             AS dup_word_ratio,
           round(coalesce(list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))), 0)
                 / greatest(n_tokens, 1), 4) AS max_tok_frac,
           round((len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1), 4)
             AS dup_2gram_ratio
    FROM f
    """,
)
def quality_repetition_filters(spark, sf_dir):
    """Gopher-style repetition quality filters (duplicate-word ratio,
    most-frequent-token fraction, duplicate-2-gram ratio) — map-only
    array expressions, zero shuffles (see functions/textstats.py)."""
    from lyssandra_spark.functions.textstats import repetition_features

    return repetition_features(_t(spark, sf_dir, "documents"))


@q(
    "decontamination_overlap",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(toks) - 7),
               i -> array_to_string(toks[i+1:i+8], ' ')))) AS gram
      FROM t WHERE len(toks) >= 8),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0)
    SELECT doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN gram IN (SELECT gram FROM bench)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(sum(CASE WHEN gram IN (SELECT gram FROM bench)
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS contamination_rate
    FROM g GROUP BY doc_id
    """,
)
def decontamination_overlap(spark, sf_dir):
    """Benchmark decontamination: per-document fraction of distinct word
    8-grams appearing in the eval set (every 20th doc stands in as the
    benchmark). Corpus side: scan -> explode -> broadcast-hash-join ->
    groupBy(doc) — one shuffle, grams dropped before it."""
    from lyssandra_spark.functions.textstats import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 20 == 0)
    return ngram_contamination(d, bench, n=8)


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity between consecutive documents
# ---------------------------------------------------------------------------

@q(
    "ngram_jaccard_neighbors",
    r"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM documents))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                 greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1), 4)
             AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def ngram_jaccard_neighbors(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn(
        "toks",
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""),
    )
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "CASE WHEN size(toks) < 3 THEN array()"
                " ELSE transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END"
            )
        ).alias("shingles"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(
            F.size(F.array_intersect("a.shingles", "b.shingles"))
            / F.greatest(
                F.size(F.array_union("a.shingles", "b.shingles")), F.lit(1)
            ),
            4,
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k over embeddings
# ---------------------------------------------------------------------------

@q(
    "knn_cosine_topk",
    """
    WITH qv AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qemb
                FROM embeddings WHERE vec_id < 10),
    sims AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qemb, CAST(e.embedding AS DOUBLE[])) AS sim
      FROM qv q JOIN embeddings e ON e.vec_id <> q.qid)
    SELECT qid, vec_id, round(sim, 6) AS cos_sim, rk FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rk
      FROM sims) t
    WHERE rk <= 5
    """,
)
def knn_cosine_topk(spark, sf_dir):
    """Vectorized exact brute force (one numpy GEMM per Arrow batch with
    per-partition partial top-k — see similarity.cosine_topk_vectorized);
    result identical to the all-pairs JVM form, ~10x faster, and the
    shuffle carries only k rows per (query, partition)."""
    from lyssandra_spark.operators.similarity import cosine_topk_vectorized

    e = _t(spark, sf_dir, "embeddings")
    out = cosine_topk_vectorized(e, e.where(F.col("vec_id") < 10), k=5)
    return out.select(
        "qid", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"
    )


@q(
    "embedding_norm_stats",
    """
    SELECT label, count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x)))), 6) AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    nrm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return e.groupBy("label").agg(
        F.count("*").alias("n"), F.round(F.avg(nrm), 6).alias("avg_norm")
    )


# ---------------------------------------------------------------------------
# LLM-pipeline rows (round 6): BM25 retrieval, corpus-level paragraph
# dedup, and reciprocal-rank fusion — each hash-checked against a full
# independent DuckDB re-implementation of the operator's math.
# ---------------------------------------------------------------------------

# fixed query workload for the retrieval rows: terms drawn from the
# documents table's actual vocabulary with very different df (the/table
# are near-ubiquitous, vector/spark are selective) so IDF has bite
_BM25_QUERY_ROWS = [
    (1, "spark window agg"),
    (2, "customer table scan"),
    (3, "fast merge batch join"),
    (4, "vector the hash"),
]
_BM25_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERY_ROWS)

# ranked-BM25 CTE chain shared by the bm25 and rrf oracles: the same
# tokenizer as every text op (lower + split on non-alnum), tf per
# (doc, term), avgdl over ALL docs (Okapi convention, matching
# search.bm25_topk), smoothed IDF, per-(qid, doc) score sum rounded to
# 6 (the exact rounding the Spark side applies before ranking).
_BM25_RANKED_CTES = f"""
    q(qid, qtext) AS (VALUES {_BM25_VALUES}),
    tok AS (SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                      x -> x <> '')) AS term
            FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    lens AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY doc_id),
    stats AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
                     (SELECT CAST(sum(tf) AS DOUBLE) FROM tf) AS total_len),
    qt AS (SELECT DISTINCT qid, term FROM
             (SELECT qid,
                     unnest(list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'),
                                        x -> x <> '')) AS term
              FROM q)),
    idf AS (SELECT term, count(*) AS df FROM tf
            WHERE term IN (SELECT term FROM qt) GROUP BY term),
    scored AS (
      SELECT qt.qid, tf.doc_id,
             round(sum(ln(1 + (s.n_docs - i.df + 0.5) / (i.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.doc_len
                                         / (s.total_len / s.n_docs)))), 6) AS bm25
      FROM tf
      JOIN qt USING (term)
      JOIN idf i USING (term)
      JOIN lens l ON l.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY qt.qid, tf.doc_id),
    ranked AS (
      SELECT qid, doc_id, bm25,
             row_number() OVER (PARTITION BY qid
                                ORDER BY bm25 DESC, doc_id ASC) AS rk
      FROM scored)"""


def _bm25_query_df(spark):
    return spark.createDataFrame(_BM25_QUERY_ROWS, "qid long, qtext string")


@q(
    "bm25_topk_documents",
    f"""
    WITH {_BM25_RANKED_CTES}
    SELECT CAST(qid AS BIGINT) AS qid, doc_id, bm25, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 10
    """,
)
def bm25_topk_documents(spark, sf_dir):
    """Okapi BM25 top-10 per query over the documents table, hash-checked
    against a from-scratch DuckDB BM25 (tf/df/avgdl/IDF all re-derived in
    SQL — see operators/search.py for the distributed plan shape)."""
    from lyssandra_spark.operators.search import bm25_topk

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(d, _bm25_query_df(spark), k=10)


@q(
    "rrf_hybrid_documents",
    f"""
    WITH {_BM25_RANKED_CTES},
    lenrank AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS rk
      FROM (SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '')) AS n_tokens
            FROM documents)
      QUALIFY rk <= 10),
    contrib AS (
      SELECT qid, doc_id, 1.0 / (60 + rk) AS c FROM ranked WHERE rk <= 10
      UNION ALL
      SELECT qv.qid, l.doc_id, 1.0 / (60 + l.rk)
      FROM (SELECT DISTINCT qid FROM q) qv CROSS JOIN lenrank l),
    fused AS (SELECT qid, doc_id, round(sum(c), 8) AS rrf_score
              FROM contrib GROUP BY qid, doc_id)
    SELECT CAST(qid AS BIGINT) AS qid, doc_id, rrf_score,
           CAST(row_number() OVER (PARTITION BY qid
                                   ORDER BY rrf_score DESC, doc_id ASC)
                AS INTEGER) AS rk
    FROM fused QUALIFY rk <= 10
    """,
)
def rrf_hybrid_documents(spark, sf_dir):
    """Reciprocal-rank fusion (Cormack 2009) of two REAL rankers — BM25
    top-10 and a longest-documents top-10 (a deterministic stand-in for a
    second retrieval mode, same for every query) — hash-checked against a
    DuckDB re-derivation of both rankings and the fused 1/(60+rank)
    scores. The global length ranking is a driver-scale window (one
    partition); production rankers are per-query-bounded upstream."""
    from lyssandra_spark.functions.textstats import word_tokens
    from lyssandra_spark.operators.search import bm25_topk, rrf_fuse

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    qdf = _bm25_query_df(spark)
    ra = bm25_topk(d, qdf, k=10).select("qid", "doc_id", "rk")
    wl = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
    lenrank = (
        d.select("doc_id", F.size(word_tokens("text")).alias("n_tokens"))
        .withColumn("rk", F.row_number().over(wl))
        .where(F.col("rk") <= 10)
        .select("doc_id", "rk")
    )
    rb = qdf.select("qid").distinct().crossJoin(lenrank)
    return rrf_fuse([ra, rb], k=10)


_BANNER = "Subscribe to our newsletter today"


# NOTE on the dedup oracles below (paragraphs + spans): DuckDB's RE2
# trims with '^\s+|\s+$' (ASCII-only \s) while the operators trim and
# split with Java's (?U)\s (full unicode whitespace). They agree
# because the synthetic documents corpus is ASCII-whitespace-only; on a
# corpus with NBSP/ideographic spaces the HASH CHECK would flip for an
# operator-side NON-bug (the operator's unicode behaviour is the
# intended one, pinned by the (?U) pytests in test_dedup.py). If the
# corpus generator ever adds unicode whitespace, widen the oracle's
# character classes instead of reading the mismatch as a regression.
@q(
    "dedup_paragraphs_documents",
    rf"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || chr(10) || '{_BANNER}'
                  ELSE text END AS text
      FROM documents),
    p AS (
      SELECT doc_id,
             unnest(range(len(parts))) AS pos,
             unnest(parts) AS para
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d)),
    t AS (SELECT doc_id, pos, para,
                 regexp_replace(para, '^\s+|\s+$', '', 'g') AS tp
          FROM p),
    hot AS (SELECT tp FROM t WHERE tp <> ''
            GROUP BY tp HAVING count(*) >= 2),
    m AS (SELECT doc_id, pos, para,
                 (tp <> '' AND tp IN (SELECT tp FROM hot)) AS dup
          FROM t)
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN NOT dup THEN para END,
                               chr(10) ORDER BY pos), '') AS text,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM m GROUP BY doc_id
    """,
)
def dedup_paragraphs_documents(spark, sf_dir):
    """Corpus-level repeated-paragraph removal (Gopher/C4 boilerplate
    strip) with a planted cross-document banner on every 3rd doc, so the
    hot set is non-trivial at every sf — hash-checked against a DuckDB
    re-derivation (split, trim, corpus-wide count >= 2, ordered
    reassembly). See operators/dedup.py:dedup_paragraphs for the
    one-count-shuffle plan shape."""
    from lyssandra_spark.operators.dedup import dedup_paragraphs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            # concat (null-propagating), NOT concat_ws (null-skipping):
            # the oracle's `text || chr(10) || banner` is NULL for a
            # null-text doc, and both engines must then drop the row
            F.concat(F.col("text"), F.lit("\n" + _BANNER)),
        ).otherwise(F.col("text")),
    )
    return dedup_paragraphs(planted)


_SPAN_BANNER = "Accept all cookies. See our policy. Close this box."

_SENT_BND = (
    "substr(text, CAST(i AS INTEGER), 1) IN ('.', '!', '?') "
    "AND substr(text, CAST(i AS INTEGER) + 1, 1) "
    "IN (' ', chr(9), chr(10), chr(13))"
)
_TOK_BND = (
    "substr(text, CAST(i AS INTEGER), 1) "
    "NOT IN (' ', chr(9), chr(10), chr(13)) "
    "AND substr(text, CAST(i AS INTEGER) + 1, 1) "
    "IN (' ', chr(9), chr(10), chr(13))"
)


def _span_chain_sql(sfx: str, win: int, bnd: str) -> str:
    """One window-span dedup CTE chain (suffix-namespaced so the
    sentence and token units coexist in a single WITH): zero-width
    chunking via character-position list ops (RE2 has no lookbehind),
    sliding spans of ``win`` trimmed chunks, corpus hot counts,
    hot-window union, index-filtered reassembly. Mirrors
    operators/dedup.py:_dedup_window_spans exactly (see the ASCII-\\s
    note above)."""
    return f"""
    b{sfx} AS (
      SELECT doc_id, text,
             list_filter(range(1, length(text)), i -> {bnd}) AS bnds
      FROM dd),
    c{sfx} AS (
      SELECT doc_id, text,
             list_prepend(0, bnds) AS starts,
             list_append(bnds, length(text)) AS ends
      FROM b{sfx}),
    ch{sfx} AS (
      SELECT doc_id,
             list_transform(range(len(starts)), k ->
                 substr(text, CAST(starts[k + 1] AS INTEGER) + 1,
                        CAST(ends[k + 1] - starts[k + 1] AS INTEGER))) AS chunks
      FROM c{sfx}),
    sp{sfx} AS (
      SELECT doc_id, chunks,
             CASE WHEN len(chunks) >= {win} THEN
               list_transform(range(len(chunks) - {win - 1}), j ->
                 array_to_string(
                   list_transform(range({win}), t ->
                     regexp_replace(
                       chunks[CAST(j + t AS INTEGER) + 1],
                       '^\\s+|\\s+$', '', 'g')), ' '))
             ELSE CAST([] AS VARCHAR[]) END AS spans
      FROM ch{sfx}),
    spe{sfx} AS (
      SELECT doc_id,
             unnest(range(len(spans))) AS pos,
             unnest(spans) AS s
      FROM sp{sfx}),
    hot{sfx} AS (SELECT s FROM spe{sfx} WHERE s <> ''
                 GROUP BY s HAVING count(*) >= 2),
    hp{sfx} AS (
      SELECT doc_id, list(pos) AS hotpos
      FROM spe{sfx} WHERE s IN (SELECT s FROM hot{sfx})
      GROUP BY doc_id),
    o{sfx} AS (
      SELECT c.doc_id, c.chunks,
             list_distinct(flatten(list_transform(
                 coalesce(h.hotpos, CAST([] AS BIGINT[])),
                 p -> list_transform(range({win}), t -> p + t)))) AS cv
      FROM ch{sfx} c LEFT JOIN hp{sfx} h USING (doc_id)),
    r{sfx} AS (
      SELECT doc_id,
             -- coalesce: DuckDB's array_to_string([]) is NULL, but a
             -- fully-covered doc must yield '' (the operator contract)
             coalesce(array_to_string(
               list_transform(
                 list_filter(range(len(chunks)),
                             k -> NOT list_contains(cv, k)),
                 k -> chunks[CAST(k AS INTEGER) + 1]), ''), '') AS text,
             CAST(len(chunks) AS BIGINT) AS n_units_total,
             CAST(len(cv) AS BIGINT) AS n_removed
      FROM o{sfx})"""


@q(
    "dedup_spans_documents",
    rf"""
    WITH dd AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN text || '. ' || '{_SPAN_BANNER}'
                  ELSE text END AS text
      FROM documents
      WHERE text IS NOT NULL),
    {_span_chain_sql("_s", 3, _SENT_BND)},
    {_span_chain_sql("_t", 8, _TOK_BND)}
    SELECT 'sentence' AS unit, * FROM r_s
    UNION ALL
    SELECT 'token' AS unit, * FROM r_t
    """,
)
def dedup_spans_documents(spark, sf_dir):
    """Repeated window-span removal, BOTH granularities as one
    unit-tagged union (the ``asof_backward_strategies`` consolidation
    pattern): C4 three-SENTENCE spans (Raffel 2020) and Lee-2021-style
    sliding TOKEN windows (8 tokens here — the planted banner is 9
    tokens and the synthetic docs run ~35, so the canonical 50 would
    find nothing), each hash-checked against a full DuckDB
    re-derivation. The banner lands MID-TEXT-STREAM on every 4th doc
    (preceded by '. ' so the corpus-unique prefix and the repeated
    banner windows are distinct — the case paragraph dedup cannot
    catch). RE2 has no lookbehind, so the oracle rebuilds both
    zero-width chunkings with character-position list ops (sentence
    boundary = [.!?] before whitespace; token boundary = non-space
    before whitespace), then spans, corpus counts, hot-window union,
    and index-filtered reassembly — byte-for-byte the operators'
    contract. See operators/dedup.py:_dedup_window_spans for the
    two-phase distributed plan both units share."""
    from lyssandra_spark.operators.dedup import dedup_spans, dedup_token_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(". " + _SPAN_BANNER)),
        ).otherwise(F.col("text")),
    )
    sent = dedup_spans(planted, n_sents=3, min_dup=2).select(
        F.lit("sentence").alias("unit"), "doc_id", "text",
        F.col("n_sents_total").alias("n_units_total"),
        F.col("n_removed_sents").alias("n_removed"),
    )
    tok = dedup_token_spans(planted, span_tokens=8, min_dup=2).select(
        F.lit("token").alias("unit"), "doc_id", "text",
        F.col("n_tokens_total").alias("n_units_total"),
        F.col("n_removed_tokens").alias("n_removed"),
    )
    return sent.unionByName(tok)
