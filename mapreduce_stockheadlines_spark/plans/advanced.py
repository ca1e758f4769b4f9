"""Advanced relational queries (SURVEY.md §2.2 categories beyond the
reference's surface): as-of join, bounded range join, cube, pivot,
subqueries via the SQL entry point, JSON + array/map scalar functions
(lag/lead/ntile windows live in core q10_window_functions).

Every query is deterministic (unique-key total orderings, integer or
pass-through-double aggregates only — no cross-engine float summation)
and oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import temporal as TP
from .catalog import register_views, table
from .core import QuerySpec

# --- q23 as-of join (backward, inclusive) -----------------------------------

def q23_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Each click joins the same user's most recent purchase at-or-before
    the click (union-and-fill construction, one shuffle — operators/
    temporal.py). Right side deduplicated per (user_id, ts) by max
    event_id so the as-of pick is deterministic."""
    e = table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    wdup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "value")
    )
    joined = TP.asof_join(
        clicks,
        purch,
        key="user_id",
        right_cols={"ts": "asof_ts", "value": "asof_value"},
    )
    return joined.select(
        "event_id", "user_id", "ts", "asof_ts", "asof_value"
    ).orderBy("event_id")


Q23_SQL = """
WITH clicks AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'),
purch AS (SELECT user_id, ts, value FROM (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase') WHERE rn = 1)
SELECT c.event_id, c.user_id, c.ts, p.ts AS asof_ts, p.value AS asof_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""

# --- q24 bounded range join --------------------------------------------------

def q24_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Clicks inside a 4-hour attribution window after a same-user purchase
    — point-in-interval join bucketed to a (key, bucket) equi-join
    (operators/temporal.py), never a cartesian fallback."""
    e = table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("end_ts"),
    )
    joined = TP.range_join_bucketed(
        clicks,
        purch,
        key="user_id",
        point_col="click_ts",
        start_col="start_ts",
        end_col="end_ts",
        bucket_seconds=4 * 3600,
    )
    return joined.select(
        "user_id", "purchase_id", "click_id", "start_ts", "click_ts"
    ).orderBy("purchase_id", "click_id")


Q24_SQL = """
WITH clicks AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                FROM events WHERE event_type = 'click'),
purch AS (SELECT event_id AS purchase_id, user_id, ts AS start_ts
          FROM events WHERE event_type = 'purchase')
SELECT p.user_id, p.purchase_id, c.click_id, p.start_ts, c.click_ts
FROM purch p JOIN clicks c
  ON c.user_id = p.user_id
 AND c.click_ts >= p.start_ts
 AND c.click_ts < p.start_ts + INTERVAL 4 HOUR
ORDER BY p.purchase_id, c.click_id
"""

# --- q25 cube + explicit grouping sets with GROUPING id ----------------------

_Q25_GS_SQL = """
SELECT 'gs' AS src, o_orderstatus, o_orderpriority,
       CAST(2 * grouping(o_orderstatus) + grouping(o_orderpriority) AS INTEGER)
         AS gid,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


def q25_cube_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (status, priority) — all 4 grouping sets in one pass —
    tag-unioned with an explicit GROUPING SETS lattice subset (the former
    q31, consolidated round 5; its freed registry slot went to
    x27_quantize_embeddings in plans/extensions.py) and with the former
    q26 pivot (consolidated round 6; freed slot → x32_sampling) and the
    former q29 JSON/array/map scalars (consolidated round 6 as the
    'json' branch — JSON extract + sequence/aggregate HOF + map lookup
    still execute, sums serialized into the union schema; freed slot →
    x33_train_classifier in plans/extensions.py). Each branch keeps its own Catalyst shape: the
    cube via the DataFrame API, the grouping sets via the spark.sql
    entry over registered views (that entry-path coverage is part of
    what q31 pinned), and the pivot via groupBy().pivot() with an
    explicit value list (no extra distinct scan — the list is part of
    the plan; missing cells coalesced to 0). The pivot branch's WIDE row
    is serialized into q25's tag-union schema (day → o_orderstatus,
    'type=count|...' cells → o_orderpriority, row total → n_orders,
    gid=-1) AFTER the pivot aggregate runs, so the physical pivot shape
    and every cell value still reach the oracle hash. Aggregates are
    order-independent (count/min/max) so the oracle hash is exact."""
    o = table(spark, sf, "orders")
    cube = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            F.lit("cube").alias("src"),
            "o_orderstatus",
            "o_orderpriority",
            "gid",
            "n_orders",
            "min_price",
            "max_price",
        )
    )
    register_views(spark, sf)
    gs = spark.sql(_Q25_GS_SQL)
    e = table(spark, sf, "events")
    wide = (
        e.withColumn("day", F.dayofmonth("ts"))
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    cells = [F.coalesce(F.col(t), F.lit(0)).cast("bigint") for t in _EVENT_TYPES]
    total = cells[0]
    for c in cells[1:]:
        total = total + c
    piv = wide.select(
        F.lit("pivot").alias("src"),
        F.col("day").cast("string").alias("o_orderstatus"),
        F.concat_ws(
            "|",
            *[
                F.concat(F.lit(f"{t}="), c.cast("string"))
                for t, c in zip(_EVENT_TYPES, cells)
            ],
        ).alias("o_orderpriority"),
        F.lit(-1).alias("gid"),
        total.alias("n_orders"),
        F.lit(None).cast("double").alias("min_price"),
        F.lit(None).cast("double").alias("max_price"),
    )
    ej = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    tri = F.aggregate(
        F.sequence(F.lit(1), k % 5 + 1), F.lit(0), lambda acc, x: acc + x
    )
    mp = F.create_map(F.lit("k"), k)
    jper = ej.select(
        "event_type",
        k.alias("k"),
        tri.alias("tri"),
        F.element_at(mp, "k").alias("mk"),
    )
    jrow = (
        jper.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sk"),
            F.sum("tri").alias("st"),
            F.sum("mk").alias("sm"),
        )
        .select(
            F.lit("json").alias("src"),
            F.col("event_type").alias("o_orderstatus"),
            F.concat(
                F.lit("k="), F.col("sk").cast("string"),
                F.lit("|tri="), F.col("st").cast("string"),
                F.lit("|mapk="), F.col("sm").cast("string"),
            ).alias("o_orderpriority"),
            F.lit(-2).alias("gid"),
            F.col("n").alias("n_orders"),
            F.lit(None).cast("double").alias("min_price"),
            F.lit(None).cast("double").alias("max_price"),
        )
    )
    return cube.unionAll(gs).unionAll(piv).unionAll(jrow).orderBy(
        "src", "gid", "o_orderstatus", "o_orderpriority"
    )


_Q25_PIVOT_SQL = """
SELECT 'pivot' AS src,
       CAST(CAST(day(ts) AS INTEGER) AS VARCHAR) AS o_orderstatus,
       'click=' || CAST(count(*) FILTER (event_type = 'click') AS VARCHAR)
       || '|error=' || CAST(count(*) FILTER (event_type = 'error') AS VARCHAR)
       || '|purchase='
       || CAST(count(*) FILTER (event_type = 'purchase') AS VARCHAR)
       || '|signup=' || CAST(count(*) FILTER (event_type = 'signup') AS VARCHAR)
       || '|view=' || CAST(count(*) FILTER (event_type = 'view') AS VARCHAR)
         AS o_orderpriority,
       CAST(-1 AS INTEGER) AS gid,
       CAST(count(*) FILTER (event_type IN ('click', 'error', 'purchase',
                                            'signup', 'view')) AS BIGINT)
         AS n_orders,
       CAST(NULL AS DOUBLE) AS min_price, CAST(NULL AS DOUBLE) AS max_price
FROM events GROUP BY day(ts)
"""

_Q25_JSON_SQL = """
SELECT 'json' AS src, event_type AS o_orderstatus,
       'k=' || CAST(CAST(sum(k) AS BIGINT) AS VARCHAR)
       || '|tri=' || CAST(CAST(sum((k % 5 + 1) * (k % 5 + 2) // 2) AS BIGINT)
                          AS VARCHAR)
       || '|mapk=' || CAST(CAST(sum(k) AS BIGINT) AS VARCHAR)
         AS o_orderpriority,
       CAST(-2 AS INTEGER) AS gid,
       count(*) AS n_orders,
       CAST(NULL AS DOUBLE) AS min_price, CAST(NULL AS DOUBLE) AS max_price
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events)
GROUP BY event_type
"""

Q25_SQL = f"""
SELECT 'cube' AS src, o_orderstatus, o_orderpriority,
       CAST(2 * grouping(o_orderstatus) + grouping(o_orderpriority) AS INTEGER)
         AS gid,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
{_Q25_GS_SQL}
UNION ALL
{_Q25_PIVOT_SQL}
UNION ALL
{_Q25_JSON_SQL}
ORDER BY src, gid, o_orderstatus, o_orderpriority
"""

# --- q26 pivot ---------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# q26_pivot was consolidated into q25_cube_grouping_sets in round 6 (the
# pivot branch keeps its explicit-value-list groupBy().pivot() physical
# shape and serializes the wide row into the tag-union schema); the
# freed registry slot went to x32_sampling in plans/extensions.py.

# --- q28 subqueries through the SQL entry point ------------------------------

_Q28_SPARK_SQL = """
WITH oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders
            GROUP BY o_custkey)
SELECT c.c_custkey, c.c_mktsegment, oc.n_orders
FROM customer c JOIN oc ON oc.o_custkey = c.c_custkey
WHERE oc.n_orders > (SELECT avg(n_orders) FROM oc)
  AND c.c_custkey IN (SELECT o_custkey FROM orders
                      WHERE o_orderstatus = 'F')
ORDER BY c.c_custkey
"""


def q28_subqueries(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery + IN subquery via ``spark.sql`` over registered
    views — exercises the ad-hoc SQL surface (jobs/sql.py path); Catalyst
    rewrites IN to a left-semi join and the scalar subquery to a
    broadcast single-row join."""
    register_views(spark, sf)
    return spark.sql(_Q28_SPARK_SQL)


Q28_SQL = _Q28_SPARK_SQL  # ANSI subset — identical text runs on DuckDB

# --- q29 JSON + array/map scalar functions ------------------------------------

# q29_json_array_map was consolidated into q25_cube_grouping_sets in
# round 6 (a fourth 'json' tag-union branch: the JSON extraction,
# sequence/aggregate HOF fold, and map construction/lookup all still
# execute, their per-event-type sums serialized into the union schema);
# the freed registry slot went to x33_train_classifier in
# plans/extensions.py.


# q30_percentiles was consolidated into q02_group_agg in round 6 (the
# exact sort-based percentile aggregate rides q02's grouping as three
# extra columns); the freed registry slot went to x31_pagerank in
# plans/extensions.py.


# --- q31 grouping sets ---------------------------------------------------------

# --- q32 full outer join --------------------------------------------------------

def q32_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER: both null-extended sides survive (event users without a
    matching customer id and vice versa)."""
    e = table(spark, sf, "events")
    c = table(spark, sf, "customer").filter(F.col("c_custkey") < 300)
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    joined = per_user.join(
        c.select("c_custkey", "c_mktsegment"),
        per_user["user_id"] == c["c_custkey"],
        "full_outer",
    )
    return joined.select(
        F.coalesce("user_id", "c_custkey").alias("id"),
        "n_events",
        "c_mktsegment",
    ).orderBy("id")


Q32_SQL = """
WITH per_user AS (SELECT user_id, count(*) AS n_events FROM events
                  GROUP BY user_id),
c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 300)
SELECT coalesce(user_id, c_custkey) AS id, n_events, c_mktsegment
FROM per_user FULL OUTER JOIN c ON user_id = c_custkey
ORDER BY id
"""


# --- q33 math + date arithmetic scalar functions -------------------------------

def q33_math_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar math (sqrt/abs/ceil/floor/mod/multiply — IEEE-identical
    across engines; no libm-dependent pow/ln/exp in the hash-matched set)
    and date arithmetic (datediff/date_add/date_trunc/year) over orders.
    Subsumes the former q17_date_functions' scalar date surface (round-4
    consolidation; its aggregation shape is covered by q02/q16/q21)."""
    o = table(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.sqrt("o_totalprice").alias("sqrt_price"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("abs_delta"),
        F.ceil("o_totalprice").cast("long").alias("ceil_price"),
        F.floor("o_totalprice").cast("long").alias("floor_price"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        # x*x, NOT pow(x, 2): IEEE multiply is correctly rounded and
        # bit-identical everywhere, while Java Math.pow and C libm pow
        # disagree in the last ULP for some inputs (round-2 q33 hash-fail:
        # 72362.86^2 -> ...886400 on Spark vs ...886399 on DuckDB).
        (F.col("o_totalprice") * F.col("o_totalprice")).alias("price_sq"),
        F.datediff(
            F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("int").alias("days_to_98"),
        # cast("timestamp"): the driver widens oracle-side dates to
        # timestamps but keeps Spark-side dates as datetime.date, so a raw
        # DATE column can never hash-match (round-1 q33 vs q17 evidence —
        # see oracle_compare.py docstring)
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
    ).orderBy("o_orderkey")


Q33_SQL = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       sqrt(o_totalprice) AS sqrt_price,
       abs(o_totalprice - 1000.0) AS abs_delta,
       CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
       CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
       o_orderkey % 7 AS key_mod7,
       o_totalprice * o_totalprice AS price_sq,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
            AS INTEGER) AS days_to_98,
       CAST(o_orderdate AS DATE) + 30 AS due_date
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
"""


ADV_QUERIES: dict[str, QuerySpec] = {
    "q23_asof_join": QuerySpec(q23_asof_join, Q23_SQL),
    "q24_range_join": QuerySpec(q24_range_join, Q24_SQL),
    "q25_cube_grouping_sets": QuerySpec(q25_cube_grouping_sets, Q25_SQL),
    "q28_subqueries": QuerySpec(q28_subqueries, Q28_SQL),
    "q32_full_outer": QuerySpec(q32_full_outer, Q32_SQL),
    "q33_math_date_functions": QuerySpec(q33_math_date_functions, Q33_SQL),
}
