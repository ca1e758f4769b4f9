"""Core declared query set (SURVEY.md §2.3 Q01-Q22).

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL for the DuckDB oracle. Conventions that make
the driver's order-insensitive value-hash match:

- every computed column aliased identically on both sides;
- double aggregates rounded (ROUND(x, 2/4)) on both sides;
- rank/grouping columns cast to the same width (INT) on both sides;
- DuckDB integer SUM/COUNT-CASE cast to BIGINT (DuckDB widens to HUGEINT);
- timestamps compared under UTC (session.apply_runtime_conf pins the tz).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, remove_stopwords, stopwords_df, tokens_array
from .catalog import parallel_table, table


@dataclass(frozen=True)
class QuerySpec:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only


def _stopword_in_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


# --- Q01 scan / filter / project (O1,O3,O4) --------------------------------

def q01_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """Predicate + projection pushed to the parquet scan (PushedFilters /
    2-column ReadSchema visible in .explain)."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


Q01_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity >= 45
ORDER BY l_orderkey, l_linenumber
"""

# --- Q02 hash aggregation (O10,O11 + §2.2 agg breadth) ---------------------

def q02_group_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Agg breadth in one grouped aggregation: count/sum/avg/min/max plus
    exact COUNT DISTINCT (q11_count_distinct folded in here in round 5 —
    Catalyst expands the distinct aggregate into the standard two-phase
    partial/final plan alongside the others; the freed registry slot
    went to x24_url_curation) plus EXACT linear-interpolated percentiles
    (q30_percentiles folded in here in round 6; the freed slot went to
    x31_pagerank in plans/extensions.py).

    Percentile plan choice: ``F.percentile`` in the main aggregate
    forces the WHOLE plan into ObjectHashAggregate — no whole-stage
    codegen for any of the six metrics (measured 4x: 0.73s → ~3s at
    sf0.1). Instead the percentiles are re-derived from a value-count
    census: one codegen corpus pass keyed by (flag, status, quantity)
    collapses map-side to <= groups x |distinct qty| (~300) rows, tiny
    windows turn counts into cumulative ranks, and conditional MINs
    pick the interpolation endpoints — value at 0-based index i is the
    least quantity whose cumulative count exceeds i, at h = q·(n-1),
    the same definition Spark's percentile and DuckDB's quantile_cont
    use. Every step is EXACT on integer-valued l_quantity (h and its
    fractional part are exact binary fractions, endpoints are integers,
    lo + frac·(hi-lo) is exact), so the re-derivation is bit-equal to
    both engines' native percentile and the oracle hash stays exact.
    At 100 TB: two codegen scans (AQE-joined 6-row results) strictly
    beat one object-agg scan; the census shuffle is ~300 rows/task."""
    li = table(spark, sf, "lineitem")
    main = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.min("l_discount").alias("min_disc"),
            F.max("l_tax").alias("max_tax"),
        )
    )
    cells = li.groupBy("l_returnflag", "l_linestatus", "l_quantity").agg(
        F.count(F.lit(1)).alias("_c")
    )
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    cum = cells.withColumn(
        "_cum", F.sum("_c").over(grp.orderBy("l_quantity"))
    ).withColumn("_n", F.sum("_c").over(grp))

    def pct(q: float, name: str):
        r = F.lit(q) * (F.col("_n") - 1).cast("double")
        lo_v = F.min(F.when(F.col("_cum") > F.floor(r), F.col("l_quantity")))
        hi_v = F.min(F.when(F.col("_cum") > F.ceil(r), F.col("l_quantity")))
        frac = F.min(r - F.floor(r).cast("double"))
        return (lo_v + frac * (hi_v - lo_v)).alias(name)

    pcts = cum.groupBy("l_returnflag", "l_linestatus").agg(
        pct(0.25, "p25_qty"), pct(0.5, "median_qty"), pct(0.75, "p75_qty")
    )
    return main.join(pcts, ["l_returnflag", "l_linestatus"]).orderBy(
        "l_returnflag", "l_linestatus"
    )


Q02_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       count(DISTINCT l_suppkey) AS n_supp,
       round(sum(l_quantity), 2) AS sum_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       min(l_discount) AS min_disc,
       max(l_tax) AS max_tax,
       quantile_cont(l_quantity, 0.25) AS p25_qty,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS p75_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --- Q03 global sort / rank / top-k (O12,O13,O14) --------------------------

def q03_topk_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Count per supplier → top-100 via TakeOrderedAndProject, THEN
    row_number over only the 100 survivors (operators/rank.ranked,
    round 5) — no window ever sees the full aggregated table, the scale
    fix for the reference's single-reducer sort
    (StockCount.java:37-66)."""
    from ..operators.rank import ranked

    li = table(spark, sf, "lineitem")
    counted = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    return ranked(counted, "l_suppkey", limit=100).orderBy("rank")


Q03_SQL = """
WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey)
SELECT l_suppkey, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS INTEGER) AS rank
FROM c ORDER BY rank LIMIT 100
"""

# --- Q04 inner equi-join + agg ---------------------------------------------

def q04_join_inner_agg(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


Q04_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

# --- Q05 broadcast dim join ------------------------------------------------

def q05_join_broadcast_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Small-dim join pinned to BroadcastHashJoin — region is tiny at any
    scale factor; no shuffle of nation."""
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


Q05_SQL = """
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey
"""

# --- Q06 left outer join (NULL-preserving count) ---------------------------

def q06_join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 350000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
                "sum_big"
            ),
        )
        .orderBy("c_custkey")
    )


Q06_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_big_orders,
       round(sum(coalesce(o_totalprice, 0)), 2) AS sum_big
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000) o
  ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey
"""

# --- Q07 left semi + left anti join (EXISTS / NOT EXISTS; O9 analogue) -----

def q07_join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Both existence-join types in one tagged query (the q12 set-ops
    consolidation pattern — round 5, its freed slot went to
    x26_classifier_score in plans/extensions.py): a left SEMI join
    (customers WITH a >450k order) unioned with a left ANTI join
    (customers with NO urgent order), tagged. Catalyst plans each branch
    independently — the tag union loses neither the
    BroadcastHashJoin(LeftSemi) nor the (LeftAnti) physical shape, both
    still pinned in test_plans.py."""
    c = table(spark, sf, "customer")
    big = table(spark, sf, "orders").filter(F.col("o_totalprice") > 450000)
    urgent = table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select(
            F.lit("semi").alias("side"),
            "c_custkey",
            "c_name",
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
    )
    anti = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select(
            F.lit("anti").alias("side"), "c_custkey", "c_name", "c_mktsegment"
        )
    )
    return semi.unionAll(anti).orderBy("side", "c_custkey")


Q07_SQL = """
SELECT 'semi' AS side, c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
UNION ALL
SELECT 'anti' AS side, c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY side, c_custkey
"""

# --- Q09 partitioned window ranking ----------------------------------------

def q09_window_partitioned(spark: SparkSession, sf: str) -> DataFrame:
    """Partitioned-window top-N in BOTH family shapes, tag-unioned (the
    round-5 consolidation pattern; the former q34's registry slot went
    to x28_lm_perplexity in plans/extensions.py): ranking straight off a
    scan partitioned by customer, and ranking after a fact⋈dim join
    partitioned by market segment — the latter is the branch whose
    `rank <= N` filter must compile to WindowGroupLimit (per-partition
    top-N heaps before any full sort; pinned in test_plans.py). Each
    branch computes row_number/rank/dense_rank in ONE Window operator."""
    o = table(spark, sf, "orders")

    def ranked(df, part_col):
        w = Window.partitionBy(part_col).orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        return df.select(
            F.col(part_col).cast("string").alias("grp"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
        ).filter(F.col("rn") <= 3)

    by_cust = ranked(o, "o_custkey").select(F.lit("cust").alias("side"), "*")
    c = table(spark, sf, "customer")
    seg = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    by_seg = ranked(seg, "c_mktsegment").select(
        F.lit("seg").alias("side"), "*"
    )
    return by_cust.unionAll(by_seg).orderBy("side", "grp", "rn")


Q09_SQL = """
SELECT 'cust' AS side, CAST(o_custkey AS VARCHAR) AS grp,
       o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER w AS INTEGER) AS rn,
         CAST(rank() OVER w AS INTEGER) AS rnk,
         CAST(dense_rank() OVER w AS INTEGER) AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
UNION ALL
SELECT 'seg' AS side, c_mktsegment AS grp,
       o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         CAST(row_number() OVER w AS INTEGER) AS rn,
         CAST(rank() OVER w AS INTEGER) AS rnk,
         CAST(dense_rank() OVER w AS INTEGER) AS drnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WINDOW w AS (PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey)
) WHERE rn <= 3
ORDER BY side, grp, rn
"""

# --- Q10 window frame + offset functions (running sum, lag/lead/ntile) -----

def q10_window_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Frame aggregate (running sum), offset functions (lag/lead/delta/
    ntile), rank distributions (percent_rank/cume_dist) and boundary
    values (first/last) over ONE partitioned sort — Catalyst evaluates
    all of them in a single Window operator (plan-pinned), so merging
    costs nothing beyond the shared shuffle. Delta / percent_rank /
    cume_dist are pass-through double arithmetic on identical operands
    (bit-identical across engines, no rounding needed)."""
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(wf), 2).alias("run_sum"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_orderstatus").over(w).alias("next_status"),
            (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias(
                "delta"
            ),
            F.ntile(4).over(w).cast("int").alias("seq_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("o_totalprice").over(wf).alias("first_price"),
            F.last("o_totalprice").over(wfull).alias("last_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q10_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_orderstatus) OVER w AS next_status,
       o_totalprice - lag(o_totalprice) OVER w AS delta,
       CAST(ntile(4) OVER w AS INTEGER) AS seq_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_totalprice) OVER (
         w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
       last_value(o_totalprice) OVER (
         w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""

# --- Q11 exact distinct aggregation ----------------------------------------

# q11_count_distinct was consolidated into q02_group_agg in round 5 (same
# pattern as q17→q33 in round 4): COUNT(DISTINCT ...) now runs there next
# to the plain aggregates. The freed registry slot (driver caps the
# registry at 50) went to x24_url_curation (plans/extensions.py).

# --- Q12 set operations (UNION ALL / INTERSECT / EXCEPT, tagged) -----------

def q12_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """All three set operations in one tagged result (one CORRECTNESS row
    covers the whole category). EXCEPT uses ``subtract`` — true EXCEPT
    DISTINCT semantics even when the left side has duplicate rows
    (``exceptAll(b).distinct()`` keeps left rows whose multiplicity
    exceeds the right's, which only coincides with EXCEPT on unique
    keys; pinned by test_rank_relational.py::test_except_semantics)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("custkey")
    )
    all_cust = c.select(F.col("c_custkey").alias("custkey"))
    u = building.unionByName(big).withColumn("op", F.lit("union_all"))
    i = urgent.intersect(high).withColumn("op", F.lit("intersect"))
    e = all_cust.subtract(urgent).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e).orderBy("op", "custkey")


Q12_SQL = """
SELECT 'union_all' AS op, custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000)
UNION ALL
SELECT 'intersect' AS op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH')
UNION ALL
SELECT 'except' AS op, custkey FROM (
  SELECT c_custkey AS custkey FROM customer
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY op, custkey
"""

# --- Q13 string pipeline: clean/tokenize/count (O6,O7,O8) ------------------

def q13_tokenize_count(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rank import ranked

    docs = parallel_table(spark, sf, "documents")
    toks = docs.select(F.explode(tokens_array("text")).alias("token"))
    counted = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return ranked(counted, "token", limit=100).orderBy("rank")


Q13_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(
           regexp_replace(lower(text), '[^a-zA-Z ]', ' ', 'g'), '\\s+')) AS token
  FROM documents
), kept AS (SELECT token FROM toks WHERE length(token) > 0),
c AS (SELECT token, count(*) AS cnt FROM kept GROUP BY token)
SELECT token, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank
FROM c ORDER BY rank LIMIT 100
"""

# --- Q14 StockCount analogue (O10-O15 full pipeline) -----------------------

def q14_stock_count_analogue(spark: SparkSession, sf: str) -> DataFrame:
    """Reference job 1 shape on the oracle tables: frequency of a
    categorical column, rank, formatted '<rank>: <key>, <cnt>' line
    (StockCount.java:63). Full ranked output — the rank comes from the
    bucketed row_number construction (no SinglePartition window even
    over a billion-key table, round 5)."""
    from ..operators.rank import ranked as _ranked

    p = table(spark, sf, "part")
    counted = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = _ranked(counted, "p_brand")
    return ranked.select(
        "rank",
        "p_brand",
        "cnt",
        F.concat(
            F.col("rank").cast("string"),
            F.lit(": "),
            F.col("p_brand"),
            F.lit(", "),
            F.col("cnt").cast("string"),
        ).alias("line"),
    ).orderBy("rank")


Q14_SQL = """
WITH c AS (SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand),
r AS (SELECT p_brand, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, p_brand) AS INTEGER) AS rank
      FROM c)
SELECT rank, p_brand, cnt,
       CAST(rank AS VARCHAR) || ': ' || p_brand || ', ' || CAST(cnt AS VARCHAR) AS line
FROM r ORDER BY rank
"""

# --- Q15 WordCount analogue (adds O9 stop-word anti-join + O14 top-100) ----

def q15_word_count_analogue(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rank import ranked

    docs = parallel_table(spark, sf, "documents")
    toks = docs.select(F.explode(tokens_array("text")).alias("token"))
    kept = remove_stopwords(toks, stopwords_df(spark))
    counted = kept.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return ranked(counted, "token", limit=100).orderBy("rank")


Q15_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(
           regexp_replace(lower(text), '[^a-zA-Z ]', ' ', 'g'), '\\s+')) AS token
  FROM documents
), kept AS (
  SELECT token FROM toks
  WHERE length(token) > 0 AND token NOT IN ({_stopword_in_list()})
), c AS (SELECT token, count(*) AS cnt FROM kept GROUP BY token)
SELECT token, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank
FROM c ORDER BY rank LIMIT 100
"""

# --- Q16 rollup + grouping id ----------------------------------------------

def q16_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Rollup + grouping id, with a post-aggregation HAVING filter
    (q20_having folded in here in round 5: ``n_cust > 50`` drops the
    under-populated nation-level rows while every region/total row
    survives — the filter does real work at every SF; the freed
    registry slot went to x25_line_dedup)."""
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    rolled = joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.grouping_id().cast("int").alias("gid"),
    ).filter(F.col("n_cust") > 50)
    return rolled.select(
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        "n_cust",
        "sum_bal",
        "gid",
    ).orderBy("gid", "r_name", "n_name")


Q16_SQL = """
SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
       count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal,
       CAST(grouping_id(r_name, n_name) AS INTEGER) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
HAVING count(*) > 50
ORDER BY gid, r_name, n_name
"""

# --- Q17 date/time functions ------------------------------------------------

# q17_date_functions was consolidated into q33_math_date_functions
# (plans/advanced.py) in round 4 — date_trunc/year now appear there as
# scalar columns, and the month-grouped aggregation shape it also carried
# is covered by q02/q16/q21. The freed registry slot (driver caps the
# registry at 50) went to x23_merge_diff (incremental-maintenance trio).

# --- Q18 conditional aggregation -------------------------------------------

# q18_conditional_agg was consolidated into q19_large_join in round 5:
# the CASE-WHEN conditional aggregates (returned revenue / returned
# count) now compute there over o_orderpriority groups, where every
# group mixes return flags so the conditionals stay non-degenerate
# (folding into q02 — already grouped BY l_returnflag — would have made
# the CASE all-or-nothing per group). The freed registry slot (driver
# caps the registry at 50) went to x29_token_divergence
# (plans/extensions.py).

# --- Q19 large-large join (sort-merge scale path) + conditional agg --------

def q19_large_join(spark: SparkSession, sf: str) -> DataFrame:
    """lineitem ⋈ orders on orderkey: both sides large → Catalyst picks
    sort-merge (or shuffled hash under AQE); co-partitioned on the join
    key. The aggregate set includes q18's folded-in conditional
    aggregates (CASE-filtered sum/count alongside plain ones — the
    partial/final plan carries them in the same exchange)."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    returned = F.col("l_returnflag") == "R"
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(
                    F.when(
                        returned,
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("returned_rev"),
            F.sum(F.when(returned, 1).otherwise(0))
            .cast("bigint")
            .alias("n_returned"),
        )
        .orderBy("o_orderpriority")
    )


Q19_SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items,
       round(sum(CASE WHEN l_returnflag = 'R'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
         AS returned_rev,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# --- Q20 post-aggregation filter (HAVING) ----------------------------------

# q20_having was consolidated into q16_rollup in round 5: the post-
# aggregation filter (HAVING) now runs there over the rollup output,
# where it drops real rows at every SF. The freed registry slot (driver
# caps the registry at 50) went to x25_line_dedup (plans/extensions.py).

# --- Q21 time windows: tumbling + sliding (streaming analogue) -------------

def q21_time_windows(spark: SparkSession, sf: str) -> DataFrame:
    """F.window(ts, ...) — the same expressions Structured Streaming uses;
    batch mode makes them oracle-checkable (epoch-aligned buckets). One
    tagged result covers both the tumbling (5 min) and sliding
    (10 min / 5 min hop → each event lands in 2 buckets) shapes."""
    e = table(spark, sf, "events")

    def agg_windows(win, tag: str) -> DataFrame:
        return (
            e.groupBy(win.alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                F.lit(tag).alias("win_type"),
                F.col("w.start").alias("bucket_start"),
                "n_events",
                "sum_value",
            )
        )

    tumbling = agg_windows(F.window("ts", "5 minutes"), "tumbling_5m")
    sliding = agg_windows(
        F.window("ts", "10 minutes", "5 minutes"), "sliding_10m_5m"
    )
    return tumbling.unionByName(sliding).orderBy("win_type", "bucket_start")


Q21_SQL = """
SELECT 'tumbling_5m' AS win_type,
       make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)
         AS bucket_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 2
UNION ALL
SELECT 'sliding_10m_5m' AS win_type, bucket_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM (
  SELECT unnest([
    make_timestamp((CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - 300) * 1000000),
    make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000)
  ]) AS bucket_start, value
  FROM events)
GROUP BY bucket_start
ORDER BY win_type, bucket_start
"""

# --- Q22 deterministic dedup -----------------------------------------------

def q22_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """dropDuplicates with a *deterministic* survivor: first row per
    (user_id, event_type) under (ts, event_id) order — reproducible where
    dropDuplicates is arbitrary."""
    from ..operators.dedup import exact_dedup

    e = table(spark, sf, "events")
    return (
        exact_dedup(e, ["user_id", "event_type"], ["ts", "event_id"])
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    )


Q22_SQL = """
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id, event_type
"""


CORE_QUERIES: dict[str, QuerySpec] = {
    "q01_filter_project": QuerySpec(q01_filter_project, Q01_SQL),
    "q02_group_agg": QuerySpec(q02_group_agg, Q02_SQL),
    "q03_topk_rank": QuerySpec(q03_topk_rank, Q03_SQL),
    "q04_join_inner_agg": QuerySpec(q04_join_inner_agg, Q04_SQL),
    "q05_join_broadcast_dim": QuerySpec(q05_join_broadcast_dim, Q05_SQL),
    "q06_join_left_outer": QuerySpec(q06_join_left_outer, Q06_SQL),
    "q07_join_semi_anti": QuerySpec(q07_join_semi_anti, Q07_SQL),
    "q09_window_partitioned": QuerySpec(q09_window_partitioned, Q09_SQL),
    "q10_window_functions": QuerySpec(q10_window_functions, Q10_SQL),
    "q12_set_ops": QuerySpec(q12_set_ops, Q12_SQL),
    "q13_tokenize_count": QuerySpec(q13_tokenize_count, Q13_SQL),
    "q14_stock_count_analogue": QuerySpec(q14_stock_count_analogue, Q14_SQL),
    "q15_word_count_analogue": QuerySpec(q15_word_count_analogue, Q15_SQL),
    "q16_rollup": QuerySpec(q16_rollup, Q16_SQL),
    "q19_large_join": QuerySpec(q19_large_join, Q19_SQL),
    "q21_time_windows": QuerySpec(q21_time_windows, Q21_SQL),
    "q22_dedup": QuerySpec(q22_dedup, Q22_SQL),
}
