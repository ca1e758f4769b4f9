"""Mergeable sketch artifacts (Apache DataSketches HLL via Spark 4
builtins): incremental distinct-counting where day N's cost is day N's
data, never a rescan of history.

``count_distinct`` over 100 TB is exact but unrepeatable — every
dashboard refresh, backfill, or rolling-window query pays the full
scan again. An HLL sketch is a tiny (~KB) MERGEABLE summary: build one
per (group, period) as data lands, persist the sketch BYTES as an
artifact table, and answer any later union-of-periods question by
merging sketches — the same pattern as the streaming ingest indexes
(history never re-read), applied to analytics. Merge is exact over the
sketch algebra: union-of-sketches == sketch-of-union by construction,
so an incrementally maintained artifact answers identically to a
from-scratch build (property-pinned in tests).

Scale shape: ``hll_sketch_agg`` partially aggregates map-side (the
shuffle carries one sketch per partition per group, never raw values);
the artifact table is (groups x periods) rows of KB-sized binary —
reading it back for a merge costs KBs where the raw data cost TBs.
DuckDB cannot parse DataSketches bytes, so cross-engine verification
uses the x16 tolerance contract: exact count alongside the estimate
with a relative-error bound assert (HLL with lgK=12 is ±~2.5% at 3σ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .membership import bloom_positions

DEFAULT_LGK = 12  # 2^12 registers: ~1.6% RSE, ~2.5 KB per sketch


def distinct_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group —
    the artifact-build step. Output: group_cols + ``sketch`` (binary)
    + ``n_rows`` (exact row count, free at agg time and useful for
    artifact sanity checks)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk)).alias(
            "sketch"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Collapse an artifact table over the grouping you still care
    about (e.g. drop the period column to union all periods): output
    group_cols + ``distinct_estimate`` (+ summed n_rows). The rows
    merged here are KB-sized sketches — this is the query that replaces
    a full-history rescan."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate("sketch").cast("bigint").alias(
            "distinct_estimate"
        ),
        "n_rows",
    )


def upsert_sketches(
    existing: DataFrame | None,
    incoming: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Fold a new period's sketches into a persisted artifact table:
    groups present in both merge (``hll_union``), new groups append.
    Pair with ``sources/versioned.write_table_version`` for an
    atomically-published, time-travelable artifact history."""
    if existing is None:
        return incoming
    both = existing.select(
        *group_cols,
        F.col("sketch").alias("_old"),
        F.col("n_rows").alias("_old_n"),
    ).join(incoming, group_cols, "full_outer")
    return both.select(
        *group_cols,
        F.when(
            F.col("_old").isNotNull() & F.col("sketch").isNotNull(),
            F.hll_union("_old", "sketch"),
        )
        .otherwise(F.coalesce("sketch", "_old"))
        .alias("sketch"),
        (
            F.coalesce(F.col("_old_n"), F.lit(0))
            + F.coalesce(F.col("n_rows"), F.lit(0))
        ).alias("n_rows"),
    )


# --- Count-Min frequency sketches (portable, exactly mergeable) -------------
#
# The frequency-side sibling of the HLL artifacts above: HLL answers
# "how many DISTINCT values", a Count-Min sketch answers "how often is
# THIS value" from a depth x width counter table that is bounded by
# the (depth, width) YOU chose, never by the vocabulary. Where the HLL
# bytes are opaque DataSketches state, this CMS is built from the same
# salted-md5 position primitive as the Bloom gate
# (membership.bloom_positions), so DuckDB re-derives the entire
# counter table AND every estimate bit-for-bit — the strongest pin the
# sketch family has. Counters ADD, so sketches merge exactly:
# cms_merge(build(A), build(B)) == build(A UNION ALL B) row-for-row
# (pinned), which makes per-period CMS artifacts fold like the HLL
# ones and pair with sources/versioned.py history.
#
# Guarantees: estimate >= true count always (only hash collisions
# inflate, never deflate — pinned against an exact census); overshoot
# <= e/width * total_count with probability 1 - e^-depth.
#
# Scale shape: build is one posexplode(depth) + count census whose
# groupBy(d, w) partially aggregates map-side — the shuffle carries at
# most depth x width rows per partition however hot a value is (the
# same two-level absorption as the line-dedup census); estimate joins
# the probe set against a depth*width-bounded build side (AQE
# broadcasts it at the defaults: 4 x 4096 cells).

DEFAULT_CMS_DEPTH = 4  # P(overshoot > eps*N) <= e^-4 ~ 1.8%
DEFAULT_CMS_WIDTH = 1 << 12  # eps = e/4096 ~ 0.066% of total count


def cms_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_CMS_DEPTH,
    width: int = DEFAULT_CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Sparse CMS counter table per group: group_cols + (d, w, cnt),
    ≤ depth·min(width, #distinct) rows per group. One row of input
    lands in exactly one w per d (depth salted hashes mod width)."""
    group_cols = list(group_cols or [])
    cells = df.select(
        *group_cols,
        F.posexplode(
            F.array(*bloom_positions(value_col, width, depth, salt))
        ).alias("d", "w"),
    )
    return cells.groupBy(*group_cols, "d", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold two counter tables built with the same (depth, width,
    salt): counters add, so this is EXACTLY build-of-union (pinned) —
    use it as the upsert for per-period CMS artifacts (a fresh period
    is just ``cms_merge(existing, incoming)``)."""
    group_cols = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_CMS_DEPTH,
    width: int = DEFAULT_CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Frequency upper-bound per probe value: min over the depth
    counters (absent cell = 0). Output: group_cols + value_col +
    ``freq_estimate``. The join's build side is the depth·width-bounded
    sketch — broadcastable at any corpus size."""
    group_cols = list(group_cols or [])
    p = probes.select(
        *group_cols,
        value_col,
        F.posexplode(
            F.array(*bloom_positions(value_col, width, depth, salt))
        ).alias("d", "w"),
    )
    joined = p.join(cms, [*group_cols, "d", "w"], "left")
    return joined.groupBy(*group_cols, value_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("freq_estimate")
    )


# --- HDR-style quantile sketches (log2-bucketed, exactly mergeable) ----------
#
# The quantile-side third leg of the artifact family: HLL answers "how
# many DISTINCT", CMS answers "how often is THIS value", this answers
# "what is the p99" — from a bucket-count table bounded by the chosen
# precision, never by the data. Buckets are HdrHistogram-shaped: keep
# the top ``prec_bits`` bits of the value's magnitude (bucket width
# 2^(msb-prec), i.e. relative error < 2^(1-prec) — ~0.8% at the
# default 8 bits), derived with INTEGER ops only (msb = length of the
# binary string — no libm, no floats), so DuckDB re-derives the entire
# bucket table AND every quantile answer bit-for-bit, the same
# strongest-pin contract as the CMS. Counts ADD, so sketches merge
# exactly: qsk_merge(build(A), build(B)) == build(A UNION ALL B)
# row-for-row (pinned), making per-period quantile artifacts fold like
# the HLL/CMS ones and pair with sources/versioned.py history.
#
# Contract: values are integer-valued measures (token counts, byte
# sizes, latencies — cast to BIGINT; fixed-point-scale fractional
# measures first, e.g. round(quality*1e6)). NULLs are dropped (an
# unrankable row, token_budget_filter's convention); |v| = 2^63-1 is
# the magnitude ceiling (LONG_MIN would overflow abs() and ANSI mode
# fails loudly rather than mis-bucketing).
#
# Scale shape: build is one projection + count census whose
# groupBy(qb) partially aggregates map-side — the shuffle carries at
# most #buckets rows per partition (≤ 63·2^(prec-1) + 1 per sign —
# ~8 K cells at prec 8) however many rows share a bucket; quantile
# queries run windows over the KB-sized sketch, never the corpus.

DEFAULT_QSK_PREC_BITS = 8  # bucket width 2^(msb-8): <0.8% relative error


def _qsk_bucket(prec_bits: int) -> Column:
    """Signed bucket representative of ``_v``: the magnitude with all
    but its top ``prec_bits`` bits cleared, negated back for negative
    values (so qb <= v < qb + width for positives, qb - width < v <= qb
    for negatives — ordering by qb always preserves value order across
    buckets)."""
    s = f"greatest(length(bin(abs(_v))) - {prec_bits}, 0)"
    lo = f"shiftleft(shiftright(abs(_v), {s}), {s})"
    return F.expr(f"CASE WHEN _v < 0 THEN -{lo} ELSE {lo} END")


def qsk_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    prec_bits: int = DEFAULT_QSK_PREC_BITS,
) -> DataFrame:
    """Quantile-sketch bucket table per group: group_cols + (qb, cnt),
    ≤ ~2^prec_bits·63 rows per group regardless of corpus size."""
    group_cols = list(group_cols or [])
    rows = df.select(
        *group_cols, F.col(value_col).cast("bigint").alias("_v")
    ).filter(F.col("_v").isNotNull())
    return rows.select(
        *group_cols, _qsk_bucket(prec_bits).alias("qb")
    ).groupBy(*group_cols, "qb").agg(F.count(F.lit(1)).alias("cnt"))


def qsk_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold two bucket tables built with the same prec_bits: counts
    add, so this is EXACTLY build-of-union (pinned) — the upsert for
    per-period quantile artifacts."""
    group_cols = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "qb")
        .agg(F.sum("cnt").alias("cnt"))
    )


def qsk_quantiles(
    sketch: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Lower-quantile estimates per group: for each q, the bucket
    representative of the rank-⌈q·n⌉ value (q=0 → minimum bucket,
    q=1 → maximum). The estimate is the exact quantile's own bucket,
    so |estimate - true| < bucket width, i.e. relative error
    < 2^(1-prec_bits) in magnitude. Runs a cumulative window over the
    SKETCH (bucket-count-bounded — the empty-group window's
    SinglePartition is over KBs, the same post-aggregation class as a
    scalar subquery), never over the data."""
    from pyspark.sql import Window

    if not quantiles or any(not 0.0 <= q <= 1.0 for q in quantiles):
        # an out-of-range q would silently vanish from the output (its
        # rank exceeds every cumulative count) — a config error, not a
        # row to drop
        raise ValueError(
            f"qsk_quantiles: quantiles must be within [0, 1], got {quantiles}"
        )
    group_cols = list(group_cols or [])
    w_ord = Window.partitionBy(*group_cols).orderBy("qb")
    w_all = Window.partitionBy(*group_cols)
    c = sketch.withColumn("_cum", F.sum("cnt").over(w_ord)).withColumn(
        "_tot", F.sum("cnt").over(w_all)
    )
    q = F.explode(
        F.array(*[F.lit(float(x)) for x in quantiles])
    ).alias("q")
    return (
        c.select(*group_cols, "qb", "_cum", "_tot", q)
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_tot")))
        .groupBy(*group_cols, "q")
        .agg(F.min("qb").alias("quantile_estimate"))
    )
