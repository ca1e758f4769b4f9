"""Stream-stream joins (§2.2 streaming extension).

Two unbounded sides buffered in state: watermarks on BOTH sides plus an
event-time range bound in the join condition let Spark evict matched/
expired state — without them a stream-stream join's state grows without
limit. The transformation is the streaming twin of the batch bucketed
range join (operators/temporal.py, q24): purchases joined to the clicks
that follow within the attribution window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    window_sql: str = "INTERVAL 4 HOURS",
) -> DataFrame:
    """Inner stream-stream join: same-user clicks in [purchase_ts,
    purchase_ts + window). Both inputs must be streaming frames with an
    event-time ``ts`` column; output is append-mode only (a match is
    final once both watermarks pass it)."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            f"""
            c_user_id = p_user_id AND
            click_ts >= purchase_ts AND
            click_ts < purchase_ts + {window_sql}
            """
        ),
    ).select("p_user_id", "purchase_id", "click_id", "purchase_ts", "click_ts")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension table.

    The static side is re-read per micro-batch (picking up dimension
    updates) and needs no watermark — only stream-stream joins buffer
    state. Broadcast the dim side explicitly: at scale the dimension is
    orders of magnitude smaller than the stream, and a shuffle join would
    re-partition every micro-batch."""
    return stream.join(F.broadcast(dim), key, "left")
