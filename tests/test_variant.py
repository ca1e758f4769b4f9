"""Spark 4 VariantType path: parse-once JSON, typed extraction, shred —
values pinned against DuckDB's JSON extraction on the same strings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_stockheadlines_spark.functions.variant import (
    parse_json_variant,
    shred_variant,
    variant_field,
)

ROWS = [
    (1, '{"user": {"id": 7, "name": "ada"}, "tags": ["x", "y"], "score": 1.5}'),
    (2, '{"user": {"id": 9, "name": "bob"}, "tags": [], "score": 2}'),
    (3, '{"user": {"id": 11}, "extra": true}'),
]


def _parsed(spark):
    df = spark.createDataFrame(ROWS, "event_id long, payload string")
    return parse_json_variant(df, "payload")


def test_variant_extraction_matches_duckdb(spark):
    v = _parsed(spark)
    got = {
        r.event_id: (r.uid, r.uname, r.score, r.tag0)
        for r in v.select(
            "event_id",
            variant_field("variant", "$.user.id", "long").alias("uid"),
            variant_field("variant", "$.user.name", "string").alias("uname"),
            variant_field("variant", "$.score", "double").alias("score"),
            variant_field("variant", "$.tags[0]", "string").alias("tag0"),
        ).collect()
    }
    con = duckdb.connect()
    want = {
        eid: tuple(rest)
        for eid, *rest in con.execute(
            """
            SELECT v.event_id,
                   CAST(json_extract(payload, '$.user.id') AS BIGINT),
                   json_extract_string(payload, '$.user.name'),
                   CAST(json_extract(payload, '$.score') AS DOUBLE),
                   json_extract_string(payload, '$.tags[0]')
            FROM (VALUES """
            + ", ".join(f"({i}, '{p}')" for i, p in ROWS)
            + ") v(event_id, payload)"
        ).fetchall()
    }
    assert got == want
    assert got[3] == (11, None, None, None)  # missing paths -> NULL


def test_variant_parse_once_then_shred(spark):
    v = _parsed(spark)
    out = shred_variant(
        v.drop("payload"),
        "variant",
        {
            "uid": ("$.user.id", "long"),
            "n_tags": ("$.tags", "array<string>"),
        },
    )
    assert set(out.columns) == {"event_id", "uid", "n_tags"}
    rows = {r.event_id: r for r in out.collect()}
    assert rows[1].uid == 7 and rows[1].n_tags == ["x", "y"]
    assert rows[2].n_tags == []
    assert rows[3].n_tags is None
    # keep_variant retains the parsed column for further extraction
    kept = shred_variant(
        v.drop("payload"), "variant", {"uid": ("$.user.id", "long")},
        keep_variant=True,
    )
    assert "variant" in kept.columns


def test_variant_strict_vs_tolerant(spark):
    v = _parsed(spark)
    # tolerant: uncastable (object -> long) is NULL
    tol = v.select(
        variant_field("variant", "$.user", "long").alias("bad")
    ).collect()
    assert all(r.bad is None for r in tol)
    # strict: same extraction raises
    with pytest.raises(Exception):
        v.select(
            variant_field("variant", "$.user", "long", strict=True).alias("bad")
        ).collect()


def test_shred_variant_rejects_column_collision(spark):
    v = _parsed(spark)
    with pytest.raises(ValueError, match="collide"):
        shred_variant(v, "variant", {"event_id": ("$.user.id", "long")})
