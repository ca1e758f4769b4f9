"""Result-comparison helpers shared by scripts/check_oracle.py and the
oracle-parity tests: canonicalize pandas frames (column order, row order,
float rounding, timestamp normalization) and diff them the way the
driver's order-insensitive value-hash does.

Type-kind checking: pandas alone cannot distinguish DuckDB DATE from
TIMESTAMP (``fetchdf`` collapses both to datetime64), which masked a real
driver hash-fail (q33, round 1). The engines' own schemas can: callers
pass ``spark_type_kinds(df.schema)`` / ``arrow_type_kinds(rel.arrow().
schema)`` and ``compare`` flags hazardous combinations.

The driver's empirically-observed date canonicalization is ASYMMETRIC
(round-1 evidence): q17 — Spark TIMESTAMP vs oracle DATE — hash-matched,
while q33 — Spark DATE vs oracle TIMESTAMP — hash-failed. That is exactly
the fetchdf behavior on the oracle side (DATE → datetime64 midnight)
combined with plain toPandas on the Spark side (DATE → datetime.date
object, which never hash-equals a Timestamp). Encoded rule:

- Spark-side DATE output is ALWAYS flagged (cast to timestamp instead);
- oracle-side DATE vs Spark TIMESTAMP is fine;
- any other kind mismatch is flagged.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd


def spark_type_kinds(schema) -> dict[str, str]:
    """Coarse type kind per column from a Spark schema."""
    from pyspark.sql import types as T

    kinds = {}
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, T.DateType):
            k = "date"
        elif isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            k = "timestamp"
        elif isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            k = "int"
        elif isinstance(t, (T.FloatType, T.DoubleType)):
            k = "float"
        elif isinstance(t, T.DecimalType):
            k = "decimal"
        elif isinstance(t, T.StringType):
            k = "str"
        elif isinstance(t, T.BooleanType):
            k = "bool"
        elif isinstance(t, T.ArrayType):
            k = "list"
        elif isinstance(t, T.BinaryType):
            k = "bin"
        else:
            k = "other"
        kinds[f.name] = k
    return kinds


def arrow_type_kinds(schema) -> dict[str, str]:
    """Coarse type kind per column from a pyarrow schema (DuckDB
    ``rel.arrow()`` preserves DATE vs TIMESTAMP where fetchdf does not)."""
    import pyarrow as pa

    kinds = {}
    for f in schema:
        t = f.type
        if pa.types.is_date(t):
            k = "date"
        elif pa.types.is_timestamp(t):
            k = "timestamp"
        elif pa.types.is_integer(t):
            k = "int"
        elif pa.types.is_floating(t):
            k = "float"
        elif pa.types.is_decimal(t):
            k = "decimal"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            k = "str"
        elif pa.types.is_boolean(t):
            k = "bool"
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            k = "list"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            k = "bin"
        else:
            k = "other"
        kinds[f.name] = k
    return kinds


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and all(
                isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                for v in sample.head(5)
            ):
                # arrow date32 → datetime.date objects; widen to datetime64
                # (the fetchdf representation the driver's oracle side uses)
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(
                    lambda v: tuple(np.asarray(v).tolist())
                    if isinstance(v, (list, np.ndarray))
                    else v
                )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(
    sdf: pd.DataFrame,
    odf: pd.DataFrame,
    spark_kinds: dict[str, str] | None = None,
    oracle_kinds: dict[str, str] | None = None,
) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    if spark_kinds is not None and oracle_kinds is not None:
        for c in sorted(sdf.columns):
            sk, ok = spark_kinds.get(c), oracle_kinds.get(c)
            if sk == "date":
                problems.append(
                    f"col {c}: Spark DATE output (driver keeps Spark dates as "
                    "datetime.date but widens oracle dates to timestamps — "
                    "cast the Spark column to timestamp)"
                )
            elif sk != ok and not (sk == "timestamp" and ok == "date"):
                problems.append(f"col {c}: type kind spark={sk} oracle={ok}")
    s, o = canon(sdf), canon(odf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                # EXACT bit equality, not isclose: the driver's value hash is
                # sensitive to last-ULP libm divergence (round-2 q33 evidence:
                # pow() differed by 1 ULP on one row and hash-failed while the
                # old rtol=1e-9 check here passed). Hash-matched queries must
                # only emit floats from correctly-rounded IEEE ops (+ - * /
                # sqrt fma) so exact equality is achievable.
                bad = (a.fillna(1e300).values != b.fillna(1e300).values)
            else:
                bad = ~(a.fillna("<NULL>") == b.fillna("<NULL>")).values
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                )
    return problems
