"""Result-comparison helpers shared by scripts/check_oracle.py and the
oracle-parity tests: canonicalize pandas frames (column order, row order,
float rounding, timestamp normalization) and diff them the way the
driver's order-insensitive value-hash does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(np.asarray(v).tolist())
                if isinstance(v, (list, np.ndarray))
                else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    s, o = canon(sdf), canon(odf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                bad = ~(
                    np.isclose(
                        a.fillna(1e300), b.fillna(1e300), rtol=1e-9, atol=1e-9
                    )
                )
            else:
                bad = ~(a.fillna("<NULL>") == b.fillna("<NULL>")).values
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                )
    return problems
