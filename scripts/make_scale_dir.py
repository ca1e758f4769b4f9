"""Build a LARGER-corpus bench directory from sf0.1 for the round-13
scale-validation run (VERDICT r12 #6: sf0.1 is overhead-bound at 32
local threads — every 8c/32c ratio was <= 1.0 — so the overlap/interval
choices need one measurement where data, not scheduling, dominates).

The corpus tables the trainer queries scan (documents / embeddings /
events) are replicated ``factor``x with id offsets (doc_id / vec_id /
event_id shifted by copy * (max_id + 1), so ids stay unique and the
fixed query sides — event_id < 200, vec_id < 5, the lowest-id heads —
stay CONSTANT while the corpus grows, which is exactly the scaling
shape of a production corpus). The TPC-H satellite tables are copied
unchanged: duplicating dimension keys would multiply join outputs and
measure an artifact, and the q-queries are not the scale story.

Output is written OUTSIDE /root/testdata (read-only) — default
/tmp/scale/sf0.1x10 — and used only for a bench measurement; nothing
in the engine reads it outside that run.

Usage: python scripts/make_scale_dir.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICATED = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}
COPIED = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem",
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/scale/sf0.1x{factor}"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t, idc in REPLICATED.items():
        src = f"{SRC}/{t}.parquet"
        span = con.sql(
            f"SELECT max({idc}) + 1 FROM read_parquet('{src}')"
        ).fetchone()[0]
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.k * {span} AS {c}" if c == idc else c for c in cols
        )
        con.sql(
            f"""
            COPY (
              SELECT {sel}
              FROM read_parquet('{src}')
              CROSS JOIN (SELECT unnest(range({factor})) AS k) k
              ORDER BY {idc}
            ) TO '{out}/{t}.parquet' (FORMAT parquet)
            """
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out}")
    print(f"done: {out}")


if __name__ == "__main__":
    main()
