"""Semi-structured data via Spark 4 ``VariantType``: parse JSON once
into the binary variant encoding, extract typed fields by path.

The modern engine path for JSON-ish columns (API event payloads, crawl
metadata, tool logs): ``get_json_object``/``json_tuple`` re-parse the
STRING for every extraction, while a variant column parses once at scan
(or ingest) time and each ``variant_get`` is a typed path walk over the
binary encoding — the same reason warehouses grew VARIANT columns. At
100 TB the parse-once property is the difference between one and N
string-parse passes over the payload bytes; stored as parquet, variant
columns also shred into typed subcolumns on write in newer formats.

All helpers are thin, codegen-side expression builders — no Python in
the data path.

No reference counterpart (§2.2 file-format/scalar breadth).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_json_variant",
    "variant_field",
    "shred_variant",
]


def parse_json_variant(
    df: DataFrame, json_col: str, out_col: str = "variant"
) -> DataFrame:
    """Parse a JSON string column into a variant column (one parse,
    reused by every downstream extraction). Malformed JSON raises at
    parse — use ``try_parse_json`` semantics by pre-filtering or fixing
    upstream; a quarantine split belongs in the reader layer
    (``sources/readers.py``)."""
    return df.withColumn(out_col, F.parse_json(F.col(json_col)))


def variant_field(
    variant_col: Column | str, path: str, dtype: str, strict: bool = False
) -> Column:
    """Typed field extraction from a variant by JSONPath-style ``path``
    (``$.a.b[0]``). Default is ``try_variant_get`` — NULL on a missing
    path or uncastable type (the tolerant shape pipelines want);
    ``strict=True`` uses ``variant_get``, which errors instead."""
    getter = F.variant_get if strict else F.try_variant_get
    return getter(
        F.col(variant_col) if isinstance(variant_col, str) else variant_col,
        path,
        dtype,
    )


def shred_variant(
    df: DataFrame,
    variant_col: str,
    fields: dict[str, tuple[str, str]],
    keep_variant: bool = False,
) -> DataFrame:
    """Shred a variant column into typed top-level columns: ``fields``
    maps output column name → (path, spark type string). One projection,
    N path walks over the SAME parsed value — the flatten step that
    turns a semi-structured payload into relational columns for the
    rest of the engine (joins, aggregations, oracles). The variant
    column is dropped unless ``keep_variant``. An output name that
    collides with a kept column raises HERE — the select would succeed
    with duplicate names and fail with AMBIGUOUS_REFERENCE far from the
    cause on first use."""
    cols = [c for c in df.columns if c != variant_col or keep_variant]
    clash = set(fields) & set(cols)
    if clash:
        raise ValueError(
            f"shred_variant: output names {sorted(clash)} collide with "
            "existing columns — rename the field or drop the column first"
        )
    extracted = [
        variant_field(variant_col, path, dtype).alias(name)
        for name, (path, dtype) in fields.items()
    ]
    return df.select(*cols, *extracted)
