"""Stage-materialized, resumable pipeline execution.

A 100 TB curation run is hours of cluster time across dozens of
stages; Spark's lineage recovery covers task and executor loss WITHIN
a job, but a driver crash, a preemption, or a config fix at stage 25
restarts the APPLICATION — and without materialization that means
redoing stages 1-24. ``run_staged`` gives the cross-job half of fault
tolerance: each stage's output is written to parquet exactly once,
stamped with a config fingerprint, and skipped on re-run while the
fingerprint chain still matches.

Invalidation is by CONTENT OF CONFIGURATION, not by mtime: every stage
is stamped with ``sha256(stage_name : stage_token : upstream_stamp)``,
so editing stage k's parameters (its ``token``) invalidates k and
everything downstream — never the finished prefix — and a stamp can
never falsely match across reordered or renamed stages. Output commit
is write-to-temp + atomic rename (the versioned-table publish idea at
directory granularity): a stage killed mid-write leaves a ``.tmp-``
directory that the next run sweeps, never a half-directory that the
next run mistakes for done.

This composes with, not replaces, ``jobs/pipeline.py``: curate() is a
lazy plan and stays one; wrap the expensive cut points (post-dedup,
post-gates, post-encode) as stages when restartability is worth the
extra materialized copies.

Storage note (same contract as the manifest sink): stamps and renames
use driver-local ``os`` calls, so ``base_dir`` must be a shared mount
on a real cluster; an object-store deployment swaps the stamp IO and
rename for its atomic-commit primitive (e.g. conditional put) — the
stamp-chain logic is storage-agnostic.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

STAMP = "_STAGE.json"


def _stamp_of(name: str, token: str, upstream: str) -> str:
    return hashlib.sha256(
        f"{name}:{token}:{upstream}".encode()
    ).hexdigest()


def _sweep_tmp(base_dir: str) -> None:
    for entry in os.listdir(base_dir) if os.path.isdir(base_dir) else []:
        # prefix match only: a committed stage dir is '{i:02d}-{name}'
        # and a stage NAME may legally contain '.tmp-' — substring
        # matching would sweep its committed output
        if entry.startswith(".tmp-"):
            shutil.rmtree(os.path.join(base_dir, entry), ignore_errors=True)


def run_staged(
    spark: SparkSession,
    stages: list[tuple[str, str, Callable[[SparkSession, DataFrame | None], DataFrame]]],
    base_dir: str,
) -> DataFrame:
    """Run ``stages`` — ordered ``(name, token, fn)`` triples where
    ``fn(spark, prev_df)`` builds the stage's output from the previous
    stage's (``None`` for the first) — materializing each to
    ``{base_dir}/{i:02d}-{name}`` and skipping stages whose stamp chain
    is already on disk. ``token`` is the stage's config fingerprint
    (serialize the parameters that change its OUTPUT — e.g.
    ``json.dumps(args, sort_keys=True)``); stamps chain, so a token
    change reruns that stage and all downstream, and completed upstream
    stages are read back, not recomputed. Returns the final stage's
    DataFrame (read from its materialized parquet — the restart path
    and the straight-through path hand downstream code the same thing).
    """
    names = [s[0] for s in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    os.makedirs(base_dir, exist_ok=True)
    _sweep_tmp(base_dir)
    upstream = ""
    prev: DataFrame | None = None
    for i, (name, token, fn) in enumerate(stages):
        if "/" in name:
            raise ValueError(f"stage name may not contain '/': {name!r}")
        stamp = _stamp_of(name, str(token), upstream)
        out_dir = os.path.join(base_dir, f"{i:02d}-{name}")
        stamp_path = os.path.join(out_dir, STAMP)
        done = False
        if os.path.exists(stamp_path):
            with open(stamp_path) as f:
                meta = json.load(f)
            if meta.get("stamp") == stamp:
                done = True
            else:
                # config (or upstream) changed: this output is stale.
                # Remove it eagerly — a stale directory that survives
                # until a later crash could be mistaken for current.
                shutil.rmtree(out_dir)
        elif os.path.exists(out_dir):
            shutil.rmtree(out_dir)  # dir without stamp = torn legacy write
        if not done:
            result = fn(spark, prev)
            tmp = os.path.join(base_dir, f".tmp-{uuid.uuid4().hex}")
            # parquet first, stamp second, rename last: the stamp is
            # inside the renamed dir, so "stamp readable" implies
            # "data complete" under any crash point
            result.write.parquet(os.path.join(tmp, "data"))
            with open(os.path.join(tmp, STAMP), "w") as f:
                json.dump({"stamp": stamp, "name": name, "index": i}, f)
            os.rename(tmp, out_dir)
        prev = spark.read.parquet(os.path.join(out_dir, "data"))
        upstream = stamp
    if prev is None:
        raise ValueError("run_staged needs at least one stage")
    return prev
