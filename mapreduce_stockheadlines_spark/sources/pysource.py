"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a synthetic analyst-headlines connector, batch + streaming.

The reference's only source is a CSV on HDFS
(/root/reference/src/StockCount.java:80); real deployments also pull
from APIs/feeds Spark has no built-in connector for. Spark 4's Python
DataSource API is the idiomatic extension point — this module
implements it end to end:

- **batch**: ``spark.read.format("headlines").option("rows", N)`` —
  the reader plans ``numPartitions`` independent ``InputPartition``
  splits, so generation (in production: API page fetches) fans out
  across executors instead of funneling through the driver;
- **streaming**: ``spark.readStream.format("headlines")`` — a
  micro-batch ``DataSourceStreamReader`` with monotone integer offsets
  (``rowsPerBatch`` per trigger), the shape any cursor/offset-based
  feed adapter takes.

Rows are a pure function of their index (md5-seeded picks — no RNG
state), so any split plan, retry, or speculative re-read yields
identical data: the same determinism contract as operators/sampling.
The generated schema mirrors the reference's ``analyst_ratings.csv``
(id, headline, date, stock), so the parity jobs run on it unchanged.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "id long, headline string, date string, stock string"

_TICKERS = (
    "AAPL", "MSFT", "GOOG", "AMZN", "TSLA", "NVDA", "META", "NFLX",
    "AMD", "INTC", "GLD", "MS",
)
_SUBJECTS = (
    "markets", "tech stocks", "the fed", "oil prices", "gold",
    "retail sales", "housing", "earnings", "the dollar", "treasuries",
)
_VERBS = (
    "rally", "slump", "surge", "steady", "climb", "dip", "rebound",
    "stall", "soar", "slide",
)
_TAILS = (
    "as investors weigh outlook", "after earnings beat", "on rate fears",
    "amid strong demand", "despite weak guidance", "to record highs",
    "as volatility returns", "on upbeat data",
)


def _pick(seq: Sequence[str], digest: bytes, slot: int) -> str:
    return seq[digest[slot] % len(seq)]


def _row(i: int) -> tuple[int, str, str, str]:
    """Row ``i`` of the synthetic feed — a pure function of ``i``."""
    import datetime as _dt

    d = hashlib.md5(f"headline:{i}".encode()).digest()
    headline = (
        f"{_pick(_SUBJECTS, d, 0)} {_pick(_VERBS, d, 1)} "
        f"{_pick(_TAILS, d, 2)}"
    )
    # real calendar arithmetic: a naive 31-day-month grid fabricates
    # dates like 2020-02-30 that to_date() nulls (or ANSI mode rejects)
    day = (d[3] | (d[4] << 8)) % 366  # 2020 is a leap year
    date = (_dt.date(2020, 1, 1) + _dt.timedelta(days=day)).isoformat()
    return i, headline, date, _pick(_TICKERS, d, 5)


class _Batch(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class HeadlinesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self) -> list[InputPartition]:
        """Split the row range into independent generation tasks — the
        connector-side analogue of file splits: parallelism is planned
        here, not recovered by a repartition after a driver read."""
        n, p = self.n_rows, max(1, self.n_parts)
        bounds = [n * i // p for i in range(p + 1)]
        return [
            _Batch(bounds[i], bounds[i + 1])
            for i in range(p)
            if bounds[i] < bounds[i + 1]
        ]

    def read(self, partition: _Batch) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class HeadlinesStreamReader(DataSourceStreamReader):
    """Monotone integer offsets, ``rowsPerBatch`` rows per trigger —
    the cursor-based feed adapter shape. Offsets are JSON dicts per the
    API contract; ``commit`` is a no-op because rows are recomputable
    from their index (replay-safe by construction)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 10**9))
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._pos = min(self._pos + self.rows_per_batch, self.max_rows)
        return {"index": self._pos}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # restart recovery, part 1: planning (including the re-execution
        # of the last uncommitted batch) is the first call that shows a
        # fresh reader instance the checkpointed offsets — adopt them so
        # a later latestOffset() can never regress below a planned end.
        # (The Python runner protocol never invokes deserializeOffset —
        # offsets cross the wire as plain json.loads — so recovery MUST
        # ride on partitions()/commit().) The max() guard also no-ops a
        # batch whose logged end regressed before this fix existed.
        self._pos = max(self._pos, start["index"], end["index"])
        return [_Batch(start["index"], max(start["index"], end["index"]))]

    def read(self, partition: _Batch) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        # restart recovery, part 2: adopt committed positions too
        self._pos = max(self._pos, end["index"])




class HeadlinesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "headlines"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> HeadlinesReader:
        return HeadlinesReader(self.options)

    def streamReader(self, schema) -> HeadlinesStreamReader:
        return HeadlinesStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('headlines')``."""
    spark.dataSource.register(HeadlinesDataSource)


# --- manifest-committing JSONL sink (custom Python DataSourceWriter) ---------
#
# Spark's built-in file sinks publish files as tasks finish; a reader
# listing the directory mid-job (or after a failed job) sees partial
# output. This writer demonstrates the OTHER half of the Python
# DataSource API — the two-phase commit protocol: tasks write shards and
# return commit messages, the DRIVER publishes a _MANIFEST.json naming
# exactly the committed shards in one atomic rename, and readers that go
# through the manifest never observe a torn write. (The same protocol
# slot would carry idempotency keys for an external API sink.)
#
# Storage note: tasks open plain ``open()`` paths, so shard files land
# on the filesystem VISIBLE TO THE EXECUTOR — correct on local[...] and
# on any shared mount (NFS/FUSE-S3); on a real cluster with only object
# storage, swap the two ``open`` calls for an fsspec/boto put of the
# same paths — the commit protocol (shard messages → driver manifest)
# is unchanged, which is the part this module exists to demonstrate.

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmpname: str
    filename: str
    n_rows: int


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _ShardCommit:
        import os

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        # attempt-UNIQUE temp file: with speculation (or a zombie first
        # attempt still flushing while its retry runs) two attempts of
        # one partition must never interleave writes into one file — the
        # driver settles exactly ONE blessed attempt per partition at
        # commit time via atomic rename
        tmpname = f".part-{pid:05d}-attempt{tc.taskAttemptId()}.tmp"
        name = f"part-{pid:05d}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, tmpname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ShardCommit(tmpname=tmpname, filename=name, n_rows=n)

    def commit(self, messages) -> None:
        import os

        # settle shards first (rename is atomic on one filesystem), then
        # publish the manifest naming exactly the settled files
        for m in messages:
            os.replace(
                os.path.join(self.path, m.tmpname),
                os.path.join(self.path, m.filename),
            )
        manifest = {
            "shards": sorted(m.filename for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        tmp = os.path.join(self.path, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.tmpname))
            except OSError:
                pass


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        return JsonlManifestWriter(self.options)


def read_manifest(spark, path: str):
    """Read ONLY the shards the manifest committed — uncommitted or
    leftover files in the directory are invisible, which is the entire
    point of the two-phase publish."""
    import json as _json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    shards = [os.path.join(path, s) for s in manifest["shards"]]
    return spark.read.json(shards)


def register_sinks(spark) -> None:
    spark.dataSource.register(JsonlManifestDataSource)
