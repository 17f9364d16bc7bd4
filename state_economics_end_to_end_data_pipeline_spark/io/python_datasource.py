"""Custom Python Data Source (Spark 4 DataSource API, SPARK-44076).

The reference reads fixed files; a Spark-first engine also wants
programmatic sources (backfill generators, API paginators, fixture
synthesizers) that parallelize like any other scan. The DataSource API
is the supported way to write one in pure Python: the driver plans
``partitions()``, each executor materializes its split in ``read()``,
and the scan composes with Catalyst like a parquet read (column pruning
and filters apply on top).

``SyntheticEventsDataSource`` generates a deterministic ledger: every
row is a pure function of its global index, so any engine can re-derive
the same table and the source is oracle-checkable end-to-end (DuckDB
re-derives it from ``range()``).

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 5000).option("partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# Deterministic row derivation (documented contract, mirrored by oracles):
#   user_id      = (i * KNUTH) % N_USERS      -- multiplicative hash spread
#   amount_cents = (i * i) % 10_000 + 100     -- bounded, index-derived
#   day          = i % 30
KNUTH = 2654435761
N_USERS = 97


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        # contiguous index ranges: split count is the parallelism the
        # scan presents to Spark, independent of row count. An empty
        # source still needs one (empty) split -- step would be 0 and
        # range(0, 0, 0) raises.
        if self.n_rows <= 0:
            return [_RangePartition(0, 0)]
        step = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, (i * KNUTH) % N_USERS, (i * i) % 10_000 + 100, i % 30)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount_cents bigint, day int"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def read_synthetic_events(spark, n_rows: int = 5000, n_parts: int = 8):
    """Register (idempotent) and read the synthetic source."""
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.read.format("synthetic_events")
        .option("rows", str(n_rows))
        .option("partitions", str(n_parts))
        .load()
    )


# ------------------------------------------------------- writer side


class _PartCommit(WriterCommitMessage):
    """Per-task commit message: the temp file a task wrote and its row
    count. Serialized executor -> driver by the API."""

    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class JsonLinesCommitWriter(DataSourceWriter):
    """Executor side of the two-phase commit: each task streams its rows
    to a TEMP file named by its task attempt id (attempt retries never
    collide), and only ``commit()`` -- driver-side, after every task
    succeeded -- renames temp parts to final names and publishes the
    manifest. A reader that requires the manifest therefore never sees a
    partial write: that is the exactly-once contract every real sink
    (parquet committer, Delta/Iceberg snapshot) implements, here in its
    minimal observable form. Local-FS rename stands in for an object
    store's copy+delete; the protocol is identical."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_commit requires a path (use .save(path))")

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        attempt = TaskContext.get().taskAttemptId()
        tmp = os.path.join(self.path, f"_tmp-{attempt}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True)) + "\n")
                n += 1
        return _PartCommit(tmp, n)

    def commit(self, messages):
        import json
        import os

        total = 0
        finals = []
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            finals.append(os.path.basename(final))
            total += m.n_rows
        manifest = os.path.join(self.path, "_MANIFEST")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": finals, "rows": total}, f)
        os.replace(tmp, manifest)  # atomic publish

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonLinesCommitDataSource(DataSource):
    """``df.write.format("jsonl_commit").mode("append").save(path)`` --
    the WRITE half of the Python DataSource API beside the synthetic
    reader above."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool):
        return JsonLinesCommitWriter(self.options)
