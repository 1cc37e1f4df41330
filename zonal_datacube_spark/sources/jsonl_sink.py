"""Custom Python DataSource WRITER (Spark 4 public sink API): a
partition-parallel JSON-lines sink with a driver-side commit manifest —
the write-path twin of sources/raster_source.py's reader.

Why this matters for the engine: results leave a pipeline through sinks,
and beyond the built-in formats a deployment writes to custom stores
(feature stores, HTTP ingestion endpoints, internal queues). The Python
DataSource writer API is the public way to add one: Spark calls
``write(iterator)`` once per input partition ON EXECUTORS (each returns a
``WriterCommitMessage``), then exactly one driver-side ``commit(messages)``
— the same two-phase task-commit contract a JVM DataSourceV2 sink gets,
which is what makes the write atomic-at-the-job level: a failed/speculated
task's file simply never makes it into the manifest.

Scale design: each partition streams its rows to its own file (no
driver collect, no cross-partition coordination until the O(partitions)
commit message list); the manifest records per-file row counts so readers
and audits can verify completeness without rescanning the data.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

JSONL_SINK_NAME = "zds_jsonl_sink"
MANIFEST = "_MANIFEST.json"
STREAM_MANIFEST = "_STREAM_MANIFEST.jsonl"


class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename, self.n_rows = filename, n_rows


def _atomic_write(path: str, payload: str) -> None:
    """Write-then-rename (the FileStreamSink discipline): a crash mid-write
    leaves a stray ``.tmp`` file, never a torn manifest that wedges every
    subsequent read with a JSON parse error. The parent directory is
    fsync'd after the rename (ADVICE r06): POSIX only durably records the
    new directory entry once the dir inode itself reaches disk — without
    it a power-cut after replace() can resurrect the OLD manifest."""
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    except OSError:  # pragma: no cover - some filesystems reject dir fsync
        pass
    finally:
        os.close(dfd)


def _manifest_records(path: str) -> Iterator[dict]:
    """Parsed stream-manifest lines, skipping a torn trailing line (a
    pre-atomic-write legacy manifest may end mid-record; tolerating it
    beats raising on every commit forever)."""
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> _FileCommit:
        """Executor-side: stream one partition to one jsonl file."""
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages: list[_FileCommit]) -> None:
        """Driver-side: publish the manifest atomically — files absent
        from it (from aborted or speculated tasks) are invisible to
        manifest readers. Under mode("overwrite") the PREVIOUS run's part
        files are then physically removed, so even a naive directory scan
        cannot mix stale rows with the new ones."""
        live = sorted([[m.filename, m.n_rows] for m in messages])
        _atomic_write(
            os.path.join(self.path, MANIFEST),
            json.dumps(
                {
                    "files": live,
                    "total_rows": sum(m.n_rows for m in messages),
                }
            ),
        )
        if self.overwrite:
            keep = {name for name, _ in live}
            for entry in os.listdir(self.path):
                if (
                    entry.startswith("part-")
                    and entry.endswith(".jsonl")
                    and entry not in keep
                ):
                    try:
                        os.remove(os.path.join(self.path, entry))
                    except OSError:
                        pass

    def abort(self, messages: list[_FileCommit]) -> None:
        # same crash-window guard as the streaming abort: if commit()
        # already published these files in the manifest (and then some
        # later step failed), they are the committed truth — deleting
        # them would orphan the manifest
        keep: set[str] = set()
        manifest = os.path.join(self.path, MANIFEST)
        if os.path.exists(manifest):
            try:
                with open(manifest) as fh:
                    keep = {name for name, _ in json.load(fh).get("files", [])}
            except (OSError, json.JSONDecodeError):
                pass
        for m in messages:
            if m.filename in keep:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """STREAMING twin of JsonlDirWriter (Spark 4 DataSourceStreamWriter
    contract): one file per (micro-batch, partition) on executors, one
    driver-side commit per micro-batch that APPENDS a manifest line
    ``{"batch": id, "files": [...], "total_rows": n}``. A batch replayed
    after a crash-before-commit simply re-runs: its first attempt's
    files were never manifested, so readers that follow the manifest see
    each batch exactly once — the same idempotent-commit discipline the
    parquet FileStreamSink's _spark_metadata log implements."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator: Iterator) -> _FileCommit:
        name = f"stream-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages: list[_FileCommit], batchId: int) -> None:
        # idempotent per batchId: a batch REPLAYED after a crash between
        # sink-commit and the engine's offset-log write arrives here a
        # second time — skip it, so the first attempt's files stay the
        # only visible copy (the replay's files are never manifested);
        # this is the batchId <= latestBatchId guard FileStreamSink's
        # _spark_metadata log implements
        manifest = os.path.join(self.path, STREAM_MANIFEST)
        prior_lines: list[str] = []
        if os.path.exists(manifest):
            for rec in _manifest_records(manifest):
                if rec["batch"] == batchId:
                    return
                prior_lines.append(json.dumps(rec))
        prior_lines.append(
            json.dumps(
                {
                    "batch": batchId,
                    "files": sorted(
                        [[m.filename, m.n_rows] for m in messages]
                    ),
                    "total_rows": sum(m.n_rows for m in messages),
                }
            )
        )
        # rewrite-then-rename instead of append: an append torn by a crash
        # would poison every later commit's replay scan; the manifest is
        # O(batches) lines, so the rewrite is metadata-sized, not
        # data-sized (the FileStreamSink _spark_metadata log's contract)
        _atomic_write(manifest, "\n".join(prior_lines) + "\n")

    def abort(self, messages: list[_FileCommit], batchId: int) -> None:
        # Crash-window subtlety (found by the injected-crash test, r09):
        # if the failure happens AFTER commit() published this batch's
        # manifest line (e.g. a later stage of the same job dies), the
        # engine still calls abort — deleting the files here would leave
        # the manifest pointing at nothing and the batch's rows lost
        # FOREVER, because the replay's fresh files are (correctly)
        # skipped by the idempotent guard. Manifested files are the
        # committed truth; only unmanifested ones are garbage.
        keep: set[str] = set()
        manifest = os.path.join(self.path, STREAM_MANIFEST)
        if os.path.exists(manifest):
            for rec in _manifest_records(manifest):
                if rec["batch"] == batchId:
                    keep = {name for name, _ in rec["files"]}
                    break
        for m in messages:
            if m.filename in keep:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return JSONL_SINK_NAME

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:  # noqa: D102
        return JsonlDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:  # noqa: D102,E501
        return JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def read_stream_manifest(path: str) -> list[dict]:
    """Committed micro-batch records, in commit order; the FIRST record
    per batchId wins (belt to the writer's idempotent-commit guard), and
    a torn trailing line from a legacy non-atomic append is skipped
    rather than raised."""
    out: list[dict] = []
    seen: set[int] = set()
    for rec in _manifest_records(os.path.join(path, STREAM_MANIFEST)):
        if rec["batch"] not in seen:
            seen.add(rec["batch"])
            out.append(rec)
    return out
