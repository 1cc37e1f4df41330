"""Custom Python DataSource (Spark 4 public API): a partitioned synthetic
raster-tile source — the connector shape the reference's domain needs
(windowed tile reads from a raster store), expressed through
``pyspark.sql.datasource``.

Why this matters for the engine: formats Spark ships (parquet/ORC/CSV/...)
are covered by the roundtrip keys; a real deployment also reads from
custom stores (COG tile servers, feature services, internal APIs). The
Python DataSource API is the public, pip-only way to add such a connector:
the source declares its schema and a list of ``InputPartition``s, and
Spark schedules one ``read()`` per partition across executors — the same
partition-parallel contract a JVM DataSourceV2 gets.

Scale design:
- one partition per ROW BAND of tiles (``n // band_rows`` bands): band
  reads are independent, so a 1000-executor cluster reads 1000 bands
  concurrently; no partition materializes more than band_rows·n cells.
- values are pure integer arithmetic of (x, y) — deterministic, so the
  DuckDB oracle regenerates them exactly (generate_series), proving the
  connector loses nothing end-to-end.
- the Python read path yields tuples in batch; for a production connector
  the same API accepts Arrow RecordBatches (``read`` may yield
  ``pyarrow.RecordBatch``) to stay vectorized — the declared key keeps the
  tuple form to exercise the row contract.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

RASTER_SOURCE_NAME = "zds_synthetic_raster"


class _BandPartition(InputPartition):
    def __init__(self, y0: int, y1: int, n: int):
        self.y0, self.y1, self.n = y0, y1, n


class SyntheticRasterReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 256))
        self.band_rows = int(options.get("band_rows", 64))

    def partitions(self) -> list[InputPartition]:  # noqa: D102
        return [
            _BandPartition(y0, min(y0 + self.band_rows, self.n), self.n)
            for y0 in range(0, self.n, self.band_rows)
        ]

    def read(self, partition: _BandPartition) -> Iterator[tuple]:  # noqa: D102
        n = partition.n
        for y in range(partition.y0, partition.y1):
            row_term = y * 17
            for x in range(n):
                yield (x, y, (x * 31 + row_term) % 97)


class SyntheticRasterDataSource(DataSource):
    """``spark.read.format("zds_synthetic_raster").option("n", 512)`` —
    a deterministic n×n raster, partition-parallel by row band."""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return RASTER_SOURCE_NAME

    def schema(self) -> str:  # noqa: D102
        return "x INT, y INT, val INT"

    def reader(self, schema) -> DataSourceReader:  # noqa: D102
        return SyntheticRasterReader(dict(self.options))


def register_raster_source(spark) -> None:
    """Idempotent registration: tolerate ONLY the already-registered
    error some Spark versions raise on re-register. Anything else (API
    absent, bad class) re-raises here, where it is diagnosable, instead
    of surfacing later as an unrelated 'data source not found' at read
    time."""
    try:
        spark.dataSource.register(SyntheticRasterDataSource)
    except Exception as exc:
        msg = str(exc).lower()
        if "already" in msg and "regist" in msg:
            return
        raise
