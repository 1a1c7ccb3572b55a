"""Custom Python DataSource (Spark 4 DataSource API) — the engine's
reader-extension point, the Spark-native analogue of the reference's
format-dispatch extension (ext/SQLCollectionsExt.jl:7 overrides _read_file
for a new target type; here a new FORMAT plugs into spark.read itself).

The demo source generates a deterministic synthetic document corpus,
partitioned for parallel reads — each InputPartition is read independently
by an executor, so a real implementation (an HTTP API pager, a proprietary
format, a message queue snapshot) scales out exactly like a file source.
"""

from __future__ import annotations

import hashlib

try:  # the DataSource API needs pyspark >= 4
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAS_DATASOURCE_API = False
    DataSource = DataSourceReader = object  # type: ignore

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _doc_text(doc_id: int) -> str:
    h = hashlib.md5(str(doc_id).encode()).digest()
    return " ".join(_WORDS[h[i] % len(_WORDS)] for i in range(8))


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        # split [0, n_rows) into n_parts contiguous id ranges
        step = -(-self.n_rows // self.n_parts)
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for doc_id in range(lo, hi):
            yield (doc_id, _doc_text(doc_id))


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Register the custom format on a session (idempotent)."""
    if not HAS_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError("pyspark >= 4 required for the DataSource API")
    spark.dataSource.register(SyntheticDocsDataSource)
