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


try:  # streaming side of the DataSource API (pyspark >= 4)
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    HAS_STREAM_API = True
except ImportError:  # pragma: no cover
    HAS_STREAM_API = False
    SimpleDataSourceStreamReader = object  # type: ignore


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same synthetic corpus: offsets are row
    positions, each batch emits the next ``batchRows`` ids. read() returns
    (rows, nextOffset); when the corpus is exhausted it returns an empty
    batch with an unchanged offset, so processAllAvailable() terminates —
    the replayable-offset contract a Kafka-like source implements, expressed
    through the Python API. readBetweenOffsets() makes batches replayable
    for recovery."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100))
        self.batch = int(options.get("batchRows", 40))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.n_rows)
        return iter([(i, _doc_text(i)) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            [(i, _doc_text(i)) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("rows", N).load() — also
    streamable: spark.readStream.format("synthetic_docs")."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Register the custom format on a session (idempotent)."""
    if not HAS_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError("pyspark >= 4 required for the DataSource API")
    spark.dataSource.register(SyntheticDocsDataSource)


# ------------------------------------------------------------- writer side

if HAS_DATASOURCE_API:
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _Committed(WriterCommitMessage):
        def __init__(self, path: str, n: int):
            self.path = path
            self.n = n

    class JsonlDirWriter(DataSourceWriter):
        """Executor-side writer: each partition streams its rows to one
        JSON-lines file in the target directory; commit messages flow back
        to the driver, which writes a _SUCCESS manifest — the same
        task-commit/job-commit protocol file sources use, expressed through
        the Python API."""

        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_dir writer requires a path")
            self.overwrite = overwrite

        def write(self, iterator):
            import json as _json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(part, "w") as f:
                for row in iterator:
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return _Committed(part, n)

        def commit(self, messages):
            import glob as _glob
            import json as _json
            import os

            committed = sorted(m.path for m in messages)
            if self.overwrite:
                # overwrite semantics: stale parts from prior jobs must not
                # survive the commit, or directory-glob readers see mixed
                # old+new data while the manifest lists only the new files
                keep = set(committed)
                for old in _glob.glob(os.path.join(self.path, "part-*.jsonl")):
                    if old not in keep:
                        os.remove(old)
            manifest = {
                "files": committed,
                "rows": sum(m.n for m in messages),
            }
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                f.write(_json.dumps(manifest))

        def abort(self, messages):
            import os

            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    class JsonlDirDataSource(DataSource):
        """df.write.format("jsonl_dir").option("path", d).mode("append").save()"""

        @classmethod
        def name(cls) -> str:
            return "jsonl_dir"

        def schema(self) -> str:  # pragma: no cover - writer-only source
            return "value string"

        def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
            return JsonlDirWriter(self.options, overwrite)

    def register_writer(spark) -> None:
        spark.dataSource.register(JsonlDirDataSource)
