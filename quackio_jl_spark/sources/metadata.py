"""Parquet file-level KV metadata round-trip — the reference's one genuinely
custom feature (SURVEY.md §2.9).

Reference semantics:
- write: inject ``KV_METADATA={k: v}`` into COPY options when format is
  parquet (/root/reference/src/QuackIO.jl:126-132); ignored for non-parquet
  (test/runtests.jl:171-173).
- read: ``SELECT * FROM parquet_kv_metadata(file) WHERE key != 'ARROW:schema'``,
  values coerced to String (/root/reference/src/QuackIO.jl:134-147;
  test/runtests.jl:158-165).

Spark has no public API for arbitrary Parquet footer KV pairs (it only writes
``org.apache.spark.sql.parquet.row.metadata``), so we do a pyarrow pass.
Scale note: pyarrow exposes no footer-only rewrite, so each part is decoded
and re-encoded once — O(bytes of that part), done atomically (temp file +
``os.replace``) so a crash mid-write never corrupts a part. Each part is
independent, so on a cluster this is one task per part; the expected use is
result-set-sized outputs (the reference's COPY TO shape), not 100 TB tables —
for those, pass the metadata at write time instead of patching after.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Mapping

import pyarrow.parquet as pq

__all__ = ["attach_kv_metadata", "read_kv_metadata", "INTERNAL_KEYS"]

# Internal keys excluded on read, like the reference skips 'ARROW:schema'
# (/root/reference/src/QuackIO.jl:139).
INTERNAL_KEYS = {
    "ARROW:schema",
    "org.apache.spark.sql.parquet.row.metadata",
    "org.apache.spark.version",
    "org.apache.spark.legacyINT96",
    "org.apache.spark.timeZone",
    "org.apache.spark.legacyDateTime",
    "writer.model.name",
}


def _part_files(path: str) -> list[str]:
    if os.path.isdir(path):
        parts = sorted(
            p
            for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(p)
            and not p.endswith((".crc", "_SUCCESS"))
            and os.path.basename(p) != "_SUCCESS"
        )
        return parts
    return [path]


def attach_kv_metadata(path: str, kv: Mapping[str, Any]) -> None:
    """Merge string-coerced KV pairs into the footer of every part file.

    Values stringified like the reference (non-string values round-trip as
    their string form — test/runtests.jl:158-165, e.g. ``1 => 2`` reads back
    as ``"2"``)."""
    new_meta = {str(k): str(v) for k, v in kv.items()}
    for part in _part_files(path):
        table = pq.read_table(part)
        existing = table.schema.metadata or {}
        merged = dict(existing)
        merged.update({k.encode(): v.encode() for k, v in new_meta.items()})
        # preserve the original compression and row-group layout where cheap
        pf = pq.ParquetFile(part)
        codec = "snappy"
        row_group_size = None
        try:
            codec = pf.metadata.row_group(0).column(0).compression.lower()
            if codec == "uncompressed":
                codec = "none"
            row_group_size = max(
                pf.metadata.row_group(i).num_rows for i in range(pf.metadata.num_row_groups)
            )
        except Exception:
            pass
        # atomic: write the patched part next to the original, then replace
        tmp = part + ".quackio_meta_tmp"
        try:
            pq.write_table(
                table.replace_schema_metadata(merged),
                tmp,
                compression=codec,
                **({"row_group_size": row_group_size} if row_group_size else {}),
            )
            os.replace(tmp, part)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)


def read_kv_metadata(path: str) -> dict[str, str]:
    """Read user KV metadata from a parquet file or directory of parts,
    excluding engine-internal keys; values returned as str."""
    out: dict[str, str] = {}
    for part in _part_files(path):
        meta = pq.read_schema(part).metadata or {}
        for k, v in meta.items():
            ks = k.decode("utf-8", errors="replace")
            if ks in INTERNAL_KEYS:
                continue
            out[ks] = v.decode("utf-8", errors="replace")
    return out
