"""Per-partition lineage records + checkpoint/resume state
(north_rule: "per-partition lineage records plus codec/size metrics
checkpointed so a killed job resumes at partition granularity").

The manifest is JSONL under ``<dir>/_lineage/manifest.jsonl``; blobs
for single-file resume live in ``<dir>/_lineage/blobs/<part_id>``.
"""
from __future__ import annotations

import json
import os
import pickle
from dataclasses import asdict, dataclass, field
from typing import Optional

from ..core.rowgroup import RowGroupMeta
from ..core.types import Encoding


@dataclass
class PartRecord:
    part_id: str
    num_rows: int
    raw_bytes: int  # uncompressed encoded size
    comp_bytes: int  # blob size
    columns: dict = field(default_factory=dict)  # name -> {encodings, codec}
    file: Optional[str] = None  # part-file mode: output file name
    checksum: Optional[str] = None


def record_from_meta(part_id: str, meta: RowGroupMeta, blob_len: int,
                     file: Optional[str] = None, checksum: Optional[str] = None) -> PartRecord:
    cols = {}
    for _, cm in meta.chunks:
        cols[".".join(cm.path)] = {
            "encodings": [Encoding(e).name for e in cm.encodings],
            "codec": cm.codec,
            "compressed": cm.total_compressed_size,
            "uncompressed": cm.total_uncompressed_size,
        }
    return PartRecord(
        part_id=part_id,
        num_rows=meta.num_rows,
        raw_bytes=meta.total_byte_size,
        comp_bytes=blob_len,
        columns=cols,
        file=file,
        checksum=checksum,
    )


class LineageLog:
    """Append-only manifest + optional blob checkpoint store."""

    def __init__(self, base_dir: str, *, store_blobs: bool = False) -> None:
        self.dir = os.path.join(base_dir, "_lineage")
        self.blob_dir = os.path.join(self.dir, "blobs")
        self.manifest_path = os.path.join(self.dir, "manifest.jsonl")
        os.makedirs(self.dir, exist_ok=True)
        if store_blobs:
            os.makedirs(self.blob_dir, exist_ok=True)
        self.store_blobs = store_blobs
        self._fh = None

    # -- write side -----------------------------------------------------
    def append(self, rec: PartRecord, blob: bytes | None = None,
               meta: RowGroupMeta | None = None) -> None:
        if self.store_blobs and blob is not None:
            tmp = os.path.join(self.blob_dir, f".{rec.part_id}.tmp")
            with open(tmp, "wb") as f:
                f.write(pickle.dumps((blob, meta)))
            os.replace(tmp, os.path.join(self.blob_dir, rec.part_id))
        if self._fh is None:
            self._fh = open(self.manifest_path, "a")
        self._fh.write(json.dumps(asdict(rec)) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    # -- resume side ----------------------------------------------------
    def completed_parts(self) -> dict[str, PartRecord]:
        out: dict[str, PartRecord] = {}
        if not os.path.exists(self.manifest_path):
            return out
        with open(self.manifest_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                rec = PartRecord(**d)
                if self.store_blobs:
                    if not os.path.exists(os.path.join(self.blob_dir, rec.part_id)):
                        continue  # blob missing: treat as incomplete
                elif rec.file is not None:
                    base = os.path.dirname(self.dir)
                    if not os.path.exists(os.path.join(base, rec.file)):
                        continue
                out[rec.part_id] = rec
        return out

    def load_blob(self, part_id: str):
        with open(os.path.join(self.blob_dir, part_id), "rb") as f:
            return pickle.loads(f.read())
