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
    """Append-only manifest + optional blob checkpoint store.

    Completion records are written by the WORKER that finished the part
    (atomic per-part json under ``_lineage/parts/``), so a hard-killed
    driver cannot lose records for parts already durable on disk —
    partition-granular resume survives SIGKILL at any point. The
    driver-side ``manifest.jsonl`` is a convenience consolidation.
    """

    def __init__(self, base_dir: str, *, store_blobs: bool = False,
                 name: str = "_lineage") -> None:
        # ``name`` namespaces independent writers sharing one out_dir
        # (e.g. compaction keeps its own manifest so its stale-part GC
        # can never see — or delete — parts another writer recorded)
        self.dir = os.path.join(base_dir, name)
        self.blob_dir = os.path.join(self.dir, "blobs")
        self.parts_dir = os.path.join(self.dir, "parts")
        self.manifest_path = os.path.join(self.dir, "manifest.jsonl")
        os.makedirs(self.dir, exist_ok=True)
        if store_blobs:
            os.makedirs(self.blob_dir, exist_ok=True)
        self.store_blobs = store_blobs
        self._fh = None

    # -- worker side ----------------------------------------------------
    def write_part_record(self, part_key: str, recs: list[PartRecord]) -> None:
        """Atomically persist a finished part's records (call AFTER the
        part file itself is durable)."""
        os.makedirs(self.parts_dir, exist_ok=True)
        tmp = os.path.join(self.parts_dir, f".{part_key}.tmp")
        with open(tmp, "w") as f:
            json.dump([asdict(r) for r in recs], f)
        os.replace(tmp, os.path.join(self.parts_dir, f"{part_key}.json"))

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

    def clear(self) -> None:
        """Forget all completion records (fresh-export semantics: the
        owning pipeline is about to rewrite the directory and stale
        records would wrongly mark new work as done)."""
        self.close()
        import shutil
        shutil.rmtree(self.parts_dir, ignore_errors=True)
        shutil.rmtree(self.blob_dir, ignore_errors=True)
        if self.store_blobs:
            os.makedirs(self.blob_dir, exist_ok=True)  # next append needs it
        if os.path.exists(self.manifest_path):
            os.unlink(self.manifest_path)

    # -- resume side ----------------------------------------------------
    def _validate(self, rec: PartRecord) -> bool:
        if self.store_blobs:
            return os.path.exists(os.path.join(self.blob_dir, rec.part_id))
        if rec.file is not None:
            base = os.path.dirname(self.dir)
            return os.path.exists(os.path.join(base, rec.file))
        return True

    def completed_parts(self) -> dict[str, PartRecord]:
        out: dict[str, PartRecord] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = PartRecord(**json.loads(line))
                    except (json.JSONDecodeError, TypeError):
                        continue  # torn trailing line from a killed driver
                    if self._validate(rec):
                        out[rec.part_id] = rec
        if os.path.isdir(self.parts_dir):
            for fname in os.listdir(self.parts_dir):
                if not fname.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(self.parts_dir, fname)) as f:
                        for d in json.load(f):
                            rec = PartRecord(**d)
                            if self._validate(rec):
                                out[rec.part_id] = rec
                except (json.JSONDecodeError, OSError):
                    continue  # torn write of a non-atomic fs: ignore
        return out

    def load_blob(self, part_id: str):
        with open(os.path.join(self.blob_dir, part_id), "rb") as f:
            return pickle.loads(f.read())
