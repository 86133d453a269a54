"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches
stages.

The media decode uses PIL when it is importable (loaded ONCE per actor
in ``__init__`` — the point of the actor pool); this container has no
image libraries, so tests exercise the deterministic ``fake=True``
path, which produces hash-derived "pixels" with the same schema,
batch sizing, actor signature and output layout as the real path.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageDecodeStage:
    """Actor stage: binary payload -> fixed-size uint8 feature tensor
    (out_size x out_size grayscale thumbnail).

    Decode backends, in order: ``fake=True`` -> deterministic
    hash-derived pixels; PIL if importable (real decode+resize);
    otherwise NotImplementedError with guidance.
    """

    def __init__(self, *, out_size: int = 16, fake: bool = False,
                 payload_col: str = "payload", id_col: str = "id") -> None:
        self.out_size = out_size
        self.fake = fake
        self.payload_col = payload_col
        self.id_col = id_col
        self._pil = None
        if not fake:
            try:  # model/library load happens once per actor, never per batch
                from PIL import Image  # type: ignore

                self._pil = Image
            except ImportError:
                pass

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.fake:
            # deterministic pseudo-pixels from the payload digest
            digest = hashlib.sha256(payload).digest()
            seed = int.from_bytes(digest[:8], "big")
            rng = np.random.default_rng(seed)
            return rng.integers(0, 256, (self.out_size, self.out_size), dtype=np.uint8)
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize((self.out_size, self.out_size))
            return np.asarray(img, dtype=np.uint8)
        raise NotImplementedError(
            "media decode requires an image library (PIL) not present in "
            "this container; construct with fake=True for plumbing tests"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        payloads = batch.column(self.payload_col).to_pylist()
        n = self.out_size * self.out_size
        # one flat uint8 buffer for the whole batch; null rows stay zeroed
        flat = np.zeros((len(payloads), n), dtype=np.uint8)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            if p is not None:
                flat[i] = self._decode(p).reshape(-1)
                ok[i] = True
        values = pa.array(flat.reshape(-1))
        ok_arr = pa.array(ok)
        # FixedSizeListArray straight from the flat buffer, validity from
        # the bool array's bitmap — no per-row Python lists
        pixels = pa.Array.from_buffers(
            pa.list_(pa.uint8(), n), len(payloads),
            [ok_arr.buffers()[1]], null_count=int((~ok).sum()),
            children=[values],
        )
        return pa.table({
            self.id_col: ids,
            "pixels": pixels,
            "decoded": ok_arr,
        })


def decode_images(ds, *, fake: bool = False, out_size: int = 16,
                  concurrency=2, batch_size: int = 64, **kw):
    """Large binary payloads need small batches: batch_size bounds
    payload_bytes x concurrency in worker heaps."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=dict(fake=fake, out_size=out_size, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
