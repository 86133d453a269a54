"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches
stages.

The actual media decode is STUBBED (the image/audio libraries are not
in this container): ``DecodeStub`` raises NotImplementedError unless
``fake=True``, in which case it produces deterministic hash-derived
"pixels" so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageDecodeStage:
    """Actor stage: binary payload -> fixed-size feature tensor.

    Real deployments replace ``_decode`` with PIL/libvips/ffmpeg loaded
    once in __init__ (that is the point of the actor pool); here the
    decode is a deterministic fake behind ``fake=True``.
    """

    def __init__(self, *, out_size: int = 16, fake: bool = False,
                 payload_col: str = "payload", id_col: str = "id") -> None:
        self.out_size = out_size
        self.fake = fake
        self.payload_col = payload_col
        self.id_col = id_col
        # real impl: self.decoder = PIL/torchvision model loaded ONCE here

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an image library not present in this "
                "container; construct with fake=True for plumbing tests"
            )
        # deterministic pseudo-pixels from the payload digest
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (self.out_size, self.out_size), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        payloads = batch.column(self.payload_col).to_pylist()
        feats = []
        ok = []
        for p in payloads:
            if p is None:
                feats.append(None)
                ok.append(False)
            else:
                feats.append(self._decode(p).reshape(-1).tolist())
                ok.append(True)
        n = self.out_size * self.out_size
        return pa.table({
            self.id_col: ids,
            "pixels": pa.array(feats, type=pa.list_(pa.uint8(), n)),
            "decoded": pa.array(ok),
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
