"""Audio column plumbing with a REAL stdlib decode path: WAV (RIFF
PCM16) is parsed with struct+numpy — no audio library — so the
actor-pool feature-extraction stage runs a genuine decode in this
container, mirroring the image stage's PIL→stdlib→fake backend chain.

Features are the classic cheap acoustic set (duration, RMS, peak,
zero-crossing rate) computed vectorized over the sample buffer.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float32 mono samples in [-1, 1]).

    Supports PCM (format 1) 16-bit and 8-bit, any channel count
    (averaged to mono). Raises ValueError on anything else."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"non-PCM WAV (format {audio_fmt}) not supported")
            if bits not in (8, 16):
                raise ValueError(f"unsupported WAV bit depth {bits}")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    n_ch, rate, bits = fmt
    if bits == 16:
        x = np.frombuffer(samples, "<i2").astype(np.float32) / 32768.0
    else:  # 8-bit WAV is unsigned
        x = (np.frombuffer(samples, np.uint8).astype(np.float32) - 128.0) / 128.0
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return rate, x


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float mono [-1, 1] -> 16-bit PCM mono WAV bytes (fixture use)."""
    pcm = np.clip(np.asarray(samples, np.float64) * 32767.0, -32768, 32767)
    body = pcm.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(body),
    )
    return hdr + body


def wav_features(rate: int, x: np.ndarray) -> dict:
    """duration_s, rms, peak, zero-crossing rate — all vectorized."""
    n = len(x)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0}
    rms = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
    peak = float(np.max(np.abs(x)))
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "duration_s": n / float(rate),
        "rms": rms,
        "peak": peak,
        "zcr": zc / max(n - 1, 1),
    }


class AudioFeatureStage:
    """Actor stage: binary WAV payload -> acoustic feature row.

    ``backend``: "stdlib" (real RIFF/PCM decode, default) or "fake"
    (hash-derived deterministic features for arbitrary payloads)."""

    def __init__(self, *, backend: str = "stdlib",
                 payload_col: str = "payload", id_col: str = "id") -> None:
        self.backend = backend
        self.payload_col = payload_col
        self.id_col = id_col

    def _features(self, payload: bytes) -> dict:
        if self.backend == "fake":
            d = hashlib.sha256(payload).digest()
            rng = np.random.default_rng(int.from_bytes(d[:8], "big"))
            x = rng.normal(0, 0.1, 800).astype(np.float32)
            return wav_features(16000, x)
        return wav_features(*decode_wav(payload))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        payloads = batch.column(self.payload_col).to_pylist()
        cols = {"duration_s": [], "rms": [], "peak": [], "zcr": []}
        ok = []
        for p in payloads:
            if p is None:
                ok.append(False)
                for k in cols:
                    cols[k].append(None)
            else:
                try:
                    f = self._features(p)
                except Exception:
                    # corrupt payload: decoded=False, row survives
                    ok.append(False)
                    for k in cols:
                        cols[k].append(None)
                    continue
                ok.append(True)
                for k in cols:
                    cols[k].append(f[k])
        return pa.table({
            self.id_col: ids,
            "decoded": pa.array(ok, pa.bool_()),
            **{k: pa.array(v, pa.float64()) for k, v in cols.items()},
        })


def audio_features(ds, *, backend: str = "stdlib", concurrency=2,
                   batch_size: int = 64, **kw):
    """Large binary payloads need small batches: batch_size bounds
    payload_bytes x concurrency in worker heaps."""
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=dict(backend=backend, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
