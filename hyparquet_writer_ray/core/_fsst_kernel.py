"""Optional compiled FSST scan kernel.

Greedy longest-match FSST encode/decode is an inherently sequential
byte-chase; a ~60-line C kernel runs it at hundreds of MB/s where any
Python-level scan (regex or numpy passes) tops out at tens. The kernel
is compiled ON DEMAND with the system C compiler into a per-user cache
dir and loaded via ctypes; when no compiler is available the caller
falls back to the pure-Python paths in :mod:`fsst` — output semantics
are identical (same greedy longest-match parse).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

/* candidate index: for each first byte, symbol codes sorted longest-first */
typedef struct { uint8_t code; uint8_t len; } Cand;

/* 255 slots per first byte: a table has at most 255 symbols total, so
   no candidate list can ever overflow — the kernel parse is always the
   same greedy longest-match the Python paths produce */
size_t fsst_compress(const uint8_t* data, size_t n,
                     const uint8_t* sym_bytes /* 255*8 */, const uint8_t* sym_len,
                     int nsym, uint8_t* out) {
    static _Thread_local Cand cands[256][255];
    uint8_t ncand[256];
    memset(ncand, 0, sizeof ncand);
    for (int L = 8; L >= 1; L--) {           /* longest first */
        for (int c = 0; c < nsym; c++) {
            if (sym_len[c] != L) continue;
            uint8_t fb = sym_bytes[c * 8];
            cands[fb][ncand[fb]].code = (uint8_t)c;
            cands[fb][ncand[fb]].len = (uint8_t)L;
            ncand[fb]++;
        }
    }
    size_t o = 0, p = 0;
    while (p < n) {
        uint8_t fb = data[p];
        size_t rem = n - p;
        int matched = 0;
        Cand* cs = cands[fb];
        int nc = ncand[fb];
        for (int i = 0; i < nc; i++) {
            uint8_t L = cs[i].len;
            if (L <= rem && memcmp(data + p, sym_bytes + cs[i].code * 8, L) == 0) {
                out[o++] = cs[i].code;
                p += L;
                matched = 1;
                break;
            }
        }
        if (!matched) {
            out[o++] = 255;          /* ESCAPE */
            out[o++] = data[p++];
        }
    }
    return o;
}

size_t fsst_decompress(const uint8_t* codes, size_t n,
                       const uint8_t* sym_bytes, const uint8_t* sym_len,
                       uint8_t* out) {
    size_t o = 0, i = 0;
    while (i < n) {
        uint8_t c = codes[i];
        if (c == 255) {
            if (i + 1 >= n) break;
            out[o++] = codes[i + 1];
            i += 2;
        } else {
            uint8_t L = sym_len[c];
            memcpy(out + o, sym_bytes + c * 8, 8);  /* overshoot is fine: cap has slack */
            o += L;
            i += 1;
        }
    }
    return o;
}
"""

_lib = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    cache = os.path.join(tempfile.gettempdir(), f"hpw_fsst_kernel_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "fsst_kernel_v2.so")
    if not os.path.exists(so):
        src = os.path.join(cache, "fsst_kernel.c")
        with open(src, "w") as f:
            f.write(_C_SRC)
        tmp = so + f".build{os.getpid()}"
        try:
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp, so)  # atomic: concurrent workers race safely
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.fsst_compress.restype = ctypes.c_size_t
    lib.fsst_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p,
    ]
    lib.fsst_decompress.restype = ctypes.c_size_t
    lib.fsst_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    return lib


def get_kernel():
    """The loaded kernel library, or None if no C compiler works here."""
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


def _packed(table) -> tuple[bytes, bytes, int]:
    packed = getattr(table, "_packed", None)
    if packed is None:
        nsym = len(table.symbols)
        sb = bytearray(255 * 8)
        sl = bytearray(255)
        for i, s in enumerate(table.symbols):
            sb[i * 8 : i * 8 + len(s)] = s
            sl[i] = len(s)
        packed = (bytes(sb), bytes(sl), nsym)
        table._packed = packed
    return packed


def compress(data: bytes, table) -> "bytes | None":
    lib = get_kernel()
    if lib is None:
        return None
    sb, sl, nsym = _packed(table)
    out = ctypes.create_string_buffer(2 * len(data) + 8)
    n = lib.fsst_compress(bytes(data), len(data), sb, sl, nsym, out)
    return out.raw[:n]


def decompress(codes, table) -> "bytes | None":
    lib = get_kernel()
    if lib is None:
        return None
    sb, sl, _ = _packed(table)
    out = ctypes.create_string_buffer(8 * len(codes) + 16)
    n = lib.fsst_decompress(bytes(codes), len(codes), sb, sl, out)
    return out.raw[:n]
