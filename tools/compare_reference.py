#!/usr/bin/env python
"""Run the reference hyparquet-writer (node, with a minimal hyparquet
shim from tools/ref_shim) and our engine on the identical deterministic
webtable input; compare wall time, output size, and decoded equality
(byte-identical text per url — the north-rule per-row invariant).

Usage: python tools/compare_reference.py [rows]
Prints one JSON line; also used to refresh BASELINE.md numbers.
"""
from __future__ import annotations

import base64
import json
import os
import shutil
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/refbench"
REF_SRC = "/root/reference/src"

RUN_REF_MJS = """
import { readFileSync, writeFileSync } from 'node:fs'
import { parquetWriteBuffer } from '%(ref)s/index.js'
const lines = readFileSync(process.argv[2], 'utf8').split('\\n').filter(Boolean)
const url = [], warc_ts = [], html = [], text = [], lang = []
for (const line of lines) {
  const r = JSON.parse(line)
  url.push(r.url)
  warc_ts.push(new Date(r.warc_ts))
  html.push(r.html === null ? null : Buffer.from(r.html, 'base64'))
  text.push(r.text)
  lang.push(r.lang)
}
const columnData = [
  { name: 'url', data: url, type: 'STRING' },
  { name: 'warc_ts', data: warc_ts, type: 'TIMESTAMP' },
  { name: 'html', data: html, type: 'BYTE_ARRAY' },
  { name: 'text', data: text, type: 'STRING' },
  { name: 'lang', data: lang, type: 'STRING' },
]
const t0 = performance.now()
const buf = parquetWriteBuffer({ columnData })
const ms = performance.now() - t0
writeFileSync(process.argv[3], Buffer.from(buf))
console.log(JSON.stringify({ rows: url.length, ms: Math.round(ms), bytes: buf.byteLength }))
"""


def setup_workdir() -> str:
    os.makedirs(WORK, exist_ok=True)
    shim_dst = os.path.join(WORK, "node_modules", "hyparquet")
    shutil.rmtree(shim_dst, ignore_errors=True)
    shutil.copytree(os.path.join(REPO, "tools", "ref_shim"), shim_dst)
    ref_dst = os.path.join(WORK, "ref_src")
    if not os.path.exists(ref_dst):
        shutil.copytree(REF_SRC, ref_dst)
    with open(os.path.join(WORK, "run_ref.mjs"), "w") as f:
        f.write(RUN_REF_MJS % {"ref": ref_dst})
    return WORK


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    sys.path.insert(0, REPO)
    from hyparquet_writer_ray import WriteOptions, write_table
    from hyparquet_writer_ray.sources.webtable import synthesize_table

    work = setup_workdir()
    t = synthesize_table(rows)
    # cache key includes a content fingerprint so a generator change
    # invalidates the reference's jsonl input (stale-cache bug: the r4
    # skew-pad fix changed rows while the old jsonl survived)
    import pyarrow.compute as pc
    fp = int(pc.sum(pc.binary_length(pc.fill_null(t.column("html"), b""))).as_py())
    jsonl = os.path.join(work, f"webtable_{rows}_{fp}.jsonl")
    if not os.path.exists(jsonl):
        with open(jsonl, "w") as f:
            for r in t.to_pylist():
                r["html"] = None if r["html"] is None else base64.b64encode(r["html"]).decode()
                # tz-naive datetimes are UTC here: .timestamp() alone
                # would apply the HOST timezone and silently shift every
                # reference-input value on a non-UTC machine
                from datetime import timezone as _tz

                r["warc_ts"] = int(
                    r["warc_ts"].replace(tzinfo=_tz.utc).timestamp() * 1000)
                f.write(json.dumps(r) + "\n")

    ref_out = os.path.join(work, "ref_out.parquet")
    res = subprocess.run(
        ["node", os.path.join(work, "run_ref.mjs"), jsonl, ref_out],
        capture_output=True, text=True, check=True, cwd=work,
    )
    ref = json.loads(res.stdout.strip())

    ours = {}
    for mode in ("reference", "smart"):
        out = os.path.join(work, f"ours_{mode}.parquet")
        opts = WriteOptions(auto_codec=mode)
        write_table(t, out, opts)  # warm
        t0 = time.perf_counter()
        write_table(t, out, opts)
        ours[mode] = {
            "ms": round((time.perf_counter() - t0) * 1000),
            "bytes": os.path.getsize(out),
        }

    # decode equality: reference output vs our output vs source truth
    ref_t = pq.read_table(ref_out)
    our_t = pq.read_table(os.path.join(work, "ours_smart.parquet"))
    checks = {}
    for col in ["url", "text", "html", "lang"]:
        checks[f"{col}_ref_eq"] = ref_t.column(col).to_pylist() == t.column(col).to_pylist()
        checks[f"{col}_ours_eq"] = our_t.column(col).to_pylist() == t.column(col).to_pylist()
    # warc_ts: reference writes TIMESTAMP_MILLIS
    checks["warc_ts_ours_eq"] = our_t.column("warc_ts").to_pylist() == t.column("warc_ts").to_pylist()

    print(json.dumps({
        "rows": rows,
        "raw_bytes": t.nbytes,
        "reference": ref,
        "ours": ours,
        "size_ratio_smart_vs_ref": round(ours["smart"]["bytes"] / ref["bytes"], 4),
        "decode_equal": checks,
        "all_equal": all(checks.values()),
    }))


if __name__ == "__main__":
    main()
