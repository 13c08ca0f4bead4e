"""Demonstrate the sandbox memory wall that bounds single-host scaling.

Runs the same workload at 2 and 8 concurrent PROCESSES (like the
scaling harness) for two workload shapes:

- compute: the MinHash permutation kernel over a cache-resident 256 KiB
  shingle slice, repeated — pure ALU + L2, no RAM streaming. This is
  what the engine's hot loop does after the cache-chunking change.
- stream: first-touch + re-stream of a fresh 512 MiB buffer per
  iteration — the memory-bandwidth-bound shape (what stage input/output
  movement through the object store looks like).

If 2→8 procs scales ~4x for `compute` but far less for `stream`, the
pipeline's sub-0.8 efficiency at 8 workers is the host's shared memory
subsystem, not the engine: on a real N→4N-node cluster each node
brings its own memory (and the criterion is weak scaling — per-node
data constant), so the per-node regime matches the 2-proc point here.

Usage: python tools/host_wall.py   → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _compute_worker(dur: float, out):
    rng = np.random.default_rng(os.getpid())
    sh = rng.integers(0, 2**63, size=1 << 15, dtype=np.uint64)  # 256 KiB
    mult = (rng.integers(1, 2**62, size=128, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    buf = np.empty_like(sh)
    n = 0
    t0 = time.monotonic()
    with np.errstate(over="ignore"):
        while time.monotonic() - t0 < dur:
            for p in range(128):
                np.multiply(sh, mult[p], out=buf)
                buf ^= buf >> np.uint64(31)
            n += 1
    out.put(n * len(sh) * 128)


def _stream_worker(dur: float, out):
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < dur:
        a = np.empty(1 << 26, dtype=np.uint64)  # fresh 512 MiB → first touch
        a[:] = np.uint64(1)
        if int(a.sum()) > 0:  # force the read-back
            n += 1
        del a
    out.put(n)


def run(kind: str, procs: int, dur: float = 8.0) -> float:
    q = mp.Queue()
    fn = _compute_worker if kind == "compute" else _stream_worker
    ps = [mp.Process(target=fn, args=(dur, q)) for _ in range(procs)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    total = 0
    for _ in ps:
        total += q.get()
    for p in ps:
        p.join()
    dt = time.monotonic() - t0
    # compute: hash-ops/s aggregate; stream: GiB/s aggregate
    # (each stream iteration touches ~1.5 GiB: first-touch+fill+read of 512 MiB)
    return total / dt if kind == "compute" else total * 1.5 / dt


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--quick":
        # one 3 s stream measurement at 2 procs — the window indicator
        # bench.py embeds in its output JSON (healthy ≈ 8-10 GB/s here)
        print(json.dumps({"stream_gbps_2proc": round(run("stream", 2, 3.0), 1)}))
        return
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {}
    for kind in ("compute", "stream"):
        r_lo = run(kind, lo)
        r_hi = run(kind, hi)
        out[kind] = {
            f"procs{lo}": round(r_lo, 1),
            f"procs{hi}": round(r_hi, 1),
            f"speedup_{lo}_to_{hi}": round(r_hi / r_lo, 2),
            "efficiency": round(r_hi / r_lo / (hi / lo), 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
