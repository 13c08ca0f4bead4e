"""Engine-shaped host probe: the actual MinHashSigner kernel on a
synthetic 4096-row Arrow batch, run under bare multiprocessing (no Ray)
at two process counts. Distinguishes 'Ray overhead' from 'host ceiling
for this workload shape'."""
import multiprocessing as mp
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def make_batch():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(0)
    words = [f"word{i}" for i in range(5000)]
    docs = [" ".join(rng.choice(words, size=400)) for _ in range(4096)]
    return pa.table(
        {
            "doc_hash": pa.array(rng.integers(0, 2**62, 4096), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(4096)]),
            "size_bytes": pa.array([len(d) for d in docs], pa.int64()),
            "text": pa.array(docs),
        }
    )


def worker(dur, out):
    from dedup.config import DedupConfig
    from dedup.minhash import MinHashSigner

    s = MinHashSigner(DedupConfig())
    b = make_batch()
    s(b)  # warm
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < dur:
        s(b)
        n += 1
    # report the worker's OWN compute-window rate: the parent's wall
    # clock includes ~4 s of per-process setup (imports + make_batch +
    # warm call), which used to dilute the reading by ~35% at dur=6 and
    # made the probe track allocation/first-touch cost instead of the
    # kernel. Each worker's n/elapsed is a pure measure of the kernel
    # under whatever CPU steal the host is applying in the window.
    out.put(n / (time.monotonic() - t0))


def run(procs, dur=12.0):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(dur, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


if __name__ == "__main__":
    import json
    import statistics

    if len(sys.argv) > 1 and sys.argv[1] == "--quick":
        # one short 1-proc ABSOLUTE kernel-speed measurement — the
        # window indicator the scaling hunter gates on alongside the
        # stream probe. The hunter's first campaign proved the stream
        # probe necessary but NOT sufficient: three stream-validated
        # windows still ran this kernel 1.5-2x below its healthy
        # speed (a CPU-side host degradation bandwidth can't see), so
        # windows are now accepted only when BOTH probes read healthy.
        # Healthy plateau for the compute-only reading with the round-5
        # kernel: ~1.7 batches/s (0.59 s/call measured in-process; the
        # old setup-inclusive reading saturated at ~1.1 by construction
        # — see BASELINE.md "round-5 probe recalibration").
        print(json.dumps({"kernel_bps_1proc": round(run(1, dur=6.0), 3)}))
        sys.exit(0)

    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # interleave legs (lo,hi,lo,hi,…): this host's bandwidth drifts on
    # minutes timescales — block-ordered legs let a window flip
    # masquerade as (anti-)scaling
    ls, hs = [], []
    for _ in range(reps):
        ls.append(run(lo))
        hs.append(run(hi))
    r_lo, r_hi = statistics.median(ls), statistics.median(hs)
    print(
        json.dumps(
            {
                f"batches_per_sec_{lo}p": round(r_lo, 2),
                f"batches_per_sec_{hi}p": round(r_hi, 2),
                "all_lo": [round(x, 2) for x in ls],
                "all_hi": [round(x, 2) for x in hs],
                "speedup": round(r_hi / r_lo, 2),
                "efficiency": round(r_hi / r_lo / (hi / lo), 2),
                "reps": reps,
                "aggregation": "median",
            }
        )
    )
