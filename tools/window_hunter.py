"""Scaling-window hunter: fire single 2-vs-8 interleaved scaling pairs
only inside host windows that BOTH probes call healthy.

This sandbox host's effective memory bandwidth swings ~45x on minutes
timescales and it ALSO degrades on a CPU-side dimension the bandwidth
probe cannot see (the first hunter campaign's three stream-validated
attempts all ran the engine's own kernel 1.5-2x below its healthy
speed — see BASELINE.md "Window-hunter campaign"). A window is
therefore accepted only when

  - the 2-proc stream probe reads >= HUNT_MIN_GBPS (default 7), AND
  - the 1-proc MinHash-kernel probe reads >= HUNT_MIN_KBPS batches/s
    (default 1.55 = 0.85 x the observed healthy plateau of 1.82-1.90
    on the round-5 compute-only probe scale; the pre-recalibration
    scale read healthy ~1.1)

both BEFORE and AFTER the measurement. Every attempt (validated or
not) is appended to the JSONL log with its four probe readings, so the
record shows the full distribution, not a cherry-pick.

Usage:
  python tools/window_hunter.py [--want N] [--hours H] [--log PATH]
Env:
  BENCH_CORPUS_DIR   pre-written parquet corpus reused across legs
  BENCH_EXPAND       expansion factor when no corpus dir (default 400)
  HUNT_MIN_GBPS / HUNT_MIN_KBPS   gate thresholds
  HUNT_CPUS          one or more "lo,hi" pairs, ";"-separated (default
                     "2,8"); multiple pairs rotate across fired
                     attempts — e.g. "2,8;1,4" alternates the pair
                     that saturates the host memory controller at the
                     high leg with the pair that keeps BOTH legs under
                     it (the engine-isolating regime, BASELINE.md
                     round-4 "1-vs-4" note)
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe(script: str, key: str) -> float:
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", script), "--quick"],
            capture_output=True, text=True, timeout=120,
        )
        d = json.loads(r.stdout.strip().splitlines()[-1])
        return float(d.get(key, 0.0))
    except Exception:
        return 0.0


def probes() -> dict:
    return {
        "stream_gbps": _probe("host_wall.py", "stream_gbps_2proc"),
        "kernel_bps": _probe("sign_probe.py", "kernel_bps_1proc"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--want", type=int, default=3)
    ap.add_argument("--hours", type=float, default=5.0)
    ap.add_argument("--log", default="/tmp/hunt_scaling.jsonl")
    ap.add_argument(
        "--mode", choices=["strong", "weak", "alternate"], default="strong",
        help="strong: bench.py --scaling (same input both legs); weak: "
        "bench.py --weak-scaling (per-CPU data constant — the N vs 4N "
        "NODE analogue); alternate: one of each per healthy window",
    )
    args = ap.parse_args()

    min_gbps = float(os.environ.get("HUNT_MIN_GBPS", "7"))
    min_kbps = float(os.environ.get("HUNT_MIN_KBPS", "1.55"))
    cpu_pairs = os.environ.get("HUNT_CPUS", "2,8").split(";")
    deadline = time.time() + args.hours * 3600

    def log(rec: dict) -> None:
        rec["ts"] = time.time()
        with open(args.log, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    valid = 0
    n_fired = 0
    while valid < args.want and time.time() < deadline:
        pre = probes()
        if pre["stream_gbps"] < min_gbps or pre["kernel_bps"] < min_kbps:
            log({"event": "skip", **pre})
            time.sleep(150)
            continue
        if args.mode == "alternate":
            flavor = "strong" if n_fired % 2 == 0 else "weak"
        else:
            flavor = args.mode
        cpus = cpu_pairs[n_fired % len(cpu_pairs)]
        n_fired += 1
        log({"event": "fire", "flavor": flavor, "cpus": cpus, **pre})
        env = dict(os.environ)
        env.setdefault("BENCH_EXPAND", "400")
        env["BENCH_SCALING_REPEATS"] = "1"
        lo_c, hi_c = cpus.split(",")
        env["BENCH_CPUS_LO"], env["BENCH_CPUS_HI"] = lo_c, hi_c
        env["BENCH_WINDOW_WAIT_S"] = "0"  # hunter already gated
        env.pop("RAY_ADDRESS", None)
        flag = "--scaling" if flavor == "strong" else "--weak-scaling"
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), flag],
                capture_output=True, text=True, env=env, cwd=REPO,
                timeout=40 * 60,
            )
        except subprocess.TimeoutExpired:
            log({"event": "error", "err": "timeout"})
            continue
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            log({"event": "error", "stderr": r.stderr[-1500:]})
            continue
        rec = json.loads(lines[-1])
        post = probes()
        ok = (pre["stream_gbps"] >= min_gbps and pre["kernel_bps"] >= min_kbps
              and post["stream_gbps"] >= min_gbps
              and post["kernel_bps"] >= min_kbps)
        rec.update({"event": "attempt", "hunter_probe_pre": pre,
                    "hunter_probe_post": post, "window_valid": ok})
        log(rec)
        if ok:
            valid += 1
    log({"event": "done", "validated": valid})


if __name__ == "__main__":
    main()
