"""Periodic flagship quiet-window probe.

The tunnel chip is shared; BENCH medians are contention-dominated
(docs/design.md "Roofline").  This probe re-measures the flagship config
(Q7 44.1k->48k, 1024 streams, int8 tiled) every few minutes and logs each
window's slope to build/quiet_probe.jsonl, so a genuinely quiet window —
if one occurs during the session — is captured with a timestamp instead
of being anecdote.  Usage:

    python experiments/quiet_probe.py [--rounds 8] [--sleep-s 120]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # reuses the exact headline measurement machinery


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--sleep-s", type=float, default=120.0)
    args = ap.parse_args()

    out = Path(__file__).resolve().parent.parent / "build" / "quiet_probe.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    best = None
    for i in range(args.rounds):
        t0 = time.time()
        m = bench.measure_config(
            *bench.FLAGSHIP,
            use_pallas=jax.default_backend() == "tpu", n_slopes=3)
        row = {
            "ts": time.time(),
            "round": i,
            "launch_ms": round(m["launch_ms"], 4),
            "launch_ms_best": round(m["launch_ms_best"], 4),
            "launch_ms_quiet": round(m["launch_ms_quiet"], 4),
            "spread": round(m["launch_ms_spread"], 3),
            "out_sps_quiet": int(m["out_samples_per_sec_quiet"]),
            "wall_s": round(time.time() - t0, 1),
        }
        with out.open("a") as f:
            f.write(json.dumps(row) + "\n")
        if best is None or row["launch_ms_best"] < best:
            best = row["launch_ms_best"]
        print(json.dumps(row), flush=True)
        if i + 1 < args.rounds:
            time.sleep(args.sleep_s)
    print(json.dumps({"best_launch_ms_overall": best}), flush=True)


if __name__ == "__main__":
    main()
