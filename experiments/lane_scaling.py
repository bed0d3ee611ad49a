"""Lane-axis (batch) scaling of the flagship kernel on the real chip.

The launch-size (time-axis) scaling is characterized in docs/design.md;
this sweeps the LANE axis B = streams*channels at fixed per-lane launch
geometry (flagship 44.1k->48k q7, 9408 in-frames/lane), answering "how
many concurrent streams saturate one chip?" — the fleet-sizing question
(reference scaling contract: one state per stream, Readme.md:20-21).

Usage: python experiments/lane_scaling.py [n_slopes]
Prints one line per B with ms/launch and out-samples/s; reuses bench.py's
scan-slope methodology (tunnel-immune).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main():
    n_slopes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rows = []
    for b_lanes in (256, 512, 1024, 2048, 4096, 8192):
        bench.N_STREAMS = b_lanes // bench.CHANNELS
        m = bench.measure_config(*bench.FLAGSHIP, use_pallas=True,
                                 n_slopes=n_slopes)
        per_lane = m["out_frames_per_launch"]
        rows.append((b_lanes, m["launch_ms"], m["launch_ms_best"],
                     m["out_samples_per_sec"],
                     m["out_samples_per_sec_best"]))
        print(f"B={b_lanes:5d}  {m['launch_ms']:7.4f} ms "
              f"(best {m['launch_ms_best']:7.4f})  "
              f"{m['out_samples_per_sec']/1e9:6.1f} G out/s "
              f"(best {m['out_samples_per_sec_best']/1e9:6.1f})  "
              f"[{per_lane} out-frames/lane]", flush=True)
    base = rows[0]
    print("\nscaling vs B=256 (median):")
    for r in rows:
        print(f"  B={r[0]:5d}: {r[3]/base[3]:5.2f}x throughput at "
              f"{r[1]/base[1]:5.2f}x launch time")


if __name__ == "__main__":
    main()
