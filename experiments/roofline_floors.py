"""Two-resource roofline audit: MXU floor vs HBM floor per bench config.

The bench roofline (`bench._roofline_ms`) is MXU-only.  Two symptoms say
that is not the whole floor:
  * 44100->24000 q5 recorded roofline_frac_quiet = 1.102 (measured quiet
    launch FASTER than the modeled floor) in both the driver r03 run and
    the local r04 run -- a systematic ~10% overestimate for that geometry.
  * direct-path (small-den) configs sit at 0.34-0.38 of the MXU floor even
    in quiet windows, suggesting a different resource binds.

This experiment rebuilds every bench config exactly as bench.py does and
prints, per config:
  mxu_ms   -- the current scheme-aware MXU model
  hbm_ms   -- bytes-touched / 819 GB/s (v5e HBM BW): input block + output
              block + history + every weight operand, once per launch
  both floors vs the last recorded quiet launch_ms (BENCH_LOCAL_r04.json)

so we can decide whether roofline_ms should become max(mxu, hbm).
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import make_batched_step
from bench import _launch_geometry, _roofline_ms, N_STREAMS, CHANNELS, \
    TARGET_IN_FRAMES

HBM_GBPS = 819e9   # v5e HBM bandwidth


def _tree_bytes(w):
    total = 0
    stack = [w]
    while stack:
        o = stack.pop()
        if isinstance(o, (list, tuple)):
            stack.extend(o)
        elif isinstance(o, dict):
            stack.extend(o.values())
        elif hasattr(o, "nbytes"):
            total += int(np.asarray(o).nbytes)
    return total


def hbm_ms(bstep, bspec, B):
    # per-launch HBM traffic: read input block + history, read all weight
    # operands once, write output block + new history.  (int8 digit planes
    # and fixed column pairs are separate operands and counted via their
    # actual nbytes.)
    io = 2 * B * (bstep.chunk_rows + bspec.out_per_launch
                  + 2 * bstep.hist_rows)
    wbytes = _tree_bytes(bstep.w)
    return (io + wbytes) / HBM_GBPS * 1e3


def main():
    rows = []
    recorded = {}
    try:
        d = json.load(open(os.path.join(os.path.dirname(__file__), os.pardir,
                                        "BENCH_LOCAL_r04.json")))
        x = d["extra"]
        recorded["44100->48000 q7 float"] = x.get("launch_ms_quiet")
        for k, v in x.get("sweep", {}).items():
            recorded[k + " float"] = v.get("launch_ms_quiet")
        for k, v in x.get("fixed_point_universe", {}).items():
            recorded[k + " fixed"] = v.get("launch_ms_quiet")
    except Exception:
        pass

    B = N_STREAMS * CHANNELS
    configs = [
        (44100, 48000, 7, False),
        (24000, 48000, 5, False),
        (48000, 44100, 10, False),
        (44100, 24000, 5, False),
        (44100, 48000, 7, True),
        (24000, 48000, 5, True),
    ]
    print(f"{'config':28s} {'kern':8s} {'schm':6s} {'mxu_ms':>8s} "
          f"{'hbm_ms':>8s} {'bound':>6s} {'quiet':>8s} {'frac_old':>8s} "
          f"{'frac_new':>8s}")
    for in_r, out_r, q, fx in configs:
        g = math.gcd(in_r, out_r)
        spec = fd.design_filter(in_r // g, out_r // g, q, fixed_point=fx)
        bspec = _launch_geometry(spec, TARGET_IN_FRAMES, use_pallas=True)
        bstep = make_batched_step(spec, bspec, use_pallas=True)
        mxu = _roofline_ms(bstep, bspec, B)
        hbm = hbm_ms(bstep, bspec, B)
        name = f"{in_r}->{out_r} q{q} {'fixed' if fx else 'float'}"
        quiet = recorded.get(name)
        new = max(mxu, hbm) if mxu else hbm
        print(f"{name:28s} {bspec.kernel:8s} {bstep.scheme:6s} "
              f"{mxu:8.4f} {hbm:8.4f} "
              f"{'HBM' if hbm > (mxu or 0) else 'MXU':>6s} "
              f"{quiet if quiet is not None else float('nan'):8.4f} "
              f"{(mxu / quiet if quiet else float('nan')):8.3f} "
              f"{(new / quiet if quiet else float('nan')):8.3f}")
        rows.append((name, mxu, hbm, quiet))


if __name__ == "__main__":
    main()
