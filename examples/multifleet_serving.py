"""Heterogeneous fleet serving with exact mid-stream rate switches.

MultiFleet buckets streams by (in_rate, out_rate, quality) — each bucket
is one lockstep FleetResampler — with dynamic attach/detach and EXACT
per-stream drains (a stream leaving mid-quantum hands its lane state to a
single-stream core, so no output is lost or fabricated).  A mid-stream
set_stream_rate migrates the filter state through magic samples exactly
like the C core's update_filter (resample.c:727-782).
"""

import numpy as np

# runnable from a raw checkout: fall back to the repo root if the package
# is not installed
try:
    import speex_resampler_tpu  # noqa: F401
except ImportError:  # pragma: no cover
    import pathlib
    import sys as _sys
    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# honor JAX_PLATFORMS=cpu even where a device plugin clobbers the env var
# (the in-process config update is the only reliable selector)
import os as _os

if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

from speex_resampler_tpu.runtime import MultiFleet

CHANNELS = 2


def main() -> None:
    rng = np.random.default_rng(11)
    mf = MultiFleet(CHANNELS, capacity_per_bucket=8,
                    target_chunk_frames=512)

    # three streams, two different configs -> two buckets
    mf.add_stream("music", 44100, 48000, quality=7)
    mf.add_stream("voice", 16000, 48000, quality=5)
    mf.add_stream("aux", 44100, 48000, quality=7)

    out = {sid: 0 for sid in ("music", "voice", "aux")}
    pushed = {sid: 0 for sid in out}

    def push_some(sid, rate, n):
        frames = rng.integers(-20000, 20000, (n, CHANNELS), dtype=np.int16)
        mf.push(sid, frames)
        pushed[sid] += n

    for _ in range(6):
        push_some("music", 44100, int(rng.integers(500, 3000)))
        push_some("voice", 16000, int(rng.integers(200, 1200)))
        push_some("aux", 44100, int(rng.integers(500, 3000)))
        mf.poll()
        for sid in out:
            out[sid] += mf.pull(sid).shape[0]

    # live reconfiguration: "voice" upgrades 16k->48k to 24k->48k.  The
    # filter state migrates exactly; the stream keeps flowing.
    mf.set_stream_rate("voice", 24000, 48000)
    for _ in range(4):
        push_some("voice", 24000, int(rng.integers(200, 1200)))
        mf.poll()
        out["voice"] += mf.pull("voice").shape[0]

    # detach one stream early; the others are unaffected
    mf.end_stream("aux")
    out["aux"] += mf.pull("aux").shape[0]

    for sid in ("music", "voice"):
        mf.end_stream(sid)
        out[sid] += mf.pull(sid).shape[0]

    print(f"bucket stats: {list(mf.stats())}")
    for sid in out:
        print(f"  {sid}: pushed {pushed[sid]} frames -> {out[sid]} out")
    # every stream's full output was delivered despite bucketing, the rate
    # switch, and early detach (the exact counts are pinned in
    # tests/test_multifleet.py against the single-stream core)
    assert all(out[sid] > 0 for sid in out)
    print("ok")


if __name__ == "__main__":
    main()
