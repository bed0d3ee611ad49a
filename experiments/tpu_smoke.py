"""On-chip smoke: the full serving stack with the compiled (non-interpret)
Pallas kernel, verified against the CPU-validated XLA path."""
import numpy as np
import jax
from speex_resampler_tpu.parallel.batch import BatchedResampler
from speex_resampler_tpu.runtime.fleet import FleetResampler
from speex_resampler_tpu.runtime.multifleet import MultiFleet

assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(0)
S, C, n = 8, 2, 30000
frames = (rng.integers(-32768, 32768, size=(S, n, C)) // 2).astype(np.int16)

ref_eng = BatchedResampler(S, C, 44100, 48000, 7, use_pallas=False)
ref = np.concatenate([ref_eng.process(frames), ref_eng.flush()], axis=1)

eng = BatchedResampler(S, C, 44100, 48000, 7)  # pallas on TPU
got = np.concatenate([eng.process(frames), eng.flush()], axis=1)
d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
print(f"BatchedResampler pallas-vs-xla on chip: max|d|={d.max()} "
      f"rate={(d > 0).mean():.2e}")
assert d.max() <= 1

fleet = FleetResampler(4, 2, 44100, 48000, 7, target_chunk_frames=2048)
for s in range(4):
    fleet.push(s, frames[s])
fleet.poll()
fleet.flush()
for s in range(4):
    out = fleet.pull(s)
    m = min(out.shape[0], ref.shape[1])
    dd = np.abs(out[:m].astype(np.int32) - ref[s, :m].astype(np.int32))
    assert dd.max() <= 1, (s, dd.max())
print("FleetResampler on chip: ok", fleet.stats.as_dict())

mf = MultiFleet(channels=2, capacity_per_bucket=4, target_chunk_frames=2048)
mf.add_stream("a", 44100, 48000, 7)
mf.add_stream("b", 24000, 48000, 5)
mf.push("a", frames[0]); mf.push("b", frames[1])
mf.poll()
mf.flush()
a = mf.pull("a"); b = mf.pull("b")
m = min(a.shape[0], ref.shape[1])
da = np.abs(a[:m].astype(np.int32) - ref[0, :m].astype(np.int32))
assert da.max() <= 1, da.max()
print("MultiFleet on chip: ok (a:", a.shape, " b:", b.shape, ")")
print("ALL SMOKE OK")
