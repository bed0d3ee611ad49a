"""MultiFleet — heterogeneous serving: many streams, many configs.

Streams are bucketed by (in_rate, out_rate, quality) — SURVEY.md §7 hard
part 6 — with one lockstep ``FleetResampler`` per bucket and dynamic slot
occupancy (inactive slots are zero-filled by the native stager and excluded
from readiness).  Streams attach and detach at any time:

    mf = MultiFleet(channels=2, capacity_per_bucket=256)
    mf.add_stream("a", 44100, 48000, 7)
    mf.add_stream("b", 8000, 16000, 5)
    mf.push_bytes("a", pcm); mf.poll(); out = mf.pull_bytes("a")
    mf.end_stream("a")          # graceful drain; pull the tail, slot freed

Rate/quality changes mid-stream use drain-and-restart semantics
(``set_stream_rate``): the old config's output is drained exactly, then the
stream continues under the new config with fresh filter state.  (The exact
C-style magic-sample migration — carrying filter memory across the switch —
lives on the single-stream ``ResamplerCore.set_rate``; a lockstep bucket
cannot host per-stream divergent phase.)

Per-stream exactness: a stream that pushed ``n`` real frames ever gets
exactly ``producible_outputs(n)`` output frames (the reference's one-shot
count) — full quanta run on the batched device engine; the sub-quantum tail
at ``end_stream`` drains through a single-stream core seeded with the
lane's filter history, which is state-faithful because lanes sit at
``last_sample = samp_frac_num = 0`` on every quantum boundary.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.resampler import ResamplerCore
from ..utils.errors import ResamplerError, ResamplerErrorCode
from .fleet import FleetResampler

__all__ = ["MultiFleet"]


@dataclasses.dataclass
class _Stream:
    key: tuple
    slot: int | None        # None once the bucket slot has been freed
    real_frames: int = 0    # real (non-padding) frames pushed
    pulled: int = 0         # output frames already handed to the caller
    ended: bool = False
    limit_override: int | None = None
    carryover: np.ndarray | None = None  # output owed after slot release


class _Bucket:
    def __init__(self, fleet: FleetResampler):
        self.fleet = fleet
        self.free = list(range(fleet.n_streams - 1, -1, -1))
        for slot in range(fleet.n_streams):
            self.fleet.set_slot_active(slot, False)

    @property
    def occupied(self) -> int:
        return self.fleet.n_streams - len(self.free)


class MultiFleet:
    def __init__(self, channels: int, *, capacity_per_bucket: int = 256,
                 target_chunk_frames: int = 4096,
                 use_pallas: bool | None = None,
                 pallas_interpret: bool = False):
        self.channels = channels
        self.capacity = capacity_per_bucket
        self._target = target_chunk_frames
        self._use_pallas = use_pallas
        self._interpret = pallas_interpret
        self._buckets: dict[tuple, _Bucket] = {}
        self._streams: dict[object, _Stream] = {}

    # -- stream lifecycle --------------------------------------------------

    def add_stream(self, sid, in_rate: int, out_rate: int, quality: int = 7):
        if sid in self._streams:
            raise ResamplerError(ResamplerErrorCode.INVALID_ARG)
        key = (in_rate, out_rate, quality)
        b = self._buckets.get(key)
        if b is None:
            b = _Bucket(FleetResampler(
                self.capacity, self.channels, in_rate, out_rate, quality,
                target_chunk_frames=self._target,
                use_pallas=self._use_pallas,
                pallas_interpret=self._interpret))
            self._buckets[key] = b
        if not b.free:
            raise ResamplerError(ResamplerErrorCode.ALLOC_FAILED)
        slot = b.free.pop()
        b.fleet.set_slot_active(slot, True)
        b.fleet.clear_slot(slot)
        self._streams[sid] = _Stream(key=key, slot=slot)
        return sid

    def end_stream(self, sid):
        """Graceful end, effective immediately: any staged tail that has
        not reached a launch quantum is drained EXACTLY through a
        single-stream core seeded with the lane's filter history (the lane
        sits at last_sample = samp_frac_num = 0 at quantum boundaries, so
        the hand-off is state-faithful).  The slot frees at once and never
        gates its bucket."""
        st = self._stream(sid)
        if st.ended:
            return
        st.ended = True
        if st.slot is None:
            return
        b = self._buckets[st.key]
        fleet = b.fleet
        C = self.channels
        tail_in = fleet.peek_staged(st.slot)
        banked = fleet.pull(st.slot)
        parts = [banked] if len(banked) else []
        if len(tail_in):
            hist = fleet.lane_history(st.slot)
            ir, orr, q = st.key
            core = ResamplerCore(C, ir, orr, ir, orr, q)
            core.import_history(hist)
            parts.append(core.process_interleaved(tail_in, 10 ** 9))
        if parts:
            tail = np.concatenate(parts)
            st.carryover = (np.concatenate([st.carryover, tail])
                            if st.carryover is not None
                            and len(st.carryover) else tail)
        self._drop_slot(st)
        self._gc(sid)

    def remove_stream(self, sid):
        """Immediate detach: staged input is dropped; already-banked output
        stays pullable until collected."""
        st = self._stream(sid)
        st.ended = True
        if st.slot is not None:
            b = self._buckets[st.key]
            banked = b.fleet.pull(st.slot)
            if len(banked):
                st.carryover = (np.concatenate([st.carryover, banked])
                                if st.carryover is not None
                                and len(st.carryover) else banked)
            self._drop_slot(st)
        self._gc(sid)

    def set_stream_rate(self, sid, in_rate: int, out_rate: int,
                        quality: int | None = None):
        """Drain-and-restart: finish the old config exactly, re-attach
        under the new one.  Output the old config still owes is delivered
        ahead of new-config output on the next pull."""
        st = self._stream(sid)
        if quality is None:
            quality = st.key[2]
        # Verify the new bucket can host the stream BEFORE tearing the old
        # one down: a full target bucket would otherwise raise ALLOC_FAILED
        # after the sid was popped, losing the drained carryover the old
        # config still owed.  (Same-bucket switches are always safe: ending
        # the stream frees its own slot.)
        new_key = (in_rate, out_rate, quality)
        nb = self._buckets.get(new_key)
        if (nb is not None and not nb.free
                and not (new_key == st.key and st.slot is not None)):
            raise ResamplerError(ResamplerErrorCode.ALLOC_FAILED)
        self.end_stream(sid)
        tail = st.carryover
        self._streams.pop(sid, None)
        self.add_stream(sid, in_rate, out_rate, quality)
        self._streams[sid].carryover = tail
        return sid

    # -- dataflow ------------------------------------------------------------

    def push(self, sid, frames: np.ndarray) -> None:
        st = self._stream(sid)
        if st.ended:
            raise ResamplerError(ResamplerErrorCode.INVALID_ARG)
        b = self._buckets[st.key]
        frames = np.asarray(frames, dtype=np.int16)
        b.fleet.push(st.slot, frames)
        st.real_frames += frames.shape[0]

    def push_bytes(self, sid, data: bytes) -> int:
        st = self._stream(sid)
        if st.ended:
            raise ResamplerError(ResamplerErrorCode.INVALID_ARG)
        n = self._buckets[st.key].fleet.push_bytes(st.slot, data)
        st.real_frames += n
        return n

    def poll(self) -> int:
        total = 0
        for b in self._buckets.values():
            total += b.fleet.poll()
        return total

    def pull(self, sid) -> np.ndarray:
        st = self._stream(sid)
        parts = []
        if st.carryover is not None and len(st.carryover):
            parts.append(st.carryover)
        st.carryover = None
        if st.slot is not None:
            got = self._collect(sid)
            if len(got):
                parts.append(got)
        out = (np.concatenate(parts) if parts
               else np.zeros((0, self.channels), dtype=np.int16))
        self._gc(sid)
        return out

    def pull_bytes(self, sid) -> bytes:
        return self.pull(sid).astype("<i2").tobytes()

    def flush(self) -> None:
        """End-of-world drain of every bucket."""
        for sid in list(self._streams):
            if not self._streams[sid].ended:
                self.end_stream(sid)
        self.poll()

    def stats(self) -> dict:
        return {str(k): b.fleet.stats.as_dict()
                for k, b in self._buckets.items()}

    # -- internals -----------------------------------------------------------

    def _stream(self, sid) -> _Stream:
        try:
            return self._streams[sid]
        except KeyError:
            raise ResamplerError(ResamplerErrorCode.INVALID_ARG) from None

    def _collect(self, sid) -> np.ndarray:
        st = self._streams[sid]
        out = self._buckets[st.key].fleet.pull(st.slot)
        st.pulled += out.shape[0]
        return out

    def _drop_slot(self, st: _Stream):
        """Free the bucket slot (caller has already salvaged its output)."""
        b = self._buckets[st.key]
        b.fleet.set_slot_active(st.slot, False)
        b.fleet._out[st.slot] = []
        b.free.append(st.slot)
        st.slot = None

    def _gc(self, sid):
        st = self._streams.get(sid)
        if st is None or not st.ended or st.slot is not None:
            return
        if st.carryover is None or not len(st.carryover):
            self._streams.pop(sid, None)

