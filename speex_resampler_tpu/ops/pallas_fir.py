"""Pallas TPU kernel for the resampler hot path.

Fuses, in one VMEM-resident pass (the BASELINE north-star kernel):
    s16 -> f32 widen  ->  phase-indexed polyphase FIR (MXU matmuls)
                      ->  WORD2INT saturate/round  ->  s16 out
replacing the reference's per-sample C inner loops
(resampler_basic_direct/_interpolate, resample.c:331-559) and the
s16<->float conversions around them (resample.c:1000-1006, :1018-1023).

Layout: **time-major** ``x[T, B]`` with the B = streams*channels lane axis
last (multiple-of-128 lanes).  Viewing x as ``[T//stride, stride, B]``, the
patch for output super-block ``b`` is rows ``b : b+A`` — a leading-axis
slice of whole (sublane, lane) tiles, so no unaligned lane rotations ever
happen.  The dense padded weight matrix W[L, R] (ops/phase.py) splits into
A = L//stride aligned chunks, and each super-block is A accumulated MXU
matmuls

    Y[b] = WORD2INT( sum_a  W_a^T [R, stride] @ x[b+a] [stride, B] )

Grid: (lane tiles, super-blocks); the x lane-tile is fetched to VMEM once
per lane tile (its index map ignores the block dimension) and reused across
all super-blocks, so HBM traffic is exactly one s16 read of x and one s16
write of y — speed-of-light for this memory-bound op.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["resample_conv_tm_pallas", "resample_conv_tm_pallas_v3",
           "resample_conv_tm_pallas_v4", "pick_lane_tile"]

_LANE = 128
# per-program VMEM budget for the x tile; Pallas double-buffers grid inputs,
# so the slab costs 2x this against the ~16 MB scoped VMEM limit
_X_TILE_BYTES = 5 * 1024 * 1024


def pick_lane_tile(T: int, B: int, reserve: int = 0) -> int:
    """Largest multiple-of-128 lane tile whose x slab fits the VMEM budget.

    ``reserve`` carves out room for other VMEM residents (e.g. the v2
    kernel's whole weight set); the double-buffered x slab then gets up to
    (14 MB - reserve)/2 but never more than the default budget."""
    budget = min(_X_TILE_BYTES, max((14 * 1024 * 1024 - reserve) // 2,
                                    1 << 20))
    lb = budget // (2 * T)
    lb = (lb // _LANE) * _LANE
    return max(_LANE, min(lb, B))


def split5_weights(w):
    """Host-side 3-term bf16 decomposition of f32 weights for the split5
    scheme: w ~= w_hi + w_mid + w_lo with each term bf16-exact.

    Combined with the EXACT 2-term bf16 split of the int16-valued input
    (x = bf16(x) + (x - bf16(x)), both parts integers within bf16's exact
    range), five single-pass bf16 MXU products reproduce the f32 dot to
    better accuracy than Precision.HIGHEST's generic 6-pass scheme — the
    dropped w_lo*x_lo term is bounded by 2^-17|w|*128 per tap (measured:
    max|err| 0.016 vs f64, WORD2INT tie rate 8.8e-4 < HIGHEST's 1.25e-3;
    experiments/split_accuracy.py).  w: f32[..., K, R] (or any shape);
    returns bf16[3, ...].
    """
    import ml_dtypes
    w = np.asarray(w, dtype=np.float32)
    hi = w.astype(ml_dtypes.bfloat16)
    mid = (w - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    lo = (w - hi.astype(np.float32)
          - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([hi, mid, lo])


def int8_weights(w, digits: int = 3):
    """Host-side int8 digit-plane decomposition (ops/int8_planes.py) for
    the "int8" scheme: returns (planes int8[D, P, K, R], bias f32[P, R],
    scales tuple, err_bound).  The MXU runs int8 dots at 2x the bf16 rate,
    so 2*D int8 passes cost ~D bf16-equivalents vs split5's 5 — measured
    ~1.35x faster at the flagship geometry for D=3
    (experiments/v5_int8_bench.py), reversing the round-1 Mosaic slow-path
    finding.  D=4 (8 passes, still under split5) tightens the worst-case
    certificate ~17x for long filters.  Exactness is gated by the
    decomposition's rigorous certificate."""
    from . import int8_planes
    sw = {3: 23, 4: 31}.get(digits, 23)
    pl8 = int8_planes.decompose(np.asarray(w, dtype=np.float32), sw=sw,
                                digits=digits)
    return (pl8.planes, pl8.bias, tuple(float(s) for s in pl8.scales),
            float(pl8.err_bound))


def int8_weights_auto(w, gate: float):
    """Smallest digit count whose certificate clears ``gate`` (3 then 4);
    None if even 4 digits cannot."""
    for digits in (3, 4):
        planes = int8_weights(w, digits=digits)
        if planes[3] <= gate:
            return planes
    return None


def _dot_int8(plane, bias_row, u32, scales):
    """2*D int8 MXU dots: x = 256*(x>>8) + ((x&255)-128) + 128; the +128
    lands in the precomputed per-output bias (128 * sum of weights)."""
    xh = (u32 >> 8).astype(jnp.int8)
    xl = ((u32 & 255) - 128).astype(jnp.int8)
    acc = jnp.zeros((plane(0).shape[0], u32.shape[1]), jnp.float32)
    for d in range(len(scales)):
        ah = jnp.dot(plane(d), xh, preferred_element_type=jnp.int32)
        al = jnp.dot(plane(d), xl, preferred_element_type=jnp.int32)
        acc += (256 * ah + al).astype(jnp.float32) * scales[d]
    return acc + bias_row[:, None]


def fixed_weight_planes_tiled(w16):
    """Host-side EXACT plane decomposition for the "fixed" scheme
    (FIXED_POINT universe, int16 taps).

    Realizable Q15 taps satisfy |w| <= 32768*cutoff < 32639 (cutoff <= .975,
    resample.c:226-238), so a balanced base-256 split w = 256*wh + wl0 with
    wh, wl0 in [-128, 127] is exact with NO constant term; the input's
    +128 plane lands in a per-output int32 bias of 128*sum_K(w) — making
    the int16 x int16 dot exactly four int8 MXU passes plus a bias add.

    w16: int16 [P, K, C] tiled weights (C = R, or n_accum*R with the
    accumulator index MAJOR: column c*R + r).  Returns
    (planes int8 [2, P, C, K]  — pre-transposed to the kernel's [R, K]
    operand layout, bias int32 [P, C]).  The split itself is the shared
    fixed_math.balanced_q15_split (one definition across all fixed
    paths); this wrapper only lays it out for the tiled kernels."""
    from .fixed_math import balanced_q15_split
    wh, wl0, bias = balanced_q15_split(w16, tap_axis=1)  # bias [P, C]
    planes = np.stack([wh, wl0]).transpose(0, 1, 3, 2)
    return np.ascontiguousarray(planes), bias


# canonical Q15 device epilogues (shared with the XLA dense twin so the
# three fixed paths cannot desynchronize)
from .fixed_math import (sat32pshr15_jax as _sat32pshr15,          # noqa: E402
                         fixed_interp_mix_rows_jax as _fixed_mix_rows)


def _dot_fixed(plane, bias_row, u16):
    """Exact fixed-universe dot: 4 int8 MXU passes, int32 wrap combine.

    plane(0)=wh, plane(1)=wl0 (int8 [R, K]); u16: int16 scratch [K, lb];
    bias_row: int32 [R].  Returns the exact (mod 2^32) int32 sum
    sum_K w*x — bit-identical to the C accumulator, any summation order."""
    u32 = u16.astype(jnp.int32)
    xh = (u32 >> 8).astype(jnp.int8)
    xl = ((u32 & 255) - 128).astype(jnp.int8)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.int32)
    wh, wl = plane(0), plane(1)
    acc = ((d(wh, xh) << 16) + ((d(wh, xl) + d(wl, xh)) << 8)
           + d(wl, xl))
    return acc + bias_row[:, None]


def _dot_scheme(plane, xf, scheme: str):
    """One output block's matmul under the selected precision scheme.

    ``plane(p)`` returns the [R, K] weight operand for pass p — the full
    f32 matrix for "highest" (p=0), the stacked bf16 planes for "split5"
    (p in 0..2).

    scheme == "highest": f32 dot at Precision.HIGHEST (the Mosaic default
    is a single bf16 pass with ~100 LSB of s16 error; HIGHEST's multi-pass
    f32 scheme keeps the <=1 LSB contract).
    scheme == "split5": 5 single-pass bf16 dots (see split5_weights).
    """
    if scheme == "split5":
        xh = xf.astype(jnp.bfloat16)
        xl = (xf - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jnp.dot,
                              preferred_element_type=jnp.float32)
        w_hi, w_mid, w_lo = plane(0), plane(1), plane(2)
        return (d(w_hi, xh) + d(w_hi, xl) + d(w_mid, xh) + d(w_mid, xl)
                + d(w_lo, xh))
    return jnp.dot(plane(0), xf, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _word2int(x):
    """WORD2INT (arch.h:208-209) — see ops/convert.py; inlined here so the
    saturate/round fuses into the kernel epilogue on the VPU."""
    y = jnp.floor(0.5 + x)
    y = jnp.where(x < -32767.5, -32768.0, y)
    y = jnp.where(x > 32766.5, 32767.0, y)
    return y.astype(jnp.int16)


def _kernel(w_ref, x_ref, o_ref, *, A: int):
    # Precision.HIGHEST is load-bearing: the default lets Mosaic run the f32
    # matmul as one bf16 MXU pass (~7 bits of mantissa — up to ~100 LSB of
    # s16 error, measured); HIGHEST selects the multi-pass f32 scheme that
    # keeps the ≤1 LSB contract.
    j = pl.program_id(1)
    acc = jnp.dot(w_ref[0], x_ref[j].astype(jnp.float32),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    for a in range(1, A):
        acc += jnp.dot(w_ref[a], x_ref[j + a].astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    o_ref[0] = _word2int(acc)


@functools.partial(jax.jit,
                   static_argnames=("stride", "interpret", "lane_tile"))
def resample_conv_tm_pallas(x, w, *, stride: int, interpret: bool = False,
                            lane_tile: int | None = None):
    """Time-major resample launch on TPU.

    x: int16[T, B]   T % stride == 0, samples = history ++ chunk ++ pad
    w: f32[L, R]     padded phase weights (ops/phase.build_padded_weights),
                     L % stride == 0
    returns int16[n_blocks * R, B] with n_blocks = T//stride - L//stride.
    """
    L, R = w.shape
    T, B = x.shape
    assert T % stride == 0 and L % stride == 0, (T, L, stride)
    A = L // stride
    n_blocks = T // stride - A
    assert n_blocks >= 1

    # W -> A chunks of [R, stride] (tiny; folded by XLA around the kernel)
    wA = w.reshape(A, stride, R).transpose(0, 2, 1).astype(jnp.float32)

    B_pad = -(-B // _LANE) * _LANE
    if B_pad != B:
        x = jnp.pad(x, ((0, 0), (0, B_pad - B)))
    lb = lane_tile or pick_lane_tile(T, B_pad)
    lb = min(lb, B_pad)
    n_lane_tiles = -(-B_pad // lb)
    if n_lane_tiles * lb != B_pad:
        x = jnp.pad(x, ((0, 0), (0, n_lane_tiles * lb - B_pad)))
        B_pad = n_lane_tiles * lb

    xr = x.reshape(T // stride, stride, B_pad)

    y = pl.pallas_call(
        functools.partial(_kernel, A=A),
        grid=(n_lane_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec((A, R, stride), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T // stride, stride, lb), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, lb), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, B_pad), jnp.int16),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * R * L * B_pad,
            bytes_accessed=T * B_pad * 2 + n_blocks * R * B_pad * 2,
            transcendentals=0),
        interpret=interpret,
    )(wA, xr)

    y = y.reshape(n_blocks * R, B_pad)
    return y[:, :B] if B_pad != B else y


# ---------------------------------------------------------------------------
# v3: concat-free phase-tiled kernel.
#
# Phase-tiled design: outputs in blocks of exactly R = 128 (one full MXU
# pass on the output axis) with cyclic per-block-phase weights
# (ops/phase.build_phase_tiled_weights) kept resident in VMEM; each program
# executes whole weight periods so every weight index and input offset is a
# compile-time constant.  Earlier revisions (see git history /
# docs/design.md) consumed one contiguous [T, B] slab, which forced the
# engine step to materialize concat(history, chunk, pad) — a full extra
# read+write of the chunk (~0.2 ms of the 0.78 ms flagship launch).  v3
# reads the history and the chunk as SEPARATE refs and assembles each
# block's patch in VMEM scratch from statically-split aligned copies:
#
#   virtual axis = hist_pad(H rows) ++ chunk, H = filt_len-1 rounded up to
#   16; the sub-16 remainder is folded into the weights as an origin shift
#   (ops/phase.build_phase_tiled_weights(origin_shift=H-(filt_len-1))), so
#   the hist/chunk boundary and every patch start stay 16-aligned.
#
# The chunk is viewed through V overlapping S-row block windows (the same
# array passed V times with index maps j-1+v), so a period's patches span
# [j*S - H, j*S + S + K) without any halo materialization.  All split
# points are compile-time constants; only the j==0 branch (history prefix)
# is a runtime predicate.
# ---------------------------------------------------------------------------


def _v3_back(S: int, H: int) -> int:
    """How many S-blocks of look-back the history prefix spans."""
    return -(-H // S)


def _v3_views(S: int, K: int, H: int, offsets) -> int:
    """Number of S-row chunk views a period's patches can touch."""
    back = _v3_back(S, H)
    off_max = int(max(offsets))
    return (back * S - H + off_max + K - 1) // S + 1


def _v3_parts(off: int, S: int, K: int, H: int, j_case):
    """Static copy plan for one block's patch: tuple of (src, s0, dst, len)
    where src is 'h' (history ref) or a chunk view index.

    j_case: an int j < back (periods whose patches may reach into the
    history prefix), or "general" for j >= back, where view v holds chunk
    block j - back + v.
    """
    back = _v3_back(S, H)
    parts = []
    r = 0
    while r < K:
        if j_case != "general":
            vrow = j_case * S + off + r     # virtual row (hist ++ chunk)
            if vrow < H:
                ln = min(H - vrow, K - r)
                parts.append(("h", vrow, r, ln))
                r += ln
                continue
            c = vrow - H
            v = c // S + back - j_case
            s0 = c % S
        else:
            u = back * S - H + off + r      # row relative to view-0 base
            v = u // S
            s0 = u - v * S
        ln = min(S - s0, K - r)
        parts.append((v, s0, r, ln))
        r += ln
    return tuple(parts)


def _kernel_v3(w_ref, *rest, offs: tuple, S: int, K: int, H: int,
               n_views: int, gp: int, scheme: str = "highest",
               scales: tuple = (), n_accum: int = 1):
    coef_ref = None
    if scheme == "fixed" and n_accum == 4:
        b_ref, coef_ref, h_ref = rest[0], rest[1], rest[2]
        rest = rest[3:]
    elif scheme in ("int8", "fixed"):
        b_ref, h_ref = rest[0], rest[1]
        rest = rest[2:]
    else:
        b_ref, h_ref = None, rest[0]
        rest = rest[1:]
    view_refs = rest[:n_views]
    o_ref = rest[n_views]
    scratch = rest[n_views + 1]
    j = pl.program_id(1)   # program = gp consecutive periods
    back = _v3_back(S, H)
    P = len(offs)

    def assemble(parts, extra_views: int):
        for src, s0, dst, ln in parts:
            ref = h_ref if src == "h" else view_refs[src + extra_views]
            scratch[pl.ds(dst, ln), :] = ref[pl.ds(s0, ln), :].astype(
                scratch.dtype)

    for g in range(gp):
        # global period index = j*gp + g; view v holds chunk block
        # j*gp - back + v, so period g's plans shift by g view slots
        for m, off_m in enumerate(offs):
            gen = _v3_parts(off_m, S, K, H, "general")
            cases = [(jc, _v3_parts(off_m, S, K, H, jc))
                     for jc in range(back)]
            cases = [(jc, pl_) for jc, pl_ in cases if pl_ != gen]
            if not cases or g >= back:
                # period index j*gp+g >= back guaranteed when g >= back
                assemble(gen, g)
            else:
                # the general plan must fire whenever NO explicit case
                # matches — including periods < back whose case plan
                # coincided with the general plan and was filtered out of
                # ``cases`` (otherwise the scratch keeps the previous
                # block's data and the block is garbage)
                period = j * gp + g
                cond = period != cases[0][0]
                for jc, _ in cases[1:]:
                    cond = jnp.logical_and(cond, period != jc)

                @pl.when(cond)
                def _(gen=gen, g=g):
                    assemble(gen, g)

                for jc, plan in cases:
                    @pl.when(period == jc)
                    def _(plan=plan, g=g):
                        # jc-case plans carry view indices computed for
                        # absolute period jc (v = c//S + back - jc); under
                        # the period == jc predicate the program's window
                        # (base j*gp - back, shifted g slots) maps view
                        # v + g to chunk block c//S exactly — in WHICHEVER
                        # program the period lands (j > 0 when back > gp)
                        assemble(plan, g)
            # precision scheme is load-bearing; see _dot_scheme/_kernel.
            if scheme == "fixed":
                acc = _dot_fixed(lambda p: w_ref[p, m], b_ref[m],
                                 scratch[...])
                if n_accum == 4:
                    o_ref[g * P + m] = _fixed_mix_rows(acc, coef_ref[m])
                else:
                    o_ref[g * P + m] = _sat32pshr15(acc)
            elif scheme == "int8":
                acc = _dot_int8(lambda p: w_ref[p, m], b_ref[m],
                                scratch[...].astype(jnp.int32), scales)
                o_ref[g * P + m] = _word2int(acc)
            else:
                plane = ((lambda p: w_ref[p, m]) if scheme == "split5"
                         else (lambda p: w_ref[m]))
                o_ref[g * P + m] = _word2int(
                    _dot_scheme(plane, scratch[...], scheme))


def _v3_periods_per_program(P: int) -> int:
    """Small weight cycles (e.g. integer ratios, P == 1) would otherwise
    yield one tiny block per program; batch ~20 blocks per program like the
    flagship's natural P."""
    return max(1, 20 // P)


@functools.partial(jax.jit, static_argnames=("offsets", "S", "n_blocks",
                                             "interpret", "lane_tile",
                                             "scheme", "scales", "n_accum"))
def resample_conv_tm_pallas_v3(hist, x, w, offsets: tuple, *, S: int,
                               n_blocks: int, interpret: bool = False,
                               lane_tile: int | None = None,
                               scheme: str = "highest",
                               scales: tuple = (), n_accum: int = 1):
    """Concat-free phase-tiled launch.

    hist: int16[H, B]      H = round16(filt_len-1) trailing samples
    x:    int16[T_c, B]    T_c = (n_periods + V - 1) * S; real data in
                           rows [0, n_in), zeros in [n_in, n_in + K)
    w:    scheme "highest": f32[P, K, R]; scheme "split5":
          bf16[3, P, K, R] pre-split by split5_weights; scheme "int8":
          (planes int8[3, P, K, R], bias f32[P, R]) from int8_weights,
          with the digit ``scales`` passed statically.  Built with
          origin_shift = H - (filt_len - 1).
    returns int16[n_blocks * R, B];  n_blocks // P must be a multiple of
    _v3_periods_per_program(P).
    """
    bias = coef = None
    if scheme == "fixed":
        # exact FIXED_POINT universe: w = (planes int8[2, P, C, K] ALREADY
        # in [R, K] operand layout (fixed_weight_planes_tiled), bias
        # int32[P, C][, coef int32[P, 4, R] when n_accum == 4]); C = R or 4R
        if n_accum == 4:
            wT, bias, coef = w
        else:
            wT, bias = w
        assert wT.dtype == jnp.int8, wT.dtype
        _, P, C, K = wT.shape
        R = C // n_accum
        w_specs = [pl.BlockSpec((2, P, C, K), lambda i, j: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((P, C), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)]
        if n_accum == 4:
            w_specs.append(pl.BlockSpec((P, 4, R), lambda i, j: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
    elif scheme == "int8":
        planes, bias = w
        assert planes.dtype == jnp.int8, planes.dtype
        D, P, K, R = planes.shape
        wT = planes.transpose(0, 1, 3, 2)  # [D, P, R, K]
        w_specs = [pl.BlockSpec((D, P, R, K), lambda i, j: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((P, R), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)]
    elif scheme == "split5":
        assert w.ndim == 4 and w.dtype == jnp.bfloat16, (w.shape, w.dtype)
        _, P, K, R = w.shape
        wT = w.transpose(0, 1, 3, 2)  # [3, P, R, K]
        w_specs = [pl.BlockSpec((3, P, R, K), lambda i, j: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)]
    else:
        P, K, R = w.shape
        wT = w.transpose(0, 2, 1).astype(jnp.float32)  # [P, R, K]
        w_specs = [pl.BlockSpec((P, R, K), lambda i, j: (0, 0, 0),
                                memory_space=pltpu.VMEM)]
    H, B = hist.shape
    T_c = x.shape[0]
    assert H % 16 == 0 and x.shape[1] == B
    n_periods = n_blocks // P
    gp = _v3_periods_per_program(P)
    assert n_periods % gp == 0, (n_periods, gp)
    back = _v3_back(S, H)
    V = _v3_views(S, K, H, offsets) + (gp - 1)
    assert T_c >= (n_periods - back + V - (gp - 1)) * S, (T_c, n_periods, V)

    B_pad = -(-B // _LANE) * _LANE
    if B_pad != B:
        hist = jnp.pad(hist, ((0, 0), (0, B_pad - B)))
        x = jnp.pad(x, ((0, 0), (0, B_pad - B)))
    if lane_tile is None:
        # one lane tile of 128 beats larger tiles on v5e regardless of the
        # VMEM headroom (more grid steps pipeline the view DMAs better:
        # 0.48 vs 0.56 ms/launch at the flagship), so the default IS the
        # minimum — VMEM sizing does not drive it (the fixed universe,
        # whose planes can exceed the float budget, sizes its own tile in
        # the caller; see _MAX_FIXED_TILED_WEIGHT_BYTES)
        lb = _LANE
    else:
        lb = lane_tile
    lb = min(lb, B_pad)
    n_lane_tiles = -(-B_pad // lb)
    if n_lane_tiles * lb != B_pad:
        pad = n_lane_tiles * lb - B_pad
        hist = jnp.pad(hist, ((0, 0), (0, pad)))
        x = jnp.pad(x, ((0, 0), (0, pad)))
        B_pad = n_lane_tiles * lb

    n_chunk_blocks = T_c // S

    def view_spec(v):
        return pl.BlockSpec(
            (S, lb),
            lambda i, j, v=v: (jnp.clip(j * gp - back + v, 0,
                                        n_chunk_blocks - 1), i),
            memory_space=pltpu.VMEM)

    scratch_dtype = jnp.int16 if scheme in ("int8", "fixed") else jnp.float32
    if scheme == "fixed":
        operands = (wT, bias) + ((coef,) if n_accum == 4 else ())
    elif scheme == "int8":
        operands = (wT, bias)
    else:
        operands = (wT,)
    y = pl.pallas_call(
        functools.partial(_kernel_v3, offs=tuple(offsets), S=S, K=K, H=H,
                          n_views=V, gp=gp, scheme=scheme, scales=scales,
                          n_accum=n_accum),
        grid=(n_lane_tiles, n_periods // gp),
        in_specs=w_specs + [
            pl.BlockSpec((H, lb), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [view_spec(v) for v in range(V)],
        out_specs=pl.BlockSpec((P * gp, R, lb), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, B_pad), jnp.int16),
        scratch_shapes=[pltpu.VMEM((K, lb), scratch_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * R * K * B_pad,
            bytes_accessed=(H + n_periods * S) * B_pad * 2
            + n_blocks * R * B_pad * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands, hist, *([x] * V))

    y = y.reshape(n_blocks * R, B_pad)
    return y[:, :B] if B_pad != B else y


# ---------------------------------------------------------------------------
# v4: streamed-weight kernel for LARGE weight cycles.
#
# Configs whose reduced denominator is coprime with R*num (e.g. 48k->44.1k,
# den=147) have P = den distinct block weights — tens of MB, far beyond
# VMEM residency.  Here the weight set and the input stay in HBM; each
# program handles ONE block and manually DMAs its weight matrix [R, K] and
# its input patch [K, lb] into double-buffered scratch, issuing block j+1's
# copies before waiting on block j's (the classic cross-program pipeline).
# Block input offsets are recomputed in-kernel from the closed form
#     row(j) = align16((f0 + j*R*num)//den + shift) - H
# so no offset table is needed; the sub-16 remainder is folded into the
# weights exactly as in v2/v3 (DMA offsets need no alignment at all, but
# the weights are shared with the other kernels).  The few early blocks
# whose window starts inside the history prefix get a synchronous fix-up.
# ---------------------------------------------------------------------------


def _v4_hist_plans(R: int, K: int, H: int, num: int, den: int,
                   shift: int, f0: int = 0) -> tuple:
    """(block j, hist row h0, rows n_h) for blocks reaching into history."""
    plans = []
    j = 0
    while True:
        av = (((f0 + j * R * num) // den + shift) // 16) * 16
        if av >= H:
            break
        plans.append((j, av, min(H - av, K)))
        j += 1
    return tuple(plans)


def _kernel_v4(*refs, R: int, K: int, H: int, num: int, den: int,
               shift: int, P: int, n_blocks: int, lb: int,
               hist_plans: tuple, f0: int = 0, scheme: str = "highest",
               scales: tuple = (), n_accum: int = 1):
    coef_ref = None
    if scheme == "fixed" and n_accum == 4:
        (h_ref, b_ref, coef_ref, w_hbm, x_hbm, o_ref,
         xbuf, wbuf, xsem, wsem, fsem) = refs
    elif scheme in ("int8", "fixed"):
        (h_ref, b_ref, w_hbm, x_hbm, o_ref,
         xbuf, wbuf, xsem, wsem, fsem) = refs
    else:
        b_ref = None
        (h_ref, w_hbm, x_hbm, o_ref,
         xbuf, wbuf, xsem, wsem, fsem) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    col = i * lb

    def x_dma(jj, slot):
        t = f0 + jj * (R * num)
        row = ((t // den + shift) // 16) * 16 - H
        row = pl.multiple_of(jnp.maximum(row, 0), 16)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(row, K), pl.ds(col, lb)],
            xbuf.at[slot], xsem.at[slot])

    def w_dma(jj, slot):
        return pltpu.make_async_copy(w_hbm.at[jj % P], wbuf.at[slot],
                                     wsem.at[slot])

    @pl.when(j == 0)
    def _():
        x_dma(0, 0).start()
        w_dma(0, 0).start()

    slot = jax.lax.rem(j, 2)
    nslot = jax.lax.rem(j + 1, 2)

    @pl.when(j + 1 < n_blocks)
    def _():
        x_dma(j + 1, nslot).start()
        w_dma(j + 1, nslot).start()

    x_dma(j, slot).wait()
    w_dma(j, slot).wait()

    # early blocks: rewrite the patch as [hist rows | chunk prefix]
    for jj, h0, n_h in hist_plans:
        @pl.when(j == jj)
        def _(h0=h0, n_h=n_h):
            if n_h < K:
                fix = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(0, K - n_h), pl.ds(col, lb)],
                    xbuf.at[slot, pl.ds(n_h, K - n_h)], fsem)
                fix.start()
                fix.wait()
            xbuf[slot, pl.ds(0, n_h), :] = h_ref[pl.ds(h0, n_h), :]

    # precision scheme is load-bearing; see _dot_scheme/_kernel.
    if scheme == "fixed":
        m = jax.lax.rem(j, P)
        acc = _dot_fixed(lambda p: wbuf[slot, p], b_ref[m], xbuf[slot])
        if n_accum == 4:
            o_ref[0] = _fixed_mix_rows(acc, coef_ref[m])
        else:
            o_ref[0] = _sat32pshr15(acc)
    elif scheme == "int8":
        acc = _dot_int8(lambda p: wbuf[slot, p],
                        b_ref[jax.lax.rem(j, P)],
                        xbuf[slot].astype(jnp.int32), scales)
        o_ref[0] = _word2int(acc)
    else:
        plane = ((lambda p: wbuf[slot, p]) if scheme == "split5"
                 else (lambda p: wbuf[slot]))
        o_ref[0] = _word2int(
            _dot_scheme(plane, xbuf[slot].astype(jnp.float32), scheme))


@functools.partial(jax.jit, static_argnames=("n_blocks", "shift", "num",
                                             "den", "f0", "interpret",
                                             "lane_tile", "scheme",
                                             "scales", "n_accum"))
def resample_conv_tm_pallas_v4(hist, x, w, *, n_blocks: int, shift: int,
                               num: int, den: int, f0: int = 0,
                               interpret: bool = False,
                               lane_tile: int | None = None,
                               scheme: str = "highest",
                               scales: tuple = (), n_accum: int = 1):
    """Streamed-weight launch for large-P configs.

    hist: int16[H, B];  x: int16[T_c, B] (real rows ++ >=K zero rows);
    w: PRE-TRANSPOSED cyclic set (stays in HBM; the caller transposes once
    at build time — transposing per launch would re-stream the whole set
    through HBM): f32[P, R, K] for scheme "highest"; bf16[P, 3, R, K]
    (split5_weights planes, plane axis second so one DMA fetches a block's
    planes) for scheme "split5"; (int8[P, D, R, K] planes,
    f32[P, R] bias) with static ``scales`` for scheme "int8".
    returns int16[n_blocks * R, B].
    """
    bias = coef = None
    if scheme == "fixed":
        # exact FIXED universe: (planes int8[P, 2, C, K], bias int32[P, C]
        # [, coef int32[P, 4, R]]); C = n_accum * R (accumulator-major)
        if n_accum == 4:
            planes, bias, coef = w
        else:
            planes, bias = w
        assert planes.dtype == jnp.int8, planes.dtype
        P, _, C, K = planes.shape
        R = C // n_accum
        w = planes
        w_scratch = pltpu.VMEM((2, 2, C, K), jnp.int8)
        w_scratch_bytes = 2 * 2 * C * K
    elif scheme == "int8":
        planes, bias = w
        assert planes.dtype == jnp.int8, planes.dtype
        P, D, R, K = planes.shape
        w = planes
        w_scratch = pltpu.VMEM((2, D, R, K), jnp.int8)
        w_scratch_bytes = 2 * D * R * K
    elif scheme == "split5":
        assert w.ndim == 4 and w.dtype == jnp.bfloat16, (w.shape, w.dtype)
        P, _, R, K = w.shape
        w_scratch = pltpu.VMEM((2, 3, R, K), jnp.bfloat16)
        w_scratch_bytes = 2 * 3 * R * K * 2
    else:
        P, R, K = w.shape
        w_scratch = pltpu.VMEM((2, R, K), jnp.float32)
        w_scratch_bytes = 2 * R * K * 4
    H, B = hist.shape
    assert H % 16 == 0 and x.shape[1] == B
    hist_plans = _v4_hist_plans(R, K, H, num, den, shift, f0)
    # enforce the "real rows ++ >= K zero rows" contract (v3 asserts its
    # T_c equivalent): the manual DMAs read K rows from the closed-form
    # per-block origin, and an under-padded x would silently read past the
    # array in HBM — wrong samples, no error
    t_last = f0 + (n_blocks - 1) * R * num
    row_last = max(((t_last // den + shift) // 16) * 16 - H, 0)
    assert x.shape[0] >= row_last + K, (x.shape, row_last, K)

    B_pad = -(-B // _LANE) * _LANE
    if B_pad != B:
        hist = jnp.pad(hist, ((0, 0), (0, B_pad - B)))
        x = jnp.pad(x, ((0, 0), (0, B_pad - B)))
    if lane_tile is None:
        # widest tile that fits VMEM: the weight set is re-streamed from
        # HBM once per lane tile, so fewer tiles = less weight traffic.
        # The fixed scheme carries int32 accumulators of C = n_accum*R rows
        # (plus epilogue temporaries) on the scoped-vmem stack — budget
        # them explicitly or Mosaic stack-OOMs at C = 4R widths.
        per_lane = 4 * K + 4 * H + 4 * R
        if scheme == "fixed":
            per_lane += 16 * C
        lb = (14 * 1024 * 1024 - w_scratch_bytes) // per_lane
        lb = max(_LANE, (lb // _LANE) * _LANE)
    else:
        lb = lane_tile
    lb = min(lb, B_pad)
    n_lane_tiles = -(-B_pad // lb)
    if n_lane_tiles * lb != B_pad:
        pad = n_lane_tiles * lb - B_pad
        hist = jnp.pad(hist, ((0, 0), (0, pad)))
        x = jnp.pad(x, ((0, 0), (0, pad)))
        B_pad = n_lane_tiles * lb

    in_specs = [pl.BlockSpec((H, lb), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)]
    operands = [hist]
    if scheme in ("int8", "fixed"):
        Cb = bias.shape[1]
        in_specs.append(pl.BlockSpec((P, Cb), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias)
    if scheme == "fixed" and n_accum == 4:
        in_specs.append(pl.BlockSpec((P, 4, R), lambda i, j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(coef)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    operands += [w, x]
    y = pl.pallas_call(
        functools.partial(_kernel_v4, R=R, K=K, H=H, num=num, den=den,
                          shift=shift, P=P, n_blocks=n_blocks, lb=lb,
                          hist_plans=hist_plans, f0=f0, scheme=scheme,
                          scales=scales, n_accum=n_accum),
        grid=(n_lane_tiles, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, lb), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, B_pad), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((2, K, lb), jnp.int16),
            w_scratch,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * R * K * B_pad,
            bytes_accessed=(H * B_pad + n_blocks * R * B_pad) * 2
            + n_blocks * (K * lb * 2 + R * K * 4) * n_lane_tiles,
            transcendentals=0),
        interpret=interpret,
    )(*operands)

    y = y.reshape(n_blocks * R, B_pad)
    return y[:, :B] if B_pad != B else y
