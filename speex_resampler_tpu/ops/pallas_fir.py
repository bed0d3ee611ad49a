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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["resample_conv_tm_pallas", "resample_conv_tm_pallas_v2",
           "pick_lane_tile"]

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
# v2: MXU-aligned phase-tiled kernel, one weight PERIOD per program.
#
# v1 pays for its one-dense-GEMM-per-superblock shape: [R=den, L=N+num] tiles
# fill the 128x128 MXU poorly (12 systolic passes per 160 outputs for
# 44.1k->48k Q7).  Here outputs are tiled in blocks of exactly R=128 (one
# full MXU pass on the output axis) with cyclic per-block-phase weights
# (ops/phase.build_phase_tiled_weights), and each program executes one full
# weight period of P blocks, so every weight index and input offset is a
# compile-time constant: no SMEM lookups, no per-block program overhead
# (measured: 640 one-block programs/launch ran 1.4x slower than 32
# period-programs).  All input slices are 16-aligned (the int16 sublane
# tile) because each block's sub-16 start remainder is pre-folded into its
# weight matrix as leading zero rows.  The whole weight set stays resident
# in VMEM across the launch.
# ---------------------------------------------------------------------------


def _kernel_v2(w_ref, x_ref, o_ref, *, offs: tuple, S: int, K: int):
    j = pl.program_id(1)
    base = j * S
    for m, off_m in enumerate(offs):
        patch = x_ref[pl.ds(base + off_m, K), :].astype(jnp.float32)
        # Precision.HIGHEST is load-bearing; see _kernel.
        o_ref[m] = _word2int(jnp.dot(
            w_ref[m], patch, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))


@functools.partial(jax.jit, static_argnames=("offsets", "S", "n_blocks",
                                             "interpret", "lane_tile"))
def resample_conv_tm_pallas_v2(x, w, offsets: tuple, *, S: int,
                               n_blocks: int, interpret: bool = False,
                               lane_tile: int | None = None):
    """Phase-tiled time-major resample launch.

    x:       int16[T, B]   history ++ chunk ++ tail pad; block j reads rows
                           (j//P)*S + offsets[j%P] .. +K  (all 16-aligned)
    w:       f32[P, K, R]  cyclic weights (ops/phase.build_phase_tiled_weights)
    offsets: static tuple of P ints
    returns int16[n_blocks * R, B];  n_blocks must be a multiple of P.
    """
    P, K, R = w.shape
    T, B = x.shape
    assert len(offsets) == P and n_blocks % P == 0, (len(offsets), P,
                                                     n_blocks)
    n_periods = n_blocks // P
    assert T >= (n_periods - 1) * S + offsets[-1] + K, (T, n_periods, S, K)

    wT = w.transpose(0, 2, 1).astype(jnp.float32)  # [P, R, K]
    w_bytes = P * R * K * 4

    B_pad = -(-B // _LANE) * _LANE
    if B_pad != B:
        x = jnp.pad(x, ((0, 0), (0, B_pad - B)))
    if lane_tile is None:
        # VMEM: x slab double-buffered (2*T*lb*2) + resident w + out block
        # double-buffered (2*P*R*lb*2) within ~14 MB
        lb = (14 * 1024 * 1024 - w_bytes) // (4 * T + 4 * P * R)
        lb = max(_LANE, (lb // _LANE) * _LANE)
    else:
        lb = lane_tile
    lb = min(lb, B_pad)
    n_lane_tiles = -(-B_pad // lb)
    if n_lane_tiles * lb != B_pad:
        x = jnp.pad(x, ((0, 0), (0, n_lane_tiles * lb - B_pad)))
        B_pad = n_lane_tiles * lb

    y = pl.pallas_call(
        functools.partial(_kernel_v2, offs=tuple(offsets), S=S, K=K),
        grid=(n_lane_tiles, n_periods),
        in_specs=[
            pl.BlockSpec((P, R, K), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, lb), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, R, lb), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, B_pad), jnp.int16),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * R * K * B_pad,
            bytes_accessed=T * B_pad * 2 + n_blocks * R * B_pad * 2,
            transcendentals=0),
        interpret=interpret,
    )(wT, x)

    y = y.reshape(n_blocks * R, B_pad)
    return y[:, :B] if B_pad != B else y
