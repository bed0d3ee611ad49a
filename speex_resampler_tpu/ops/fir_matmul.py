"""Device hot path: the resampler as one phase-indexed matmul per launch.

TPU-first reformulation of the reference hot loops (resample.c:331-559).
Using the closed-form recurrence (ops/phase.py), outputs are grouped into
super-blocks of R = G*den outputs consuming exactly G*num inputs each, so a
launch is a single strided convolution

    Y[s, b, r] = sum_l X[s, b*G*num + l] * W[l, r]      (L = filt_len + G*num)

which XLA lowers onto the MXU.  The group factor G widens the matmul's
N-dimension for small ``den`` (e.g. integer upsampling, den=2) so MXU lanes
stay filled; W is the host-built padded weight matrix
(ops/phase.build_padded_weights with R sub-phases).

A gather-based fallback handles pathological ratios whose padded weight
matrix would be too large (huge reduced denominators, e.g. 44100→44101).

Input samples ride as int16 end-to-end (the reference's float memory holds
exact s16 values, resample.c:1000-1006, so int16 state is lossless) and are
widened on-device; output applies WORD2INT (ops/convert.py) before leaving
as int16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .convert import word2int

__all__ = ["choose_group", "resample_conv", "resample_conv_tm",
           "resample_gather", "MAX_PADDED_WEIGHT_BYTES"]

# Above this padded-weight size the gather fallback is used instead.
MAX_PADDED_WEIGHT_BYTES = 32 * 1024 * 1024

_LANE_TARGET = 128  # MXU lane width worth of output columns per block row


def choose_group(num: int, den: int, filt_len: int) -> int:
    """Pick the super-block group factor G (R = G*den output columns).

    Widens small-den configs toward 128 output columns while keeping the
    FLOP overhead L/filt_len = (filt_len + G*num)/filt_len bounded.
    """
    if den >= _LANE_TARGET:
        return 1
    g = -(-_LANE_TARGET // den)  # ceil
    # cap padding overhead: G*num <= 2*filt_len keeps L <= 3*filt_len
    while g > 1 and g * num > 2 * filt_len:
        g -= 1
    return max(g, 1)


@partial(jax.jit, static_argnames=("stride", "accum_dtype", "raw"))
def resample_conv(x, w, *, stride: int, accum_dtype=jnp.float32,
                  raw: bool = False):
    """One resample launch: strided patches × padded phase weights → MXU.

    x: int16[batch, T]   input samples (history + chunk + zero pad), where
                         T = n_blocks * stride + L, T % stride == 0
    w: f32[L, R]         padded phase weights, L % stride == 0
    returns int16[batch, n_blocks*R] (callers slice off masked tail outputs).

    Patches P[b, l] = x[b*stride + l] are built without a gather: writing
    l = a*stride + d, P[b, a*stride+d] = reshape(x)[b+a, d], so P is a
    concat of A = L//stride shifted views of x.reshape(-1, stride) — pure
    reshape/slice/concat that XLA fuses into the matmul's operand reads.
    (A strided lax.conv spelling of the same math compiles to a very slow
    kernel on CPU and obscures the MXU mapping on TPU; this form is a plain
    GEMM everywhere.)
    """
    L, R = w.shape
    batch, T = x.shape
    assert T % stride == 0 and L % stride == 0, (T, L, stride)
    A = L // stride
    n_blocks = T // stride - A
    xr = x.reshape(batch, T // stride, stride)
    parts = [xr[:, a:a + n_blocks, :] for a in range(A)]
    patches = jnp.concatenate(parts, axis=2)           # [batch, B, L]
    pf = patches.reshape(batch * n_blocks, L).astype(jnp.float32)
    y = jnp.dot(pf, w.astype(jnp.float32),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=accum_dtype)    # [batch*B, R]
    if raw:  # float-sample path (speex_resampler_process_float): no WORD2INT
        return y.astype(jnp.float32).reshape(batch, n_blocks * R)
    return word2int(y).reshape(batch, n_blocks * R)


@partial(jax.jit, static_argnames=("stride", "accum_dtype"))
def resample_conv_tm(x, w, *, stride: int, accum_dtype=jnp.float32):
    """Time-major twin of :func:`resample_conv` (same math, x transposed);
    the layout the batched engine and the Pallas kernel use.

    x: int16[T, B], T % stride == 0; w: f32[L, R], L % stride == 0.
    returns int16[n_blocks*R, B], n_blocks = T//stride - L//stride.
    """
    L, R = w.shape
    T, B = x.shape
    assert T % stride == 0 and L % stride == 0, (T, L, stride)
    A = L // stride
    n_blocks = T // stride - A
    xr = x.reshape(T // stride, stride, B)
    wA = w.reshape(A, stride, R).transpose(0, 2, 1).astype(jnp.float32)
    acc = jnp.zeros((n_blocks, R, B), dtype=accum_dtype)
    for a in range(A):
        xa = lax.dynamic_slice_in_dim(xr, a, n_blocks, axis=0)
        acc = acc + jnp.einsum(
            "rs,nsb->nrb", wA[a], xa.astype(jnp.float32),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=accum_dtype)
    return word2int(acc).reshape(n_blocks * R, B)


@partial(jax.jit, static_argnames=("tile", "accum_dtype", "raw"))
def resample_gather(x, taps, starts, *, tile: int = 2048,
                    accum_dtype=jnp.float32, raw: bool = False):
    """Fallback launch for huge-den ratios: per-output tap-row dots.

    x:      int16[batch, T]
    taps:   f32[n_out_padded, filt_len]   H rows pre-gathered by phase
    starts: int32[n_out_padded]           window starts (clamped in range)
    returns int16[batch, n_out_padded]
    """
    n_out, filt_len = taps.shape
    xf = x.astype(jnp.float32)
    batch = xf.shape[0]
    n_tiles = n_out // tile
    assert n_tiles * tile == n_out, "caller pads n_out to a tile multiple"

    def do_tile(args):
        s, t = args                                    # [tile], [tile, N]
        idx = s[:, None] + jnp.arange(filt_len, dtype=s.dtype)[None, :]
        win = xf[:, idx].astype(accum_dtype)           # [batch, tile, N]
        return jnp.einsum("bon,on->bo", win, t.astype(accum_dtype),
                          precision=lax.Precision.HIGHEST)

    y = lax.map(do_tile, (starts.reshape(n_tiles, tile),
                          taps.reshape(n_tiles, tile, filt_len)))
    y = jnp.moveaxis(y, 1, 0).reshape(batch, n_out)
    if raw:
        return y.astype(jnp.float32)
    return word2int(y)
