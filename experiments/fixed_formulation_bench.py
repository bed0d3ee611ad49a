"""Which XLA formulation of the exact int8-plane contraction runs fastest
on TPU?  Flagship-like shapes: n_blocks=64, L=294, C=640, B=2048.

Candidates:
  A. per-a-slice einsum loop (current resample_conv_tm_fixed)
  B. one einsum over concatenated patches  [n,L,B] x [L,C]
  C. batch-major patches reshape + plain GEMM  [B*n, L] x [L, C]
  D. raw int8 GEMM of the same MAC count (machine-rate baseline)
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

n, L, C, B, stride = 64, 294, 640, 2048, 147
A = L // stride
assert A * stride == L

rng = np.random.default_rng(0)
T = (n + A) * stride
x16 = jnp.asarray(rng.integers(-32768, 32768, (T, B)).astype(np.int16))
xb16 = jnp.asarray(np.ascontiguousarray(np.asarray(x16).T))  # [B, T]
wh = jnp.asarray(rng.integers(-128, 128, (L, C)).astype(np.int8))
wl = jnp.asarray(rng.integers(-128, 128, (L, C)).astype(np.int8))


def timeit(f, *args, iters=8):
    y = f(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        y = f(*args)
        jax.tree.map(lambda a: a.block_until_ready(), y)
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def form_a(x, wh, wl):
    xr = x.reshape(T // stride, stride, B)
    whA = wh.reshape(A, stride, C).transpose(0, 2, 1)
    wlA = wl.reshape(A, stride, C).transpose(0, 2, 1)
    acc = jnp.zeros((n, C, B), jnp.int32)
    for a in range(A):
        xa = lax.dynamic_slice_in_dim(xr, a, n, axis=0)
        xh = (xa >> 8).astype(jnp.int8)
        xl0 = ((xa & 255) - 128).astype(jnp.int8)
        for wp, xp, sh in ((whA[a], xh, 16), (whA[a], xl0, 8),
                           (wlA[a], xh, 8), (wlA[a], xl0, 0)):
            acc = acc + (jnp.einsum("cs,nsb->ncb", wp, xp,
                                    preferred_element_type=jnp.int32) << sh)
    return acc


@jax.jit
def form_b(x, wh, wl):
    xr = x.reshape(T // stride, stride, B)
    parts = [lax.dynamic_slice_in_dim(xr, a, n, axis=0) for a in range(A)]
    p = jnp.concatenate(parts, axis=1)                   # [n, L, B]
    xh = (p >> 8).astype(jnp.int8)
    xl0 = ((p & 255) - 128).astype(jnp.int8)
    acc = jnp.zeros((n, C, B), jnp.int32)
    for wp, xp, sh in ((wh, xh, 16), (wh, xl0, 8),
                       (wl, xh, 8), (wl, xl0, 0)):
        acc = acc + (jnp.einsum("lc,nlb->ncb", wp, xp,
                                preferred_element_type=jnp.int32) << sh)
    return acc


@jax.jit
def form_c(xb, wh, wl):
    xr = xb.reshape(B, T // stride, stride)
    parts = [xr[:, a:a + n, :] for a in range(A)]
    p = jnp.concatenate(parts, axis=2).reshape(B * n, L)
    xh = (p >> 8).astype(jnp.int8)
    xl0 = ((p & 255) - 128).astype(jnp.int8)
    acc = jnp.zeros((B * n, C), jnp.int32)
    for wp, xp, sh in ((wh, xh, 16), (wh, xl0, 8),
                       (wl, xh, 8), (wl, xl0, 0)):
        acc = acc + (jnp.dot(xp, wp,
                             preferred_element_type=jnp.int32) << sh)
    return acc


M = B * n
g1 = jnp.asarray(rng.integers(-128, 128, (M, L)).astype(np.int8))
g2 = jnp.asarray(rng.integers(-128, 128, (L, C)).astype(np.int8))


@jax.jit
def form_d(a, b):
    acc = jnp.zeros((M, C), jnp.int32)
    for _ in range(4):
        acc = acc + jnp.dot(a, b, preferred_element_type=jnp.int32)
    return acc


def report(name, t):
    macs = 4 * n * L * C * B
    print(f"{name}: {t*1e3:8.3f} ms   {macs/t/1e12:6.1f} T int8-MAC/s")


print("backend:", jax.default_backend())
report("A per-slice einsum", timeit(form_a, x16, wh, wl))
report("B concat einsum   ", timeit(form_b, x16, wh, wl))
report("C batch-major GEMM", timeit(form_c, xb16, wh, wl))
report("D raw GEMM x4     ", timeit(form_d, g1, g2))
