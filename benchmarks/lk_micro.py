"""Microbench: LK correlation-map formulations on the device.

The per-level hot op is C_g[k, dy, dx] = <win[k, dy+., dx+.], g[k]> for
K keypoints — currently a K-grouped VALID conv. Grouped convs with K
groups lower to many tiny per-group contractions on TPU; this compares:
  a) grouped conv (current)
  b) im2col: stack the D*D static shifts of win -> one batched matvec
  c) shift-accumulate: P*P fused multiply-adds over (K, D, D) slices
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

K = 1024
P = 15          # patch side (half_win 7)
S = 6
D = 2 * S + 2   # 14
Wn = D + P - 1  # 28

rng = np.random.default_rng(0)
win = jnp.asarray(rng.standard_normal((K, Wn, Wn)), jnp.float32)
g = jnp.asarray(rng.standard_normal((K, P, P)), jnp.float32)


@jax.jit
def grouped(win, g):
    return jax.lax.conv_general_dilated(
        win[None], g[:, None], window_strides=(1, 1), padding="VALID",
        feature_group_count=K,
    )[0]


@jax.jit
def im2col(win, g):
    # patches[k, dy*D+dx, :] = win[k, dy:dy+P, dx:dx+P].ravel()
    pats = jnp.stack(
        [win[:, dy:dy + P, dx:dx + P].reshape(K, P * P)
         for dy in range(D) for dx in range(D)], axis=1)
    return jnp.einsum("kop,kp->ko", pats, g.reshape(K, P * P)).reshape(
        K, D, D)


@jax.jit
def shiftacc(win, g):
    C = jnp.zeros((K, D, D), jnp.float32)
    for i in range(P):
        for j in range(P):
            C = C + win[:, i:i + D, j:j + D] * g[:, i, j][:, None, None]
    return C


def timed(fn, label, reps=10):
    out = fn(win, g)
    _ = np.asarray(out)[:1, :1, :1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(win, g)
    _ = np.asarray(out)[:1, :1, :1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:14s} {dt*1e3:7.2f} ms", flush=True)
    return out


a = timed(grouped, "grouped-conv")
b = timed(im2col, "im2col-matmul")
c = timed(shiftacc, "shift-acc")
print("max|a-b| =", float(jnp.max(jnp.abs(a - b))))
print("max|a-c| =", float(jnp.max(jnp.abs(a - c))))
