"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

The reference fork's short-term track-consistency evidence comes from
optical flow (SURVEY.md §3.1 'Optical-flow track consistency' row,
cv::calcOpticalFlowPyrLK). TPU-native shape: all keypoints tracked in
parallel — per level (coarse to fine), gather a gradient window from
the previous image once, then run fixed Gauss-Newton iterations against
bilinearly-sampled windows of the next image; a 2x2 normal-equation
solve per keypoint per iteration, vmapped.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FlowResult(NamedTuple):
    uv_next: jax.Array   # (K, 2) tracked positions in the next image
    err: jax.Array       # (K,) mean abs photometric residual
    ok: jax.Array        # (K,) bool converged & in-bounds


SEARCH_RAD = 6   # max per-level correction of the coarse-to-fine guess


def _track_level(
    img_prev: jax.Array, img_next: jax.Array,
    uv_prev: jax.Array, uv_guess: jax.Array,
    half_win: int, iters: int,
):
    """One pyramid level of LK for all keypoints, gather-free iterations.

    The GN normal-equation RHS only needs the inner products
    <sample(q), gx> and <sample(q), gy>, and bilinear sampling COMMUTES
    with those (linear) correlations: precompute the correlation maps
    C_g[d] = <W[d+.], g> over the integer offset grid of a local search
    window ONCE per level (K-last shift-accumulate), and every GN
    iteration reduces to separable hat-weight contractions of a (D, D)
    map — no image gathers at all. Patch extraction itself is a
    contiguous-row gather + one-hot column-selection matmul (no
    per-keypoint dynamic slices anywhere). Evolution, all measured on
    v5e (1024 kps, 640x480, scan-amortized): r1 flat gathers
    ~57 ms/pair -> r3 correlation maps w/ grouped convs 9.7 -> K-last
    offset work + gather-free final error 7.2 -> matmul patch
    extraction 1.9 ms/pair.

    The window bounds the per-level correction to ±SEARCH_RAD px of the
    coarse-to-fine guess, which halving pyramids satisfy."""
    r = half_win
    P = 2 * r + 1                   # patch side
    S = SEARCH_RAD
    D = 2 * S + 2                   # offset grid (bilinear needs the +1)
    Wn = D + P - 1                  # search-window side
    pad = S + r + 3
    H, W = img_prev.shape
    prev_p = jnp.pad(img_prev, pad, mode="edge")
    next_p = jnp.pad(img_next, pad, mode="edge")

    # --- per-keypoint patch extraction as row-gather + column-select
    # matmuls. The r4 formulation vmapped one dynamic_slice per keypoint
    # per gather (2048 slices/level) — measured ~2 ms/level, the
    # dominant LK cost once the offset-grid work went K-last. Here: ONE
    # contiguous-row gather (DMA-friendly) per image, then a batched
    # one-hot column-selection matmul on the MXU; the template's
    # bilinear blend folds into the row blend + selection weights.
    K = uv_prev.shape[0]
    Wp = W + 2 * pad
    wgrid = jnp.arange(Wp, dtype=jnp.int32)

    xq = jnp.clip(uv_prev[:, 0], 0.0, W - 1.001)
    yq = jnp.clip(uv_prev[:, 1], 0.0, H - 1.001)
    x0 = jnp.floor(xq).astype(jnp.int32)
    y0 = jnp.floor(yq).astype(jnp.int32)
    fx = (xq - x0).astype(img_prev.dtype)
    fy = (yq - y0).astype(img_prev.dtype)
    # template support: (P+2, P+2) bilinear patch (interior P x P plus a
    # 1-px ring for central-difference gradients)
    nT = P + 2
    rowsT = prev_p[(y0 - (r + 1) + pad)[:, None]
                   + jnp.arange(nT + 1)[None, :], :]     # (K, nT+1, Wp)
    rowsB = (1.0 - fy)[:, None, None] * rowsT[:, :-1] \
        + fy[:, None, None] * rowsT[:, 1:]               # (K, nT, Wp)
    offT = wgrid[None, :, None] - (x0 - (r + 1) + pad)[:, None, None] \
        - jnp.arange(nT)[None, None, :]                  # (K, Wp, nT)
    selT = (1.0 - fx)[:, None, None] * (offT == 0) \
        + fx[:, None, None] * (offT == 1)
    T1 = jnp.einsum("kiw,kwj->kij", rowsB, selT)         # (K, nT, nT)
    tmpl = T1[:, 1:-1, 1:-1]
    gx = (T1[:, 1:-1, 2:] - T1[:, 1:-1, :-2]) * 0.5
    gy = (T1[:, 2:, 1:-1] - T1[:, :-2, 1:-1]) * 0.5

    # search window: integer-anchored (Wn, Wn) crop of the next image,
    # anchor = floor(guess) - S - r
    gx0 = jnp.clip(uv_guess[:, 0], 0.0, W - 1.001)
    gy0 = jnp.clip(uv_guess[:, 1], 0.0, H - 1.001)
    ax = jnp.floor(gx0).astype(jnp.int32) - S - r
    ay = jnp.floor(gy0).astype(jnp.int32) - S - r
    rowsW = next_p[(ay + pad)[:, None]
                   + jnp.arange(Wn)[None, :], :]         # (K, Wn, Wp)
    offW = wgrid[None, :, None] - (ax + pad)[:, None, None] \
        - jnp.arange(Wn)[None, None, :]                  # (K, Wp, Wn)
    selW = (offW == 0).astype(img_next.dtype)
    win = jnp.einsum("kiw,kwj->kij", rowsW, selW)        # (K, Wn, Wn)
    anchor = jnp.stack([ax, ay], axis=-1).astype(uv_guess.dtype)

    # --- K-LAST layout for the per-offset work ---------------------------
    # TPU tiles the last two dims to (8, 128): any (K, D, D) array with
    # D=14 pads ~10x and every offset-grid op pays the bloat (the
    # K-grouped conv formulation of r2-r4 measured 9.7 ms/pair mostly
    # from this). Transposed to (D, D, K) the K=1024 axis fills the
    # lanes exactly; the correlation becomes P*P static-slice
    # multiply-adds on perfectly-tiled arrays and the whole window
    # stays in VMEM.
    winT = jnp.transpose(win, (1, 2, 0))                # (Wn, Wn, K)
    gxT = jnp.transpose(gx, (1, 2, 0))                  # (P, P, K)
    gyT = jnp.transpose(gy, (1, 2, 0))

    # offset-grid correlation maps: C_g[dy, dx, k] = <win[k, d+.], g[k]>
    def corr(gT):
        C = jnp.zeros((D, D, K), win.dtype)
        for i in range(P):
            for j in range(P):
                C = C + winT[i:i + D, j:j + D, :] * gT[i, j][None, None, :]
        return C

    C_gx = corr(gxT)
    C_gy = corr(gyT)
    cx0 = jnp.einsum("kij,kij->k", tmpl, gx)
    cy0 = jnp.einsum("kij,kij->k", tmpl, gy)
    gxx = jnp.einsum("kij,kij->k", gx, gx) + 1e-3
    gxy = jnp.einsum("kij,kij->k", gx, gy)
    gyy = jnp.einsum("kij,kij->k", gy, gy) + 1e-3
    det = jnp.maximum(gxx * gyy - gxy * gxy, 1e-9)

    grid = jnp.arange(D, dtype=uv_prev.dtype)

    def hats(q):
        """(D, K) separable bilinear hat weights at offsets q (K,)."""
        return jnp.maximum(0.0, 1.0 - jnp.abs(grid[:, None] - q[None, :]))

    def read(C, wy, wx):
        # sum_{d,e} C[d,e,k] wy[d,k] wx[e,k] — elementwise in K lanes
        return jnp.sum(C * wy[:, None, :] * wx[None, :, :], axis=(0, 1))

    def body(_, p):
        # patch top-left in window-grid coords: q = p - anchor - r
        # (= p - floor(guess) + S, in [0, 2S] for |p - guess| <= S)
        q = jnp.clip(p - anchor - r, 0.0, 2.0 * S + 0.999)
        wx = hats(q[:, 0])
        wy = hats(q[:, 1])
        bx = read(C_gx, wy, wx) - cx0
        by = read(C_gy, wy, wx) - cy0
        # closed-form 2x2 solve (G constant over iterations)
        dx = (gyy * bx - gxy * by) / det
        dy = (gxx * by - gxy * bx) / det
        return p - jnp.stack([dx, dy], axis=-1)

    p = jax.lax.fori_loop(0, iters, body, uv_guess)

    # final photometric error — the bilinear window sample is SEPARABLE,
    # so the per-keypoint dynamic_slice of the old formulation (1024
    # vmapped gathers on a badly-tiled (K, 28, 28) array — ~3 ms/pair,
    # over half the level's device time) becomes two axis-wise hat
    # contractions on the K-last window: identical values, zero gathers.
    qf = jnp.clip(p - anchor - r, 0.0, 2.0 * S + 0.999)
    wxf = hats(qf[:, 0])                                # (D, K)
    wyf = hats(qf[:, 1])
    tmplT = jnp.transpose(tmpl, (1, 2, 0))              # (P, P, K)
    # rows: winY[i, c, k] = sum_d wyf[d, k] * winT[d+i, c, k]
    winY = jnp.stack([
        sum(wyf[d] * winT[d + i] for d in range(D)) for i in range(P)
    ])                                                   # (P, Wn, K)
    cur = jnp.stack([
        sum(wxf[e] * winY[:, e + j] for e in range(D)) for j in range(P)
    ], axis=1)                                           # (P, P, K)
    err = jnp.mean(jnp.abs(cur - tmplT), axis=(0, 1))
    return p, err


def _pyramid2(img: jax.Array, n_levels: int) -> List[jax.Array]:
    """Factor-2 pyramid (LK convergence basin needs fast shrinkage; the
    ORB 1.2 pyramid is for scale-invariant detection, not flow)."""
    levels = [img]
    for _ in range(1, n_levels):
        prev = levels[-1]
        H, W = prev.shape
        levels.append(
            jax.image.resize(prev, (H // 2, W // 2), method="bilinear")
        )
    return levels


def lk_track(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,          # (K, 2) level-0 coordinates
    valid: jax.Array,            # (K,) bool
    n_levels: int = 3,
    half_win: int = 7,
    iters: int = 8,
    max_err: float = 20.0,
) -> FlowResult:
    """Track keypoints from img_prev to img_next (coarse->fine)."""
    pyr_prev = _pyramid2(img_prev, n_levels)
    pyr_next = _pyramid2(img_next, n_levels)
    top = n_levels - 1
    guess = uv_prev / (2.0 ** top)
    for lvl in range(top, -1, -1):
        uv_l = uv_prev / (2.0 ** lvl)
        guess, err = _track_level(
            pyr_prev[lvl], pyr_next[lvl], uv_l, guess, half_win, iters
        )
        if lvl > 0:
            guess = guess * 2.0
    uv_next = guess
    H, W = pyr_next[0].shape
    inb = (
        (uv_next[:, 0] >= half_win) & (uv_next[:, 0] < W - half_win)
        & (uv_next[:, 1] >= half_win) & (uv_next[:, 1] < H - half_win)
    )
    ok = valid & inb & (err < max_err)
    return FlowResult(uv_next=uv_next, err=err, ok=ok)
