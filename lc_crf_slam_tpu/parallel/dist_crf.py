"""Distributed CRF mean-field: tracks sharded over the mesh.

SURVEY.md §6.7/§8.2-M5: the CRF's unary/pairwise message computation
shards by track. Each device owns a contiguous track shard and computes
mean-field message rows for its tracks; the pairwise Potts messages read
neighbor beliefs that may live on other shards, so each iteration
all-gathers the (tiny: one f32 per track) belief vector over ICI — the
halo exchange for cross-shard kNN edges. The kNN graph itself is built
row-sharded: each device scores its rows against the all-gathered
positions (the N x N distance work is what actually scales).

Matches models/crf.py's single-device semantics exactly (same update
order, same fixed iteration count); verified bit-for-bit against it in
tests/test_dist.py on the forced 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..config import SLAMConfig

AXIS = "edge"  # mesh axis name (see parallel/mesh.py)


def dist_knn_graph(cfg: SLAMConfig, xyz: jax.Array, ok: jax.Array,
                   mesh: Mesh):
    """Row-sharded fixed-degree kNN with Gaussian weights.

    xyz (N, 3) and ok (N,) are sharded by track; neighbor indices are
    GLOBAL track ids, so the returned tables compose with any gather.
    N must divide by the mesh size (the CRF capacity is a power of two).
    """
    c = cfg.crf
    N = xyz.shape[0]
    k = min(c.knn, N - 1)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
    )
    def rows(xyz_l, ok_l):
        # halo: full positions/validity for the column dimension
        xyz_f = jax.lax.all_gather(xyz_l, AXIS, tiled=True)
        ok_f = jax.lax.all_gather(ok_l, AXIS, tiled=True)
        n_l = xyz_l.shape[0]
        row0 = jax.lax.axis_index(AXIS) * n_l
        gids = row0 + jnp.arange(n_l)
        d2 = jnp.sum(
            jnp.square(xyz_l[:, None, :] - xyz_f[None, :, :]), axis=-1
        )
        d2 = jnp.where(ok_l[:, None] & ok_f[None, :], d2, jnp.inf)
        d2 = jnp.where(gids[:, None] == jnp.arange(N)[None, :], jnp.inf, d2)
        neg, nbr = jax.lax.top_k(-d2, k)
        d2k = -neg
        w = c.pairwise_weight * jnp.exp(-d2k / (2.0 * c.spatial_sigma**2))
        w = jnp.where(jnp.isfinite(d2k), w, 0.0)
        return nbr, w

    return rows(xyz, ok)


def dist_mean_field(
    cfg: SLAMConfig, u_static, u_dyn, nbr, w, ok, mesh: Mesh
) -> jax.Array:
    """Track-sharded mean-field; returns q_dyn (N,) sharded by track.

    Per iteration each device updates its own rows; the one collective
    is the all-gather of the belief vector (the cross-shard halo for
    pairwise edges). Identical fixed-point schedule to crf.mean_field.
    """

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS),) * 5,
        out_specs=P(AXIS),
    )
    def run(u_s_l, u_d_l, nbr_l, w_l, ok_l):
        def body(_, q_l):
            q_f = jax.lax.all_gather(q_l, AXIS, tiled=True)
            q_static = 1.0 - q_f
            msg_dyn = jnp.sum(w_l * q_static[nbr_l], axis=-1)
            msg_static = jnp.sum(w_l * q_f[nbr_l], axis=-1)
            ls = -(u_s_l + msg_static)
            ld = -(u_d_l + msg_dyn)
            mx = jnp.maximum(ls, ld)
            q = jnp.exp(ld - mx) / (jnp.exp(ls - mx) + jnp.exp(ld - mx))
            return jnp.where(ok_l, q, 0.0)

        q0 = jnp.where(ok_l, 1.0 - cfg.crf.prior_static, 0.0)
        return jax.lax.fori_loop(0, cfg.crf.mean_field_iters, body, q0)

    return run(u_static, u_dyn, nbr, w, ok)
