"""Retrieval-embedding A/B at map scale (VERDICT r4 ask #8).

The production loop/reloc retrieval compresses each keyframe's
descriptor set into kf_emb (mapstate._descriptor_embedding: 256-d
centered mean-bit vector, cosine-scored). That is exact enough at
TUM scale (~300 KFs); this harness measures how it degrades at 1k+
keyframes with perceptual aliasing, against a stronger candidate that
fits the same (F, D) @ (D,) scoring interface:

  meanbit   — production: 256-d centered bit-mean.
  bow-V     — flat coarse vocabulary: V random binary anchor
              descriptors; each descriptor assigns to its nearest
              anchor by Hamming distance; the embedding is the
              L2-normalized assignment histogram (DBoW2's mechanism
              minus the tree — the tree only accelerates assignment,
              which on TPU is one (K, V) popcount matmul).

Task: P places x 2 visits each; every visit re-observes a noisy subset
of its place's base descriptor set plus distractors; a fraction of
places are ALIASED (share half their base set with a twin place).
Metric: top-1 / top-5 retrieval of the sibling visit, overall and on
the aliased subset.

Run: python benchmarks/retrieval_ab.py [--places 600] [--noise 0.06]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lc_crf_slam_tpu.ops.orb import pack_bits, unpack_bits
from lc_crf_slam_tpu.models.mapstate import _descriptor_embedding


def make_task(n_places=600, base_size=300, obs_size=250, distractors=50,
              flip=0.06, alias_frac=0.2, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((n_places, base_size, 256)) < 0.5       # bits
    # aliased twins: place 2i+1 shares the first half of 2i's base set
    n_alias = int(alias_frac * n_places / 2)
    aliased = np.zeros(n_places, bool)
    for i in range(n_alias):
        a, b = 2 * i, 2 * i + 1
        base[b, : base_size // 2] = base[a, : base_size // 2]
        aliased[a] = aliased[b] = True

    kfs = []
    labels = []
    for p in range(n_places):
        for _visit in range(2):
            idx = rng.choice(base_size, obs_size, replace=False)
            bits = base[p, idx].copy()
            bits ^= rng.random(bits.shape) < flip
            extra = rng.random((distractors, 256)) < 0.5
            kfs.append(np.concatenate([bits, extra]))
            labels.append(p)
    return np.asarray(kfs), np.asarray(labels), aliased


def emb_meanbit(kfs):
    K = kfs.shape[1]
    valid = jnp.ones((K,), bool)
    out = []
    for b in np.array_split(np.arange(len(kfs)), 16):
        packed = jax.vmap(pack_bits)(jnp.asarray(kfs[b]))
        out.append(np.asarray(jax.vmap(
            lambda d: _descriptor_embedding(d, valid))(packed)))
    return np.concatenate(out)


def emb_bow(kfs, V=1024, seed=7):
    rng = np.random.default_rng(seed)
    anchors = jnp.asarray(rng.random((V, 256)) < 0.5, jnp.float32)

    @jax.jit
    def one(bits):
        b = jnp.asarray(bits, jnp.float32)                 # (K, 256)
        # Hamming = popcount(a XOR d) = |a| + |d| - 2 a.d  (monotone in
        # the dot product for fixed magnitudes) — assignment via one
        # (K, V) matmul on +-1-mapped bits
        s = (2 * b - 1) @ (2 * anchors - 1).T              # (K, V)
        assign = jnp.argmax(s, axis=1)
        h = jnp.zeros((V,)).at[assign].add(1.0)
        return h / jnp.maximum(jnp.linalg.norm(h), 1e-6)

    out = []
    for b in np.array_split(np.arange(len(kfs)), 16):
        out.append(np.asarray(jax.vmap(one)(jnp.asarray(kfs[b]))))
    return np.concatenate(out)


def evaluate(name, emb, labels, aliased, t_build):
    n = len(labels)
    sims = emb @ emb.T
    np.fill_diagonal(sims, -np.inf)
    # sibling visit: the other KF with the same label
    order = np.argsort(-sims, axis=1)
    lab = labels[order]
    top1 = (lab[:, 0] == labels).mean()
    top5 = (lab[:, :5] == labels[:, None]).any(axis=1).mean()
    amask = aliased[labels]
    a1 = (lab[amask, 0] == labels[amask]).mean()
    a5 = (lab[amask, :5] == labels[amask, None]).any(axis=1).mean()
    print(f"{name:12s} top1={top1:.3f} top5={top5:.3f} | aliased "
          f"top1={a1:.3f} top5={a5:.3f} | build={t_build:.1f}s "
          f"dim={emb.shape[1]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--places", type=int, default=600)
    ap.add_argument("--noise", type=float, default=0.06)
    args = ap.parse_args()

    kfs, labels, aliased = make_task(n_places=args.places, flip=args.noise)
    print(f"task: {len(labels)} keyframes, {args.places} places, "
          f"{aliased.sum()} aliased, flip={args.noise}", flush=True)

    t0 = time.time()
    e = emb_meanbit(kfs)
    evaluate("meanbit-256", e, labels, aliased, time.time() - t0)
    for V in (256, 1024, 4096):
        t0 = time.time()
        e = emb_bow(kfs, V=V)
        evaluate(f"bow-{V}", e, labels, aliased, time.time() - t0)


if __name__ == "__main__":
    main()
