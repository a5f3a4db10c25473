"""Binary bag-of-words place recognition (DBoW2 equivalent, on-device).

Behavioral spec: reference ``3rdparty/DBoW2`` — TemplatedVocabulary
transform/score over 256-bit ORB descriptors (hierarchical k-means tree,
L1 scoring, ScoringObject.cpp) and the conf_matrix rows built per keyframe
(mapHandler.cpp insertKFBowVector* :4118-4239).

TPU-first design: the vocabulary is a fixed (branching k, depth d) tree
stored as one packed descriptor array per level; transform() descends the
tree for all N descriptors at once (each step is a batched Hamming argmin
over k children = popcount matmul); BoW vectors are dense (k^d,) L1-
normalized tf vectors; scores against the whole keyframe database are one
batched reduction.

Training uses binary k-means (majority-bit centroids) — the reference ships
a pre-trained vocabulary file; here the vocabulary is trained online from
accumulated keyframe descriptors (or offline from any descriptor corpus).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.descriptors import hamming_distance_matrix, pack_bits, unpack_bits


class Vocabulary(NamedTuple):
    """Hierarchical binary vocabulary; level l holds k^(l+1) node descriptors
    (children of level l-1 nodes, contiguous blocks of k)."""

    levels: tuple[jax.Array, ...]  # each (k^(l+1), 8) uint32
    k: int
    depth: int

    @property
    def num_words(self) -> int:
        return self.k ** self.depth


def _majority_centroid(bits: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Binary k-means centroid: per-bit weighted majority."""
    w = weights[:, None]
    frac = (bits * w).sum(0) / max(w.sum(), 1e-9)
    return (frac >= 0.5).astype(np.int8)


def train_vocabulary(descriptors: np.ndarray, k: int = 10, depth: int = 3,
                     iters: int = 8, seed: int = 0) -> Vocabulary:
    """Host-side hierarchical binary k-means (training is offline; transform
    and scoring are the on-device hot path)."""
    rng = np.random.default_rng(seed)
    desc = np.asarray(descriptors, dtype=np.uint32)
    bits = np.unpackbits(desc.view(np.uint8), axis=-1, bitorder="little")

    def kmeans(sub: np.ndarray) -> np.ndarray:
        n = len(sub)
        if n == 0:
            return np.zeros((k, 256), np.int8)
        init = sub[rng.choice(n, size=min(k, n), replace=False)]
        cents = np.zeros((k, 256), np.int8)
        cents[: len(init)] = init
        if len(init) < k:  # duplicate-pad
            cents[len(init):] = init[rng.integers(0, len(init), k - len(init))]
        for _ in range(iters):
            d = (sub[:, None, :] != cents[None, :, :]).sum(-1)
            assign = d.argmin(1)
            for c in range(k):
                sel = sub[assign == c]
                if len(sel):
                    cents[c] = _majority_centroid(sel, np.ones(len(sel)))
        return cents

    levels = []
    # level 0: k clusters of everything; level l: k children per parent
    parents = [bits]
    for l in range(depth):
        cents_l = []
        next_parents = []
        for sub in parents:
            cents = kmeans(sub)
            cents_l.append(cents)
            if l + 1 < depth:
                if len(sub):
                    d = (sub[:, None, :] != cents[None, :, :]).sum(-1)
                    assign = d.argmin(1)
                else:
                    assign = np.zeros(0, np.int64)
                for c in range(k):
                    next_parents.append(sub[assign == c] if len(sub) else sub)
        cents_l = np.concatenate(cents_l, axis=0)  # (k^(l+1), 256)
        packed = np.asarray(
            jax.device_get(pack_bits(jnp.asarray(cents_l, jnp.uint8))))
        levels.append(jnp.asarray(packed, jnp.uint32))
        parents = next_parents
    return Vocabulary(levels=tuple(levels), k=k, depth=depth)


def transform(voc: Vocabulary, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """Descriptors (N, 8) -> dense L1-normalized BoW vector (k^depth,).

    Tree descent, all descriptors in parallel: at each level, gather each
    descriptor's k candidate children and take the Hamming argmin.
    """
    n = desc.shape[0]
    k = voc.k
    node = jnp.zeros((n,), jnp.int32)  # current node id within its level
    for l in range(voc.depth):
        level_desc = voc.levels[l]  # (k^(l+1), 8)
        cand_idx = node[:, None] * k + jnp.arange(k, dtype=jnp.int32)[None, :]
        cand = level_desc[cand_idx]  # (N, k, 8)
        x = jax.lax.population_count(desc[:, None, :] ^ cand)
        d = jnp.sum(x.astype(jnp.int32), axis=-1)  # (N, k)
        node = (node * k + jnp.argmin(d, axis=-1).astype(jnp.int32))
    w = voc.num_words
    counts = jnp.zeros((w,), desc.dtype if desc.dtype.kind == "f" else jnp.float32)
    counts = counts.at[node].add(jnp.where(valid, 1.0, 0.0))
    total = jnp.sum(counts)
    return counts / jnp.maximum(total, 1e-9)


def l1_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L1 score in [0, 1]: 1 - 0.5 * || v1 - v2 ||_1 for L1-normalized
    vectors (ScoringObject.cpp L1Scoring).  Broadcasts: (..., W) x (..., W).
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


def score_against_database(v: jax.Array, db: jax.Array, db_valid: jax.Array) -> jax.Array:
    """One BoW vector against (D, W) database -> (D,) scores; invalid rows
    get -1 (the conf_matrix row of insertKFBowVector)."""
    s = l1_score(v[None, :], db)
    return jnp.where(db_valid, s, -1.0)
