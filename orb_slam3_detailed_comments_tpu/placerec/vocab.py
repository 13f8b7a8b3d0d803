"""Binary bag-of-words vocabulary: hierarchical k-medians over ORB descriptors.

Replaces DBoW2's TemplatedVocabulary<FORB> (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:44, FORB.cpp). The reference
ships a pretrained 10^6-word tree (ORBvoc.txt, k=10 L=6) which is not in the
mount; this module trains a vocabulary from descriptor samples (hierarchical
k-medians with bitwise majority-vote centroids, the same construction DBoW2's
`create` uses) and provides a fully vectorized transform:

    descriptors [N, 8] uint32  ->  word ids [N]

via level-wise gather + XOR/popcount argmin — each tree level is one batched
op instead of DBoW2's per-descriptor pointer descent.

Scoring uses tf-idf weighted cosine similarity evaluated as one [Q, K]
matmul over the keyframe-database weight matrix (MXU-friendly), standing in
for DBoW2's sparse L1 score.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """Flat tree: level l has k^l nodes; children of node n are
    n*k ... n*k+k-1 at the next level. centroids[l] is [k^(l+1), 8] uint32
    (the nodes AT level l+1, indexed by parent-major order)."""
    k: int
    levels: int
    centroids: tuple          # per level: np/jnp [k^(l+1), 8] uint32
    idf: jnp.ndarray          # [n_words] float32

    @property
    def n_words(self) -> int:
        return self.k ** self.levels


_POP_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(1).astype(np.uint16)


def _popcount_np(x: np.ndarray) -> np.ndarray:
    # byte-LUT popcount: 8x less peak memory than unpackbits
    return _POP_LUT[x.view(np.uint8)].sum(-1, dtype=np.int32)


def _assign_np(descs: np.ndarray, cents: np.ndarray,
               chunk: int = 200_000) -> np.ndarray:
    """argmin Hamming assignment [M,8]x[k,8] -> [M], chunked so million-
    descriptor training runs stay within memory."""
    out = np.empty(len(descs), np.int32)
    for i in range(0, len(descs), chunk):
        d = _popcount_np(descs[i:i + chunk, None, :] ^ cents[None, :, :])
        out[i:i + chunk] = d.argmin(1)
    return out


def _majority_centroid(descs: np.ndarray) -> np.ndarray:
    """Bitwise majority vote of [M, 8] uint32 -> [8] uint32
    (reference: FORB::meanValue, Thirdparty/DBoW2/DBoW2/FORB.cpp)."""
    tot = np.zeros(256, np.int64)
    for i in range(0, len(descs), 200_000):   # chunked: million-row groups
        tot += np.unpackbits(descs[i:i + 200_000].view(np.uint8),
                             axis=-1).sum(0, dtype=np.int64)
    maj = (tot * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


def _kmedians(descs: np.ndarray, k: int, rng, iters: int = 8) -> np.ndarray:
    """Binary k-medians: [M, 8] -> centroids [k, 8]."""
    M = len(descs)
    if M == 0:
        return np.zeros((k, 8), np.uint32)
    init = rng.choice(M, size=min(k, M), replace=False)
    cents = descs[init]
    if len(cents) < k:
        cents = np.concatenate([cents, np.tile(cents[-1:], (k - len(cents), 1))])
    for _ in range(iters):
        assign = _assign_np(descs, cents)                        # [M]
        new = []
        for c in range(k):
            sel = descs[assign == c]
            new.append(_majority_centroid(sel) if len(sel) else cents[c])
        new = np.stack(new)
        if (new == cents).all():
            break
        cents = new
    return cents.astype(np.uint32)


def train(descriptors: np.ndarray, k: int = 10, levels: int = 3,
          seed: int = 0, max_train: int = 60000) -> Vocabulary:
    """Hierarchical k-medians. descriptors [M, 8] uint32.

    levels=3..4 (1k..10k words) is plenty for maps of a few hundred KFs; the
    reference's 1M words amortize a lifetime of datasets.
    """
    rng = np.random.default_rng(seed)
    if len(descriptors) > max_train:
        descriptors = descriptors[rng.choice(len(descriptors), max_train,
                                             replace=False)]
    groups = [np.arange(len(descriptors))]
    centroids = []
    for l in range(levels):
        cents_l = []
        new_groups = []
        for g in groups:
            cg = _kmedians(descriptors[g], k, rng)
            cents_l.append(cg)
            a = _assign_np(descriptors[g], cg)
            for c in range(k):
                new_groups.append(g[a == c])
        centroids.append(np.concatenate(cents_l, axis=0))    # [k^(l+1), 8]
        groups = new_groups
    # idf from training distribution
    voc = Vocabulary(k=k, levels=levels,
                     centroids=tuple(jnp.asarray(c) for c in centroids),
                     idf=jnp.ones(k ** levels))
    words = np.asarray(transform(voc, jnp.asarray(descriptors),
                                 jnp.ones(len(descriptors), bool)))
    counts = np.bincount(words, minlength=k ** levels).astype(np.float64)
    idf = np.log(max(len(descriptors), 1) / np.maximum(counts, 1.0))
    return voc._replace(idf=jnp.asarray(idf, jnp.float32))


@partial(jax.jit, static_argnames=("k", "levels"))
def _transform_jit(cents, desc, valid, k: int, levels: int) -> jnp.ndarray:
    node = jnp.zeros(desc.shape[0], jnp.int32)
    for l in range(levels):
        child0 = node * k
        cand = child0[:, None] + jnp.arange(k)[None, :]       # [N, k]
        cc = cents[l][cand]                            # [N, k, 8]
        d = jnp.sum(jax.lax.population_count(desc[:, None, :] ^ cc), axis=-1)
        node = (child0 + jnp.argmin(d, axis=-1)).astype(jnp.int32)
    return jnp.where(valid, node, -1)


def transform(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> word ids [N] int32 (level-wise vectorized descent,
    replacing TemplatedVocabulary::transform's per-descriptor walk).

    One jitted program, NOT eager level-by-level ops: the keyframe
    database calls this from the mapping worker thread, and eager
    primitive dispatch racing the async-GBA thread's program execution
    aborts XLA:CPU (every observed crash had this exact pair)."""
    return _transform_jit(tuple(voc.centroids), desc, valid,
                          k=voc.k, levels=voc.levels)


def bow_vector(voc: Vocabulary, words: jnp.ndarray) -> jnp.ndarray:
    """Word ids [N] -> L2-normalized tf-idf vector [n_words]."""
    W = voc.n_words
    ok = words >= 0
    hist = jnp.zeros(W).at[jnp.where(ok, words, 0)].add(ok.astype(jnp.float32))
    v = hist * voc.idf
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)


def bow_sparse(voc: Vocabulary, words: np.ndarray,
               width: int) -> tuple[np.ndarray, np.ndarray]:
    """Word ids [N] -> sparse L2-normalized tf-idf vector as
    (ids [width] int32, weights [width] float32), zero-padded. A frame has
    at most n_features distinct words, so `width`=n_features is lossless —
    this is the DBoW2 BowVector (sparse map<WordId,WordValue>) shape, kept
    fixed-width for array storage."""
    words = np.asarray(words)
    uw, counts = np.unique(words[words >= 0], return_counts=True)
    w = counts.astype(np.float32) * np.asarray(voc.idf)[uw]
    n = np.linalg.norm(w)
    if n > 1e-9:
        w = w / n
    if len(uw) > width:                      # keep the heaviest words
        keep = np.argsort(-w)[:width]
        uw, w = uw[keep], w[keep]
        w = w / max(np.linalg.norm(w), 1e-9)
    ids = np.zeros(width, np.int32)
    ws = np.zeros(width, np.float32)
    ids[:len(uw)] = uw
    ws[:len(uw)] = w
    return ids, ws


def save(voc: Vocabulary, path: str):
    np.savez_compressed(
        path, k=voc.k, levels=voc.levels, idf=np.asarray(voc.idf),
        **{f"c{l}": np.asarray(c) for l, c in enumerate(voc.centroids)})


def load(path: str) -> Vocabulary:
    z = np.load(path)
    levels = int(z["levels"])
    return Vocabulary(
        k=int(z["k"]), levels=levels,
        centroids=tuple(jnp.asarray(z[f"c{l}"]) for l in range(levels)),
        idf=jnp.asarray(z["idf"]))
