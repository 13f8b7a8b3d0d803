"""Keyframe database: appearance indexing + candidate retrieval.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc): the inverted
index vector<list<KeyFrame*>> becomes a fixed-width sparse tf-idf matrix —
per keyframe the word ids [K, W] and weights [K, W] of its BoW vector
(W = max distinct words per frame <= n_features), so memory is independent
of vocabulary size. Loop/reloc candidate scoring densifies the single query
vector and evaluates all K cosine scores as one gather+reduce, followed by
the reference's covisibility-group accumulation (DetectNBestCandidates,
KeyFrameDatabase.cc:649).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import vocab as vocab_mod
from ..mapping.mapstore import MapStore


class KeyFrameDatabase:
    def __init__(self, voc: vocab_mod.Vocabulary, max_kf: int,
                 max_words_per_kf: int = 0):
        self.voc = voc
        self.width = max_words_per_kf    # 0: sized lazily from the first add
        self.word_ids = None             # [max_kf, W] int32
        self.word_w = None               # [max_kf, W] float32 (L2-normalized)
        self.max_kf = max_kf
        self.valid = np.zeros(max_kf, bool)

    def _ensure(self, n_feat: int, kf_id: int):
        if self.word_ids is None:
            if self.width <= 0:
                self.width = n_feat
            self.word_ids = np.zeros((self.max_kf, self.width), np.int32)
            self.word_w = np.zeros((self.max_kf, self.width), np.float32)
        while kf_id >= self.max_kf:    # track MapStore.grow capacity doubling
            self.max_kf *= 2
            self.word_ids = np.concatenate(
                [self.word_ids, np.zeros_like(self.word_ids)])
            self.word_w = np.concatenate(
                [self.word_w, np.zeros_like(self.word_w)])
            self.valid = np.concatenate([self.valid, np.zeros_like(self.valid)])

    def add(self, kf_id: int, desc: np.ndarray, feat_valid: np.ndarray):
        self._ensure(len(desc), kf_id)
        words = vocab_mod.transform(self.voc, jnp.asarray(desc),
                                    jnp.asarray(feat_valid))
        ids, w = vocab_mod.bow_sparse(self.voc, np.asarray(words), self.width)
        self.word_ids[kf_id] = ids
        self.word_w[kf_id] = w
        self.valid[kf_id] = True

    def erase(self, kf_id: int):
        self.valid[kf_id] = False
        if self.word_w is not None:
            self.word_w[kf_id] = 0.0

    def clear(self):
        self.valid[:] = False
        if self.word_w is not None:
            self.word_w[:] = 0.0

    def query_scores(self, desc: np.ndarray, feat_valid: np.ndarray) -> np.ndarray:
        """Cosine tf-idf score of a query image against every stored KF [K]."""
        if self.word_ids is None:
            return np.zeros(self.max_kf, np.float32)
        words = vocab_mod.transform(self.voc, jnp.asarray(desc),
                                    jnp.asarray(feat_valid))
        qi, qw = vocab_mod.bow_sparse(self.voc, np.asarray(words), self.width)
        qdense = np.zeros(self.voc.n_words, np.float32)
        nz = qw > 0                                  # skip zero-padding slots
        qdense[qi[nz]] = qw[nz]
        s = (self.word_w * qdense[self.word_ids]).sum(1)
        s[~self.valid] = 0.0
        return s

    def detect_candidates(self, m: MapStore, query_kf: int, n_best: int = 3,
                          exclude: set | None = None) -> list:
        """Loop/merge candidates for a keyframe: score all KFs, accumulate
        over covisibility groups, exclude the query's own covisible set
        (reference: DetectNBestCandidates)."""
        scores = self.query_scores(m.kf_feat_desc[query_kf],
                                   m.kf_feat_valid[query_kf])
        covis_ids, _ = m.covisibility(query_kf, min_weight=15)
        excl = {query_kf, *covis_ids.tolist(), *(exclude or set())}
        covm = m.covisibility_matrix()
        cand = []
        for k in np.argsort(-scores):
            k = int(k)
            if scores[k] <= 1e-6 or k in excl or not m.kf_valid[k]:
                continue
            # accumulated score over k's top covisibility group
            group = [k] + [int(x) for x in np.argsort(-covm[k])[:10]
                           if covm[k, x] >= 15 and m.kf_valid[x]]
            acc = float(sum(scores[g] for g in group))
            best_in_group = max(group, key=lambda g: scores[g])
            cand.append((acc, best_in_group))
        cand.sort(key=lambda t: -t[0])
        out, seen = [], set()
        for acc, k in cand:
            if k not in seen:
                out.append(k)
                seen.add(k)
            if len(out) >= n_best:
                break
        return out

    def detect_relocalization_candidates(self, m: MapStore, desc, feat_valid,
                                         n_best: int = 5) -> list:
        """(reference: DetectRelocalizationCandidates, KeyFrameDatabase.cc:827)"""
        scores = self.query_scores(desc, feat_valid)
        order = np.argsort(-scores)
        return [int(k) for k in order[:n_best]
                if scores[k] > 1e-6 and m.kf_valid[k]]
