"""Keyframe database: appearance indexing + candidate retrieval.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc): the inverted
index vector<list<KeyFrame*>> becomes a dense [K, n_words] tf-idf weight
matrix; loop/reloc candidate scoring is one matmul of the query BoW vector
against all keyframes, followed by the reference's covisibility-group
accumulation (DetectNBestCandidates, KeyFrameDatabase.cc:649).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import vocab as vocab_mod
from ..mapping.mapstore import MapStore


class KeyFrameDatabase:
    def __init__(self, voc: vocab_mod.Vocabulary, max_kf: int):
        self.voc = voc
        self.weights = np.zeros((max_kf, voc.n_words), np.float32)
        self.valid = np.zeros(max_kf, bool)

    def add(self, kf_id: int, desc: np.ndarray, feat_valid: np.ndarray):
        words = vocab_mod.transform(self.voc, jnp.asarray(desc),
                                    jnp.asarray(feat_valid))
        v = vocab_mod.bow_vector(self.voc, words)
        self.weights[kf_id] = np.asarray(v)
        self.valid[kf_id] = True

    def erase(self, kf_id: int):
        self.valid[kf_id] = False
        self.weights[kf_id] = 0.0

    def clear(self):
        self.valid[:] = False
        self.weights[:] = 0.0

    def query_scores(self, desc: np.ndarray, feat_valid: np.ndarray) -> np.ndarray:
        """Cosine tf-idf score of a query image against every stored KF [K]."""
        words = vocab_mod.transform(self.voc, jnp.asarray(desc),
                                    jnp.asarray(feat_valid))
        q = np.asarray(vocab_mod.bow_vector(self.voc, words))
        s = self.weights @ q
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
