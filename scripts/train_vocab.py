#!/usr/bin/env python
"""Train the bundled BoW vocabulary from diverse synthetic imagery.

The reference ships a pretrained 10^6-word ORB vocabulary (ORBvoc.txt,
k=10 L=6, built offline from Bovisa/outdoor footage — DBoW2's
TemplatedVocabulary; not present in this mount). This script builds our
bundled equivalent: it renders many independently-seeded synthetic worlds,
extracts ORB descriptors with the production extractor, and trains a
k=10 hierarchical binary k-medians tree (placerec/vocab.py — the same
FORB meanValue/Hamming scheme DBoW2 uses).

    python scripts/train_vocab.py [levels=4] [n_worlds=60] [out.npz]

The bundled default_vocab.npz is a 1M-word k=10 L=6 tree (ORBvoc's
structure) trained on 4.1M descriptors from 400 worlds with
`VOCAB_PHASE=extract python scripts/train_vocab.py 6 400 /tmp/v.npz` then
`VOCAB_PHASE=train ...` (two phases so the CPU k-medians doesn't hold the
TPU); quality-check candidates with scripts/eval_vocab.py (held-out:
top1=0.98, same/other margin 5.37x).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_worlds = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    out = (sys.argv[3] if len(sys.argv) > 3 else
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))),
               "orb_slam3_detailed_comments_tpu", "placerec",
               "default_vocab.npz"))
    # phase=extract dumps descriptors and exits (frees the TPU); phase=train
    # loads them and runs the CPU k-medians; default does both in-process
    phase = os.environ.get("VOCAB_PHASE", "all")
    cache = os.environ.get("VOCAB_DESC_CACHE", "/tmp/vocab_desc.npy")

    import jax
    if phase == "train":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.ops import extractor
    from orb_slam3_detailed_comments_tpu.placerec import vocab
    from orb_slam3_detailed_comments_tpu.utils import synth_render

    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    cfg = extractor.OrbConfig(n_features=1024)
    jext = jax.jit(lambda im: extractor.extract(im, cfg))

    t0 = time.time()
    if phase == "train":
        descs = np.load(cache)
        print(f"loaded {len(descs)} cached descriptors from {cache}")
        _train_and_save(descs, levels, out, t0)
        return
    all_desc = []
    frames_per_world = 10
    for wseed in range(n_worlds):
        rng = np.random.default_rng(1000 + wseed)
        planes = synth_render.default_world(
            rng, extent=float(rng.uniform(8, 20)),
            tex_size=int(rng.integers(700, 1500)))
        R, t = synth_render.orbit_trajectory(
            frames_per_world,
            advance=float(rng.uniform(1.0, 4.0)),
            sway=float(rng.uniform(0.1, 0.8)))
        for i in range(frames_per_world):
            img = synth_render.render_frame(cam, planes, R[i], t[i])
            f = jext(jnp.asarray(img))
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            all_desc.append(d)
        if wseed % 10 == 0:
            n = sum(len(d) for d in all_desc)
            print(f"world {wseed}/{n_worlds}: {n} descriptors "
                  f"({time.time() - t0:.0f}s)")
    descs = np.concatenate(all_desc, axis=0)
    if phase == "extract":
        np.save(cache, descs)
        print(f"cached {len(descs)} descriptors to {cache}")
        return
    _train_and_save(descs, levels, out, t0)


def _train_and_save(descs, levels, out, t0):
    from orb_slam3_detailed_comments_tpu.placerec import vocab
    print(f"training k=10 L={levels} on {len(descs)} descriptors ...")
    voc = vocab.train(descs, k=10, levels=levels, seed=0,
                      max_train=4_000_000 if levels >= 5 else 1_500_000)
    vocab.save(voc, out)
    print(f"saved {voc.n_words}-word vocabulary to {out} "
          f"({os.path.getsize(out) / 1e6:.2f} MB, "
          f"{time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
