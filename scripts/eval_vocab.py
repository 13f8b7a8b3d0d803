"""A/B place-recognition evaluation of BoW vocabularies.

Builds a keyframe database from held-out synthetic worlds (seeds disjoint
from the training seeds in train_vocab.py) and measures, for query frames
taken between the database frames:

  - top1: fraction of queries whose best-scoring database frame is the
    nearest-in-time frame of the SAME world (the "same place"),
  - margin: median ratio of the same-place score to the best score from a
    DIFFERENT world (loop-closure false-positive headroom).

Mirrors the role of the reference's vocabulary quality check (DBoW2 L1
scoring feeding KeyFrameDatabase::DetectNBestCandidates,
src/KeyFrameDatabase.cc:649) without needing real datasets.

`--domains` additionally sweeps texture statistics the vocabulary was NOT
trained on (1/f natural spectra, strong illumination fields, saturated
specular highlights — synth_render.TEXTURE_DOMAINS) and reports per-domain
retrieval, quantifying the domain gap vs the reference's real-imagery
ORBvoc (unpacked by /root/reference/build.sh:29-33).

Usage: python scripts/eval_vocab.py [--domains] voc_a.npz [voc_b.npz ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def render_eval_set(cam, jext, n_worlds, frames_per_world, seed0,
                    texture_fn=None):
    """Descriptor sets for `n_worlds` held-out worlds; `texture_fn(rng, size)`
    overrides every plane's texture (domain-shift probe)."""
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.utils import synth_render
    descs, valids, world_of, idx_in_world = [], [], [], []
    for w in range(n_worlds):
        rng = np.random.default_rng(seed0 + w)
        planes = synth_render.default_world(
            rng, extent=float(rng.uniform(8, 20)),
            tex_size=int(rng.integers(700, 1500)))
        if texture_fn is not None:
            for pl in planes:
                pl.texture = texture_fn(rng, pl.texture.shape[0])
        R, t = synth_render.orbit_trajectory(
            frames_per_world,
            advance=float(rng.uniform(1.0, 3.0)),
            sway=float(rng.uniform(0.1, 0.6)))
        for i in range(frames_per_world):
            img = synth_render.render_frame(cam, planes, R[i], t[i])
            f = jext(jnp.asarray(img))
            descs.append(np.asarray(f.desc))
            valids.append(np.asarray(f.valid))
            world_of.append(w)
            idx_in_world.append(i)
    return descs, valids, np.asarray(world_of), np.asarray(idx_in_world)


def retrieval_metrics(voc, descs, valids, world_of, idx_in_world):
    """(top1, margin) of odd-frame queries against the even-frame database."""
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.placerec import vocab
    vecs = []
    for d, v in zip(descs, valids):
        words = vocab.transform(voc, jnp.asarray(d), jnp.asarray(v))
        vecs.append(np.asarray(vocab.bow_vector(voc, words)))
    vecs = np.stack(vecs)                      # [F, n_words]
    is_db = idx_in_world % 2 == 0
    db, q = np.where(is_db)[0], np.where(~is_db)[0]
    S = vecs[q] @ vecs[db].T                   # [Q, D]
    same_world = world_of[q][:, None] == world_of[db][None, :]
    near = same_world & (np.abs(idx_in_world[q][:, None]
                                - idx_in_world[db][None, :]) <= 1)
    top1 = (near[np.arange(len(q)), S.argmax(1)]).mean()
    s_same = np.where(near, S, -np.inf).max(1)
    s_other = np.where(~same_world, S, -np.inf).max(1)
    margin = np.median(s_same / np.maximum(s_other, 1e-9))
    return float(top1), float(margin)


def main():
    import jax
    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.ops import extractor
    from orb_slam3_detailed_comments_tpu.placerec import vocab
    from orb_slam3_detailed_comments_tpu.utils import synth_render

    args = sys.argv[1:]
    do_domains = "--domains" in args
    paths = [a for a in args if not a.startswith("--")]
    assert paths, "usage: eval_vocab.py [--domains] voc.npz [voc2.npz ...]"

    import jax.numpy as jnp
    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    cfg = extractor.OrbConfig(n_features=1024)
    jext = jax.jit(lambda im: extractor.extract(im, cfg))

    domains = {"blob": None}
    if do_domains:
        domains.update({k: fn for k, fn in
                        synth_render.TEXTURE_DOMAINS.items() if k != "blob"})

    sets = {}
    for name, fn in domains.items():
        t0 = time.time()
        n_worlds = 20 if name == "blob" else 12
        sets[name] = render_eval_set(cam, jext, n_worlds, 10, 50_000, fn)
        print(f"rendered {name}: {len(sets[name][0])} frames "
              f"({time.time() - t0:.0f}s)")

    for path in paths:
        voc = vocab.load(path)
        for name, data in sets.items():
            top1, margin = retrieval_metrics(voc, *data)
            print(f"{os.path.basename(path):28s} n_words={voc.n_words:>7d} "
                  f"domain={name:10s} top1={top1:.3f} "
                  f"same/other margin={margin:.2f}")


if __name__ == "__main__":
    main()
