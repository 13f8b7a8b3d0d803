import numpy as np, jax, jax.numpy as jnp, time
from orb_slam3_detailed_comments_tpu.ops import extractor, pyramid, brief, fast
from orb_slam3_detailed_comments_tpu.utils import synth_render
from orb_slam3_detailed_comments_tpu.models import cameras
h, w = 480, 752
cfg = extractor.OrbConfig(n_features=1024)
cam = cameras.pinhole(fx=458.0, fy=457.0, cx=w/2, cy=h/2, width=w, height=h)
rng = np.random.default_rng(3)
planes = synth_render.default_world(rng)
R, t = synth_render.orbit_trajectory(4)
img = jnp.asarray(synth_render.render_frame(cam, planes, R[1], t[1]))
def timeit(name, fn, n=80):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(name, round((time.perf_counter()-t0)/n*1e3, 3), 'ms')
budgets = extractor.level_budgets(cfg)
def build(barrier):
    def f(im):
        levels = pyramid.build_pyramid(im, 8, 1.2)
        yxs, angs, offs, wids, heis, blur_flats = [], [], [], [], [], []
        off = 0
        outs = []
        for lv in range(8):
            lvl = levels[lv]
            ch = int(round(h/1.2**lv)); cw = int(round(w/1.2**lv))
            kps = fast.detect_level(lvl, (ch, cw), budgets[lv], cell=32, k_per_cell=8, min_th=7.0, margin=16)
            ang = brief.ic_angle(lvl, kps.yx)
            bl = pyramid.gaussian_blur(lvl)
            blur_flats.append(bl.reshape(-1))
            ph, pw = lvl.shape
            b = budgets[lv]
            yxs.append(kps.yx); angs.append(ang)
            offs.append(jnp.full((b,), off, jnp.int32))
            wids.append(jnp.full((b,), pw, jnp.int32))
            heis.append(jnp.full((b,), ph, jnp.int32))
            off += ph*pw
            outs.append(kps.score); outs.append(ang)
        flat = jnp.concatenate(blur_flats)
        if barrier:
            flat = jax.lax.optimization_barrier(flat)
        d = brief.describe_flat(flat, jnp.concatenate(yxs),
            jnp.concatenate(angs), jnp.concatenate(offs),
            jnp.concatenate(wids), jnp.concatenate(heis))
        outs.append(d)
        return outs
    return jax.jit(f)
fa, fb = build(False), build(True)
jax.block_until_ready(fa(img)); jax.block_until_ready(fb(img))
timeit('no barrier', lambda: fa(img))
timeit('with optimization_barrier', lambda: fb(img))
