"""A/B device-time comparison: ba._ba_solve_tables (reference layout) vs
ba_packed.ba_solve_packed (entries-on-lanes) on the DEPLOYED local-BA
problem — the same System-driven steady-state problem bench.py measures.

Run bare on the TPU:  python scripts/ab_ba_packed.py [iters]
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax.numpy as jnp
    from scripts.devtime import device_ms
    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.optim import ba, ba_packed
    from orb_slam3_detailed_comments_tpu.pipeline.local_mapping import (
        LocalMappingConfig, build_ba_problem)
    from orb_slam3_detailed_comments_tpu.pipeline.system import (
        MONOCULAR, System)
    from orb_slam3_detailed_comments_tpu.utils import synth_render

    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    rng = np.random.default_rng(3)
    planes = synth_render.default_world(rng)
    n_warm = 45
    R, t = synth_render.orbit_trajectory(n_warm)
    slam = System(cam, MONOCULAR, enable_loop_closing=False)
    for i in range(n_warm):
        img = synth_render.render_frame(cam, planes, R[i], t[i])
        slam.track_monocular(img, i * 0.05)
    m = slam.map
    window = [int(k) for k in m.kf_ids()[-8:]]
    built = build_ba_problem(m, window, fixed=None)
    assert built is not None
    prob, bmeta = built
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else \
        LocalMappingConfig.ba_iters
    td = bmeta["table_depth"]
    d = ba.table_depth_of(prob, td)
    TL = ba.prepare_table(prob, td)
    C = int(prob.kf_R.shape[0])
    P = int(prob.points.shape[0])
    O = int(prob.obs_pt.shape[0])
    print(f"problem: C={C} P={P} O={O} d={d} iters={iters}")

    def solve_ref(kf_R):
        r = ba._ba_solve_tables(prob._replace(kf_R=kf_R), cam, iters,
                                5.991, 1e-4, td, table=TL)
        return r.kf_t.sum() + r.cost

    def solve_packed(kf_R):
        r = ba_packed.ba_solve_packed(prob._replace(kf_R=kf_R), cam, iters,
                                      5.991, 1e-4, td, table=TL)
        return r.kf_t.sum() + r.cost

    kf_R0 = prob.kf_R
    ms_ref = device_ms(solve_ref, kf_R0, reps_hi=17, reps_lo=3)
    ms_pk = device_ms(solve_packed, kf_R0, reps_hi=17, reps_lo=3)
    print(f"reference table solve: {ms_ref:.3f} ms "
          f"({ms_ref / iters * 1000:.1f} us/LM-iter)")
    print(f"packed solve:          {ms_pk:.3f} ms "
          f"({ms_pk / iters * 1000:.1f} us/LM-iter)")
    print(f"speedup: {ms_ref / ms_pk:.2f}x")

    # result agreement on the deployed problem
    ra = ba._ba_solve_tables(prob, cam, iters, 5.991, 1e-4, td, table=TL)
    rb = ba_packed.ba_solve_packed(prob, cam, iters, 5.991, 1e-4, td,
                                   table=TL)
    dt = float(jnp.abs(ra.kf_t - rb.kf_t).max())
    dp = float(jnp.abs(ra.points - rb.points).max())
    agree = float((ra.obs_inlier == rb.obs_inlier).mean())
    print(f"agreement: max|dt|={dt:.2e} max|dpoints|={dp:.2e} "
          f"inlier agree={agree:.4f} cost {float(ra.cost):.3f} vs "
          f"{float(rb.cost):.3f}")


if __name__ == "__main__":
    main()
