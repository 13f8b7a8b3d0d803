#!/usr/bin/env python
"""Self-contained demo on a rendered synthetic world (no dataset needed):
runs mono, stereo, or rgbd SLAM over a generated sequence, reports ATE
against exact ground truth, and writes trajectory + visualization frames.

Usage: python examples/synthetic_demo.py [mono|stereo|rgbd] [n_frames] [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mono"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/tpu_slam_demo"
    os.makedirs(outdir, exist_ok=True)

    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.pipeline.system import (
        System, MONOCULAR, STEREO, RGBD)
    from orb_slam3_detailed_comments_tpu.utils import (
        evaluate_ate, synth_render)
    from orb_slam3_detailed_comments_tpu.viz import drawers

    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    rng = np.random.default_rng(7)
    planes = synth_render.default_world(rng)
    R, t = synth_render.orbit_trajectory(n)
    ts = np.arange(n) * 0.05
    baseline = 0.11

    sensor = {"mono": MONOCULAR, "stereo": STEREO, "rgbd": RGBD}[mode]
    slam = System(cam, sensor, baseline=baseline)
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        if mode == "mono":
            img = synth_render.render_frame(cam, planes, R[i], t[i])
            slam.track_monocular(img, float(ts[i]))
        elif mode == "stereo":
            l, r = synth_render.render_stereo_pair(cam, planes, R[i], t[i], baseline)
            img = l
            slam.track_stereo(l, r, float(ts[i]))
        else:
            img = synth_render.render_frame(cam, planes, R[i], t[i])
            d = synth_render.render_depth(cam, planes, R[i], t[i])
            slam.track_rgbd(img, d, float(ts[i]))
        times.append(time.perf_counter() - t0)
        if i % 10 == 0 and slam.tracker.last is not None:
            fr = slam.tracker.last
            vis = drawers.draw_frame(
                img, np.asarray(fr.prepared.feat.xy),
                np.asarray(fr.prepared.feat.valid),
                fr.match_pt >= 0,
                f"{mode} f{i} kf={slam.n_keyframes} pts={slam.n_map_points}")
            drawers.save_png(os.path.join(outdir, f"frame_{i:04d}.png"), vis)

    drawers.save_png(os.path.join(outdir, "map_topdown.png"),
                     drawers.draw_map_topdown(slam.map))
    from orb_slam3_detailed_comments_tpu.viz import webviewer
    webviewer.export_html(slam, os.path.join(outdir, "map_viewer.html"),
                          title=f"synthetic {mode}")
    traj = os.path.join(outdir, f"trajectory_{mode}.txt")
    slam.save_trajectory_tum(traj)

    rows = slam.trajectory_tum()
    est_ts = np.array([r_[0] for r_ in rows])
    est_xyz = np.array([r_[1:4] for r_ in rows])
    gt = synth_render.camera_centers(R, t)
    # TUM-format ground truth so evaluation/evaluate_ate_scale.py can be
    # driven on the demo output standalone (identity orientation: the ATE
    # CLI only reads positions)
    with open(os.path.join(outdir, f"groundtruth_{mode}.txt"), "w") as f:
        for k in range(n):
            f.write(f"{ts[k]:.6f} {gt[k, 0]:.6f} {gt[k, 1]:.6f} "
                    f"{gt[k, 2]:.6f} 0 0 0 1\n")
    rmse, nn, scale = evaluate_ate.ate_rmse(ts, gt, est_ts, est_xyz,
                                            with_scale=(mode == "mono"))
    print(f"[{mode}] frames={n} tracked={len(rows)} kf={slam.n_keyframes} "
          f"points={slam.n_map_points}")
    print(f"[{mode}] ATE RMSE {rmse * 100:.2f} cm over {nn} poses "
          f"(scale {scale:.3f}); median frame time "
          f"{np.median(times) * 1e3:.1f} ms")
    print(f"outputs in {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
