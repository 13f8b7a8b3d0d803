#!/usr/bin/env python
"""ATE evaluation CLI (reference: evaluation/evaluate_ate_scale.py).

Associates an estimated TUM-format trajectory with ground truth, aligns with
Horn's method (+ optional similarity scale for monocular), prints RMS ATE.

Usage:
    python evaluation/evaluate_ate_scale.py <groundtruth.txt> <estimate.txt>
        [--no-scale] [--max-dt 0.02] [--plot out.png]
"""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("groundtruth")
    ap.add_argument("estimate")
    ap.add_argument("--no-scale", action="store_true",
                    help="rigid alignment only (stereo/RGB-D/inertial)")
    ap.add_argument("--max-dt", type=float, default=0.02)
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    import numpy as np
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from orb_slam3_detailed_comments_tpu.utils import evaluate_ate as ev

    gt_ts, gt_xyz = ev.load_tum(args.groundtruth)
    est_ts, est_xyz = ev.load_tum(args.estimate)
    rmse, n, scale = ev.ate_rmse(gt_ts, gt_xyz, est_ts, est_xyz,
                                 with_scale=not args.no_scale,
                                 max_dt=args.max_dt)
    print(f"compared_pose_pairs {n} pairs")
    print(f"absolute_translational_error.rmse {rmse:.6f} m")
    print(f"scale {scale:.6f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        pairs = ev.associate(est_ts, gt_ts, args.max_dt)
        est = est_xyz[pairs[:, 0]]
        gt = gt_xyz[pairs[:, 1]]
        s, R, t, aligned = ev.align_horn(est, gt, not args.no_scale)
        fig, ax = plt.subplots(figsize=(7, 7))
        ax.plot(gt[:, 0], gt[:, 1], "k-", label="ground truth")
        ax.plot(aligned[:, 0], aligned[:, 1], "b-", label="estimated")
        ax.legend(); ax.set_xlabel("x [m]"); ax.set_ylabel("y [m]")
        ax.set_aspect("equal")
        fig.savefig(args.plot, dpi=120)
        print(f"plot saved to {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
