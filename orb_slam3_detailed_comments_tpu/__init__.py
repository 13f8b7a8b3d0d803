"""tpu-slam: a TPU-native visual / visual-inertial SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ORB-SLAM3
(reference: electech6/ORB_SLAM3_detailed_comments) — monocular / stereo /
RGB-D tracking with and without IMU, pinhole and Kannala-Brandt fisheye
cameras, multi-map Atlas, loop closing and map merging — redesigned around
tensor state, batched kernels, and a Gauss-Newton/LM solver with
Schur-complement landmark elimination instead of pointer graphs, pthreads
and g2o.

Layer map (mirrors SURVEY.md §1 of the reference):
  lie/       — SO3/SE3/Sim3 exp/log/Jacobians        (replaces Sophus)
  models/    — camera models + two-view reconstruction (replaces CameraModels/)
  ops/       — feature extraction + matching kernels   (replaces ORBextractor/ORBmatcher)
  optim/     — GN/LM, pose opt, local BA, pose graphs  (replaces g2o + Optimizer)
  imu/       — preintegration + inertial factors       (replaces ImuTypes)
  mapping/   — tensor map store, covisibility, Atlas   (replaces Frame/KeyFrame/MapPoint/Map/Atlas)
  placerec/  — BoW vocabulary, keyframe DB, Sim3/PnP   (replaces DBoW2 + KeyFrameDatabase + solvers)
  pipeline/  — Tracking / LocalMapping / LoopClosing / System facade
  parallel/  — device meshes, sharded distributed BA, frame-parallel tracking
  utils/     — config, datasets, trajectory IO, timing
  viz/       — headless frame/map drawers
"""

import os as _os

import jax as _jax

# Geometry/optimization code needs true-f32 matmuls: on TPU the default MXU
# precision for f32 inputs is bf16-accumulate, which loses ~3 decimal digits —
# fatal for pose Jacobians and Schur solves. Hot kernels that can tolerate
# lower precision opt in explicitly via precision= / preferred_element_type.
if _os.environ.get("TPU_SLAM_FAST_MATMUL", "0") != "1":
    _jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
