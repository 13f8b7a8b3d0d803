#!/bin/bash
# Run + evaluate EuRoC sequences against ground truth, mirroring the
# reference's euroc_eval_examples.sh across ALL its graded configs
# (stereo single + multi-session, mono-inertial single + multi-session;
# reference lines 5-40) plus the stereo-inertial config the reference
# grades via its examples. Ground-truth files are the EuRoC
# state_groundtruth_estimate0 exports in TUM format (t x y z qx qy qz qw);
# set GT_DIR (left-cam frame, visual configs) and GT_DIR_IMU (body/IMU
# frame, inertial configs — the reference evaluates those against
# evaluation/Ground_truth/EuRoC_imu) to directories of <SEQ>_GT.txt files.
set -u
pathDatasetEuroc="${EUROC_PATH:-/Datasets/EuRoC}"
gtDir="${GT_DIR:-evaluation/Ground_truth/EuRoC_left_cam}"
gtDirImu="${GT_DIR_IMU:-evaluation/Ground_truth/EuRoC_imu}"
outDir="${OUT_DIR:-results_euroc}"
cfg=examples/config/EuRoC.yaml
if [ ! -d "$gtDir" ]; then
  echo "error: ground-truth dir '$gtDir' not found." >&2
  echo "EuRoC ground truth is not bundled (the reference ships it under" >&2
  echo "evaluation/Ground_truth/). Export GT_DIR to a directory of" >&2
  echo "<SEQ>_GT.txt files in TUM format (t x y z qx qy qz qw), e.g. the" >&2
  echo "EuRoC state_groundtruth_estimate0 exports." >&2
  exit 1
fi
if [ ! -d "$pathDatasetEuroc" ]; then
  echo "error: dataset dir '$pathDatasetEuroc' not found; set EUROC_PATH." >&2
  exit 1
fi
mkdir -p "$outDir"

# ---- single session, pure visual (stereo) --------------------------------
for s in MH01 V102; do
  echo "Launching $s with Stereo sensor"
  python examples/stereo_euroc.py "$cfg" "$pathDatasetEuroc/$s" \
    "$outDir/f_dataset-${s}_stereo.txt"
  echo "Evaluation of $s trajectory with Stereo sensor"
  python evaluation/evaluate_ate_scale.py "$gtDir/${s}_GT.txt" \
    "$outDir/f_dataset-${s}_stereo.txt"
done

# ---- multi-session, pure visual (stereo) ---------------------------------
echo "Launching Machine Hall multi-session with Stereo sensor"
python examples/stereo_euroc.py "$cfg" \
  "$pathDatasetEuroc/MH01" "$pathDatasetEuroc/MH02" "$pathDatasetEuroc/MH03" \
  "$pathDatasetEuroc/MH04" "$pathDatasetEuroc/MH05" \
  "$outDir/f_dataset-MH01_to_MH05_stereo.txt"
echo "Evaluation of Machine Hall multi-session trajectory"
python evaluation/evaluate_ate_scale.py "$gtDir/MH_GT.txt" \
  "$outDir/f_dataset-MH01_to_MH05_stereo.txt"

# ---- single session, visual-inertial -------------------------------------
# (reference: mono_inertial_euroc on V102, graded against the IMU-frame GT)
if [ -d "$gtDirImu" ]; then
  echo "Launching V102 with Monocular-Inertial sensor"
  python examples/mono_inertial_euroc.py "$cfg" "$pathDatasetEuroc/V102" \
    "$outDir/f_dataset-V102_monoi.txt"
  echo "Evaluation of V102 trajectory with Monocular-Inertial sensor"
  python evaluation/evaluate_ate_scale.py "$gtDirImu/V102_GT.txt" \
    "$outDir/f_dataset-V102_monoi.txt"

  echo "Launching MH01 with Stereo-Inertial sensor"
  python examples/stereo_inertial_euroc.py "$cfg" "$pathDatasetEuroc/MH01" \
    "$outDir/f_dataset-MH01_stereoi.txt"
  echo "Evaluation of MH01 trajectory with Stereo-Inertial sensor"
  python evaluation/evaluate_ate_scale.py "$gtDirImu/MH01_GT.txt" \
    "$outDir/f_dataset-MH01_stereoi.txt"

  # ---- multi-session, visual-inertial ------------------------------------
  # (reference: V201..V203 welded into one Atlas map, graded jointly)
  echo "Launching Vicon Room 2 multi-session with Monocular-Inertial sensor"
  python examples/mono_inertial_euroc.py "$cfg" \
    "$pathDatasetEuroc/V201" "$pathDatasetEuroc/V202" \
    "$pathDatasetEuroc/V203" \
    "$outDir/f_dataset-V201_to_V203_monoi.txt"
  echo "Evaluation of Vicon Room 2 multi-session trajectory"
  python evaluation/evaluate_ate_scale.py "$gtDirImu/V2_GT.txt" \
    "$outDir/f_dataset-V201_to_V203_monoi.txt"

  echo "Launching Machine Hall multi-session with Stereo-Inertial sensor"
  python examples/stereo_inertial_euroc.py "$cfg" \
    "$pathDatasetEuroc/MH01" "$pathDatasetEuroc/MH02" \
    "$pathDatasetEuroc/MH03" \
    "$outDir/f_dataset-MH01_to_MH03_stereoi.txt"
  echo "Evaluation of Machine Hall stereo-inertial multi-session trajectory"
  python evaluation/evaluate_ate_scale.py "$gtDirImu/MH_GT.txt" \
    "$outDir/f_dataset-MH01_to_MH03_stereoi.txt"
else
  echo "note: GT_DIR_IMU '$gtDirImu' not found — skipping the" >&2
  echo "visual-inertial evaluations (set GT_DIR_IMU to the EuRoC_imu" >&2
  echo "ground-truth exports to grade mono-inertial/stereo-inertial)." >&2
fi
