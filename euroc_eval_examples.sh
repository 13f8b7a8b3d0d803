#!/bin/bash
# Run + evaluate EuRoC sequences against ground truth, mirroring the
# reference's euroc_eval_examples.sh. Ground-truth files are the EuRoC
# state_groundtruth_estimate0 exports in TUM format (t x y z qx qy qz qw);
# set GT_DIR to a directory of <SEQ>_GT.txt files.
set -u
pathDatasetEuroc="${EUROC_PATH:-/Datasets/EuRoC}"
gtDir="${GT_DIR:-evaluation/Ground_truth/EuRoC_left_cam}"
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

for s in MH01 V102; do
  echo "Launching $s with Stereo sensor"
  python examples/stereo_euroc.py "$cfg" "$pathDatasetEuroc/$s" \
    "$outDir/f_dataset-${s}_stereo.txt"
  echo "Evaluation of $s trajectory with Stereo sensor"
  python evaluation/evaluate_ate_scale.py "$gtDir/${s}_GT.txt" \
    "$outDir/f_dataset-${s}_stereo.txt"
done

echo "Launching Machine Hall multi-session with Stereo sensor"
python examples/stereo_euroc.py "$cfg" \
  "$pathDatasetEuroc/MH01" "$pathDatasetEuroc/MH02" "$pathDatasetEuroc/MH03" \
  "$pathDatasetEuroc/MH04" "$pathDatasetEuroc/MH05" \
  "$outDir/f_dataset-MH01_to_MH05_stereo.txt"
echo "Evaluation of Machine Hall multi-session trajectory"
python evaluation/evaluate_ate_scale.py "$gtDir/MH_GT.txt" \
  "$outDir/f_dataset-MH01_to_MH05_stereo.txt"
