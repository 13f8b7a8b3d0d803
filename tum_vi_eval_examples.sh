#!/bin/bash
# Run + evaluate TUM-VI sequences against the mocap ground truth, mirroring
# the reference's tum_vi_eval_examples.sh (stereo-inertial on the 512x512
# KB8 fisheye exports, graded with evaluate_ate_scale). The mocap exports
# live at <seq>/mav0/mocap0/data.csv in the dataset itself.
set -u
pathDatasetTUM_VI="${TUMVI_PATH:-/Datasets/TUM_VI}"
outDir="${OUT_DIR:-results_tumvi}"
cfg=examples/config/TUM-VI_512.yaml
if [ ! -d "$pathDatasetTUM_VI" ]; then
  echo "error: dataset dir '$pathDatasetTUM_VI' not found; set TUMVI_PATH." >&2
  exit 1
fi
mkdir -p "$outDir"

# Single session: the fisheye stereo-inertial flagship
for s in dataset-magistrale1_512_16 dataset-room1_512_16; do
  echo "Launching $s with Stereo-Inertial sensor"
  python examples/stereo_inertial_tum_vi.py "$cfg" \
    "$pathDatasetTUM_VI/$s" "$outDir/f_${s}_stereoi.txt"
  echo "Evaluation of $s trajectory with Stereo-Inertial sensor"
  python evaluation/evaluate_ate_scale.py \
    "$pathDatasetTUM_VI/$s/mav0/mocap0/data.csv" \
    "$outDir/f_${s}_stereoi.txt"
done

# Single session, mono-inertial (the reference grades room sequences)
echo "Launching room1 with Monocular-Inertial sensor"
python examples/mono_inertial_tum_vi.py "$cfg" \
  "$pathDatasetTUM_VI/dataset-room1_512_16" "$outDir/f_room1_monoi.txt"
echo "Evaluation of room1 trajectory with Monocular-Inertial sensor"
python evaluation/evaluate_ate_scale.py \
  "$pathDatasetTUM_VI/dataset-room1_512_16/mav0/mocap0/data.csv" \
  "$outDir/f_room1_monoi.txt"

# Multi-session: rooms 1-3 welded into one Atlas map, graded jointly
echo "Launching rooms 1-3 multi-session with Monocular-Inertial sensor"
python examples/mono_inertial_tum_vi.py "$cfg" \
  "$pathDatasetTUM_VI/dataset-room1_512_16" \
  "$pathDatasetTUM_VI/dataset-room2_512_16" \
  "$pathDatasetTUM_VI/dataset-room3_512_16" \
  "$outDir/f_rooms123_monoi.txt"
echo "Evaluation of rooms 1-3 multi-session trajectory"
python evaluation/evaluate_ate_scale.py \
  "$pathDatasetTUM_VI/dataset-room1_512_16/mav0/mocap0/data.csv" \
  "$outDir/f_rooms123_monoi.txt"
