#!/bin/bash
# Batch driver over TUM-VI sequences, mirroring the reference's
# tum_vi_examples.sh. Expects the 512x512 fisheye exports
# (<seq>/mav0/cam0/data + imu0/data.csv).
set -u
pathDatasetTUM_VI="${TUMVI_PATH:-/Datasets/TUM_VI}"
outDir="${OUT_DIR:-results_tumvi}"
cfg=examples/config/TUM-VI_512.yaml
mkdir -p "$outDir"

seqs=(dataset-corridor1_512_16 dataset-magistrale1_512_16
      dataset-room1_512_16 dataset-slides1_512_16 dataset-outdoors1_512_16)

for s in "${seqs[@]}"; do
  echo "Launching $s with Monocular sensor"
  python examples/mono_tum_vi.py "$cfg" "$pathDatasetTUM_VI/$s" \
    "$outDir/f_${s}_mono.txt"

  echo "Launching $s with Stereo sensor"
  python examples/stereo_tum_vi.py "$cfg" "$pathDatasetTUM_VI/$s" \
    "$outDir/f_${s}_stereo.txt"

  echo "Launching $s with Monocular-Inertial sensor"
  python examples/mono_inertial_tum_vi.py "$cfg" "$pathDatasetTUM_VI/$s" \
    "$outDir/f_${s}_monoi.txt"

  echo "Launching $s with Stereo-Inertial sensor"
  python examples/stereo_inertial_tum_vi.py "$cfg" "$pathDatasetTUM_VI/$s" \
    "$outDir/f_${s}_stereoi.txt"
done

# Multi-session: rooms 1-3 welded into one Atlas map
echo "Launching rooms 1-3 multi-session with Monocular-Inertial sensor"
python examples/mono_inertial_tum_vi.py "$cfg" \
  "$pathDatasetTUM_VI/dataset-room1_512_16" \
  "$pathDatasetTUM_VI/dataset-room2_512_16" \
  "$pathDatasetTUM_VI/dataset-room3_512_16" \
  "$outDir/f_rooms123_monoi.txt"
