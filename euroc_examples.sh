#!/bin/bash
# Batch driver over the EuRoC MAV sequences, mirroring the reference's
# euroc_examples.sh: every sensor mode over every sequence, plus the
# multi-session (Atlas) runs. Point pathDatasetEuroc at a standard EuRoC
# layout (<seq>/mav0/cam0/data, .../imu0/data.csv).
set -u
pathDatasetEuroc="${EUROC_PATH:-/Datasets/EuRoC}"
outDir="${OUT_DIR:-results_euroc}"
cfg=examples/config/EuRoC.yaml
mkdir -p "$outDir"

seqs=(MH01 MH02 MH03 MH04 MH05 V101 V102 V103 V201 V202 V203)

#------------------------------------
# Monocular
for s in "${seqs[@]}"; do
  echo "Launching $s with Monocular sensor"
  python examples/mono_euroc.py "$cfg" "$pathDatasetEuroc/$s" \
    "$outDir/f_dataset-${s}_mono.txt"
done

#------------------------------------
# Stereo
for s in "${seqs[@]}"; do
  echo "Launching $s with Stereo sensor"
  python examples/stereo_euroc.py "$cfg" "$pathDatasetEuroc/$s" \
    "$outDir/f_dataset-${s}_stereo.txt"
done

#------------------------------------
# Monocular-Inertial
for s in "${seqs[@]}"; do
  echo "Launching $s with Monocular-Inertial sensor"
  python examples/mono_inertial_euroc.py "$cfg" "$pathDatasetEuroc/$s" \
    "$outDir/f_dataset-${s}_monoi.txt"
done

#------------------------------------
# Stereo-Inertial
for s in "${seqs[@]}"; do
  echo "Launching $s with Stereo-Inertial sensor"
  python examples/stereo_inertial_euroc.py "$cfg" "$pathDatasetEuroc/$s" \
    "$outDir/f_dataset-${s}_stereoi.txt"
done

#------------------------------------
# MultiSession (Atlas): one run over all Machine Hall / Vicon room sequences
echo "Launching Machine Hall multi-session with Stereo-Inertial sensor"
python examples/stereo_inertial_euroc.py "$cfg" \
  "$pathDatasetEuroc/MH01" "$pathDatasetEuroc/MH02" "$pathDatasetEuroc/MH03" \
  "$pathDatasetEuroc/MH04" "$pathDatasetEuroc/MH05" \
  "$outDir/f_dataset-MH01_to_MH05_stereoi.txt"

echo "Launching Vicon Room 1 multi-session with Monocular-Inertial sensor"
python examples/mono_inertial_euroc.py "$cfg" \
  "$pathDatasetEuroc/V101" "$pathDatasetEuroc/V102" "$pathDatasetEuroc/V103" \
  "$outDir/f_dataset-V101_to_V103_monoi.txt"
