#!/bin/bash
# Fetch the TUM RGBD sequences used by the configs (fr1_desk, fr2_xyz,
# fr3_office). NOTE: this environment has no network egress; run elsewhere.
set -e
mkdir -p data/TUM_RGBD
cd data/TUM_RGBD
base=https://cvg.cit.tum.de/rgbd/dataset
for pair in \
  "freiburg1 rgbd_dataset_freiburg1_desk" \
  "freiburg2 rgbd_dataset_freiburg2_xyz" \
  "freiburg3 rgbd_dataset_freiburg3_long_office_household"; do
  set -- $pair
  wget $base/$1/$2.tgz
  tar -xzf $2.tgz
  rm $2.tgz
done
