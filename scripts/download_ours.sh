#!/usr/bin/env bash
# Fetch the RTG-SLAM authors' self-captured Azure-Kinect sequences ("ours"
# layout: color/ depth/ pose/ + config.yaml). The upstream release ships this
# script as a placeholder too (reference scripts/download_ours.sh) — the
# dataset is distributed via the project page rather than a stable URL.
# Fill in the link from https://gapszju.github.io/RTG-SLAM/ and unzip into
# data/ours/<scene>; readers expect the layout documented in
# rtgslam_tpu/data/dataset.py (read_ours_scene).
set -euo pipefail
mkdir -p data/ours && cd data/ours
echo "Download the 'ours' sequences from the RTG-SLAM project page"
echo "(https://gapszju.github.io/RTG-SLAM/) and extract them here, e.g.:"
echo "  wget <release-url>/ours.zip && unzip ours.zip"
