#!/bin/bash
# Fetch the Replica SLAM sequences (same source the reference uses).
# NOTE: this environment has no network egress; run on a connected machine.
set -e
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
rm Replica.zip
