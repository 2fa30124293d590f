#!/bin/bash
# Fetch the standard NeRF example datasets (lego + fern) into ./data
# (reference: download_nerf_data.sh)
set -e
mkdir -p data
cd data
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/nerf_example_data.zip
unzip -n nerf_example_data.zip
