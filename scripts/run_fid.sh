#!/bin/bash
# FID launcher — analog of the reference `fid/small_dset_run_fid.sh`
# (positional wrapper around fid_score_small_dset.py with dims=768).
# Usage: run_fid.sh <path_real> <path_fake> <inception_weights>
#        [max_images] [batch_size] [small_dset]
# (the reference wrapper's 3rd positional was number_of_images — a flag
# its own script never defined; here it is the 4th arg and functional)
set -e
cd "$(dirname "$0")/.."

path_real=${1:?path_real}
path_fake=${2:?path_fake}
weights=${3:?inception_weights (pt_inception-2015-12-05 .pth or .npz)}
max_images=${4:-0}
batch_size=${5:-20}
small_dset=${6:-1}

python cli/compute_metrics.py fid --real_dir "$path_real" \
  --fake_dir "$path_fake" --inception_weights "$weights" \
  --max_images "$max_images" \
  --batch_size "$batch_size" --small_dset "$small_dset"
