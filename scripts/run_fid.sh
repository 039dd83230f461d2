#!/bin/bash
# FID launcher — analog of the reference `fid/small_dset_run_fid.sh`
# (positional wrapper around fid_score_small_dset.py with dims=768).
# Usage: run_fid.sh <path_real> <path_fake> <inception_weights>
#        [batch_size] [small_dset]
set -e
cd "$(dirname "$0")/.."

path_real=${1:?path_real}
path_fake=${2:?path_fake}
weights=${3:?inception_weights (pt_inception-2015-12-05 .pth or .npz)}
batch_size=${4:-20}
small_dset=${5:-1}

python cli/compute_metrics.py fid --real_dir "$path_real" \
  --fake_dir "$path_fake" --inception_weights "$weights" \
  --batch_size "$batch_size" --small_dset "$small_dset"
