#!/bin/bash
# Mean-LDR-histogram / lambda-dict tooling launcher — analog of the
# reference `data/run_hist_fit.sh` (csh wrapper around lum_est_test.py).
# Usage: run_hist_fit.sh <mode> <input_dir> <output> [extra flags...]
#   mode = mean_hist     build the 20-bin mean LDR histogram
#          lambdas       fit per-image lambdas against a mean hist
#          scene_lambdas fit per-scene lambdas (video datasets)
set -e
cd "$(dirname "$0")/.."

mode=${1:?mode (mean_hist|lambdas|scene_lambdas)}
input_dir=${2:?input_dir}
output=${3:?output}
shift 3

python cli/prepare_lambdas.py --mode "$mode" --input_dir "$input_dir" \
  --output "$output" "$@"
