#!/bin/bash
# Full-res HDRI Haven image-TMO eval (192-px overlap; reference
# `run_imageTMO_test_on_HDRIHavenDataset.sh` + `model_save_util.py:304`).
set -e
cd "$(dirname "$0")/.."
exec python cli/test_imageTMO.py \
  --model_path "${MODEL_PATH:-model_weights_imageTMO}" \
  --input_images_path "${INPUT_IMAGES:-input_images}" \
  --output_path "${OUTPUT_PATH:-output_HDRIHaven}" \
  --f_factor_path "${F_FACTOR_PATH:-lambda_data/input_images_lambdas_HDRHaven.npy}" \
  --scale 1 --overlap 192 "$@"
