#!/bin/bash
# Full-res LVZ-HDR image-TMO eval (x100-gain preprocessed inputs; reference
# `run_imageTMO_test_on_LVZHDRDataset.sh`).
set -e
cd "$(dirname "$0")/.."
exec python cli/test_imageTMO.py \
  --model_path "${MODEL_PATH:-model_weights_imageTMO}" \
  --input_images_path "${INPUT_IMAGES:-input_images}" \
  --output_path "${OUTPUT_PATH:-output_LVZHDR}" \
  --f_factor_path "${F_FACTOR_PATH:-lambda_data/input_images_lambdas_LVZHDR.npy}" \
  --scale 1 --overlap 192 "$@"
