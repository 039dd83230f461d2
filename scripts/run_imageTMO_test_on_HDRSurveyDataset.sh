#!/bin/bash
# Quarter-res HDR Survey image-TMO eval (reference
# `activate_trained_model/run_imageTMO_test_on_HDRSurveyDataset.sh`).
set -e
cd "$(dirname "$0")/.."
exec python cli/test_imageTMO.py \
  --model_path "${MODEL_PATH:-model_weights_imageTMO}" \
  --input_images_path "${INPUT_IMAGES:-input_images}" \
  --output_path "${OUTPUT_PATH:-output_HDRSurvey}" \
  --f_factor_path "${F_FACTOR_PATH:-lambda_data/input_images_lambdas_HDRSdataset.npy}" \
  --scale 4 --overlap 64 "$@"
