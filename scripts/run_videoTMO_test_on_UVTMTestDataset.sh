#!/bin/bash
# UVTM video-TMO eval (reference `run_videoTMO_test_on_UVTMTestDataset.sh`).
set -e
cd "$(dirname "$0")/.."
exec python cli/test_videoTMO.py \
  --model_path "${MODEL_PATH:-model_weights_videoTMO}" \
  --input_images_path "${INPUT_IMAGES:-input_video_scenes}" \
  --output_path "${OUTPUT_PATH:-output_UVTM}" \
  --f_factor_path "${F_FACTOR_PATH:-lambda_data/input_images_lambdas.npy}" \
  "$@"
