"""Global constants for the UnCLTMO-TPU framework.

TPU-native rebuild of the constants in the reference implementation
(`utils/params.py:1-113` of cao-cong/UnCLTMO).  Only the constants that are
actually consumed by the live code paths are kept; dead/legacy constants are
dropped.
"""

# Training crop size.  The U-Net (valid 3x3 convs, depth 4, transpose-conv
# decoder) maps a 256x256 input to a 12x12 bottleneck, which is the fixed grid
# the GCN block's positional embedding is built for (reference
# `models/unet_multi_filters/Unet.py:66`).
INPUT_SIZE = 256

# Bottleneck grid (INPUT_SIZE=256 -> 12x12; see models/unet.py for the size
# arithmetic).
GCN_GRID = 12

EPSILON = 1e-08   # reference `utils/params.py:48`
EPSILON2 = 1e-05  # reference `utils/params.py:49`

# Adam beta1 for both optimizers (reference `utils/params.py:61`).
BETA1 = 0.5

MANUAL_SEED = 999

# ---- skip-connection concat operators (reference `utils/params.py:78-83`)
ORIGINAL_UNET = "original_unet"
SQUARE = "square"
SQUARE_ROOT = "square_root"
SQUARE_AND_SQUARE_ROOT = "square_and_square_root"
GAMMA = "gamma"
SQUARE_AND_SQUARE_ROOT_MANUAL_D = "square_and_square_root_manual_d"

# layer_factor: how many tensors the `up` block concatenates
# (reference `utils/params.py:73-75`, `utils/model_save_util.py:145-153`).
LAYER_FACTOR = {
    ORIGINAL_UNET: 2,
    SQUARE: 3,
    SQUARE_ROOT: 3,
    GAMMA: 3,
    SQUARE_AND_SQUARE_ROOT: 4,
    SQUARE_AND_SQUARE_ROOT_MANUAL_D: 4,
}

UNET_NETWORK = "unet"

# ---- batch dict keys (reference `utils/params.py:17-21`)
GRAY_INPUT_IMAGE_KEY = "input_im"
COLOR_IMAGE_KEY = "color_im"
ORIGINAL_GRAY_KEY = "original_gray"
ORIGINAL_GRAY_NORM_KEY = "original_gray_norm"
GAMMA_FACTOR_KEY = "gamma_factor"

# ---- default output sub-directories (reference `utils/params.py:26-31`)
MODELS_SAVE_PATH = "models"
LOSS_PATH = "loss_plot"
RESULTS_PATH = "result_images"
MODELS_IMAGES = "model_results"

# Rec.601 luma weights used for all gray conversions in the reference
# (`utils/hdr_image_util.py:72-82`).
REC601 = (0.299, 0.587, 0.114)

# Rec.709 luma weights used by TMQI (`TMQI.py:46-49`).
REC709 = (0.2126, 0.7152, 0.0722)

# Tiled-inference defaults (reference `utils/model_save_util.py:303-304`).
TILE = 256
TILE_OVERLAP_QUARTER_RES = 64
TILE_OVERLAP_FULL_RES = 192

# Fraction of channels carried between video frames at every encoder/decoder
# level (reference `models/unet_multi_filters/Unet.py:138`).
RECURRENT_CH_RATIO = 1.0 / 32.0
