#!/bin/bash
# Image-TMO training launcher — same knobs as the reference
# `run_imageTMO_train.sh` (published config values), forwarded as named
# flags instead of the reference's 68 positional args.
set -e
cd "$(dirname "$0")/.."

checkpoint=0
change_random_seed=0
batch_size=8
num_epochs=21
lr_decay_step=50
d_pretrain_epochs=0
G_lr=0.00001
D_lr=0.000015
use_xaviar=1
model="unet"
filters=32
unet_depth=4
con_operator="square_and_square_root"
unet_norm="none"
g_activation="relu"
d_down_dim=16
d_norm="none"
last_layer="sigmoid"
d_model="simpleD"
d_last_activation="none"
stretch_g="none"
g_doubleConvTranspose=1
simpleD_maxpool=0
bilinear=0
padding="replicate"
d_padding=0
convtranspose_kernel=2
final_shape_addition=0
up_mode=0
input_dim=1
output_dim=1
loss_g_d_factor=0.1
# effective published value: the reference run_*.sh assigns "1,1,0"
# at the top but its launch loop overrides with adv_weight_list_lst
# (run_imageTMO_train.sh:108); the shipped checkpoints'
# run_settings.npy confirms 0.2,0.2,0.2
adv_weight_list="0.2,0.2,0.2"
ssim_loss_factor=1
ssim_window_size=5
# same: loop override (run_imageTMO_train.sh:106), confirmed by the
# shipped run_settings.npy
pyramid_weight_list="1,1,1"
data_root_npy="${DATA_ROOT_NPY:-data/HDRplus_patches512_npy}"
data_root_ldr="${DATA_ROOT_LDR:-data/DIV2K_patches512_npy2}"
# SICE over/under-exposed negatives — the image dataset draws its ldr_neg
# stream from this pool too (`ProcessedDatasetFolderImg.py:265-267`);
# without it the contrastive losses degrade to positive-vs-positive
neg_ldr_root="${NEG_LDR_ROOT:-data/SICE_patches512_npy}"
test_dataroot_original_hdr="${TEST_ORIGINAL_HDR:-data/input_images}"
factor_coeff=0.1
f_train_dict_path="${F_TRAIN_DICT:-data/input_images_lambdas_HDRplus256train.npy}"
data_trc="min_log"
add_frame=0
normalization="bugy_max_normalization"
result_dir_prefix="${RESULT_DIR:-results_imageTMOTrain/bs8}"

exec python cli/main_train_image.py \
  --checkpoint $checkpoint --change_random_seed $change_random_seed \
  --batch_size $batch_size --num_epochs $num_epochs \
  --lr_decay_step $lr_decay_step --d_pretrain_epochs $d_pretrain_epochs \
  --G_lr $G_lr --D_lr $D_lr --use_xaviar $use_xaviar \
  --model $model --filters $filters --unet_depth $unet_depth \
  --con_operator $con_operator --unet_norm $unet_norm \
  --g_activation $g_activation --d_down_dim $d_down_dim --d_norm $d_norm \
  --last_layer $last_layer --d_model $d_model \
  --d_last_activation $d_last_activation --stretch_g $stretch_g \
  --g_doubleConvTranspose $g_doubleConvTranspose \
  --simpleD_maxpool $simpleD_maxpool --bilinear $bilinear \
  --padding $padding --d_padding $d_padding \
  --convtranspose_kernel $convtranspose_kernel \
  --final_shape_addition $final_shape_addition --up_mode $up_mode \
  --input_dim $input_dim --output_dim $output_dim \
  --loss_g_d_factor $loss_g_d_factor --adv_weight_list $adv_weight_list \
  --ssim_loss_factor $ssim_loss_factor --ssim_window_size $ssim_window_size \
  --pyramid_weight_list $pyramid_weight_list \
  --data_root_npy "$data_root_npy" --data_root_ldr "$data_root_ldr" \
  --neg_ldr_root "$neg_ldr_root" \
  --test_dataroot_original_hdr "$test_dataroot_original_hdr" \
  --factor_coeff $factor_coeff --f_train_dict_path "$f_train_dict_path" \
  --data_trc $data_trc --add_frame $add_frame \
  --normalization $normalization \
  --result_dir_prefix "$result_dir_prefix" "$@"
