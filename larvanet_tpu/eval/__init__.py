from larvanet_tpu.eval.metrics import (
    image_to_uint8,
    fit_truth_to_output,
    shave,
    psnr_rgb,
    rgb_to_y,
    psnr_y,
    ssim,
)
