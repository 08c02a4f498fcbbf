from harp_tpu.eval.metrics import (
    sil_iou,
    l1_diff,
    ssim,
    ms_ssim,
    perceptual_distance,
    image_eval,
    align_w_scale,
    align_by_trafo,
    EvalUtil,
)
