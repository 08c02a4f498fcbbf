from harp_tpu.preprocess.crop import (
    crop_frame,
    crop_unscreen_sequence,
    resize_center_crop,
)
from harp_tpu.preprocess.fit import (
    fit_mano_to_vertices,
    fit_arm_to_vertices,
    fit_nimble_to_vertices,
    remove_spike,
    smooth_pose_sequence,
    smooth_camera_sequence,
)
