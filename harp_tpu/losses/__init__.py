from harp_tpu.losses.basic import (
    l1_loss,
    silhouette_loss,
    photometric_loss,
    kps_anchor_loss,
    vert_disp_reg,
    arap_loss,
)
from harp_tpu.losses.texture_reg import albedo_reg, normal_reg, smooth_texture_reg, close_to_z_reg
from harp_tpu.losses.perceptual import (
    Vgg16Features,
    vgg_feature_l1,
    vgg_feature_l1_cached,
    precompute_slices,
)
