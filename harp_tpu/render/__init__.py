from harp_tpu.render.camera import (
    weak_perspective_to_translation,
    OPENCV_TO_P3D_R,
    world_to_view,
    view_to_screen,
    screen_from_world,
    look_at_rotation,
    camera_center,
)
from harp_tpu.render.rasterizer import (
    RasterConfig,
    rasterize_soft,
    rasterize_hard,
    soft_alpha_from_ids,
    barycentrics_of,
)
