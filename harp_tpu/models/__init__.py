from harp_tpu.models.lbs import kinematic_levels, forward_kinematics, linear_blend_skinning
from harp_tpu.models.mano import ManoModel, mano_forward
from harp_tpu.models.manoarm import ManoArmModel, manoarm_forward
