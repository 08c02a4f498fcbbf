from harp_tpu.ops.rotations import (
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    quaternion_to_matrix,
    rot6d_to_matrix,
    project_to_rotation,
)
from harp_tpu.ops.mesh import (
    MeshTopology,
    build_topology,
    build_subdivision,
    apply_subdivision,
    vertex_normals,
    laplacian_smoothing_loss,
    normal_consistency_loss,
    edge_lengths,
)
