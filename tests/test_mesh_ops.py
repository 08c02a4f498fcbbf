import os

import numpy as np
import jax.numpy as jnp
import pytest

from harp_tpu.ops import mesh as M

REF_ARM_OBJ = "/root/reference/template/arm/arm_template.obj"
REF_ARM_CORR = "/root/reference/template/arm/smplx_arm_corr.pkl"


def _quad_mesh():
    # Two triangles sharing an edge, in the z=0 plane.
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    return verts, faces


def test_topology_edges():
    verts, faces = _quad_mesh()
    topo = M.build_topology(faces, 4)
    # 5 unique edges, lexicographically sorted.
    expected = np.array([[0, 1], [0, 2], [1, 2], [1, 3], [2, 3]])
    np.testing.assert_array_equal(topo.edges, expected)
    # faces_to_edges column i = edge opposite vertex i.
    # Face (0,1,2): e12=(1,2)->2, e20=(0,2)->1, e01=(0,1)->0
    np.testing.assert_array_equal(topo.faces_to_edges[0], [2, 1, 0])
    # One interior edge -> one face pair.
    assert topo.edge_face_pairs.shape == (1, 2)


def test_vertex_normals_flat():
    verts, faces = _quad_mesh()
    n = M.vertex_normals(jnp.asarray(verts), faces)
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (4, 1)), atol=1e-6)


def test_vertex_normals_batched():
    verts, faces = _quad_mesh()
    batch = jnp.stack([jnp.asarray(verts), jnp.asarray(verts) * 2.0])
    n = M.vertex_normals(batch, faces)
    assert n.shape == (2, 4, 3)
    np.testing.assert_allclose(n[1], np.tile([0, 0, 1.0], (4, 1)), atol=1e-6)


def test_laplacian_loss_flat_grid_interior():
    # A vertex at the centroid of its neighbors has zero laplacian.
    verts = np.array([[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]], np.float32)
    faces = np.array([[0, 1, 3], [0, 3, 2], [0, 2, 4], [0, 4, 1]], np.int64)
    topo = M.build_topology(faces, 5)
    loss = M.laplacian_smoothing_loss(jnp.asarray(verts), topo)
    # Center vertex: neighbors mean = origin = itself -> 0 contribution.
    gathered = verts[topo.neighbors]
    deg = topo.neighbor_mask.sum(1, keepdims=True)
    mean_nbr = (gathered * topo.neighbor_mask[..., None]).sum(1) / deg
    expected = np.linalg.norm(mean_nbr - verts, axis=1).mean()
    np.testing.assert_allclose(loss, expected, rtol=1e-6)


def test_normal_consistency_flat_vs_bent():
    verts, faces = _quad_mesh()
    topo = M.build_topology(faces, 4)
    flat = M.normal_consistency_loss(jnp.asarray(verts), topo)
    np.testing.assert_allclose(flat, 0.0, atol=1e-6)
    bent = verts.copy()
    bent[3, 2] = 1.0  # fold the second triangle up
    assert M.normal_consistency_loss(jnp.asarray(bent), topo) > 0.1


def test_subdivision_counts():
    verts, faces = _quad_mesh()
    topo = M.build_topology(faces, 4)
    sub = M.build_subdivision(topo)
    assert sub.num_verts == 4 + 5
    assert sub.faces.shape == (8, 3)
    out = M.apply_subdivision(sub, jnp.asarray(verts))
    assert out.shape == (9, 3)
    # New verts are midpoints in edge order.
    np.testing.assert_allclose(out[4], [0.5, 0, 0], atol=1e-6)  # edge (0,1)
    np.testing.assert_allclose(out[8], [0.5, 1.0, 0], atol=1e-6)  # edge (2,3)


def test_subdivision_face_pattern():
    verts, faces = _quad_mesh()
    topo = M.build_topology(faces, 4)
    sub = M.build_subdivision(topo)
    # Block 0 first face: (v0, e01, e20) for face (0,1,2):
    # e01 = edge(0,1) = id 0 -> 4; e20 = edge(2,0) = id 1 -> 5
    np.testing.assert_array_equal(sub.faces[0], [0, 4, 5])
    # Block 3 first face: (e12, e20, e01) = (6, 5, 4)
    np.testing.assert_array_equal(sub.faces[6], [6, 5, 4])


@pytest.mark.skipif(not os.path.exists(REF_ARM_OBJ), reason="reference template absent")
def test_subdivision_matches_harp_arm_template():
    """The arm template obj was exported from a pytorch3d subdivision of the
    1026-vert coarse arm mesh; our subdivision must reproduce its exact
    vertex/face ordering for the template UVs to line up."""
    from harp_tpu.assets import load_obj_with_uv, load_arm_correspondence

    corr = load_arm_correspondence(REF_ARM_CORR)
    coarse_faces = corr["face"]
    num_coarse = int(coarse_faces.max()) + 1
    assert num_coarse == 1026
    topo = M.build_topology(coarse_faces, num_coarse)
    sub = M.build_subdivision(topo)

    obj_verts, obj_faces, _, obj_faces_uvs = load_obj_with_uv(REF_ARM_OBJ)
    assert sub.num_verts == obj_verts.shape[0] == 4083
    assert sub.faces.shape == obj_faces.shape == (8128, 3)

    # The obj exporter (trimesh) renumbered vertices, but face ORDER is
    # preserved: there must exist one consistent vertex permutation mapping
    # our subdivided faces onto the obj faces (this is what keeps the obj's
    # faces_uvs aligned with subdivided-face indices).
    perm = -np.ones(sub.num_verts, dtype=np.int64)
    for mine, theirs in zip(sub.faces.ravel(), obj_faces.ravel()):
        if perm[mine] == -1:
            perm[mine] = theirs
        else:
            assert perm[mine] == theirs
    assert (perm >= 0).all()

    # Geometric check: appended verts are midpoints of the permuted coarse verts.
    coarse_pos = obj_verts[perm[:num_coarse]]
    out = np.asarray(M.apply_subdivision(sub, jnp.asarray(coarse_pos)))
    np.testing.assert_allclose(out[num_coarse:], obj_verts[perm[num_coarse:]], atol=1e-4)


def test_taubin_smoothing_reduces_roughness():
    from harp_tpu.ops.mesh import taubin_smoothing
    rng = np.random.RandomState(0)
    # Noisy sphere-ish: icosphere stand-in = synthetic hand palm component.
    from harp_tpu.assets import build_synthetic_hand
    m = build_synthetic_hand()
    topo = M.build_topology(m.faces, m.num_verts)
    noisy = m.v_template + 0.002 * rng.randn(*m.v_template.shape).astype(np.float32)
    smoothed = taubin_smoothing(jnp.asarray(noisy), topo)
    rough = lambda v: float(M.laplacian_smoothing_loss(jnp.asarray(v), topo))
    # Smoothing removes most of the noise-induced roughness (the template
    # itself carries baseline curvature).
    base = rough(m.v_template)
    assert rough(smoothed) - base < (rough(noisy) - base) * 0.5
    # No catastrophic shrinkage.
    assert np.abs(np.asarray(smoothed) - m.v_template).max() < 0.02
