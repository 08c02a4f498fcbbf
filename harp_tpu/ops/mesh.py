"""Static mesh topology + differentiable mesh operators.

TPU-first design: all topology (edges, neighbor lists, subdivision pattern,
edge-adjacent face pairs) is precomputed ONCE in numpy as static arrays; the
per-step differentiable operators are pure gather/segment-sum JAX functions
with static shapes, so XLA fuses them into the surrounding graph.

The edge ordering and the 4-way subdivision vertex/face ordering reproduce
pytorch3d's `Meshes.edges_packed` / `SubdivideMeshes` conventions (studied at
the reference's call sites, optimize_sequence.py:67-89, utils/visualize.py:50-56)
so that HARP's subdivided template assets (e.g. template/arm/arm_template.obj,
whose face order came from a pytorch3d subdivision) line up exactly with our
subdivided meshes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from harp_tpu.ops.numerics import safe_norm, safe_normalize


@dataclasses.dataclass(frozen=True)
class MeshTopology:
    """Static (non-traced) topology of a single triangle mesh.

    Attributes:
      num_verts: V
      faces: (F, 3) int32
      edges: (E, 2) int32, each row (min, max), sorted lexicographically —
        identical ordering to pytorch3d edges_packed.
      faces_to_edges: (F, 3) int32 — per face the edge ids of
        [edge(v1,v2), edge(v2,v0), edge(v0,v1)] (edge i opposite vertex i).
      neighbors: (V, D) int32 padded vertex-adjacency (pad = own index).
      neighbor_mask: (V, D) bool.
      edge_face_pairs: (P, 2) int32 — pairs of faces sharing an interior edge.
    """

    num_verts: int
    faces: np.ndarray
    edges: np.ndarray
    faces_to_edges: np.ndarray
    neighbors: np.ndarray
    neighbor_mask: np.ndarray
    edge_face_pairs: np.ndarray


def build_topology(faces: np.ndarray, num_verts: int) -> MeshTopology:
    faces = np.asarray(faces, dtype=np.int64)
    v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
    # Order matters: [e12, e20, e01] so that faces_to_edges column i is the
    # edge opposite vertex i (pytorch3d convention).
    raw = np.concatenate(
        [np.stack([v1, v2], 1), np.stack([v2, v0], 1), np.stack([v0, v1], 1)], 0
    )
    raw.sort(axis=1)
    ehash = raw[:, 0] * num_verts + raw[:, 1]
    uniq, inverse = np.unique(ehash, return_inverse=True)
    edges = np.stack([uniq // num_verts, uniq % num_verts], 1)
    faces_to_edges = inverse.reshape(3, -1).T

    # Padded vertex adjacency from edges.
    deg = np.zeros(num_verts, dtype=np.int64)
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    max_deg = max(int(deg.max()), 1)
    neighbors = np.tile(np.arange(num_verts)[:, None], (1, max_deg))
    mask = np.zeros((num_verts, max_deg), dtype=bool)
    cursor = np.zeros(num_verts, dtype=np.int64)
    for a, b in edges:
        neighbors[a, cursor[a]] = b
        mask[a, cursor[a]] = True
        cursor[a] += 1
        neighbors[b, cursor[b]] = a
        mask[b, cursor[b]] = True
        cursor[b] += 1

    # Faces adjacent to each edge -> interior-edge face pairs.
    edge_faces: dict[int, list[int]] = {}
    for fi in range(faces.shape[0]):
        for ei in faces_to_edges[fi]:
            edge_faces.setdefault(int(ei), []).append(fi)
    pairs = []
    for ei, fl in edge_faces.items():
        for i in range(len(fl)):
            for j in range(i + 1, len(fl)):
                pairs.append((fl[i], fl[j]))
    edge_face_pairs = (
        np.asarray(pairs, dtype=np.int64) if pairs else np.zeros((0, 2), np.int64)
    )

    return MeshTopology(
        num_verts=num_verts,
        faces=faces.astype(np.int32),
        edges=edges.astype(np.int32),
        faces_to_edges=faces_to_edges.astype(np.int32),
        neighbors=neighbors.astype(np.int32),
        neighbor_mask=mask,
        edge_face_pairs=edge_face_pairs.astype(np.int32),
    )


@dataclasses.dataclass(frozen=True)
class Subdivision:
    """One 4-way (midpoint) subdivision step, pytorch3d-ordered.

    New vertices are the edge midpoints, appended after the original verts in
    edge order. New faces are the concatenation of four F-sized blocks:
      block0: (v0, e01, e20)   block1: (v1, e12, e01)
      block2: (v2, e20, e12)   block3: (e12, e20, e01)
    where eXY is the index of the midpoint of edge (vX, vY), offset by V.
    """

    coarse: MeshTopology
    edge_src: np.ndarray  # (E, 2) endpoint indices for each new vertex
    faces: np.ndarray  # (4F, 3) subdivided faces
    num_verts: int  # V + E


def build_subdivision(topology: MeshTopology) -> Subdivision:
    V = topology.num_verts
    faces = topology.faces.astype(np.int64)
    fe = topology.faces_to_edges.astype(np.int64) + V
    f0 = np.stack([faces[:, 0], fe[:, 2], fe[:, 1]], 1)
    f1 = np.stack([faces[:, 1], fe[:, 0], fe[:, 2]], 1)
    f2 = np.stack([faces[:, 2], fe[:, 1], fe[:, 0]], 1)
    f3 = fe
    new_faces = np.concatenate([f0, f1, f2, f3], 0).astype(np.int32)
    return Subdivision(
        coarse=topology,
        edge_src=topology.edges.copy(),
        faces=new_faces,
        num_verts=V + topology.edges.shape[0],
    )


def apply_subdivision(sub: Subdivision, verts: jnp.ndarray) -> jnp.ndarray:
    """(..., V, 3) -> (..., V+E, 3): append edge midpoints."""
    e = jnp.asarray(sub.edge_src)
    mids = 0.5 * (
        jnp.take(verts, e[:, 0], axis=-2) + jnp.take(verts, e[:, 1], axis=-2)
    )
    return jnp.concatenate([verts, mids], axis=-2)


def face_normals(verts: jnp.ndarray, faces) -> jnp.ndarray:
    """Unnormalized (area-weighted) face normals, (..., F, 3)."""
    faces = jnp.asarray(faces)
    p0 = jnp.take(verts, faces[:, 0], axis=-2)
    p1 = jnp.take(verts, faces[:, 1], axis=-2)
    p2 = jnp.take(verts, faces[:, 2], axis=-2)
    return jnp.cross(p1 - p0, p2 - p0)


def vertex_normals(verts: jnp.ndarray, faces, num_verts: int | None = None) -> jnp.ndarray:
    """Area-weighted vertex normals, matching pytorch3d verts_normals.

    Each face's unnormalized normal is accumulated at its three vertices,
    then normalized. Batched over leading axes.
    """
    faces = jnp.asarray(faces)
    if num_verts is None:
        num_verts = verts.shape[-2]
    fn = face_normals(verts, faces)

    def accumulate(v, n):
        out = jnp.zeros((num_verts, 3), dtype=v.dtype)
        for k in range(3):
            out = out.at[faces[:, k]].add(n)
        return out

    batch = verts.shape[:-2]
    flat_v = verts.reshape((-1,) + verts.shape[-2:])
    flat_n = fn.reshape((-1,) + fn.shape[-2:])
    acc = jax.vmap(accumulate)(flat_v, flat_n)
    acc = acc.reshape(batch + (num_verts, 3))
    return safe_normalize(acc)


def laplacian_smoothing_loss(verts: jnp.ndarray, topology: MeshTopology) -> jnp.ndarray:
    """Uniform-weight Laplacian magnitude, mean over verts (and batch).

    Matches pytorch3d mesh_laplacian_smoothing(method='uniform') used at
    reference optimize_sequence.py:536: || mean(neighbors) - v ||_2 averaged.
    """
    nbr = jnp.asarray(topology.neighbors)
    mask = jnp.asarray(topology.neighbor_mask, dtype=verts.dtype)
    gathered = jnp.take(verts, nbr, axis=-2)  # (..., V, D, 3)
    deg = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
    mean_nbr = (gathered * mask[..., None]).sum(-2) / deg
    lap = mean_nbr - verts
    return safe_norm(lap, axis=-1).mean()


def normal_consistency_loss(verts: jnp.ndarray, topology: MeshTopology) -> jnp.ndarray:
    """1 - cos(angle) between normals of faces sharing an edge, averaged.

    Matches pytorch3d mesh_normal_consistency on consistently-wound meshes
    (reference optimize_sequence.py:537).
    """
    pairs = jnp.asarray(topology.edge_face_pairs)
    fn = face_normals(verts, topology.faces)
    n0 = jnp.take(fn, pairs[:, 0], axis=-2)
    n1 = jnp.take(fn, pairs[:, 1], axis=-2)
    cos = (n0 * n1).sum(-1) / (safe_norm(n0, axis=-1) * safe_norm(n1, axis=-1))
    return (1.0 - cos).mean()


def edge_lengths(verts: jnp.ndarray, topology: MeshTopology) -> jnp.ndarray:
    """(..., E) edge lengths."""
    e = jnp.asarray(topology.edges)
    d = jnp.take(verts, e[:, 0], axis=-2) - jnp.take(verts, e[:, 1], axis=-2)
    return safe_norm(d, axis=-1)


def taubin_smoothing(verts: jnp.ndarray, topology: MeshTopology,
                     lam: float = 0.53, mu: float = -0.53,
                     num_iter: int = 10) -> jnp.ndarray:
    """Taubin lambda/mu mesh smoothing (pytorch3d taubin_smoothing defaults;
    used by the reference's mesh export, optimize_sequence.py:780).

    Alternating positive/negative uniform-Laplacian steps smooth without
    shrinkage. verts: (..., V, 3).
    """
    nbr = jnp.asarray(topology.neighbors)
    mask = jnp.asarray(topology.neighbor_mask, dtype=verts.dtype)
    deg = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)

    def lap(v):
        gathered = jnp.take(v, nbr, axis=-2)
        mean_nbr = (gathered * mask[..., None]).sum(-2) / deg
        return mean_nbr - v

    def step(v, _):
        v = v + lam * lap(v)
        v = v + mu * lap(v)
        return v, None

    out, _ = jax.lax.scan(step, verts, None, length=num_iter)
    return out
