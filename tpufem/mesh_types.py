"""Mesh containers: host-side numpy Mesh and jit-ready padded batches.

The reference passes meshes between stages as .msh files parsed into Python dicts
(src/deep_fem_uav_wing/meshing.py:112-176). tpufem's contract is array-first:
a host-side `Mesh` of numpy arrays, and fixed-shape padded device batches so
assembly/solve can be `jit`-ed and `vmap`-ed (SURVEY.md §7: padded nodes/tets must
contribute exactly zero to K, loads, loss and metrics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class Mesh:
    """A single tetrahedral mesh with oriented boundary surface.

    nodes      : (N, 3) float64 node coordinates
    tets       : (T, 4) int32 corner-node connectivity, positive orientation
    surf_faces : (F, 3) int32 boundary triangles, outward-oriented
    tet10      : optional (T, 10) int32 quadratic connectivity (corner 4 + edge 6)
    meta       : provenance (params, resolution, source)
    """

    nodes: np.ndarray
    tets: np.ndarray
    surf_faces: np.ndarray
    tet10: np.ndarray | None = None
    meta: dict[str, Any] = field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return len(self.nodes)

    @property
    def num_tets(self) -> int:
        return len(self.tets)

    @property
    def num_surf_faces(self) -> int:
        return len(self.surf_faces)

    def tet_volumes(self) -> np.ndarray:
        v = self.nodes[self.tets]
        return np.einsum(
            "ti,ti->t", v[:, 1] - v[:, 0], np.cross(v[:, 2] - v[:, 0], v[:, 3] - v[:, 0])
        ) / 6.0

    def validate(self) -> None:
        assert self.tets.min() >= 0 and self.tets.max() < self.num_nodes
        vols = self.tet_volumes()
        assert (vols > 0).all(), f"{(vols <= 0).sum()} non-positive tets"


def pad_to(arr: np.ndarray, n: int, fill: float | int = 0) -> np.ndarray:
    """Pad axis 0 of `arr` to length `n` with `fill`."""
    if len(arr) > n:
        raise ValueError(f"cannot pad length {len(arr)} down to {n}")
    pad = [(0, n - len(arr))] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


@dataclass
class PaddedMesh:
    """Fixed-shape mesh arrays for jit/vmap. Padding rules:

    - padded tets point at node 0 with `tet_mask == 0` so their stiffness and
      volume contributions are multiplied away;
    - padded faces likewise with `face_mask == 0`;
    - `node_mask` marks real nodes (padded nodes get unit diagonal in the
      operator, zero loads, and are excluded from metrics).
    """

    nodes: np.ndarray  # (Np, 3) float
    tets: np.ndarray  # (Tp, 4) int32
    surf_faces: np.ndarray  # (Fp, 3) int32
    node_mask: np.ndarray  # (Np,) float
    tet_mask: np.ndarray  # (Tp,) float
    face_mask: np.ndarray  # (Fp,) float
    num_nodes: int
    num_tets: int
    num_faces: int

    @classmethod
    def from_mesh(cls, mesh: Mesh, n_nodes: int, n_tets: int, n_faces: int, dtype=np.float32) -> "PaddedMesh":
        N, T, F = mesh.num_nodes, mesh.num_tets, mesh.num_surf_faces
        node_mask = pad_to(np.ones(N, dtype=dtype), n_nodes)
        tet_mask = pad_to(np.ones(T, dtype=dtype), n_tets)
        face_mask = pad_to(np.ones(F, dtype=dtype), n_faces)
        return cls(
            nodes=pad_to(mesh.nodes.astype(dtype), n_nodes),
            tets=pad_to(mesh.tets.astype(np.int32), n_tets),
            surf_faces=pad_to(mesh.surf_faces.astype(np.int32), n_faces),
            node_mask=node_mask,
            tet_mask=tet_mask,
            face_mask=face_mask,
            num_nodes=N,
            num_tets=T,
            num_faces=F,
        )
