"""Structured tetrahedral wing mesher — replaces the Gmsh subprocess.

The reference shells out to Gmsh with a generated .geo (src/deep_fem_uav_wing/
meshing.py:41-109) and parses MSH2 text back (meshing.py:112-176). tpufem meshes
the parametric wing directly: a structured (chord x span x thickness) hex grid fit
to the NACA-00xx section, Kuhn 6-tet subdivision (face-consistent across cells),
leading/trailing-edge columns welded into wedges, degenerate tets dropped.

The decisive TPU-first property: for a fixed `WingMeshResolution` the topology
(tets, boundary faces, boundary sets) is IDENTICAL for every wing in the PRD
parameter box — only node coordinates change, via the jnp-traceable
`nodes_from_params`. Batched dataset generation (reference
scripts/generate_fem_dataset.py's sequential ccx loop) therefore becomes a single
`vmap` over parameter vectors with zero per-case padding logic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from tpufem.geometry import cosine_stations, naca00xx_half_thickness
from tpufem.mesh_types import Mesh

# Kuhn subdivision of the unit hex along the v0-v6 diagonal; consistent across a
# structured grid (shared-face diagonals match between neighbor cells).
_KUHN_TETS = np.array(
    [
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
        [0, 5, 1, 6],
    ],
    dtype=np.int64,
)

# Hex corner offsets in (i: chord, j: span, k: thickness) index space.
_HEX_CORNERS = np.array(
    [
        (0, 0, 0),  # v0
        (1, 0, 0),  # v1
        (1, 1, 0),  # v2
        (0, 1, 0),  # v3
        (0, 0, 1),  # v4
        (1, 0, 1),  # v5
        (1, 1, 1),  # v6
        (0, 1, 1),  # v7
    ],
    dtype=np.int64,
)


@dataclass(frozen=True)
class WingMeshResolution:
    """Structured grid resolution: n_chord x n_span x n_thick cells.

    te_floor_frac > 0 applies a trailing-edge half-thickness floor of
    te_floor_frac * chord * s (linear ramp, zero at the LE): the standard
    finite-TE idealization. A sharp NACA TE forces element aspect ratios into
    the hundreds near the TE wedge, which drives the stiffness condition
    number to ~1e9+ — CG stops converging in ANY precision (measured). A 0.6%
    floor caps AR around ~20 and restores normal iterative behavior; it adds
    ~0.25% to the section volume. spacing='le' clusters chord stations at the
    leading edge only (TE clustering is pointless once the TE is blunt).
    """

    n_chord: int = 32
    n_span: int = 24
    n_thick: int = 4
    te_floor_frac: float = 0.0
    spacing: str = "cosine"  # 'cosine' (both ends) | 'le' (leading edge only)

    @property
    def key(self) -> tuple:
        return (self.n_chord, self.n_span, self.n_thick, self.te_floor_frac, self.spacing)


# ~matching the reference default gmsh clscale=0.1 mesh scale (tens of thousands
# of nodes); COARSE is for tests, DOF100K targets the BASELINE 100k-DOF config.
COARSE = WingMeshResolution(12, 8, 2)
MEDIUM = WingMeshResolution(32, 24, 4)
FINE = WingMeshResolution(48, 48, 6)
DOF100K = WingMeshResolution(64, 80, 6, te_floor_frac=0.006, spacing="le")
# ~1M-DOF when promoted to tet10 (tpufem.fem.tet10)
DOF1M_TET10 = WingMeshResolution(96, 128, 8, te_floor_frac=0.006, spacing="le")


@dataclass(frozen=True)
class WingTopology:
    """Welded connectivity + per-node parametric basis for a fixed resolution.

    node_basis columns: (s, yfrac, zfrac, zbase) where
      x = chord*s + span*yfrac*tan(sweep)
      y = span*yfrac
      z = chord * zfrac * max(thickness_ratio*zbase, te_floor*s)
    (zbase = half-thickness at t=1; te_floor = TE thickness floor fraction)

    station_id/slot index the through-thickness "lines": station = (i, j) chord/
    span grid column, slot = position along thickness. Node numbering is
    station-major (all of a station's nodes contiguous), which the thickness-
    line block-Jacobi preconditioner (tpufem.fem.precond) exploits.
    """

    tets: np.ndarray  # (T,4) int32, positively oriented for any PRD params
    surf_faces: np.ndarray  # (F,3) int32 outward-oriented
    node_basis: np.ndarray  # (N,4) float64
    num_nodes: int
    station_id: np.ndarray  # (N,) int32: i*(n_span+1)+j
    slot: np.ndarray  # (N,) int32: thickness index within the station
    num_stations: int
    slots_per_station: int  # n_thick + 1
    te_floor: float = 0.0


@lru_cache(maxsize=8)
def wing_topology(res: WingMeshResolution) -> WingTopology:
    nc, ns, nt = res.n_chord, res.n_span, res.n_thick
    from tpufem.geometry import le_stations

    s = (le_stations if res.spacing == "le" else cosine_stations)(nc)  # LE..TE
    zbase = naca00xx_half_thickness(s, 1.0)  # half-thickness per unit t-ratio

    # Full grid ids g(i,j,k); weld all k to k=0 where the section degenerates
    # to an edge: always at the LE (i=0); at the TE (i=nc) only when sharp
    # (te_floor_frac == 0 — a floored TE keeps finite thickness).
    NI, NJ, NK = nc + 1, ns + 1, nt + 1

    def gid(i, j, k):
        return (i * NJ + j) * NK + k

    I, J, K = np.meshgrid(np.arange(NI), np.arange(NJ), np.arange(NK), indexing="ij")
    weld = (I == 0) | ((I == nc) & (res.te_floor_frac == 0.0))
    rep = gid(I, J, np.where(weld, 0, K)).ravel()

    uniq, new_of_old = np.unique(rep, return_inverse=True)
    num_nodes = len(uniq)

    # Parametric basis of each welded node from its representative grid index.
    ri = uniq // (NJ * NK)
    rj = (uniq // NK) % NJ
    rk = uniq % NK
    zfrac = 2.0 * rk / nt - 1.0
    node_basis = np.stack(
        [s[ri], rj / ns, zfrac, zbase[ri]], axis=1
    )  # (N,4)

    # Hex cells -> Kuhn tets in welded ids.
    ci, cj, ck = np.meshgrid(np.arange(nc), np.arange(ns), np.arange(nt), indexing="ij")
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    corners = np.empty((len(ci), 8), dtype=np.int64)
    for c, (di, dj, dk) in enumerate(_HEX_CORNERS):
        corners[:, c] = new_of_old[gid(ci + di, cj + dj, ck + dk)]
    tets = corners[:, _KUHN_TETS].reshape(-1, 4)  # (cells*6, 4)

    # Drop degenerate tets (welded duplicate vertices at LE/TE wedges).
    t_sorted = np.sort(tets, axis=1)
    nondeg = np.all(np.diff(t_sorted, axis=1) != 0, axis=1)
    tets = tets[nondeg]

    # Fix orientation using a reference geometry (orientation is invariant over
    # the PRD box: the coordinate map is a positive-Jacobian deformation).
    nodes = _nodes_np(
        node_basis, span_m=1.0, chord_m=0.35, sweep_deg=10.0, thickness_ratio=0.10,
        te_floor=res.te_floor_frac,
    )
    v = nodes[tets]
    vol6 = np.einsum("ti,ti->t", v[:, 1] - v[:, 0], np.cross(v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]))
    flip = vol6 < 0
    tets[flip] = tets[flip][:, [0, 1, 3, 2]]

    surf = boundary_faces(tets)
    return WingTopology(
        tets=tets.astype(np.int32),
        surf_faces=surf.astype(np.int32),
        node_basis=node_basis,
        num_nodes=num_nodes,
        station_id=(ri * NJ + rj).astype(np.int32),
        slot=rk.astype(np.int32),
        num_stations=NI * NJ,
        slots_per_station=NK,
        te_floor=res.te_floor_frac,
    )


def boundary_faces(tets: np.ndarray) -> np.ndarray:
    """Outward-oriented boundary triangles of a positively-oriented tet mesh.

    For a positive tet (a,b,c,d) the four outward faces are
    (a,c,b), (a,b,d), (b,c,d), (a,d,c); boundary = faces whose vertex set occurs
    exactly once. Replaces the reference's python DFS orientation pass
    (meshing.py:222-306) with a sort-based O(T log T) extraction.
    """
    a, b, c, d = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
    faces = np.concatenate(
        [
            np.stack([a, c, b], axis=1),
            np.stack([a, b, d], axis=1),
            np.stack([b, c, d], axis=1),
            np.stack([a, d, c], axis=1),
        ],
        axis=0,
    )
    key = np.sort(faces, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    return faces[counts[inv] == 1]


def _nodes_np(
    basis: np.ndarray,
    span_m: float,
    chord_m: float,
    sweep_deg: float,
    thickness_ratio: float,
    te_floor: float = 0.0,
) -> np.ndarray:
    s, yfrac, zfrac, zbase = basis[:, 0], basis[:, 1], basis[:, 2], basis[:, 3]
    y = span_m * yfrac
    x = chord_m * s + np.tan(np.deg2rad(sweep_deg)) * y
    half = np.maximum(thickness_ratio * zbase, te_floor * s)
    z = chord_m * half * zfrac
    return np.stack([x, y, z], axis=1)


def nodes_from_params(basis, span_m, chord_m, sweep_deg, thickness_ratio, te_floor=0.0):
    """jnp-traceable node coordinates from wing parameters.

    Works with numpy or jax.numpy inputs; `vmap` over the four scalars yields
    batched node arrays with shared topology — the core of the one-jit-call
    dataset generation path (BASELINE.json config 4).
    """
    import jax.numpy as jnp

    dt = jnp.asarray(basis).dtype
    span_m = jnp.asarray(span_m, dtype=dt)
    chord_m = jnp.asarray(chord_m, dtype=dt)
    sweep_deg = jnp.asarray(sweep_deg, dtype=dt)
    thickness_ratio = jnp.asarray(thickness_ratio, dtype=dt)
    s, yfrac, zfrac, zbase = basis[:, 0], basis[:, 1], basis[:, 2], basis[:, 3]
    y = span_m * yfrac
    x = chord_m * s + jnp.tan(jnp.deg2rad(sweep_deg)) * y
    half = jnp.maximum(thickness_ratio * zbase, jnp.asarray(te_floor, dt) * s)
    z = chord_m * half * zfrac
    return jnp.stack([x, y, z], axis=1)


def structured_wing_mesh(
    span_m: float,
    chord_m: float,
    sweep_deg: float,
    thickness_ratio: float,
    res: WingMeshResolution = MEDIUM,
) -> Mesh:
    """Mesh one wing instance (host-side numpy Mesh)."""
    topo = wing_topology(res)
    nodes = _nodes_np(
        topo.node_basis, span_m, chord_m, sweep_deg, thickness_ratio, topo.te_floor
    )
    mesh = Mesh(
        nodes=nodes,
        tets=topo.tets.copy(),
        surf_faces=topo.surf_faces.copy(),
        meta={
            "params": {
                "span_m": span_m,
                "chord_m": chord_m,
                "sweep_deg": sweep_deg,
                "thickness_ratio": thickness_ratio,
            },
            "resolution": res.key,
            "source": "tpufem-structured",
            # thickness-line structure for the block-Jacobi preconditioner
            "station_id": topo.station_id,
            "slot": topo.slot,
            "num_stations": topo.num_stations,
            "slots_per_station": topo.slots_per_station,
            "num_span_stations": res.n_span + 1,  # NJ in station = i*NJ+j
        },
    )
    return mesh


def compute_tet_quality(mesh: Mesh) -> dict:
    """Aspect-ratio quality metric, vectorized.

    Same definition as reference meshing.py:516-593: AR = max_edge /
    (2*sqrt(6)*inradius), inradius = 3V/A_total, degenerate -> 1e6;
    quality_ok_ratio = share of tets with AR < 3.
    """
    v = mesh.nodes[mesh.tets]  # (T,4,3)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    edges = np.stack([np.linalg.norm(v[:, i] - v[:, j], axis=1) for i, j in pairs], axis=1)
    max_edge = edges.max(axis=1)
    vol = np.abs(mesh.tet_volumes())
    tri_ids = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    area = sum(
        0.5 * np.linalg.norm(np.cross(v[:, b] - v[:, a], v[:, c] - v[:, a]), axis=1)
        for a, b, c in tri_ids
    )
    inradius = 3.0 * vol / np.maximum(area, 1e-300)
    ar = np.where(inradius > 1e-300, max_edge / (2.0 * np.sqrt(6.0) * inradius), 1e6)
    return {
        "aspect_ratio_mean": float(ar.mean()),
        "aspect_ratio_p95": float(np.percentile(ar, 95)),
        "aspect_ratio_max": float(ar.max()),
        "quality_ok_ratio": float((ar < 3.0).mean()),
    }
