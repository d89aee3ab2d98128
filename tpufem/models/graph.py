"""Surface graph construction for the stress surrogate.

Parity with reference gnn/dataset.py:26-164 (`_faces_to_edge_index`,
`build_graph_data`):
  - nodes: surface nodes of the FEM case
  - edges: deduplicated undirected triangle edges, both directions
  - features x = [pos normalized to ~[0,1]^3 || unit outward normal (3) ||
    global params (4, PRD-range normalized)]  -> 10-D
  - target y = log1p(von Mises stress [Pa]); raw stress/disp/loss_mask kept.

Normalization constants are the PRD ranges (hardcoded in the reference at
dataset.py:122-127): pos_x by max chord+sweep extent, pos_y by max span,
pos_z by max half-thickness; params min-max scaled to [0,1].
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tpufem.pipeline.types import PRD_RANGES

# Position scale bounds from the PRD box (reference dataset.py:122-127 spirit:
# fixed global normalization so every case shares the same feature space).
_POS_SCALE = np.array(
    [
        PRD_RANGES["span_m"][1] * np.tan(np.deg2rad(PRD_RANGES["sweep_deg"][1]))
        + PRD_RANGES["chord_m"][1],  # max x extent: tip sweep offset + chord
        PRD_RANGES["span_m"][1],  # max y extent
        PRD_RANGES["chord_m"][1] * PRD_RANGES["thickness_ratio"][1],  # max z extent (full)
    ]
)


@dataclass
class GraphData:
    """One padded-or-exact surface graph."""

    x: np.ndarray  # (N, 10) float32 node features
    edge_index: np.ndarray  # (2, E) int32, both directions
    y: np.ndarray  # (N,) float32 log1p(stress_vm)
    stress_vm: np.ndarray  # (N,) float32 raw Pa
    disp: np.ndarray  # (N, 3) float32
    loss_mask: np.ndarray  # (N,) float32 1.0 where loss/metrics count
    node_mask: np.ndarray  # (N,) float32 1.0 for real nodes
    edge_mask: np.ndarray  # (E,) float32 1.0 for real edges
    num_nodes: int
    num_edges: int


def faces_to_edges(faces: np.ndarray, node_ids: np.ndarray) -> np.ndarray:
    """Undirected deduplicated edge list over surface-local indices, both
    directions (reference dataset.py:26-63). `faces` are in global mesh node
    ids; `node_ids` is the sorted surface node id list."""
    remap = {int(g): i for i, g in enumerate(node_ids)}
    f = np.vectorize(remap.__getitem__)(faces)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    e = np.unique(np.sort(e, axis=1), axis=0)  # undirected dedup
    both = np.concatenate([e, e[:, ::-1]], axis=0)
    return both.T.astype(np.int32)  # (2, E)


def build_graph(
    surface: dict[str, np.ndarray],
    faces: np.ndarray,
    params: dict[str, float],
) -> GraphData:
    """Build one case's graph from a surface_results payload + surface faces.

    Args:
      surface: dict with node_id/pos/normal/stress_vm/disp/loss_mask
               (tpufem.fem.driver.surface_results or a loaded npz)
      faces: (F,3) surface triangles in global node ids
      params: wing parameter dict
    """
    node_ids = surface["node_id"]
    pos = surface["pos"].astype(np.float64)
    normal = surface["normal"].astype(np.float64)

    pos_n = pos / _POS_SCALE[None, :]
    p_feat = np.array(
        [
            _minmax(params["span_m"], *PRD_RANGES["span_m"]),
            _minmax(params["chord_m"], *PRD_RANGES["chord_m"]),
            _minmax(params["sweep_deg"], *PRD_RANGES["sweep_deg"]),
            _minmax(params["thickness_ratio"], *PRD_RANGES["thickness_ratio"]),
        ]
    )
    n = len(node_ids)
    x = np.concatenate(
        [pos_n, normal, np.broadcast_to(p_feat, (n, 4))], axis=1
    ).astype(np.float32)

    stress = surface["stress_vm"].astype(np.float64)
    y = np.log1p(np.clip(stress, 0, None)).astype(np.float32)
    edge_index = faces_to_edges(faces, node_ids)

    return GraphData(
        x=x,
        edge_index=edge_index,
        y=y,
        stress_vm=stress.astype(np.float32),
        disp=surface["disp"].astype(np.float32),
        loss_mask=surface["loss_mask"].astype(np.float32),
        node_mask=np.ones(n, dtype=np.float32),
        edge_mask=np.ones(edge_index.shape[1], dtype=np.float32),
        num_nodes=n,
        num_edges=edge_index.shape[1],
    )


def pad_graph(g: GraphData, n_nodes: int, n_edges: int) -> GraphData:
    """Pad to fixed shapes for jit. Padded edges carry edge_mask 0 and the mean
    aggregation weights messages by edge_mask, so they contribute exactly
    nothing; padded nodes are masked out of loss and metrics (SURVEY.md §7 hard
    part 3: padding must contribute exactly zero)."""
    from tpufem.mesh_types import pad_to

    if g.num_nodes > n_nodes or g.num_edges > n_edges:
        raise ValueError("graph larger than padding target")
    e = np.zeros((2, n_edges), dtype=np.int32)
    e[:, : g.num_edges] = g.edge_index
    return GraphData(
        x=pad_to(g.x, n_nodes),
        edge_index=e,
        y=pad_to(g.y, n_nodes),
        stress_vm=pad_to(g.stress_vm, n_nodes),
        disp=pad_to(g.disp, n_nodes),
        loss_mask=pad_to(g.loss_mask, n_nodes),
        node_mask=pad_to(g.node_mask, n_nodes),
        edge_mask=pad_to(g.edge_mask, n_edges),
        num_nodes=g.num_nodes,
        num_edges=g.num_edges,
    )


def _minmax(v: float, lo: float, hi: float) -> float:
    return (v - lo) / (hi - lo)
