"""Equivalent nodal loads from surface pressure, vectorized.

Parity with reference `compute_equivalent_nodal_loads` (fem.py:106-147): per
loaded face the force is p * A * (-n_hat) (pressure pushes against the outward
normal, i.e. down onto the upper skin), split 1/3 to each vertex. Since
A * n_hat = 0.5 * (e1 x e2) for an outward-wound triangle, the per-vertex load is
simply -p/6 * cross(e1, e2) — one fused cross product + segment_sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pressure_loads(nodes, faces, pressure, num_nodes, face_mask=None):
    """Nodal load vector (N,3) from uniform pressure on outward-oriented faces.

    Args:
      nodes: (N,3); faces: (F,3) int32 outward-wound loaded faces (padded rows
      allowed with face_mask=0); pressure: scalar [Pa].
    """
    v = nodes[faces]  # (F,3,3)
    area_vec = 0.5 * jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])  # A * n_hat
    f_vert = (-pressure / 3.0) * area_vec  # per-vertex share
    if face_mask is not None:
        f_vert = f_vert * face_mask[:, None]
    f3 = jnp.broadcast_to(f_vert[:, None, :], (faces.shape[0], 3, 3))
    return jax.ops.segment_sum(
        f3.reshape(-1, 3), faces.reshape(-1), num_segments=num_nodes
    )
