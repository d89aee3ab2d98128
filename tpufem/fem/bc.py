"""Dirichlet boundary conditions as dof masks.

Reference deck: `*BOUNDARY Nroot,1,3,0` clamps all 3 dofs of every root node
(fem.py:150-215). tpufem expresses this as a flat (N*3,) mask with 0 on
constrained dofs; combined with the masked operator in assembly.py this is exact
row/column elimination for homogeneous BCs and is vmap-safe (fixed shapes).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dirichlet_mask(num_nodes: int, clamped_nodes, node_mask=None, dtype=jnp.float32):
    """(N*3,) mask: 1.0 on free dofs, 0.0 on clamped-node dofs and padded nodes."""
    m = np.ones((num_nodes, 3), dtype=np.float32)
    m[np.asarray(clamped_nodes)] = 0.0
    m = jnp.asarray(m, dtype=dtype)
    if node_mask is not None:
        m = m * node_mask[:, None]
    return m.reshape(-1)
