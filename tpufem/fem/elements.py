"""Tet4 element setup: shape-function gradients and volumes, fully vectorized.

Replaces the element machinery inside CalculiX (C3D4 constant-strain tets; deck
schema reference docs/spec.md:208-229). For tet (x0..x3) with edge matrix
J = [x1-x0; x2-x0; x3-x0] (rows), V = det(J)/6 and the shape gradients are
grad N_a = columns of inv(J) for a=1..3, grad N_0 = -sum.

tpufem's stiffness action never materializes B or Ke: with gradients g[a] the
element operator is

    H     = sum_a g_a (x) u_a          (displacement gradient, 3x3)
    eps   = sym(H)
    sigma = lam*tr(eps)*I + 2*mu*eps
    f_a   = V * sigma @ g_a

which is algebraically identical to f = Ke u (K_{ai,bj} = V[lam g_ai g_bj +
mu g_aj g_bi + mu delta_ij g_a.g_b]) but reads ~5x fewer bytes per CG iteration
(gradients (T,4,3) instead of Ke (T,12,12)) — the SpMV is HBM-bandwidth-bound on
TPU, so this is the speed-of-light formulation.
"""

from __future__ import annotations

import jax.numpy as jnp


def tet4_setup(nodes, tets, tet_mask=None):
    """Per-element gradients and volumes.

    Args:
      nodes: (N,3) float
      tets: (T,4) int32 (positively oriented; padded tets may be degenerate)
      tet_mask: optional (T,) 1.0 for real tets, 0.0 for padding

    Returns:
      grads: (T,4,3) shape-function gradients (zeroed for masked/degenerate tets)
      vols:  (T,) element volumes (zeroed for masked tets)
    """
    x = nodes[tets]  # (T,4,3)
    e = x[:, 1:] - x[:, :1]  # (T,3,3) rows = edge vectors
    det = jnp.linalg.det(e)
    vols = det / 6.0

    # inv(J) columns give grads of N1..N3; guard degenerate tets.
    safe_det = jnp.where(jnp.abs(det) > 0, det, 1.0)
    # adjugate / det for a 3x3 (cheaper + well-defined under masking)
    c0 = jnp.cross(e[:, 1], e[:, 2])
    c1 = jnp.cross(e[:, 2], e[:, 0])
    c2 = jnp.cross(e[:, 0], e[:, 1])
    inv = jnp.stack([c0, c1, c2], axis=2) / safe_det[:, None, None]  # (T,3,3) = inv(J)
    g123 = jnp.swapaxes(inv, 1, 2)  # row a-1 = column a of inv(J)
    g0 = -g123.sum(axis=1, keepdims=True)
    grads = jnp.concatenate([g0, g123], axis=1)  # (T,4,3)

    valid = jnp.abs(det) > 0
    if tet_mask is not None:
        valid = valid & (tet_mask > 0)
    grads = jnp.where(valid[:, None, None], grads, 0.0)
    vols = jnp.where(valid, vols, 0.0)
    return grads, vols
