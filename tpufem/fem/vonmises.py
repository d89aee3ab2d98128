"""Stress recovery: element stress, volume-weighted nodal averaging, von Mises.

Parity with reference `_stress_to_von_mises` (fem.py:332-356):
vm = sqrt(0.5*((sxx-syy)^2+(syy-szz)^2+(szz-sxx)^2) + 3*(sxy^2+syz^2+szx^2)).
CalculiX reports nodal stresses by averaging element values at shared nodes; for
constant-strain tet4 tpufem uses the volume-weighted average of adjacent element
stress tensors (averaging tensors, then taking vm — less biased than averaging
scalar vm values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def element_stress(grads, vols, tets, u_nodes, lam, mu):
    """Constant per-element Cauchy stress (T,3,3) from nodal displacement (N,3)."""
    ue = u_nodes[tets]
    # broadcast-sum form (see tpufem.fem.assembly: 5x faster than einsum on TPU)
    H = (grads[:, :, :, None] * ue[:, :, None, :]).sum(axis=1)
    eps = 0.5 * (H + jnp.swapaxes(H, 1, 2))
    tr = eps[:, 0, 0] + eps[:, 1, 1] + eps[:, 2, 2]
    sigma = 2.0 * mu * eps
    sigma = sigma.at[:, 0, 0].add(lam * tr)
    sigma = sigma.at[:, 1, 1].add(lam * tr)
    sigma = sigma.at[:, 2, 2].add(lam * tr)
    return sigma


def nodal_stress(sigma_e, vols, tets, num_nodes):
    """Volume-weighted average of adjacent element stresses -> (N,6) Voigt
    (sxx, syy, szz, sxy, syz, szx) — the FRD component order the reference
    parses (fem.py:272-329)."""
    w = vols  # (T,)
    voigt = jnp.stack(
        [
            sigma_e[:, 0, 0],
            sigma_e[:, 1, 1],
            sigma_e[:, 2, 2],
            sigma_e[:, 0, 1],
            sigma_e[:, 1, 2],
            sigma_e[:, 2, 0],
        ],
        axis=1,
    )  # (T,6)
    contrib = (w[:, None] * voigt)[:, None, :] * jnp.ones((1, 4, 1), voigt.dtype)
    num = jax.ops.segment_sum(
        contrib.reshape(-1, 6), tets.reshape(-1), num_segments=num_nodes
    )
    den = jax.ops.segment_sum(
        jnp.broadcast_to(w[:, None], (w.shape[0], 4)).reshape(-1),
        tets.reshape(-1),
        num_segments=num_nodes,
    )
    return num / jnp.maximum(den, 1e-300)[:, None]


def von_mises(stress6):
    """von Mises from (..., 6) Voigt stress (reference fem.py:332-356)."""
    sxx, syy, szz = stress6[..., 0], stress6[..., 1], stress6[..., 2]
    sxy, syz, szx = stress6[..., 3], stress6[..., 4], stress6[..., 5]
    return jnp.sqrt(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3.0 * (sxy**2 + syz**2 + szx**2)
    )
