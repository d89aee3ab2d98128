"""Geometric multigrid: transfer transposition, V-cycle SPD/symmetry,
MG-PCG correctness vs the two-level solver, and iteration superiority."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufem.fem.batched_t import WingBatchT
from tpufem.fem.material import Material, lame_params
from tpufem.fem.multigrid import WingMGT, build_hierarchy
from tpufem.mesher import WingMeshResolution

RES = WingMeshResolution(16, 16, 4, te_floor_frac=0.006, spacing="le")
P4 = np.array([[1.2, 0.35, 10.0, 0.10], [1.8, 0.25, 25.0, 0.07]])


def test_transfer_exact_transpose():
    hier = build_hierarchy(RES)
    assert len(hier.levels) >= 2
    tr = hier.transfers[0]
    Nf = hier.levels[0].topo.num_nodes
    Nc = hier.levels[1].topo.num_nodes
    rng = np.random.default_rng(0)
    xc = rng.normal(size=(Nc, 3))
    yf = rng.normal(size=(Nf, 3))
    Pxc = (xc[tr.parents] * tr.pweights[:, :, None]).sum(axis=1)
    Ptyf = (yf[tr.children] * tr.cweights[:, :, None]).sum(axis=1)
    assert np.allclose((yf * Pxc).sum(), (xc * Ptyf).sum(), rtol=1e-12)


def test_prolongation_reproduces_linear_fields():
    """P applied to a linear function of the coarse node coords must match the
    fine nodal values wherever the geometry map is linear (the span/thickness
    directions; chord uses s-weighted interpolation of a curved surface, so
    only near-exactness is required there)."""
    hier = build_hierarchy(RES)
    tr = hier.transfers[0]
    from tpufem.mesher import _nodes_np

    fine, coarse = hier.levels[0], hier.levels[1]
    args = dict(span_m=1.2, chord_m=0.35, sweep_deg=10.0, thickness_ratio=0.10,
                te_floor=RES.te_floor_frac)
    xf = _nodes_np(fine.topo.node_basis, **args)
    xc = _nodes_np(coarse.topo.node_basis, **args)
    u_c = xc @ np.array([0.3, -1.1, 2.0])  # linear scalar field
    u_f = xf @ np.array([0.3, -1.1, 2.0])
    interp = (u_c[tr.parents] * tr.pweights).sum(axis=1)
    scale = np.abs(u_f).max()
    # exact on the span axis; small curvature error on chord/thickness
    assert np.abs(interp - u_f).max() / scale < 0.02
    # exact for the y (pure span) field
    uy_c, uy_f = xc[:, 1], xf[:, 1]
    interp_y = (uy_c[tr.parents] * tr.pweights).sum(axis=1)
    assert np.abs(interp_y - uy_f).max() / np.abs(uy_f).max() < 1e-6  # f32 weights


@pytest.mark.slow
def test_vcycle_symmetric_positive():
    bt = WingBatchT(RES, dtype=jnp.float64, mg_levels=None)
    lam, mu = lame_params(Material())
    lam = jnp.float64(lam)
    mu = jnp.float64(mu)
    p4 = jnp.asarray(P4, jnp.float64)
    _, _, _, _, state = bt._jit_setup_mg(p4, jnp.float64(5e3), lam, mu)
    state = bt.mg.finalize(state, P4, float(lam), float(mu))
    rng = np.random.default_rng(1)
    N = bt.num_nodes
    u = jnp.asarray(rng.normal(size=(N, 3, 2)))
    v = jnp.asarray(rng.normal(size=(N, 3, 2)))
    Vu = bt.mg.apply(state, u)
    Vv = bt.mg.apply(state, v)
    lhs = np.asarray((v * Vu).sum(axis=(0, 1)))
    rhs = np.asarray((u * Vv).sum(axis=(0, 1)))
    assert np.allclose(lhs, rhs, rtol=1e-10)  # <v, Vu> == <u, Vv>
    uu = np.asarray((u * Vu).sum(axis=(0, 1)))
    assert (uu > 0).all()  # positive definite


def test_mg_pcg_matches_two_level_and_is_faster():
    lam, mu = lame_params(Material())
    ref = WingBatchT(RES, dtype=jnp.float64)
    out_ref = ref.solve(P4, tol=1e-10, maxiter=5000, chunk_iters=5000)
    assert bool(np.all(np.asarray(out_ref.converged)))

    mg = WingBatchT(RES, dtype=jnp.float64, mg_levels=None)
    out_mg = mg.solve(P4, tol=1e-10, maxiter=1000, chunk_iters=1000)
    assert bool(np.all(np.asarray(out_mg.converged)))

    err = np.abs(np.asarray(out_mg.u) - np.asarray(out_ref.u)).max()
    scale = np.abs(np.asarray(out_ref.u)).max()
    assert err / scale < 1e-8
    assert out_mg.iters < out_ref.iters  # multigrid must beat the two-level
