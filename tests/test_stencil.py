"""Stencil SpMV must match the incidence-gather welded operator exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpufem.fem.batched_t import WingBatchT
from tpufem.fem.material import Material, lame_params
from tpufem.fem.stencil import (
    assemble_stencil,
    from_grid,
    grid_meta,
    nodes_grid,
    root_mask,
    stencil_apply,
    to_grid,
)
from tpufem.mesher import WingMeshResolution

P4 = np.array([[1.2, 0.35, 10.0, 0.10], [2.0, 0.2, 30.0, 0.05]])


@pytest.mark.parametrize("te_floor", [0.006, 0.0])
@pytest.mark.slow
def test_stencil_apply_matches_gather_operator(te_floor):
    res = WingMeshResolution(8, 6, 3, te_floor_frac=te_floor, spacing="le")
    dt = jnp.float64
    bt = WingBatchT(res, dtype=dt)
    lam, mu = lame_params(Material())
    lam = jnp.float64(lam)
    mu = jnp.float64(mu)
    p4 = jnp.asarray(P4, dt)

    # reference: welded incidence-gather operator
    nodes = bt._nodes(p4)
    grads, vols = bt._grads_vols(nodes)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(bt.num_nodes, 3, 2)))
    y_ref = bt._apply_A(grads, vols, u, lam, mu)

    # stencil path
    X = nodes_grid(res, p4, dt)
    # full-grid coords at welded representatives must match the mesher's
    m = grid_meta(res)
    xg = np.asarray(X)[:, :, m["gi"], m["gk"], m["gj"]]  # (3,B,N)
    np.testing.assert_allclose(
        np.transpose(xg, (2, 0, 1)), np.asarray(nodes), rtol=0, atol=1e-12
    )
    C = assemble_stencil(res, X, lam, mu)
    free = root_mask(X.shape, dt)
    ug = to_grid(res, u)
    yg = stencil_apply(res, C, ug, free)
    y = from_grid(res, yg)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-9 * scale)

    # grid round-trip is the identity on active vectors
    np.testing.assert_allclose(np.asarray(from_grid(res, ug)), np.asarray(u))


@pytest.mark.slow
def test_wing_stencil_solver_matches_gather_mg():
    from tpufem.fem.stencil_mg import WingStencilT

    res = WingMeshResolution(16, 16, 4, te_floor_frac=0.006, spacing="le")
    p4 = np.array([[1.2, 0.35, 10.0, 0.10], [1.8, 0.25, 25.0, 0.07]])
    ref = WingBatchT(res, dtype=jnp.float64, mg_levels=None)
    out_ref = ref.solve(p4, tol=1e-10, maxiter=1000, chunk_iters=1000)
    assert bool(np.all(np.asarray(out_ref.converged)))

    st = WingStencilT(res, dtype=jnp.float64)
    out = st.solve(p4, tol=1e-10, maxiter=1000, chunk_iters=1000)
    assert bool(np.all(np.asarray(out.converged)))
    err = np.abs(np.asarray(out.u) - np.asarray(out_ref.u)).max()
    scale = np.abs(np.asarray(out_ref.u)).max()
    assert err / scale < 1e-8
    # grid-native MG should be at least as strong as the gather-path MG
    assert out.iters <= out_ref.iters * 1.5


@pytest.mark.slow
def test_wing_stencil_outer_f64_true_residual():
    """The bench path: f32 engine + f64-operator outer CG judged on the TRUE
    residual of the host-exact f64 system (stencil_mg._host_setup64). The
    solution must agree with an all-f64 reference solve and the reported
    residual must certify the returned (f64) displacement."""
    from tpufem.fem.stencil_mg import WingStencilT

    res = WingMeshResolution(12, 10, 3, te_floor_frac=0.006, spacing="le")
    p4 = np.array([[1.2, 0.35, 10.0, 0.10], [1.8, 0.25, 25.0, 0.07]])
    st = WingStencilT(res, dtype=jnp.float32)
    out = st.solve(p4, tol=1e-8, maxiter=2000, chunk_iters=500, outer_f64=True)
    assert bool(np.all(np.asarray(out.converged))), np.asarray(out.rel_residual)
    assert np.asarray(out.u).dtype == np.float64

    ref = WingBatchT(res, dtype=jnp.float64, mg_levels=None)
    out_ref = ref.solve(p4, tol=1e-11, maxiter=4000, chunk_iters=2000)
    assert bool(np.all(np.asarray(out_ref.converged)))
    err = np.abs(np.asarray(out.u) - np.asarray(out_ref.u)).max()
    scale = np.abs(np.asarray(out_ref.u)).max()
    assert err / scale < 1e-7
