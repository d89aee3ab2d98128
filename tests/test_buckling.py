"""Linearized buckling (tpufem.fem.buckling): the grid-native geometric
stiffness apply vs an independent numpy assembly (machine precision), and
end-to-end buckling factors vs a dense generalized eigensolve of the
assembled (-K_G, K) pencil. Beyond-parity — the reference FEM stage is
static-only."""

import numpy as np
import pytest
import scipy.linalg as sla

from tpufem.fem.buckling import WingBuckling, element_stress, geom_apply
from tpufem.fem.material import Material, lame_params
from tpufem.fem.refsolve import assemble_K, direct_solve, tet4_setup_np
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets

PARAMS = (1.2, 0.35, 10.0, 0.10)
RES = WingMeshResolution(8, 10, 2, 0.006, "le")
PRESSURE = 5e3


def _sigma_np(mesh, u):
    """Per-tet stress from a host displacement field (numpy reference)."""
    lam, mu = lame_params(Material())
    grads, vols = tet4_setup_np(mesh.nodes.astype(np.float64), mesh.tets)
    H = np.einsum("tad,tae->tde", grads, u[mesh.tets])
    eps = 0.5 * (H + np.swapaxes(H, 1, 2))
    tr = np.trace(eps, axis1=1, axis2=2)
    sig = 2 * mu * eps + lam * tr[:, None, None] * np.eye(3)
    return sig, grads, np.abs(vols)


def _kg_coefs(mesh, u):
    """(T,4,4) scalar coefficients V * g_a^T sigma g_b of K_G."""
    sig, grads, vols = _sigma_np(mesh, u)
    sg = np.einsum("tde,tbe->tbd", sig, grads)
    return np.einsum("tad,tbd->tab", grads, sg) * vols[:, None, None]


def test_geom_apply_matches_numpy_assembly():
    """Grid K_G apply == scattered numpy assembly to machine precision for
    random stress-generating u0 and random input x."""
    import jax.numpy as jnp

    from tpufem.fem.stencil import cell_geometry, from_grid, nodes_grid, to_grid
    from tpufem.fem.stencil_mg import WingStencilT

    mesh = structured_wing_mesh(*PARAMS, RES)
    sets = build_boundary_sets(mesh)
    lam, mu = lame_params(Material())
    N = len(mesh.nodes)
    free_rows = np.ones(N, bool)
    free_rows[sets.nroot_nodes] = False

    rng = np.random.default_rng(0)
    u0 = rng.standard_normal((N, 3, 1))
    u0[~free_rows] = 0.0
    x = rng.standard_normal((N, 3, 1))
    x[~free_rows] = 0.0

    coef = _kg_coefs(mesh, u0[:, :, 0])
    ye = np.einsum("tab,tbi->tai", coef, x[mesh.tets, :, 0])
    y_np = np.zeros((N, 3))
    np.add.at(y_np, mesh.tets.reshape(-1), ye.reshape(-1, 3))
    y_np[~free_rows] = 0.0

    X = nodes_grid(RES, jnp.asarray(np.array([PARAMS]), jnp.float64), jnp.float64)
    geo = cell_geometry(RES, X)
    st = WingStencilT(RES, dtype=jnp.float64)
    free = st.smg.free_masks[0].astype(jnp.float64)
    sig = element_stress(RES, geo, to_grid(RES, jnp.asarray(u0)), lam, mu)
    yg = geom_apply(RES, geo, sig, to_grid(RES, jnp.asarray(x)), free)
    y = np.asarray(from_grid(RES, yg))[:, :, 0]
    assert np.abs(y - y_np).max() / np.abs(y_np).max() < 1e-13


@pytest.mark.slow
def test_buckling_factors_match_dense_pencil():
    """Subspace iteration factors == dense eigh(-K_G, K) of the assembled
    pencil (sigma0 from an independent scipy static solve)."""
    mesh = structured_wing_mesh(*PARAMS, RES)
    sets = build_boundary_sets(mesh)
    mat = Material()
    N = len(mesh.nodes)

    u_ref, _, _ = direct_solve(mesh, sets, pressure=PRESSURE, mat=mat)
    coef = _kg_coefs(mesh, u_ref)
    KG = np.zeros((3 * N, 3 * N))
    dof = 3 * mesh.tets  # (T,4)
    for i in range(3):
        np.add.at(
            KG,
            (np.repeat(dof + i, 4, axis=1).reshape(-1),
             np.tile(dof + i, (1, 4)).reshape(-1)),
            coef.reshape(-1),
        )
    K = assemble_K(mesh.nodes.astype(np.float64), mesh.tets, mat).toarray()
    free = np.ones(3 * N, bool)
    free[(3 * sets.nroot_nodes[:, None] + np.arange(3)).reshape(-1)] = False
    nu = sla.eigh(
        -KG[np.ix_(free, free)], K[np.ix_(free, free)], eigvals_only=True
    )
    pos = nu[nu > 0]
    lam_ref = np.sort(1.0 / pos)[:2]

    wb = WingBuckling(RES, PARAMS, pressure=PRESSURE)
    out = wb.solve(n_modes=2, tol=1e-7)
    assert out.converged, out.sweeps
    np.testing.assert_allclose(out.factors, lam_ref, rtol=1e-5)
    # physics: the solid-section wing is nowhere near buckling at the design
    # load — the critical factor is large and positive
    assert out.load_factor > 10.0
