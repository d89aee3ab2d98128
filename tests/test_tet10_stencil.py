"""Grid-native tet10 stencil engine (tpufem.fem.tet10_stencil) vs the gather
reference (tpufem.fem.tet10 / tet10_mg): operator equivalence to machine
precision, transfer transposes, and solver agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.material import Material, lame_params
from tpufem.fem.tet10 import tet10_force, tet10_from_tet4, tet10_root_nodes, tet10_setup
from tpufem.fem.tet10_stencil import (
    Tet10StencilT,
    cell_geometry2,
    dup_mask2,
    free_mask2,
    from_grid2,
    grid_meta2,
    nodes_grid2,
    prolong_p,
    restrict_p,
    strain_apply10,
    to_grid2,
)
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets

pytestmark = pytest.mark.slow  # multi-minute engine cross-checks

PARAMS = (1.2, 0.35, 10.0, 0.10)


@pytest.mark.parametrize(
    "reskey",
    [
        (6, 4, 2, 0.0, "cosine"),  # sharp TE: both weld columns
        (8, 6, 2, 0.006, "le"),  # floored TE (flagship family)
    ],
)
def test_strain_apply10_matches_gather_operator(reskey):
    """The doubled-grid stencil apply must equal tet10_force on the welded
    system to machine precision (weld spread/reduce embedding included)."""
    res = WingMeshResolution(*reskey)
    m2 = grid_meta2(res)  # asserts the weld-pattern bijection internally
    mesh = structured_wing_mesh(*PARAMS, res)
    t10 = tet10_from_tet4(mesh)
    assert t10.num_nodes == m2["num_nodes"]
    lam, mu = (jnp.float64(v) for v in lame_params(Material()))

    rng = np.random.default_rng(0)
    free = np.ones((t10.num_nodes, 3), np.float64)
    free[tet10_root_nodes(t10)] = 0.0
    x = rng.normal(size=(t10.num_nodes, 3, 1)) * free[:, :, None]

    nodes10 = t10.nodes10(mesh.nodes)
    Jinv, vols = tet10_setup(jnp.asarray(nodes10), jnp.asarray(t10.tet10))
    y_ref = np.asarray(
        tet10_force(
            Jinv, vols, jnp.asarray(t10.tet10), jnp.asarray(x[:, :, 0]),
            lam, mu, t10.num_nodes,
        )
    ) * free

    p4 = jnp.asarray(np.array([PARAMS]), jnp.float64)
    X2 = nodes_grid2(res, p4, jnp.float64)
    # doubled-grid coordinates must reproduce the welded tet10 node coords
    coords = np.asarray(from_grid2(res, X2))[:, :, 0]
    assert np.abs(coords - nodes10).max() < 1e-12

    geo = cell_geometry2(res, X2)
    yg = strain_apply10(
        res, geo, to_grid2(res, jnp.asarray(x)), free_mask2(res, jnp.float64),
        lam, mu,
    )
    y = np.asarray(from_grid2(res, yg))[:, :, 0] * free
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-12


def test_p_transfer_exact_transpose():
    """<P x4, r2> == <x4, R r2> for the P2<->P1 grid transfers."""
    from tpufem.fem.stencil_mg import StencilMG

    res = WingMeshResolution(8, 8, 2, 0.006, "le")
    smg = StencilMG(res, dtype=jnp.float64)
    d2, f2 = dup_mask2(res, jnp.float64), free_mask2(res, jnp.float64)
    rng = np.random.default_rng(1)
    NI, NK, NJ = res.n_chord + 1, res.n_thick + 1, res.n_span + 1
    x4 = jnp.asarray(rng.normal(size=(3, 1, NI, NK, NJ)))
    x4 = x4 * smg.dup_masks[0] * smg.free_masks[0]
    r2 = jnp.asarray(rng.normal(size=(3, 1, 2 * NI - 1, 2 * NK - 1, 2 * NJ - 1)))
    r2 = r2 * d2 * f2
    lhs = float((prolong_p(res, x4, d2, f2) * r2).sum())
    rhs = float((x4 * restrict_p(res, r2, smg.free_masks[0]) * smg.dup_masks[0]).sum())
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)


def test_tet10_stencil_solver_matches_gather_pmg():
    """Tet10StencilT must converge like Tet10MGSolver (same p-MG math) and
    agree on u to f64 accuracy; both judge convergence on the f64 residual."""
    from tpufem.fem.tet10_mg import Tet10MGSolver

    res = WingMeshResolution(8, 8, 2, 0.006, "le")
    mesh = structured_wing_mesh(*PARAMS, res)
    bs = build_boundary_sets(mesh)
    t10 = tet10_from_tet4(mesh)

    st = Tet10StencilT(res, dtype=jnp.float32)
    out = st.solve(
        np.array([PARAMS]), bs.surf_upper_faces, pressure=5e3, tol=1e-6,
        maxiter=600, chunk_iters=200, outer_f64=True,
    )
    assert bool(np.all(out.converged)), float(np.max(out.rel_residual))
    assert out.iters < 300  # MG-class iteration count

    ref = Tet10MGSolver(res, t10, dtype=jnp.float32)
    rout = ref.solve(
        np.array(PARAMS), bs.surf_upper_faces, pressure=5e3, tol=1e-6,
        maxiter=600, chunk_iters=200, outer_f64=True,
    )
    assert rout.converged
    du = np.abs(out.u[:, :, 0] - rout.u).max() / np.abs(rout.u).max()
    assert du < 1e-5, du
    # vm recovered in f64 here vs f32 in the reference: f32-grade agreement
    dvm = np.abs(out.vm[:, 0] - rout.vm).max() / np.abs(rout.vm).max()
    assert dvm < 5e-3, dvm


def test_tet10_stencil_batched_lanes_independent():
    """Two different wings solved in one trailing-batch call must match the
    same wings solved individually (per-lane isolation on the grid)."""
    res = WingMeshResolution(6, 4, 2, 0.006, "le")
    mesh = structured_wing_mesh(*PARAMS, res)
    bs = build_boundary_sets(mesh)
    p2 = np.array([PARAMS, (1.6, 0.45, 20.0, 0.08)])
    st = Tet10StencilT(res, dtype=jnp.float32)
    both = st.solve(p2, bs.surf_upper_faces, pressure=5e3, tol=1e-6,
                    maxiter=400, chunk_iters=400)
    assert bool(np.all(both.converged))
    one = st.solve(p2[1:2], bs.surf_upper_faces, pressure=5e3, tol=1e-6,
                   maxiter=400, chunk_iters=400)
    du = np.abs(both.u[:, :, 1] - one.u[:, :, 0]).max()
    scale = np.abs(one.u).max()
    assert du / scale < 1e-5
