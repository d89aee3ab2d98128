"""tet10 p-multigrid: transfer transposition + solver correctness vs the
round-1 two-level tet10 path, and iteration superiority."""

import numpy as np
import jax.numpy as jnp

from tpufem.fem.tet10 import solve_tet10_case, tet10_from_tet4, tet10_root_nodes
from tpufem.fem.tet10_mg import Tet10MGSolver
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets
import pytest

pytestmark = pytest.mark.slow  # multi-minute engine cross-checks

RES = WingMeshResolution(16, 16, 4, te_floor_frac=0.006, spacing="le")
P4 = (1.4, 0.3, 15.0, 0.09)


def _setup():
    mesh = structured_wing_mesh(*P4, RES)
    bs = build_boundary_sets(mesh)
    t10 = tet10_from_tet4(mesh)
    return mesh, bs, t10


def test_p_transfer_exact_transpose():
    _, _, t10 = _setup()
    solver = Tet10MGSolver(RES, t10, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u4 = jnp.asarray(rng.normal(size=(solver.N4, 3)))
    r10 = jnp.asarray(rng.normal(size=(solver.N10, 3)))
    lhs = float((r10 * solver.prolong(u4)).sum())
    rhs = float((solver.restrict(r10) * u4).sum())
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_p_prolong_exact_on_linear_fields():
    _, _, t10 = _setup()
    solver = Tet10MGSolver(RES, t10, dtype=jnp.float64)
    nodes4 = t10.mesh4.nodes
    nodes10 = t10.nodes10(nodes4)
    coef = np.array([[0.3, -1.1, 2.0], [0.5, 0.1, -0.7], [1.0, 0.0, 0.2]])
    u4 = jnp.asarray(nodes4 @ coef)
    u10 = np.asarray(solver.prolong(u4))
    ref = nodes10 @ coef
    free = np.asarray(solver.free)
    err = np.abs((u10 - ref) * free).max()  # exact away from the clamp mask
    assert err < 1e-12 * np.abs(ref).max()


def test_tet10_mg_matches_two_level_and_is_faster():
    mesh, bs, t10 = _setup()
    nroot10 = tet10_root_nodes(t10)
    from tpufem.fem.tet10 import tet10_upper_t6

    u_ref, vm_ref, it_ref, rel_ref, conv_ref = solve_tet10_case(
        t10, nroot10, tet10_upper_t6(t10, bs.surf_upper_faces), pressure=5e3,
        tol=1e-9, maxiter=8000, dtype=jnp.float64,
        nj2=2 * (RES.n_span + 1) - 1,
    )
    assert conv_ref

    solver = Tet10MGSolver(RES, t10, dtype=jnp.float64)
    out = solver.solve(P4, bs.surf_upper_faces, pressure=5e3, tol=1e-9, maxiter=2000)
    assert out.converged
    err = np.abs(out.u - u_ref).max() / np.abs(u_ref).max()
    assert err < 1e-7
    assert out.iters < it_ref  # p-MG must beat the tet10 two-level


def test_tet10_mg_mixed_precision_refinement():
    """Flagship-scale path: f32 MG-PCG + f64 true-residual refinement must
    reach tol on the TRUE f64 residual and match a full-f64 solve."""
    mesh, bs, t10 = _setup()

    f64_solver = Tet10MGSolver(RES, t10, dtype=jnp.float64)
    ref = f64_solver.solve(P4, bs.surf_upper_faces, pressure=5e3, tol=1e-10, maxiter=2000)
    assert ref.converged

    solver = Tet10MGSolver(RES, t10, dtype=jnp.float32)
    out = solver.solve(
        P4, bs.surf_upper_faces, pressure=5e3, tol=5e-7, maxiter=8000,
        chunk_iters=200, refine_steps=6, inner_tol=1e-4,
    )
    # tol sits above the refinement floor (~1.8e-7 here: the f32-assembled
    # correction operator differs from the f64 one by ~eps_f32 relative,
    # which at this mesh's kappa~1e9 bounds the attainable TRUE residual) but
    # below the product tol 1e-6; convergence is judged on the TRUE f64
    # residual, where the f32 recurred residual is off by ~9 orders at this
    # conditioning (measured: recurred 9.9e-5, true 6.0e+2 after the inner
    # solve)
    assert out.converged
    assert out.rel_residual <= 5e-7
    err = np.abs(out.u - ref.u).max() / np.abs(ref.u).max()
    assert err < 1e-6


def test_tet10_mg_f64_polish_breaks_refinement_floor():
    """When refinement cannot reach tol (rel stalls round-over-round), the
    chunked f64-outer CG polish — warm-started from the refined solution —
    must drive the computed f64 residual to tol. refine_steps=1 leaves the
    residual ~1e-2, far above tol, so this exercises the polish path."""
    mesh, bs, t10 = _setup()
    solver = Tet10MGSolver(RES, t10, dtype=jnp.float32)
    out = solver.solve(
        P4, bs.surf_upper_faces, pressure=5e3, tol=5e-7, maxiter=8000,
        chunk_iters=50, refine_steps=1, inner_tol=1e-4,
    )
    assert out.converged
    assert out.rel_residual <= 5e-7


def test_tet10_force_elem_chunked_matches_dense():
    """Chunked operator application (HBM-bounded scan over element blocks,
    used by the ~2.5M-DOF flagship solve) is exactly the dense apply."""
    from tpufem.fem.tet10 import tet10_force, tet10_setup

    _, _, t10 = _setup()
    nodes10 = jnp.asarray(t10.nodes10(t10.mesh4.nodes))
    conn = jnp.asarray(t10.tet10)
    Jinv, vols = tet10_setup(nodes10, conn)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(t10.num_nodes, 3)))
    lam, mu = 1.1e9, 0.8e9
    dense = tet10_force(Jinv, vols, conn, u, lam, mu, t10.num_nodes)
    # chunk size that does NOT divide T exercises the zero-volume padding
    chunked = tet10_force(
        Jinv, vols, conn, u, lam, mu, t10.num_nodes, elem_chunk=777
    )
    err = float(jnp.abs(chunked - dense).max() / jnp.abs(dense).max())
    assert err < 1e-12
