"""Tet10 quadratic element tests: shape-gradient exactness, patch test,
superior bending accuracy vs tet4, end-to-end wing solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem import Material, lame_params
from tpufem.fem.tet10 import (
    DNDXI,
    GAUSS_POINTS,
    Tet10Mesh,
    pressure_loads_t6,
    solve_tet10_case,
    tet10_diagonal,
    tet10_force,
    tet10_from_tet4,
    tet10_operator,
    tet10_root_nodes,
    tet10_setup,
    tet10_upper_t6,
)
from tpufem.mesher import COARSE, structured_wing_mesh
from tpufem.sets import build_boundary_sets
from tests.test_fem import box_mesh

MAT = Material()
LAM, MU = lame_params(MAT)


def test_dndxi_partition_of_unity():
    # gradients of a partition of unity sum to zero at every quadrature point
    np.testing.assert_allclose(DNDXI.sum(axis=1), 0.0, atol=1e-12)


def test_dndxi_reproduces_quadratic():
    """Shape functions are exact for quadratic fields: check nodal
    interpolation of f(x)=x1^2 has gradient 2*x1 at each gauss point."""
    # reference tet nodes in (xi1,xi2,xi3): corners + edge midpoints
    corners = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
    nodes = np.concatenate([corners, [(corners[a] + corners[b]) / 2 for a, b in edges]])
    fvals = nodes[:, 0] ** 2
    for q, lam4 in enumerate(GAUSS_POINTS):
        xi = lam4[1:]  # (xi1, xi2, xi3)
        grad = DNDXI[q].T @ fvals  # (3,)
        np.testing.assert_allclose(grad, [2 * xi[0], 0, 0], atol=1e-12)


def test_promotion_counts():
    m = box_mesh(2, 2, 2)
    t10 = tet10_from_tet4(m)
    assert t10.tet10.shape == (m.num_tets, 10)
    assert t10.num_nodes == m.num_nodes + len(t10.edge_endpoints)
    # midpoints are true midpoints
    n10 = t10.nodes10(m.nodes)
    mids = n10[m.num_nodes :]
    expect = 0.5 * (m.nodes[t10.edge_endpoints[:, 0]] + m.nodes[t10.edge_endpoints[:, 1]])
    np.testing.assert_allclose(mids, expect)
    # every T6 face's midside nodes match its corner edges
    f = t10.surf_t6[0]
    for k, (a, b) in enumerate(((0, 1), (1, 2), (2, 0))):
        np.testing.assert_allclose(n10[f[3 + k]], 0.5 * (n10[f[a]] + n10[f[b]]), atol=1e-12)


def test_operator_symmetric_and_linear_field_force_free():
    m = box_mesh(2, 2, 2)
    t10 = tet10_from_tet4(m)
    n10 = jnp.asarray(t10.nodes10(m.nodes))
    conn = jnp.asarray(t10.tet10)
    Jinv, vols = tet10_setup(n10, conn)
    N = t10.num_nodes
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, 3))
    y = rng.normal(size=(N, 3))
    fx = np.asarray(tet10_force(Jinv, vols, conn, jnp.asarray(x), LAM, MU, N))
    fy = np.asarray(tet10_force(Jinv, vols, conn, jnp.asarray(y), LAM, MU, N))
    # symmetry of K
    assert np.vdot(y, fx) == pytest.approx(np.vdot(x, fy), rel=1e-10)
    # rigid translation -> zero force
    f0 = np.asarray(tet10_force(Jinv, vols, conn, jnp.ones((N, 3)), LAM, MU, N))
    assert np.abs(f0).max() < 1e-6 * np.abs(fx).max()


def test_tet10_diagonal_positive():
    m = box_mesh(2, 2, 2)
    t10 = tet10_from_tet4(m)
    n10 = jnp.asarray(t10.nodes10(m.nodes))
    conn = jnp.asarray(t10.tet10)
    Jinv, vols = tet10_setup(n10, conn)
    d = tet10_diagonal(Jinv, vols, conn, LAM, MU, t10.num_nodes, jnp.ones(t10.num_nodes * 3))
    assert (np.asarray(d) > 0).all()


def test_t6_pressure_total_force():
    m = box_mesh(2, 2, 2)
    t10 = tet10_from_tet4(m)
    n10 = jnp.asarray(t10.nodes10(m.nodes))
    fv = m.nodes[m.surf_faces]
    top = np.abs(fv[:, :, 2].mean(axis=1) - 1.0) < 1e-9
    t6 = t10.surf_t6[top]
    p = 1234.0
    f = np.asarray(pressure_loads_t6(n10, jnp.asarray(t6), p, t10.num_nodes))
    # total vertical force = -p * area (top face area = 1)
    assert f[:, 2].sum() == pytest.approx(-p, rel=1e-9)
    # corners carry exactly zero for uniform pressure on straight T6
    corner_ids = np.unique(t6[:, :3])
    interior_corners = [i for i in corner_ids if np.abs(f[i]).max() < 1e-9 * p]
    assert len(interior_corners) == len(corner_ids)


def test_tet10_patch_uniaxial():
    """Constant-stress patch test in quadratic elements."""
    from tpufem.fem.solver import pcg

    m = box_mesh(2, 2, 2, L=(2.0, 1.0, 1.0))
    t10 = tet10_from_tet4(m)
    n10_np = t10.nodes10(m.nodes)
    n10 = jnp.asarray(n10_np)
    conn = jnp.asarray(t10.tet10)
    N = t10.num_nodes
    traction = 1e6

    free = np.ones((N, 3))
    free[n10_np[:, 0] < 1e-12, 0] = 0
    free[n10_np[:, 1] < 1e-12, 1] = 0
    free[n10_np[:, 2] < 1e-12, 2] = 0
    free = jnp.asarray(free.reshape(-1))

    fv = m.nodes[m.surf_faces]
    end = np.abs(fv[:, :, 0].mean(axis=1) - 2.0) < 1e-9
    t6 = t10.surf_t6[end]
    f = -np.asarray(pressure_loads_t6(n10, jnp.asarray(t6), traction, N))  # outward pull

    Jinv, vols = tet10_setup(n10, conn)
    A = tet10_operator(Jinv, vols, conn, LAM, MU, N, free)
    diag = tet10_diagonal(Jinv, vols, conn, LAM, MU, N, free)
    res = pcg(A, jnp.asarray(f.reshape(-1)) * free, diag, tol=1e-12, maxiter=8000)
    assert bool(res.converged)
    u = np.asarray(res.x).reshape(-1, 3)
    exact = np.stack(
        [
            traction / MAT.E * n10_np[:, 0],
            -MAT.nu * traction / MAT.E * n10_np[:, 1],
            -MAT.nu * traction / MAT.E * n10_np[:, 2],
        ],
        axis=1,
    )
    np.testing.assert_allclose(u, exact, rtol=1e-7, atol=1e-14)


def test_tet10_bending_beats_tet4():
    """Quadratic elements resolve bending far better on the same grid."""
    from tpufem.fem.assembly import stiffness_operator
    from tpufem.fem.bc import dirichlet_mask as dmask
    from tpufem.fem.elements import tet4_setup
    from tpufem.fem.refsolve import pressure_loads_np
    from tpufem.fem.solver import pcg

    L, b, h = 2.0, 0.2, 0.2
    q = 1e4
    I = b * h**3 / 12.0
    tip_exact = (q * b) * L**4 / (8 * MAT.E * I)
    m = box_mesh(12, 2, 2, L=(L, b, h))

    # tet4
    n = m.num_nodes
    free4 = np.ones((n, 3))
    free4[m.nodes[:, 0] < 1e-12] = 0
    free4 = jnp.asarray(free4.reshape(-1))
    fv = m.nodes[m.surf_faces]
    top = np.abs(fv[:, :, 2].mean(axis=1) - h) < 1e-9
    f4 = pressure_loads_np(m.nodes, m.surf_faces[top], q)
    g4, v4 = tet4_setup(jnp.asarray(m.nodes), jnp.asarray(m.tets))
    A4 = stiffness_operator(g4, v4, jnp.asarray(m.tets), LAM, MU, n, free4)
    from tpufem.fem.assembly import stiffness_diagonal

    d4 = stiffness_diagonal(g4, v4, jnp.asarray(m.tets), LAM, MU, n, free4)
    r4 = pcg(A4, jnp.asarray(f4.reshape(-1)) * free4, d4, tol=1e-10, maxiter=20000)
    u4 = np.asarray(r4.x).reshape(-1, 3)
    tip4 = -u4[np.abs(m.nodes[:, 0] - L) < 1e-9, 2].mean()

    # tet10 on the same grid
    t10 = tet10_from_tet4(m)
    n10_np = t10.nodes10(m.nodes)
    n10 = jnp.asarray(n10_np)
    conn = jnp.asarray(t10.tet10)
    N = t10.num_nodes
    free10 = np.ones((N, 3))
    free10[n10_np[:, 0] < 1e-12] = 0
    free10 = jnp.asarray(free10.reshape(-1))
    t6 = t10.surf_t6[top]
    f10 = np.asarray(pressure_loads_t6(n10, jnp.asarray(t6), q, N))
    Jinv, vols = tet10_setup(n10, conn)
    A10 = tet10_operator(Jinv, vols, conn, LAM, MU, N, free10)
    d10 = tet10_diagonal(Jinv, vols, conn, LAM, MU, N, free10)
    r10 = pcg(A10, jnp.asarray(f10.reshape(-1)) * free10, d10, tol=1e-10, maxiter=40000)
    u10 = np.asarray(r10.x).reshape(-1, 3)
    tip10 = -u10[np.abs(n10_np[:, 0] - L) < 1e-9, 2].mean()

    err4 = abs(tip4 - tip_exact) / tip_exact
    err10 = abs(tip10 - tip_exact) / tip_exact
    assert err10 < err4 / 3  # quadratic elements crush tet4 in bending
    assert err10 < 0.05


def test_tet10_wing_solve():
    """End-to-end structured wing in tet10 with the doubled-grid line
    preconditioner."""
    m = structured_wing_mesh(1.2, 0.35, 10.0, 0.10, COARSE)
    bs = build_boundary_sets(m)
    t10 = tet10_from_tet4(m)
    assert t10.station_id is not None  # doubled-grid stations available
    u, vm, iters, rel, conv = solve_tet10_case(
        t10,
        tet10_root_nodes(t10),
        tet10_upper_t6(t10, bs.surf_upper_faces),
        pressure=100.0,
        dtype=jnp.float64,
        tol=1e-10,
        maxiter=5000,
    )
    assert conv
    assert np.isfinite(u).all() and np.isfinite(vm).all()
    assert u[:, 2].mean() < 0  # deflects downward
    y = t10.nodes10(m.nodes)[:, 1]
    assert vm[y < 0.3].mean() > vm[y > 0.9].mean()  # root concentration
