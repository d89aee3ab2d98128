"""Thickness-line block-Jacobi preconditioner tests (float64 ground truth)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpufem.fem import Material, lame_params, tet4_setup
from tpufem.fem.assembly import stiffness_operator
from tpufem.fem.bc import dirichlet_mask
from tpufem.fem.loads import pressure_loads
from tpufem.fem.precond import build_line_plan, line_blocks, make_line_preconditioner
from tpufem.fem.refsolve import assemble_K
from tpufem.fem.solver import pcg
from tpufem.mesher import COARSE, structured_wing_mesh, wing_topology
from tpufem.sets import build_boundary_sets

MAT = Material()
LAM, MU = lame_params(MAT)


def setup_case():
    topo = wing_topology(COARSE)
    mesh = structured_wing_mesh(1.2, 0.35, 15.0, 0.10, COARSE)
    bs = build_boundary_sets(mesh)
    plan = build_line_plan(topo)
    free = dirichlet_mask(mesh.num_nodes, bs.nroot_nodes, dtype=jnp.float64)
    grads, vols = tet4_setup(jnp.asarray(mesh.nodes), jnp.asarray(mesh.tets))
    return topo, mesh, bs, plan, free, grads, vols


def test_plan_partitions_nodes():
    topo, mesh, _, plan, _, _, _ = setup_case()
    # every node in exactly one (station, slot)
    seen = plan.station_nodes[plan.node_station, plan.node_slot]
    np.testing.assert_array_equal(seen, np.arange(mesh.num_nodes))
    assert plan.slot_valid.sum() == mesh.num_nodes


def test_blocks_match_masked_K_submatrices():
    topo, mesh, bs, plan, free, grads, vols = setup_case()
    Binv = np.asarray(line_blocks(plan, grads, vols, LAM, MU, free))
    # explicit masked K
    K = assemble_K(mesh.nodes, mesh.tets, MAT).toarray()
    m = np.asarray(free)
    Km = m[:, None] * K * m[None, :] + np.diag(1.0 - m)

    rng = np.random.default_rng(0)
    for s in rng.choice(plan.num_stations, 12, replace=False):
        slots = plan.slot_valid[s] > 0
        nodes = plan.station_nodes[s][slots]
        dofs = (3 * nodes[:, None] + np.arange(3)).reshape(-1)
        sub = Km[np.ix_(dofs, dofs)]
        # corresponding rows/cols of the inverted block
        ds = (3 * np.nonzero(slots)[0][:, None] + np.arange(3)).reshape(-1)
        inv_sub = Binv[s][np.ix_(ds, ds)]
        np.testing.assert_allclose(inv_sub @ sub, np.eye(len(dofs)), atol=1e-6)


def test_M_is_symmetric_positive():
    topo, mesh, bs, plan, free, grads, vols = setup_case()
    Binv = line_blocks(plan, grads, vols, LAM, MU, free)
    M = make_line_preconditioner(plan, Binv)
    n = mesh.num_nodes * 3
    rng = np.random.default_rng(1)
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    Mx = np.asarray(M(jnp.asarray(x)))
    My = np.asarray(M(jnp.asarray(y)))
    assert abs(x @ My - y @ Mx) < 1e-8 * abs(x @ Mx)  # symmetry
    assert x @ Mx > 0  # positive


def test_line_pcg_converges_fast_f64():
    """The point of the preconditioner: far fewer iterations than Jacobi."""
    topo, mesh, bs, plan, free, grads, vols = setup_case()
    tets = jnp.asarray(mesh.tets)
    A = stiffness_operator(grads, vols, tets, LAM, MU, mesh.num_nodes, free)
    f = pressure_loads(jnp.asarray(mesh.nodes), jnp.asarray(mesh.surf_faces[bs.surf_upper_faces]), 5000.0, mesh.num_nodes)
    b = f.reshape(-1) * free
    Binv = line_blocks(plan, grads, vols, LAM, MU, free)
    M = make_line_preconditioner(plan, Binv)
    res = pcg(A, b, M=M, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    # Jacobi needed 1766 iterations at tol 1e-10 on this mesh; the line
    # preconditioner must beat that decisively.
    assert int(res.iters) < 900
