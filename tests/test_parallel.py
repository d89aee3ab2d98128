"""Parallel layer tests on the virtual 8-device CPU mesh: halo-exchange PCG
equals the single-device solve, GSPMD-sharded solve works, DP training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem import Material, WingSolveConfig, lame_params, solve_wing_case
from tpufem.fem.bc import dirichlet_mask
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.parallel.halo_pcg import build_halo_partition, halo_pcg_solve
from tpufem.parallel.meshes import make_mesh
from tpufem.parallel.sharded_solver import sharded_pcg_solve
from tpufem.sets import build_boundary_sets

RES = WingMeshResolution(12, 15, 2)  # 16 span stations
RES_UNEVEN = WingMeshResolution(12, 18, 2)  # 19 span stations: NOT divisible
PARAMS = (1.2, 0.35, 10.0, 0.10)


def _reference_solution(pressure=200.0):
    m = structured_wing_mesh(*PARAMS, RES)
    bs = build_boundary_sets(m)
    sol = solve_wing_case(
        m, bs, WingSolveConfig(pressure=pressure, dtype=jnp.float64, tol=1e-10, maxiter=20000)
    )
    assert sol.converged
    return m, bs, sol


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_halo_pcg_matches_single_device(n_dev):
    m, bs, ref = _reference_solution()
    part = build_halo_partition(RES, n_dev, *PARAMS, dtype=np.float64)
    mesh = make_mesh(n_dev)
    u, iters, rel = halo_pcg_solve(
        part, mesh, pressure=200.0, tol=1e-10, maxiter=20000, dtype=jnp.float64
    )
    assert rel <= 1e-10
    err = np.linalg.norm(u - ref.u) / np.linalg.norm(ref.u)
    assert err < 1e-8, err


def test_halo_pcg_chunked_matches_single_dispatch():
    """Dispatch-bounded halo PCG (Krylov state carried across shard_map
    dispatches) must be EXACTLY the single-dispatch solve — chunk bounding
    exists because long dispatches kill tunneled TPU workers (~1 min)."""
    m, bs, ref = _reference_solution()
    part = build_halo_partition(RES, 4, *PARAMS, dtype=np.float64)
    mesh = make_mesh(4)
    u1, it1, rel1 = halo_pcg_solve(
        part, mesh, pressure=200.0, tol=1e-10, maxiter=20000, dtype=jnp.float64
    )
    u2, it2, rel2 = halo_pcg_solve(
        part, mesh, pressure=200.0, tol=1e-10, maxiter=20000, dtype=jnp.float64,
        chunk_iters=13,
    )
    assert it2 == it1 and rel2 <= 1e-10
    assert np.abs(u1 - u2).max() == 0.0  # bit-identical Krylov trajectory


def test_halo_pcg_uneven_slabs():
    """19 span stations over 8 devices — the divisibility constraint that
    excluded the flagship resolution in round 1 is gone."""
    m = structured_wing_mesh(*PARAMS, RES_UNEVEN)
    bs = build_boundary_sets(m)
    ref = solve_wing_case(
        m, bs, WingSolveConfig(pressure=200.0, dtype=jnp.float64, tol=1e-10, maxiter=20000)
    )
    assert ref.converged
    part = build_halo_partition(RES_UNEVEN, 8, *PARAMS, dtype=np.float64)
    mesh = make_mesh(8)
    u, iters, rel = halo_pcg_solve(
        part, mesh, pressure=200.0, tol=1e-10, maxiter=20000, dtype=jnp.float64
    )
    assert rel <= 1e-10
    err = np.linalg.norm(u - ref.u) / np.linalg.norm(ref.u)
    assert err < 1e-8, err


@pytest.mark.slow
def test_halo_pcg_tet10_matches_single_device():
    """Sharded tet10 == single-device tet10 (VERDICT round-1 'done' criterion)."""
    from tpufem.fem.tet10 import (
        solve_tet10_case,
        tet10_from_tet4,
        tet10_root_nodes,
        tet10_upper_t6,
    )

    m = structured_wing_mesh(*PARAMS, RES_UNEVEN)
    bs = build_boundary_sets(m)
    t10 = tet10_from_tet4(m)
    u_ref, vm_ref, it_ref, rel_ref, conv_ref = solve_tet10_case(
        t10, tet10_root_nodes(t10), tet10_upper_t6(t10, bs.surf_upper_faces),
        pressure=200.0, tol=1e-10, maxiter=30000, dtype=jnp.float64,
        nj2=2 * (RES_UNEVEN.n_span + 1) - 1,
    )
    assert conv_ref
    part = build_halo_partition(RES_UNEVEN, 4, *PARAMS, dtype=np.float64, element="tet10")
    mesh = make_mesh(4)
    u, iters, rel = halo_pcg_solve(
        part, mesh, pressure=200.0, tol=1e-10, maxiter=30000, dtype=jnp.float64
    )
    assert rel <= 1e-10
    err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-8, err


def test_halo_partition_invariants():
    part = build_halo_partition(RES_UNEVEN, 4, *PARAMS)
    # every node owned by exactly one device
    assert int(part.node_mask.sum()) == part.num_nodes
    # permutation is a bijection
    assert len(np.unique(part.perm)) == part.num_nodes
    # all devices' elements reference valid local range
    assert part.elems.min() >= 0
    assert part.elems.max() < part.n_max + part.g_max


@pytest.mark.slow
def test_halo_partition_flagship_resolution():
    """BASELINE config 5 literally: the ~2.5M-DOF tet10 flagship resolution
    (NJ=129 span stations — indivisible by any device count, the round-1
    blocker) must partition over 8 devices with uneven slabs."""
    from tpufem.mesher import DOF1M_TET10

    part = build_halo_partition(
        DOF1M_TET10, 8, 1.6, 0.4, 20.0, 0.10, dtype=np.float32, element="tet10"
    )
    assert part.num_nodes == 837049
    assert int(part.node_mask.sum()) == part.num_nodes
    assert len(np.unique(part.perm)) == part.num_nodes
    assert part.elems.min() >= 0
    assert part.elems.max() < part.n_max + part.g_max


def test_gspmd_sharded_solve():
    m, bs, ref = _reference_solution()
    mesh = make_mesh(8)
    free = dirichlet_mask(m.num_nodes, bs.nroot_nodes, dtype=jnp.float64)
    lam, mu = lame_params(Material())
    u, iters, rel = sharded_pcg_solve(
        mesh,
        m.nodes.astype(np.float64),
        m.tets,
        m.surf_faces[bs.surf_upper_faces],
        np.asarray(free),
        pressure=200.0,
        lam=lam,
        mu=mu,
        tol=1e-10,
        maxiter=20000,
    )
    err = np.linalg.norm(np.asarray(u) - ref.u) / np.linalg.norm(ref.u)
    assert err < 1e-7, err


@pytest.mark.slow
def test_dp_train_step_runs():
    import optax

    from tpufem.models.sage import GraphSAGE, SAGEConfig
    from tpufem.models.train import stack_graphs
    from tpufem.parallel.data_parallel import make_dp_train_step, shard_batch
    from __graft_entry__ import _tiny_graph

    mesh = make_mesh(8)
    cfg = SAGEConfig(hidden=16, encoder_hidden=8, decoder_hidden=8, num_layers=1)
    model = GraphSAGE(cfg)
    graphs = [_tiny_graph(seed=s) for s in range(8)]
    batch = stack_graphs(graphs)
    params = model.init(jax.random.PRNGKey(0), batch.x[0], batch.edge_index[0], batch.edge_mask[0])
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    with mesh:
        step = make_dp_train_step(model, opt, mesh)
        b = shard_batch(batch, mesh)
        params2, opt_state, loss = step(params, opt_state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree.map(lambda a, b2: a - b2, params, params2),
        0.0,
    )
    assert delta > 0
