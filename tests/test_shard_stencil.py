"""Span-sharded stencil MG (tpufem.parallel.shard_stencil) vs single-device:
the full multigrid preconditioner INSIDE the sharded operator must reproduce
the single-device solve bit-for-bit-class (1e-8) with the SAME iteration
count — the round-3 closure of BASELINE config 5's sharded-flagship gap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpufem.mesher import DOF1M_TET10, WingMeshResolution, structured_wing_mesh
from tpufem.parallel.shard_stencil import ShardedStencilSolver, make_plan
from tpufem.sets import build_boundary_sets

pytestmark = pytest.mark.slow  # multi-minute engine cross-checks

PARAMS = (1.2, 0.35, 10.0, 0.10)


def _mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return Mesh(np.array(devs[:8]), ("mesh",))


def test_plan_flagship_shards_four_levels():
    """DOF1M_TET10 (span 128) over 8 devices: tet4 levels with 128/64/32/16/8
    span cells all stay sharded; only the (3,4,1) coarsest is replicated."""
    plan, levels = make_plan(DOF1M_TET10, 8)
    assert plan.n_shard == 5
    assert plan.cells == (16, 8, 4, 2, 1)
    assert levels[plan.n_shard].n_span == 4  # replicated tail


def test_sharded_tet4_matches_single_device():
    mesh = _mesh8()
    res = WingMeshResolution(16, 16, 2, 0.006, "le")
    s = ShardedStencilSolver(res, 8, element="tet4", dtype=jnp.float64)
    u, iters, rel = s.solve(PARAMS, mesh, pressure=5e3, tol=1e-8,
                            maxiter=400, chunk_iters=100)
    assert rel <= 1e-8
    assert iters < 150  # MG-class count

    from tpufem.fem.stencil_mg import WingStencilT

    st = WingStencilT(res, dtype=jnp.float64)
    out = st.solve(np.array([PARAMS]), pressure=5e3, tol=1e-8,
                   maxiter=400, chunk_iters=400)
    assert iters == out.iters  # identical Krylov trajectory
    u1 = np.asarray(out.u)[:, :, 0]
    assert np.abs(u - u1).max() / np.abs(u1).max() < 1e-8


@pytest.mark.slow
def test_sharded_tet4_chunked_matches_one_dispatch():
    """Warm-Krylov chunking is mathematically identical to one dispatch."""
    mesh = _mesh8()
    res = WingMeshResolution(16, 16, 2, 0.006, "le")
    s = ShardedStencilSolver(res, 8, element="tet4", dtype=jnp.float64)
    u1, it1, rel1 = s.solve(PARAMS, mesh, pressure=5e3, tol=1e-8,
                            maxiter=300, chunk_iters=23)
    u2, it2, rel2 = s.solve(PARAMS, mesh, pressure=5e3, tol=1e-8,
                            maxiter=300, chunk_iters=None)
    assert it1 == it2
    assert np.abs(u1 - u2).max() <= 1e-12 * np.abs(u2).max()


@pytest.mark.slow
def test_sharded_tet10_matches_single_device():
    """Sharded tet10 p-MG (doubled-grid slabs, tet4 MG correction sharded
    underneath) == single-device Tet10StencilT to 1e-8."""
    mesh = _mesh8()
    res = WingMeshResolution(16, 16, 2, 0.006, "le")
    s = ShardedStencilSolver(res, 8, element="tet10", dtype=jnp.float64)
    u, iters, rel = s.solve(PARAMS, mesh, pressure=5e3, tol=1e-8,
                            maxiter=600, chunk_iters=150)
    assert rel <= 1e-8
    assert iters < 400

    from tpufem.fem.tet10_stencil import Tet10StencilT

    wm = structured_wing_mesh(*PARAMS, res)
    bs = build_boundary_sets(wm)
    st = Tet10StencilT(res, dtype=jnp.float64)
    out = st.solve(np.array([PARAMS]), bs.surf_upper_faces, pressure=5e3,
                   tol=1e-8, maxiter=600, chunk_iters=600)
    assert iters == out.iters
    u1 = out.u[:, :, 0]
    assert np.abs(u - u1).max() / np.abs(u1).max() < 1e-8
