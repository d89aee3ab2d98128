"""Batched solver tests: vmapped (leading) and trailing-batch variants equal
the single-case solve; shared-topology dataset path works end to end."""

import jax.numpy as jnp
import numpy as np

from tpufem.fem import WingSolveConfig, solve_wing_case
from tpufem.fem.batched import solve_wing_batch
from tpufem.fem.batched_t import WingBatchT
from tpufem.mesher import COARSE, structured_wing_mesh
from tpufem.sets import build_boundary_sets

P4 = np.array(
    [
        [1.2, 0.35, 10.0, 0.10],
        [1.6, 0.42, 25.0, 0.07],
        [1.0, 0.20, 0.0, 0.15],
    ]
)


def _reference(k, pressure=5000.0):
    m = structured_wing_mesh(*P4[k], COARSE)
    bs = build_boundary_sets(m)
    return solve_wing_case(
        m, bs,
        WingSolveConfig(pressure=pressure, dtype=jnp.float64, tol=1e-10, maxiter=20000),
    )


def test_trailing_batch_matches_single_case():
    bt = WingBatchT(COARSE, dtype=jnp.float64)
    out = bt.solve(P4, pressure=5000.0, tol=1e-10, maxiter=20000, chunk_iters=3000)
    assert bool(np.all(np.asarray(out.converged)))
    for k in range(len(P4)):
        ref = _reference(k)
        ue = np.linalg.norm(np.asarray(out.u[:, :, k]) - ref.u) / np.linalg.norm(ref.u)
        ve = np.abs(np.asarray(out.vm[:, k]) - ref.vm).max() / ref.vm.max()
        assert ue < 1e-8, (k, ue)
        assert ve < 1e-7, (k, ve)


def test_vmapped_batch_matches_single_case():
    out, ctx = solve_wing_batch(
        [dict(span_m=r[0], chord_m=r[1], sweep_deg=r[2], thickness_ratio=r[3]) for r in P4],
        COARSE,
        pressure=5000.0,
        tol=1e-10,
        maxiter=20000,
        dtype=jnp.float64,
    )
    assert bool(np.all(np.asarray(out.converged)))
    for k in range(len(P4)):
        ref = _reference(k)
        ue = np.linalg.norm(np.asarray(out.u[k]) - ref.u) / np.linalg.norm(ref.u)
        assert ue < 1e-8, (k, ue)


def test_blunt_te_resolution_solves():
    """The benchmark-config mesh options (TE floor + LE spacing) work end to end."""
    from tpufem.mesher import WingMeshResolution

    res = WingMeshResolution(16, 8, 3, te_floor_frac=0.006, spacing="le")
    bt = WingBatchT(res, dtype=jnp.float64)
    out = bt.solve(P4[:2], pressure=5000.0, tol=1e-9, maxiter=20000, chunk_iters=4000)
    assert bool(np.all(np.asarray(out.converged)))
    assert np.isfinite(np.asarray(out.vm)).all()
    # downward deflection for both cases
    assert (np.asarray(out.u)[:, 2, :].mean(axis=0) < 0).all()
