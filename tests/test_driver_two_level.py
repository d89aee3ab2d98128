"""Single-case driver with RBM two-level preconditioning at a blunt-TE
resolution large enough for the coarse level to matter."""

import jax.numpy as jnp
import numpy as np

from tpufem.fem import WingSolveConfig, solve_wing_case
from tpufem.fem.refsolve import direct_solve
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets

RES = WingMeshResolution(24, 16, 3, te_floor_frac=0.006, spacing="le")


def test_driver_two_level_f32_matches_direct():
    m = structured_wing_mesh(1.6, 0.30, 25.0, 0.07, RES)
    bs = build_boundary_sets(m)
    cfg = WingSolveConfig(
        pressure=5000.0, dtype=jnp.float32, tol=1e-6, maxiter=8000,
        two_level=True, refine_steps=1, chunk_iters=2000,
    )
    sol = solve_wing_case(m, bs, cfg)
    assert sol.converged
    u_ref, _, vm_ref = direct_solve(m, bs, pressure=5000.0)
    ue = np.linalg.norm(sol.u - u_ref) / np.linalg.norm(u_ref)
    assert ue < 1e-7, ue
    # refined stress is direct-solver grade
    assert np.abs(sol.vm - vm_ref).max() < 200.0  # Pa


def test_driver_two_level_faster_than_line_only():
    m = structured_wing_mesh(1.6, 0.30, 25.0, 0.07, RES)
    bs = build_boundary_sets(m)
    base = dict(pressure=5000.0, dtype=jnp.float32, tol=1e-6, maxiter=12000)
    two = solve_wing_case(m, bs, WingSolveConfig(**base, two_level=True))
    one = solve_wing_case(m, bs, WingSolveConfig(**base, two_level=False))
    assert two.converged
    # the coarse level must cut iterations substantially
    assert two.iters < one.iters * 0.7, (two.iters, one.iters)
