"""Geometrically nonlinear statics (tpufem.fem.nonlinear): TL-StVK internal
force / energy / tangent consistency, small-load reduction to the linear
stencil operator, and the Newton-Krylov wing solve with its membrane-
stiffening physics. Beyond-parity capability — the reference FEM stage
(reference src/deep_fem_uav_wing/fem.py:524-533) is linear-static only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.material import Material, lame_params
from tpufem.fem.nonlinear import (
    WingNonlinear,
    stvk_cauchy_stress,
    stvk_energy,
    stvk_internal_force,
)
from tpufem.fem.stencil import cell_geometry, nodes_grid, strain_apply, to_grid
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets

PARAMS = (1.2, 0.35, 10.0, 0.10)
RES = WingMeshResolution(8, 10, 2, 0.006, "le")


@pytest.fixture(scope="module")
def grid_setup():
    p4 = jnp.asarray(np.asarray(PARAMS)[None], jnp.float64)
    X = nodes_grid(RES, p4, jnp.float64)
    geo = cell_geometry(RES, X)
    mesh = structured_wing_mesh(*PARAMS, RES)
    sets = build_boundary_sets(mesh)
    # free mask in grid layout: zero the clamped-root rows
    free_nodes = np.ones(len(mesh.nodes), np.float64)
    free_nodes[sets.nroot_nodes] = 0.0
    free = to_grid(RES, jnp.asarray(np.repeat(free_nodes[:, None], 3, axis=1)[:, :, None]))
    lam, mu = lame_params(Material())
    return geo, free, jnp.float64(lam), jnp.float64(mu)


def _rand_grid(free, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal(np.asarray(free).shape) * scale
    return jnp.asarray(u) * free


def test_small_load_reduces_to_linear(grid_setup):
    """f_int(u) -> K u as |u| -> 0: the quadratic remainder scales as |u|^2."""
    geo, free, lam, mu = grid_setup
    u = _rand_grid(free, seed=1, scale=1.0)
    errs = []
    # random (non-smooth) u hits the thin-TE cells' ~1/h gradient scale
    # (h ~ 1 mm at this resolution), so |H| ~ 1000 eps: stay well inside
    # the small-strain regime
    for eps in (1e-6, 1e-7):
        ue = u * eps
        f_nl = stvk_internal_force(RES, geo, ue, free, lam, mu)
        f_lin = strain_apply(RES, geo, ue, free, lam, mu)
        num = float(jnp.linalg.norm((f_nl - f_lin).ravel()))
        den = float(jnp.linalg.norm(f_lin.ravel()))
        errs.append(num / den)
    # relative deviation is O(|u|): shrinking u 10x shrinks it ~10x
    assert errs[0] < 1e-2
    assert errs[1] < 0.15 * errs[0]


def test_internal_force_is_energy_gradient(grid_setup):
    """f_int == grad_u W on free rows — hyperelastic consistency (this is
    what makes the jvp tangent symmetric)."""
    geo, free, lam, mu = grid_setup
    u = _rand_grid(free, seed=2, scale=1e-2)
    f = stvk_internal_force(RES, geo, u, free, lam, mu)
    gW = jax.grad(lambda v: stvk_energy(RES, geo, v, free, lam, mu))(u)
    # compare on free rows (f_int carries identity on constrained rows)
    diff = (f - gW) * free
    ref = jnp.linalg.norm((f * free).ravel())
    assert float(jnp.linalg.norm(diff.ravel())) <= 1e-10 * max(float(ref), 1.0)


def test_tangent_symmetry_and_fd(grid_setup):
    """<v, K_T w> == <w, K_T v>, and jvp matches a central finite difference."""
    geo, free, lam, mu = grid_setup
    u = _rand_grid(free, seed=3, scale=1e-2)
    v = _rand_grid(free, seed=4, scale=1.0)
    w = _rand_grid(free, seed=5, scale=1.0)

    def fint(x):
        return stvk_internal_force(RES, geo, x, free, lam, mu)

    Kv = jax.jvp(fint, (u,), (v,))[1]
    Kw = jax.jvp(fint, (u,), (w,))[1]
    a = float((w * Kv).sum())
    b = float((v * Kw).sum())
    assert abs(a - b) <= 1e-9 * max(abs(a), 1.0)

    h = 1e-6
    fd = (fint(u + h * v) - fint(u - h * v)) / (2 * h)
    num = float(jnp.linalg.norm((Kv - fd).ravel()))
    den = float(jnp.linalg.norm(fd.ravel()))
    assert num / den < 1e-6


def test_cauchy_reduces_to_linear_stress(grid_setup):
    """sigma(u) -> linear element stress as |u| -> 0."""
    from tpufem.fem.buckling import element_stress

    geo, free, lam, mu = grid_setup
    u = _rand_grid(free, seed=6, scale=1e-7)
    sig_nl = stvk_cauchy_stress(RES, geo, u, free, lam, mu)
    sig_lin = element_stress(RES, geo, u, lam, mu)
    num = float(jnp.linalg.norm((sig_nl - sig_lin).ravel()))
    den = float(jnp.linalg.norm(sig_lin.ravel()))
    assert num / den < 1e-3


@pytest.mark.slow
def test_newton_solve_converges_and_stiffens():
    """Full solve at a hard load on a slender wing (5.6% span deflection):
    Newton converges, and membrane stretching makes the nonlinear tip
    deflection SMALLER than the linear prediction (measured +0.116%)."""
    slender = (1.6, 0.3, 0.0, 0.08)
    solver = WingNonlinear(RES, slender, pressure=3e5, inner_tol=1e-10,
                           inner_maxiter=800)
    out = solver.solve(n_steps=2, newton_tol=1e-8)
    assert out.converged, f"newton residual {out.rel_residual:.2e}"
    assert np.isfinite(out.u).all()

    mag_nl = np.linalg.norm(out.u, axis=1).max()
    mag_lin = np.linalg.norm(out.u_linear, axis=1).max()
    # a real geometric effect in the stiffening direction, physically sized
    assert mag_nl < mag_lin
    stiff = (mag_lin - mag_nl) / mag_lin
    assert 5e-4 < stiff < 5e-2, f"stiffening {stiff:.2e}"
    # at least one load step needed >1 Newton iteration (genuinely nonlinear)
    assert any(h["newton_iters"] >= 2 for h in out.history)


@pytest.mark.slow
def test_newton_small_load_matches_linear_solution():
    """At a light load the nonlinear solve lands on the linear solution."""
    solver = WingNonlinear(RES, PARAMS, pressure=1.0, inner_tol=1e-10,
                           inner_maxiter=800)
    out = solver.solve(n_steps=1, newton_tol=1e-8)
    assert out.converged
    num = np.linalg.norm(out.u - out.u_linear)
    den = np.linalg.norm(out.u_linear)
    # agreement up to the O(|grad u|) geometric correction at this load
    assert num / den < 1e-3
