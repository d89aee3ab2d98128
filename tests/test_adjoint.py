"""Adjoint gradients through the MG-PCG solve (tpufem.fem.adjoint).

The custom_vjp must reproduce central finite differences of the SAME traced
objective to high relative accuracy (f64, tight CG tolerance) — the adjoint
method is exact up to solver tolerance, so agreement is the whole test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.adjoint import DifferentiableWingFEM
from tpufem.mesher import WingMeshResolution

pytestmark = pytest.mark.slow  # multi-minute engine cross-checks

RES = WingMeshResolution(8, 12, 2, te_floor_frac=0.006, spacing="le")
P0 = np.array([[1.2, 0.35, 10.0, 0.10], [1.7, 0.25, 22.0, 0.08]])


@pytest.fixture(scope="module")
def fem():
    return DifferentiableWingFEM(RES, P0, pressure=5e3, tol=1e-11, maxiter=4000)


def _fd_grad(f, p0, eps):
    """Central finite differences of scalar f at p0 (B,4)."""
    g = np.zeros_like(p0)
    for b in range(p0.shape[0]):
        for i in range(p0.shape[1]):
            pp = p0.copy()
            pp[b, i] += eps[i]
            fp = float(f(jnp.asarray(pp)))
            pp[b, i] -= 2 * eps[i]
            fm = float(f(jnp.asarray(pp)))
            g[b, i] = (fp - fm) / (2 * eps[i])
    return g


def test_compliance_gradient_matches_fd(fem):
    @jax.jit
    def J(p4):
        u = fem.solve(p4)
        return fem.compliance(p4, u).sum()

    g = np.asarray(jax.jit(jax.grad(J))(jnp.asarray(P0, jnp.float64)))
    eps = np.array([1e-5, 1e-5, 1e-4, 1e-6])
    g_fd = _fd_grad(J, P0.astype(np.float64), eps)
    rel = np.abs(g - g_fd) / np.maximum(np.abs(g_fd), np.abs(g).max() * 1e-8)
    assert rel.max() < 1e-4, (g, g_fd, rel)


def test_smooth_max_vm_gradient_matches_fd(fem):
    @jax.jit
    def J(p4):
        u = fem.solve(p4)
        return fem.smooth_max_vm(p4, u).sum()

    g = np.asarray(jax.jit(jax.grad(J))(jnp.asarray(P0, jnp.float64)))
    eps = np.array([1e-5, 1e-5, 1e-4, 1e-6])
    g_fd = _fd_grad(J, P0.astype(np.float64), eps)
    rel = np.abs(g - g_fd) / np.maximum(np.abs(g_fd), np.abs(g).max() * 1e-8)
    assert rel.max() < 1e-3, (g, g_fd, rel)


def test_gradient_signs_are_physical(fem):
    """Thicker wing -> stiffer (compliance falls); the volume (mass proxy)
    grows with every sizing parameter."""
    @jax.jit
    def J(p4):
        u = fem.solve(p4)
        return fem.compliance(p4, u).sum()

    g = np.asarray(jax.jit(jax.grad(J))(jnp.asarray(P0, jnp.float64)))
    assert (g[:, 3] < 0).all(), "d(compliance)/d(thickness) must be negative"

    gv = np.asarray(jax.grad(lambda p: fem.volume(p).sum())(jnp.asarray(P0, jnp.float64)))
    assert (gv[:, [0, 1, 3]] > 0).all(), "volume grows with span/chord/thickness"


def test_optimizer_step_reduces_objective(fem):
    """A few Adam steps on compliance + volume penalty must go downhill with
    the frozen preconditioner (no refresh) — the practical usage pattern."""
    import optax

    def L(p4):
        u = fem.solve(p4)
        c = fem.compliance(p4, u)
        v = fem.volume(p4)
        return (c / 1e-2 + v / 1e-3).sum()

    p = jnp.asarray(P0, jnp.float64)
    opt = optax.adam(1e-3)
    state = opt.init(p)
    l0 = float(L(p))
    vg = jax.jit(jax.value_and_grad(L))
    for _ in range(5):
        val, g = vg(p)
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    assert float(L(p)) < l0
