"""Modal analysis (tpufem.fem.modal): subspace-iteration eigensolver vs an
independent scipy.sparse shift-invert on the assembled (K, lumped-M) pencil,
plus mode-shape physics (first mode = spanwise bending, amplitude growing
root -> tip). Beyond-parity capability — the reference FEM stage
(reference src/deep_fem_uav_wing/fem.py) is static-only."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.fem.material import Material
from tpufem.fem.modal import WingModal, lumped_mass
from tpufem.fem.refsolve import assemble_K
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets

PARAMS = (1.2, 0.35, 10.0, 0.10)
RES = WingMeshResolution(8, 10, 2, 0.006, "le")


@pytest.fixture(scope="module")
def scipy_reference():
    mat = Material()
    mesh = structured_wing_mesh(*PARAMS, RES)
    sets = build_boundary_sets(mesh)
    K = assemble_K(mesh.nodes.astype(np.float64), mesh.tets, mat)
    m = lumped_mass(mesh.nodes.astype(np.float64), mesh.tets, mat.rho)
    free = np.ones(len(mesh.nodes) * 3, bool)
    free[(3 * sets.nroot_nodes[:, None] + np.arange(3)).reshape(-1)] = False
    w, V = spla.eigsh(
        K[free][:, free], k=6, M=sp.diags(np.repeat(m, 3)[free]),
        sigma=0, which="LM",
    )
    return mesh, free, m, w, V


def test_lumped_mass_totals():
    """Row-sum lumping preserves total mass exactly (rho * mesh volume)."""
    mat = Material()
    mesh = structured_wing_mesh(*PARAMS, RES)
    m = lumped_mass(mesh.nodes.astype(np.float64), mesh.tets, mat.rho)
    x = mesh.nodes[mesh.tets]
    e = x[:, 1:] - x[:, :1]
    vol = np.abs(np.linalg.det(e)).sum() / 6.0
    assert m.min() > 0
    np.testing.assert_allclose(m.sum(), mat.rho * vol, rtol=1e-12)


def test_modal_matches_scipy_eigsh(scipy_reference):
    """Frequencies must match the assembled-pencil shift-invert to the
    inner-solve tolerance; eigen-residuals certified by one K application."""
    _, free, m, w, V = scipy_reference
    f_ref = np.sqrt(w) / (2 * np.pi)

    wm = WingModal(RES, PARAMS)
    out = wm.solve(n_modes=6)
    assert out.converged, out.sweeps
    np.testing.assert_allclose(out.freqs_hz, f_ref, rtol=1e-8)
    assert np.all(out.eig_residual < 1e-4)

    # eigenvectors: M-weighted alignment |<phi, phi_ref>_M| ~ 1 (distinct
    # eigenvalues at this resolution; signs are arbitrary)
    mf = np.repeat(m, 3)[free]
    for i in range(3):  # lowest three are well separated
        phi = out.modes[:, :, i].reshape(-1)[free]
        ref = V[:, i]
        num = abs(float(phi @ (mf * ref)))
        den = np.sqrt(float(phi @ (mf * phi)) * float(ref @ (mf * ref)))
        assert num / den > 0.999999, (i, num / den)


@pytest.mark.slow
def test_harmonic_response_matches_direct_solve(scipy_reference):
    """Modal superposition is EXACT for a force in the span of the retained
    modes: compare vs a direct (K - w^2 M) solve of the assembled system at
    an off-resonance frequency, undamped."""
    from tpufem.fem.modal import harmonic_response

    mesh, free, m, w_ref, V = scipy_reference
    mat = Material()
    K = assemble_K(mesh.nodes.astype(np.float64), mesh.tets, mat)
    mf = np.repeat(m, 3)[free]

    wm = WingModal(RES, PARAMS)
    out = wm.solve(n_modes=4)
    # force = M (0.7 phi1 + 0.3 phi2): excites only the retained modes
    phi_flat = out.modes.reshape(-1, out.modes.shape[2])
    F_flat = np.repeat(m, 3) * (0.7 * phi_flat[:, 0] + 0.3 * phi_flat[:, 1])
    force = F_flat.reshape(-1, 3)

    f_hz = 0.5 * out.freqs_hz[0]  # below first resonance
    u = harmonic_response(out, m, force, np.array([f_hz]), zeta=0.0)[0]

    w = 2 * np.pi * f_hz
    A = (K[free][:, free] - (w**2) * sp.diags(mf)).tocsc()
    u_direct = spla.spsolve(A, F_flat[free])
    err = np.abs(u.reshape(-1)[free].real - u_direct).max() / np.abs(u_direct).max()
    assert err < 1e-6, err

    # resonance peak: damped amplitude at f1 dwarfs the off-resonance one
    u_res = harmonic_response(out, m, force, out.freqs_hz[:1], zeta=0.01)[0]
    assert np.abs(u_res).max() > 10 * np.abs(u).max()


def test_transient_response_analytic_step(scipy_reference):
    """Piecewise-exact transient integrator vs the closed-form underdamped
    step response: force = M phi1 (only mode 1 excited), g(t) = unit step."""
    from tpufem.fem.modal import transient_response

    mesh, free, m, w_ref, V = scipy_reference
    wm = WingModal(RES, PARAMS)
    out = wm.solve(n_modes=3)

    phi1 = out.modes[:, :, 0]
    force = (np.repeat(m, 3).reshape(-1, 3)) * phi1  # M phi1
    w1 = np.sqrt(out.lam[0])
    zeta = 0.05
    t = np.linspace(0.0, 10.0 / w1, 400)
    u = transient_response(out, force, np.ones_like(t), t, zeta=zeta)

    # analytic modal step response (modal force = 1, modal mass = 1)
    wd = w1 * np.sqrt(1 - zeta**2)
    q_ref = (1.0 / w1**2) * (
        1.0
        - np.exp(-zeta * w1 * t)
        * (np.cos(wd * t) + zeta * w1 / wd * np.sin(wd * t))
    )
    # project the computed field back onto mode 1 (M-inner product)
    q_num = np.einsum("tni,ni->t", u, (np.repeat(m, 3).reshape(-1, 3)) * phi1)
    np.testing.assert_allclose(q_num, q_ref, rtol=1e-9, atol=1e-12 / w1**2)
    # other modes stay unexcited
    q2 = np.einsum(
        "tni,ni->t", u, (np.repeat(m, 3).reshape(-1, 3)) * out.modes[:, :, 1]
    )
    assert np.abs(q2).max() < 1e-8 * np.abs(q_num).max()


def test_first_mode_is_spanwise_bending(scipy_reference):
    """Physics: the fundamental mode of a clamped thin wing is first bending —
    dominantly z-motion, amplitude monotone root band -> tip band."""
    mesh, *_ = scipy_reference
    wm = WingModal(RES, PARAMS)
    out = wm.solve(n_modes=2)
    phi = out.modes[:, :, 0]
    # z-dominance
    comp = (phi**2).sum(axis=0)
    assert comp[2] > 5 * max(comp[0], comp[1])
    # amplitude grows along span
    y = mesh.nodes[:, 1]
    span = y.max() - y.min()
    amp = np.abs(phi[:, 2])
    tip = amp[y > y.min() + 0.8 * span].mean()
    mid = amp[(y > y.min() + 0.4 * span) & (y < y.min() + 0.6 * span)].mean()
    root = amp[y < y.min() + 0.2 * span].mean()
    assert tip > mid > root
    # first natural frequency is positive and far below the second group
    assert out.freqs_hz[0] > 0
    assert out.freqs_hz[1] / out.freqs_hz[0] > 1.5


def test_assemble_k10_matches_jax_operator():
    """The independent quadrature tet10 assembly == the JAX gather operator
    to machine precision (straight edges: degree-2 integrand, 4-pt rule
    exact) — the tet10 anchor the tet4 path has in refsolve.assemble_K."""
    import jax.numpy as jnp

    from tpufem.fem.material import lame_params
    from tpufem.fem.refsolve import assemble_K10, lumped_mass10
    from tpufem.fem.tet10 import tet10_force, tet10_from_tet4, tet10_setup

    mesh = structured_wing_mesh(*PARAMS, WingMeshResolution(6, 8, 2, 0.006, "le"))
    t10 = tet10_from_tet4(mesh)
    n10 = np.asarray(t10.nodes10(mesh.nodes.astype(np.float64)))
    mat = Material()
    lam, mu = lame_params(mat)

    K = assemble_K10(n10, t10.tet10, mat)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((t10.num_nodes, 3))
    y_np = (K @ u.reshape(-1)).reshape(-1, 3)
    Jinv, vols = tet10_setup(jnp.asarray(n10), jnp.asarray(t10.tet10))
    y_jax = np.asarray(
        tet10_force(Jinv, vols, jnp.asarray(t10.tet10), jnp.asarray(u),
                    lam, mu, t10.num_nodes)
    )
    assert np.abs(y_np - y_jax).max() / np.abs(y_jax).max() < 1e-13

    # HRZ lumped mass: positive, exact total mass
    m = lumped_mass10(n10, t10.tet10, mat.rho)
    x4 = n10[t10.tet10[:, :4]]
    vol = np.abs(np.linalg.det(x4[:, 1:] - x4[:, :1])).sum() / 6.0
    assert m.min() > 0
    np.testing.assert_allclose(m.sum(), mat.rho * vol, rtol=1e-12)


@pytest.mark.slow
def test_modal10_matches_scipy_eigsh():
    """tet10 subspace iteration == scipy shift-invert on the assembled
    quadratic pencil (independent assembly, HRZ mass)."""
    import scipy.sparse as ssp

    from tpufem.fem.modal import WingModal10
    from tpufem.fem.refsolve import assemble_K10

    mat = Material()
    wm = WingModal10(RES, PARAMS, material=mat)
    K = assemble_K10(wm.nodes10, wm.t10.tet10, mat)
    free = np.repeat(wm.free_rows, 3)
    w, _ = spla.eigsh(
        K[free][:, free], k=4, M=ssp.diags(np.repeat(wm.mass, 3)[free]),
        sigma=0, which="LM",
    )
    f_ref = np.sqrt(w) / (2 * np.pi)

    out = wm.solve(n_modes=4)
    assert out.converged, out.sweeps
    np.testing.assert_allclose(out.freqs_hz, f_ref, rtol=1e-7)
    assert np.all(out.eig_residual[:3] < 1e-4)
