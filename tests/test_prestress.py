"""Stress-stiffened modal analysis (tpufem.fem.buckling.WingPrestressedModal):
frequencies of (K + p K_G(sigma0), M) vs a dense scipy eigensolve of the
independently assembled pencil, plus the frequency-collapse physics — the
lowest frequency falls monotonically with load factor p and approaches zero
at the buckling factor lambda_cr. Beyond-parity: the reference FEM stage
(reference src/deep_fem_uav_wing/fem.py) is static-only."""

import numpy as np
import scipy.linalg as sla

from tpufem.fem.buckling import WingPrestressedModal
from tpufem.fem.material import Material
from tpufem.fem.modal import lumped_mass
from tpufem.fem.refsolve import assemble_K, direct_solve
from tpufem.mesher import WingMeshResolution, structured_wing_mesh
from tpufem.sets import build_boundary_sets

from tests.test_buckling import _kg_coefs
import pytest

pytestmark = pytest.mark.slow  # multi-minute engine cross-checks

PARAMS = (1.2, 0.35, 10.0, 0.10)
RES = WingMeshResolution(8, 10, 2, 0.006, "le")
PRESSURE = 5e3


def _assembled_pencil():
    """(K, K_G, m_diag, free) of the small anchor mesh, sigma0 from an
    independent scipy static solve."""
    mesh = structured_wing_mesh(*PARAMS, RES)
    sets = build_boundary_sets(mesh)
    mat = Material()
    N = len(mesh.nodes)

    u_ref, _, _ = direct_solve(mesh, sets, pressure=PRESSURE, mat=mat)
    coef = _kg_coefs(mesh, u_ref)
    KG = np.zeros((3 * N, 3 * N))
    dof = 3 * mesh.tets  # (T,4)
    for i in range(3):
        np.add.at(
            KG,
            (np.repeat(dof + i, 4, axis=1).reshape(-1),
             np.tile(dof + i, (1, 4)).reshape(-1)),
            coef.reshape(-1),
        )
    K = assemble_K(mesh.nodes.astype(np.float64), mesh.tets, mat).toarray()
    m = lumped_mass(mesh.nodes.astype(np.float64), mesh.tets, mat.rho)
    free = np.ones(3 * N, bool)
    free[(3 * sets.nroot_nodes[:, None] + np.arange(3)).reshape(-1)] = False
    return K, KG, np.repeat(m, 3), free


def test_prestressed_freqs_match_dense_and_collapse_at_buckling():
    K, KG, m3, free = _assembled_pencil()

    # critical factor + buckling mode from the dense pencil (as test_buckling)
    nu, V = sla.eigh(-KG[np.ix_(free, free)], K[np.ix_(free, free)])
    lam_cr = 1.0 / nu.max()
    phi_b = V[:, np.argmax(nu)]  # buckling eigenvector (free dofs)

    factors = [0.0, 0.5 * lam_cr, 0.9 * lam_cr]
    k = 4
    f_ref = []
    for p in factors:
        Kp = (K + p * KG)[np.ix_(free, free)]
        w = sla.eigh(Kp, np.diag(m3[free]), eigvals_only=True,
                     subset_by_index=[0, k - 1])
        f_ref.append(np.sqrt(np.maximum(w, 0.0)) / (2 * np.pi))
    f_ref = np.array(f_ref)  # (3,k)

    wpm = WingPrestressedModal(RES, PARAMS, pressure=PRESSURE)
    outs = wpm.frequency_sweep(factors, n_modes=k)
    f = np.array([o.freqs_hz for o in outs])

    for i, o in enumerate(outs):
        assert o.converged, (factors[i], o.sweeps)
    np.testing.assert_allclose(f, f_ref, rtol=1e-6)

    # physics: f1 falls monotonically with load, and obeys the exact Rayleigh
    # bound along the buckling mode — phi_b^T (K + p K_G) phi_b =
    # (1 - p/lambda_cr) phi_b^T K phi_b, so omega1^2(p) <= (1 - p/lambda_cr)
    # * R_b with R_b the (K, M) Rayleigh quotient of the buckling mode. The
    # bound forces collapse to zero AT lambda_cr without assuming the lowest
    # vibration mode is the buckling mode (it is not, on this wing).
    assert f[1, 0] < f[0, 0] and f[2, 0] < f[1, 0]
    R_b = (phi_b @ K[np.ix_(free, free)] @ phi_b) / (phi_b @ (m3[free] * phi_b))
    for p, fi in zip(factors, f[:, 0]):
        bound = (1.0 - p / lam_cr) * R_b
        assert (2 * np.pi * fi) ** 2 <= bound * (1 + 1e-9), (p, fi, bound)


def test_prestress_zero_load_matches_free_vibration():
    """p = 0 == WingModal (same pencil, independent code path)."""
    from tpufem.fem.modal import WingModal

    wm = WingModal(RES, PARAMS)
    out0 = wm.solve(n_modes=3)
    wpm = WingPrestressedModal(RES, PARAMS, pressure=PRESSURE)
    outp = wpm.solve(n_modes=3, load_factor=0.0)
    np.testing.assert_allclose(outp.freqs_hz, out0.freqs_hz, rtol=1e-8)
