"""Stationary random-vibration response (tpufem.fem.modal.random_response):
the von Karman gust PSD normalization, and the frequency-domain RMS field
cross-validated against the piecewise-exact TIME-domain integrator on a
synthesized realization — two independent code paths (trapezoid PSD
integration vs transient modal superposition) that must agree at steady
state. Beyond-parity: the reference pipeline is static-only."""

import numpy as np

from tpufem.fem.modal import (
    WingModal,
    random_response,
    transient_response,
    von_karman_psd,
)
from tpufem.fem.refsolve import pressure_loads_np
from tpufem.mesher import WingMeshResolution
import pytest

PARAMS = (1.2, 0.35, 10.0, 0.10)
RES = WingMeshResolution(8, 10, 2, 0.006, "le")


def test_von_karman_psd_integrates_to_variance():
    """One-sided S(f) integrates to sigma_w^2 (the 1.339-constant identity)."""
    f = np.logspace(-5, 4, 20000)
    s = von_karman_psd(f, sigma_w=3.0, scale_l=100.0, airspeed=30.0)
    var = np.trapezoid(s, f)
    np.testing.assert_allclose(var, 9.0, rtol=2e-3)


@pytest.mark.slow
def test_random_rms_matches_time_domain():
    """RMS field from the PSD integral == RMS of a time-domain realization.

    The realization is a finite cosine sum with line spacing 1/T, so over an
    integer number of periods (after the transient decays) the time RMS is
    the EXACT line-sum RMS — agreement is limited only by the trapezoid-vs-
    line-sum quadrature and the piecewise-linear sampling of the forcing."""
    wm = WingModal(RES, PARAMS)
    out = wm.solve(n_modes=4)
    force = pressure_loads_np(
        wm.mesh.nodes.astype(np.float64),
        wm.mesh.surf_faces[wm.sets.surf_upper_faces], 5e3,
    )
    zeta = 0.02

    # band-limited von Karman gust factor g = w_g / V (quasi-steady)
    period = 4.0
    df = 1.0 / period
    f_lines = np.arange(1, int(200.0 / df) + 1) * df  # 0.25 .. 200 Hz
    s_g = von_karman_psd(f_lines, sigma_w=2.0, scale_l=50.0, airspeed=30.0) / (
        30.0**2
    )

    # pad with zero-PSD endpoints so the trapezoid gives every LINE its full
    # df weight — the synthesized realization is a line spectrum (rectangle
    # rule), and the von Karman spectrum is so low-frequency-heavy that the
    # first line alone carries ~2/3 of the in-band variance: half-weighting
    # it (a bare trapezoid end) shifts the RMS by ~15%
    f_fd = np.concatenate([[0.0], f_lines, [f_lines[-1] + df]])
    s_fd = np.concatenate([[0.0], s_g, [0.0]])
    rms_u, sig_q = random_response(out, wm.mass, force, f_fd, s_fd, zeta=zeta)

    # time-domain realization: amplitudes sqrt(2 S df), random phases
    rng = np.random.default_rng(7)
    amps = np.sqrt(2.0 * s_g * df)
    phases = rng.uniform(0.0, 2.0 * np.pi, len(f_lines))
    dt = 2.5e-4
    n_per = int(round(period / dt))
    t = np.arange(3 * n_per + 1) * dt
    g = np.zeros_like(t)
    for j0 in range(0, len(f_lines), 64):
        fj = f_lines[j0 : j0 + 64]
        g += (
            amps[j0 : j0 + 64, None]
            * np.cos(2.0 * np.pi * fj[:, None] * t[None] + phases[j0 : j0 + 64, None])
        ).sum(axis=0)
    # realization variance is the exact line sum (one period, integer lines)
    np.testing.assert_allclose(
        np.mean(g[n_per : 3 * n_per] ** 2), (amps**2).sum() / 2.0, rtol=1e-10
    )

    u_t = transient_response(out, force, g, t, zeta=zeta)
    steady = u_t[n_per : 3 * n_per]  # transient decayed by e^{-zeta w1 T} ~ 1e-17
    rms_t = np.sqrt((steady**2).mean(axis=0))

    # compare where there is signal (tip region moves; root rows are clamped)
    m = rms_u > 0.05 * rms_u.max()
    rel = np.abs(rms_t[m] - rms_u[m]) / rms_u[m]
    assert float(rel.max()) < 0.02, float(rel.max())
    # modal RMS sanity: the full-field RMS at the peak dof is dominated by
    # (and bounded by) the modal superposition magnitudes
    assert sig_q[0] > 0 and np.isfinite(sig_q).all()
