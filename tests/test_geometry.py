"""Geometry layer tests: NACA profile, loft watertightness, volume convergence."""

import numpy as np
import pytest

from tpufem.geometry import (
    airfoil_ring,
    generate_wing_surface,
    naca00xx_half_thickness,
    surface_is_consistently_oriented,
    surface_is_watertight,
    surface_signed_volume,
)
from tpufem.pipeline.types import PRD_RANGES


def test_naca_thickness_endpoints():
    assert naca00xx_half_thickness(np.array(0.0), 0.1) == pytest.approx(0.0)
    # closed trailing edge: exactly zero at x/c = 1
    assert naca00xx_half_thickness(np.array(1.0), 0.1) == pytest.approx(0.0, abs=1e-12)


def test_naca_max_thickness_matches_ratio():
    # max total thickness of a NACA-00xx equals the thickness ratio (~at x/c=0.3)
    x = np.linspace(0, 1, 200001)
    for t in (0.05, 0.10, 0.15):
        zmax = naca00xx_half_thickness(x, t).max()
        assert 2 * zmax == pytest.approx(t, rel=2e-2)


def test_airfoil_ring_closed_and_symmetric():
    ring = airfoil_ring(0.35, 0.1, n_chord=32)
    assert len(ring) == 64
    assert len(np.unique(ring.round(12), axis=0)) == len(ring)
    # symmetric: for every (x, z) there is an (x, -z)
    flipped = ring * np.array([1.0, -1.0])
    a = set(map(tuple, ring.round(12)))
    b = set(map(tuple, flipped.round(12)))
    assert a == b


@pytest.mark.parametrize(
    "span,chord,sweep,t",
    [
        (1.2, 0.35, 0.0, 0.10),  # spec validation case 1 (docs/spec.md:309-353)
        (1.5, 0.30, 20.0, 0.08),  # spec case 2: sweep + thin
        (2.0, 0.25, 30.0, 0.05),  # spec case 3: hard (max sweep, thinnest)
    ],
)
def test_loft_watertight_all_spec_cases(span, chord, sweep, t):
    s = generate_wing_surface(span, chord, sweep, t)
    assert surface_is_watertight(s)
    assert surface_is_consistently_oriented(s)
    assert surface_signed_volume(s) > 0


def test_loft_volume_matches_analytic():
    span, chord, t = 1.2, 0.35, 0.10
    s = generate_wing_surface(span, chord, 15.0, t, n_chord=96, n_span=8)
    x = np.linspace(0, 1, 100001)
    section_area = 2 * np.trapezoid(naca00xx_half_thickness(x, t), x) * chord**2
    expected = section_area * span  # sweep is a shear: volume-preserving
    assert surface_signed_volume(s) == pytest.approx(expected, rel=2e-3)


def test_loft_extents_follow_params():
    span, chord, sweep, t = 1.4, 0.4, 25.0, 0.12
    s = generate_wing_surface(span, chord, sweep, t)
    v = s.vertices
    assert v[:, 1].min() == pytest.approx(0.0)
    assert v[:, 1].max() == pytest.approx(span)
    assert v[:, 2].max() == pytest.approx(chord * t / 2, rel=2e-2)
    tip_le_x = span * np.tan(np.deg2rad(sweep))
    assert v[:, 0].max() == pytest.approx(tip_le_x + chord, rel=1e-6)


def test_prd_box_corners_all_valid():
    lo = {k: v[0] for k, v in PRD_RANGES.items()}
    hi = {k: v[1] for k, v in PRD_RANGES.items()}
    for p in (lo, hi):
        s = generate_wing_surface(
            p["span_m"], p["chord_m"], p["sweep_deg"], p["thickness_ratio"]
        )
        assert surface_is_watertight(s)
