"""Mesher tests: validity, volume convergence, shared topology, boundary sets."""

import numpy as np
import pytest

from tpufem.geometry import generate_wing_surface, surface_signed_volume
from tpufem.mesher import (
    COARSE,
    MEDIUM,
    WingMeshResolution,
    boundary_faces,
    compute_tet_quality,
    nodes_from_params,
    structured_wing_mesh,
    wing_topology,
)
from tpufem.sets import build_boundary_sets


def test_mesh_valid_and_positive():
    m = structured_wing_mesh(1.2, 0.35, 15.0, 0.10, MEDIUM)
    m.validate()  # positive volumes, indices in range


def test_mesh_volume_converges_to_loft():
    span, chord, sweep, t = 1.2, 0.35, 15.0, 0.10
    target = surface_signed_volume(
        generate_wing_surface(span, chord, sweep, t, n_chord=128, n_span=8)
    )
    prev_err = np.inf
    for res in (COARSE, MEDIUM, WingMeshResolution(48, 32, 6)):
        m = structured_wing_mesh(span, chord, sweep, t, res)
        err = abs(m.tet_volumes().sum() - target) / target
        assert err < prev_err + 1e-12
        prev_err = err
    assert prev_err < 2e-3


def test_boundary_faces_closed():
    m = structured_wing_mesh(1.0, 0.3, 0.0, 0.08, COARSE)
    f = m.surf_faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 1).all()  # closed + consistently outward


def test_boundary_faces_outward():
    m = structured_wing_mesh(1.0, 0.3, 0.0, 0.08, COARSE)
    v = m.nodes[m.surf_faces]
    vol = np.einsum("fi,fi->f", v[:, 0], np.cross(v[:, 1], v[:, 2])).sum() / 6.0
    assert vol == pytest.approx(m.tet_volumes().sum(), rel=1e-9)


def test_topology_shared_across_params():
    """The decisive vmap property: same resolution -> identical connectivity."""
    t1 = wing_topology(MEDIUM)
    m_a = structured_wing_mesh(1.0, 0.2, 0.0, 0.05, MEDIUM)
    m_b = structured_wing_mesh(2.0, 0.5, 30.0, 0.15, MEDIUM)
    assert np.array_equal(m_a.tets, m_b.tets)
    assert np.array_equal(m_a.surf_faces, m_b.surf_faces)
    # both orientations positive across the PRD box
    assert (m_a.tet_volumes() > 0).all()
    assert (m_b.tet_volumes() > 0).all()
    assert m_a.num_nodes == t1.num_nodes


def test_nodes_from_params_matches_mesh():
    topo = wing_topology(COARSE)
    m = structured_wing_mesh(1.3, 0.42, 12.0, 0.11, COARSE)
    nodes = np.asarray(nodes_from_params(topo.node_basis, 1.3, 0.42, 12.0, 0.11))
    np.testing.assert_allclose(nodes, m.nodes, rtol=0, atol=1e-12)


def test_quality_metrics_reported():
    m = structured_wing_mesh(1.2, 0.35, 15.0, 0.10, COARSE)
    q = compute_tet_quality(m)
    assert set(q) == {
        "aspect_ratio_mean",
        "aspect_ratio_p95",
        "aspect_ratio_max",
        "quality_ok_ratio",
    }
    assert 0.0 <= q["quality_ok_ratio"] <= 1.0


def test_boundary_sets_rules():
    m = structured_wing_mesh(1.2, 0.35, 15.0, 0.10, MEDIUM)
    bs = build_boundary_sets(m)
    # NROOT: exactly the y=0 nodes
    assert (m.nodes[bs.nroot_nodes, 1] <= 1e-4).all()
    assert len(bs.nroot_nodes) >= 10
    # upper faces on the +z side, away from root
    fv = m.nodes[m.surf_faces[bs.surf_upper_faces]]
    assert (fv[:, :, 2].mean(axis=1) > 0).all()
    assert (fv[:, :, 1].mean(axis=1) > 5e-4).all()
    assert 0.2 <= bs.upper_area_ratio <= 0.7


def test_boundary_faces_function_single_tet():
    tets = np.array([[0, 1, 2, 3]], dtype=np.int64)
    f = boundary_faces(tets)
    assert len(f) == 4
