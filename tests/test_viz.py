"""Viz tests: GLB structural validity, colormaps, STL round-trip, arrows."""

import numpy as np
import pytest

from tpufem.geometry import generate_wing_surface
from tpufem.utils.stl import read_stl, write_stl
from tpufem.viz.arrows import make_pressure_arrows
from tpufem.viz.colormaps import hot, normalize_range, viridis
from tpufem.viz.glb import GLBMesh, is_binary_glb, read_glb, write_glb
from tpufem.viz.results import (
    color_range_from_masked,
    stl_to_glb,
    surface_results_to_glb,
)


def square_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float64)
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int64)
    return v, f


def test_glb_roundtrip(tmp_path):
    v, f = square_mesh()
    colors = np.array([[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1], [1, 1, 1, 1.0]])
    p = tmp_path / "m.glb"
    write_glb(p, GLBMesh(vertices=v, faces=f, colors=colors, name="sq"))
    assert is_binary_glb(p)
    out = read_glb(p)
    g = out["json"]
    assert g["asset"]["version"] == "2.0"
    assert len(g["meshes"]) == 1
    prim = g["meshes"][0]["primitives"][0]
    assert "POSITION" in prim["attributes"] and "COLOR_0" in prim["attributes"]
    # positions parse back exactly
    acc = g["accessors"][prim["attributes"]["POSITION"]]
    view = g["bufferViews"][acc["bufferView"]]
    pos = np.frombuffer(
        out["bin"][view["byteOffset"] : view["byteOffset"] + view["byteLength"]],
        dtype=np.float32,
    ).reshape(-1, 3)
    np.testing.assert_allclose(pos, v)
    assert acc["min"] == [0.0, 0.0, 0.0]
    # indices
    iacc = g["accessors"][prim["indices"]]
    iview = g["bufferViews"][iacc["bufferView"]]
    idx = np.frombuffer(
        out["bin"][iview["byteOffset"] : iview["byteOffset"] + iview["byteLength"]],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(idx, f.reshape(-1))
    # byte alignment
    for bv in g["bufferViews"]:
        assert bv["byteOffset"] % 4 == 0


def test_glb_multi_mesh(tmp_path):
    v, f = square_mesh()
    p = tmp_path / "multi.glb"
    write_glb(p, [GLBMesh(v, f, name="a"), GLBMesh(v + 2.0, f, name="b")])
    g = read_glb(p)["json"]
    assert len(g["meshes"]) == 2
    assert len(g["nodes"]) == 2
    assert g["scenes"][0]["nodes"] == [0, 1]


def test_stl_roundtrip(tmp_path):
    s = generate_wing_surface(1.2, 0.35, 10.0, 0.1, n_chord=16, n_span=4)
    p = tmp_path / "wing.stl"
    write_stl(p, s.vertices, s.faces)
    v2, f2 = read_stl(p)
    assert len(f2) == s.num_faces
    # welded vertex count matches (loft verts are unique)
    assert len(v2) == s.num_vertices
    # volume preserved through f32 round trip
    t = v2[f2]
    vol = np.einsum("fi,fi->f", t[:, 0], np.cross(t[:, 1], t[:, 2])).sum() / 6
    assert vol == pytest.approx(0.01, rel=0.05)


def test_stl_to_glb(tmp_path):
    s = generate_wing_surface(1.0, 0.3, 0.0, 0.08, n_chord=12, n_span=3)
    stl = tmp_path / "w.stl"
    glb = tmp_path / "w.glb"
    write_stl(stl, s.vertices, s.faces)
    stl_to_glb(stl, glb)
    assert is_binary_glb(glb)


def test_colormaps():
    t = np.linspace(0, 1, 11)
    for cm in (viridis, hot):
        c = cm(t)
        assert c.shape == (11, 3)
        assert (0 <= c).all() and (c <= 1).all()
    # viridis endpoints: dark purple -> yellow
    v = viridis(np.array([0.0, 1.0]))
    assert v[0, 2] > v[0, 0]  # blue-ish at 0
    assert v[1, 0] > 0.9 and v[1, 1] > 0.85  # yellow at 1
    # hot endpoints: black -> white
    h = hot(np.array([0.0, 1.0]))
    np.testing.assert_allclose(h[0], 0, atol=1e-12)
    np.testing.assert_allclose(h[1], 1, atol=1e-12)


def test_normalize_and_range():
    vals = np.linspace(0, 100, 101)
    mask = vals >= 50
    vmin, vmax = color_range_from_masked(vals, mask)
    assert vmin == 50.0
    assert vmax == pytest.approx(99.0, abs=1.0)  # p98 of masked
    t = normalize_range(vals, vmin, vmax)
    assert t[0] == 0.0 and t[-1] == 1.0


def test_surface_results_to_glb(tmp_path):
    n = 5
    surface = {
        "node_id": np.array([3, 7, 9, 12, 20]),
        "pos": np.random.default_rng(0).uniform(size=(n, 3)).astype(np.float32),
        "stress_vm": np.array([1.0, 5.0, 2.0, 8.0, 3.0], dtype=np.float32),
        "loss_mask": np.array([1, 1, 1, 1, 0], dtype=bool),
    }
    faces_global = np.array([[3, 7, 9], [9, 12, 20]])
    p = tmp_path / "res.glb"
    vmin, vmax = surface_results_to_glb(p, surface, faces_global)
    assert is_binary_glb(p)
    assert vmin == 1.0 and vmax <= 8.0


def test_pressure_arrows_deterministic():
    rng = np.random.default_rng(1)
    nodes = rng.uniform(size=(30, 3))
    faces = rng.integers(0, 30, size=(400, 3))
    v1, f1 = make_pressure_arrows(nodes, faces, case_id="a764c81d")
    v2, f2 = make_pressure_arrows(nodes, faces, case_id="a764c81d")
    np.testing.assert_array_equal(v1, v2)
    assert f1.max() < len(v1)
    assert np.isfinite(v1).all()
    # <=200 arrows sampled: 26 template verts each (tip + 3 rings of 8 + cap)
    assert len(v1) == 200 * 26
