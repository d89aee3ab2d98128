"""Native meshcore (C++/ctypes) vs numpy reference implementations."""

import numpy as np
import pytest

from tpufem import native
from tpufem.mesher import COARSE, boundary_faces, structured_wing_mesh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def mesh():
    return structured_wing_mesh(1.2, 0.35, 15.0, 0.10, COARSE)


def test_boundary_faces_match_numpy(mesh):
    ref = boundary_faces(mesh.tets.astype(np.int64))
    nat = native.boundary_faces_native(mesh.tets)
    assert nat is not None
    assert len(nat) == len(ref)
    # same oriented face set (order may differ)
    a = {tuple(np.roll(f, -np.argmin(f))) for f in ref}
    b = {tuple(np.roll(f, -np.argmin(f))) for f in nat}
    assert a == b


def test_unique_edges_match_numpy(mesh):
    from tpufem.fem.tet10 import _EDGES

    tets = mesh.tets.astype(np.int64)
    edges = np.sort(tets[:, _EDGES].reshape(-1, 2), axis=1)
    ref = np.unique(edges, axis=0)
    nat = native.unique_edges_native(mesh.tets)
    assert nat is not None
    np.testing.assert_array_equal(np.asarray(nat, dtype=np.int64), ref)


def test_unique_tri_edges(mesh):
    f = mesh.surf_faces.astype(np.int64)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    ref = np.unique(np.sort(e, axis=1), axis=0)
    nat = native.unique_tri_edges_native(mesh.surf_faces)
    np.testing.assert_array_equal(np.asarray(nat, dtype=np.int64), ref)


def test_msh2_native_roundtrip(tmp_path, mesh):
    """Write an MSH2 file from the wing mesh, parse with native + python,
    compare."""
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(mesh.num_nodes)]
    for i, p in enumerate(mesh.nodes, 1):
        lines.append(f"{i} {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}")
    lines += ["$EndNodes", "$Elements", str(mesh.num_tets)]
    for i, t in enumerate(mesh.tets + 1, 1):
        lines.append(f"{i} 4 2 0 1 {t[0]} {t[1]} {t[2]} {t[3]}")
    lines += ["$EndElements", ""]
    p = tmp_path / "wing.msh"
    p.write_text("\n".join(lines))

    out = native.msh2_parse_native(p.read_text())
    assert out is not None
    node_ids, node_xyz, tris, tets = out
    assert len(node_ids) == mesh.num_nodes
    np.testing.assert_allclose(node_xyz, mesh.nodes, rtol=1e-6)
    np.testing.assert_array_equal(tets - 1, mesh.tets)

    # full pipeline through tpufem.msh2 (uses native when available)
    from tpufem.msh2 import parse_msh2

    m2 = parse_msh2(p)
    assert m2.num_nodes == mesh.num_nodes
    assert m2.num_tets == mesh.num_tets
    assert (m2.tet_volumes() > 0).all()
