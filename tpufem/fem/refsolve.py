"""Independent host-side direct solve (scipy) — the correctness anchor.

CalculiX is unavailable in the build environment (SURVEY.md §7), so the
BASELINE <1e-6-vs-CalculiX criterion is interpreted as <1e-6 vs an independent
direct factorization of the same discrete system: explicit sparse K assembled
from the closed-form tet4 stiffness K_{ai,bj} = V*(lam*g_ai*g_bj + mu*g_aj*g_bi
+ mu*delta_ij*g_a.g_b), Dirichlet elimination, scipy spsolve in float64.
Used by tests and by the dataset validator's cross-check mode.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.fem.material import Material, lame_params
from tpufem.mesh_types import Mesh
from tpufem.sets import BoundarySets


def tet4_setup_np(nodes: np.ndarray, tets: np.ndarray):
    x = nodes[tets]
    e = x[:, 1:] - x[:, :1]
    det = np.linalg.det(e)
    vols = det / 6.0
    inv = np.linalg.inv(e)
    g123 = np.swapaxes(inv, 1, 2)
    g0 = -g123.sum(axis=1, keepdims=True)
    grads = np.concatenate([g0, g123], axis=1)
    return grads, vols


def assemble_K(nodes: np.ndarray, tets: np.ndarray, mat: Material) -> sp.csr_matrix:
    lam, mu = lame_params(mat)
    grads, vols = tet4_setup_np(nodes, tets)
    T = len(tets)
    # K_e blocks: (T, 4,3, 4,3)
    gg = np.einsum("tai,tbj->taibj", grads, grads)  # g_ai g_bj
    gdot = np.einsum("tak,tbk->tab", grads, grads)  # g_a . g_b
    eye = np.eye(3)
    Ke = lam * gg + mu * np.einsum("taibj->tbiaj", gg) + mu * np.einsum(
        "tab,ij->taibj", gdot, eye
    )
    Ke = Ke * vols[:, None, None, None, None]
    dof = (3 * tets[:, :, None] + np.arange(3)[None, None, :]).reshape(T, 12)
    rows = np.repeat(dof, 12, axis=1).reshape(-1)
    cols = np.tile(dof, (1, 12)).reshape(-1)
    K = sp.coo_matrix(
        (Ke.reshape(T, 12, 12).reshape(-1), (rows, cols)),
        shape=(3 * len(nodes), 3 * len(nodes)),
    ).tocsr()
    return K


def pressure_loads_np(nodes: np.ndarray, faces: np.ndarray, pressure: float) -> np.ndarray:
    v = nodes[faces]
    area_vec = 0.5 * np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    f_vert = (-pressure / 3.0) * area_vec
    f = np.zeros_like(nodes)
    for k in range(3):
        np.add.at(f, faces[:, k], f_vert)
    return f


def direct_solve(
    mesh: Mesh,
    sets: BoundarySets,
    pressure: float = 5e3,
    mat: Material = Material(),
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (u (N,3), stress6 (N,6), vm (N,)) in float64."""
    nodes = mesh.nodes.astype(np.float64)
    K = assemble_K(nodes, mesh.tets, mat)
    f = pressure_loads_np(nodes, mesh.surf_faces[sets.surf_upper_faces], pressure)
    free = np.ones(len(nodes) * 3, dtype=bool)
    free[(3 * sets.nroot_nodes[:, None] + np.arange(3)).reshape(-1)] = False
    b = f.reshape(-1)
    u = np.zeros(len(nodes) * 3)
    Kff = K[free][:, free]
    u[free] = spla.spsolve(Kff.tocsc(), b[free])
    u = u.reshape(-1, 3)

    # stress recovery identical in spirit to the JAX path (tensor average)
    lam, mu = lame_params(mat)
    grads, vols = tet4_setup_np(nodes, mesh.tets)
    ue = u[mesh.tets]
    H = np.einsum("tai,taj->tij", grads, ue)
    eps = 0.5 * (H + np.swapaxes(H, 1, 2))
    tr = np.trace(eps, axis1=1, axis2=2)
    sig = 2 * mu * eps
    sig[:, 0, 0] += lam * tr
    sig[:, 1, 1] += lam * tr
    sig[:, 2, 2] += lam * tr
    voigt = np.stack(
        [sig[:, 0, 0], sig[:, 1, 1], sig[:, 2, 2], sig[:, 0, 1], sig[:, 1, 2], sig[:, 2, 0]],
        axis=1,
    )
    num = np.zeros((len(nodes), 6))
    den = np.zeros(len(nodes))
    for k in range(4):
        np.add.at(num, mesh.tets[:, k], vols[:, None] * voigt)
        np.add.at(den, mesh.tets[:, k], vols)
    s6 = num / np.maximum(den, 1e-300)[:, None]
    sxx, syy, szz, sxy, syz, szx = s6.T
    vm = np.sqrt(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3 * (sxy**2 + syz**2 + szx**2)
    )
    return u, s6, vm
