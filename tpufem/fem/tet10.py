"""Tet10 (quadratic C3D10) elements: mesh promotion, matrix-free operator,
loads, stress recovery — the ~1M-DOF scale config (BASELINE.json config 5).

The reference never goes beyond CalculiX C3D4; tet10 is the rebuild's refined
configuration. Design mirrors the tet4 tensor form (tpufem.fem.elements): with
straight edges the Jacobian is constant per element, so only inv(J) (T,3,3) and
V (T,) are stored; quadrature-point shape gradients come from a constant
(Q,10,3) reference table contracted with inv(J) on the fly. 4-point Gauss
quadrature integrates the (linear-strain)^2 stiffness exactly.

Node order: corners 0-3, then midpoints of edges
(0,1), (1,2), (2,0), (0,3), (1,3), (2,3) (CalculiX C3D10 convention).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.mesh_types import Mesh

_EDGES = np.array([(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)], dtype=np.int64)

# 4-point Gauss rule on the tet (degree-2 exact), barycentric a=0.5854102, b=0.1381966
_A, _B = 0.5854101966249685, 0.13819660112501053
GAUSS_POINTS = np.array(
    [
        [_A, _B, _B, _B],
        [_B, _A, _B, _B],
        [_B, _B, _A, _B],
        [_B, _B, _B, _A],
    ]
)  # barycentric (lambda0..lambda3)
GAUSS_WEIGHT = 0.25  # x V each


def _dndxi_table() -> np.ndarray:
    """(Q, 10, 3) gradients of the 10 shape functions wrt (xi1, xi2, xi3)
    where lambda0 = 1-xi1-xi2-xi3, lambda_i = xi_i."""
    # dlambda/dxi: (4,3)
    dl = np.array([[-1.0, -1.0, -1.0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    out = np.zeros((len(GAUSS_POINTS), 10, 3))
    for q, lam in enumerate(GAUSS_POINTS):
        # corners: N_a = lam_a*(2 lam_a - 1) -> dN = (4 lam_a - 1) dlam_a
        for a in range(4):
            out[q, a] = (4 * lam[a] - 1) * dl[a]
        # midsides: N = 4 lam_a lam_b -> dN = 4 (lam_a dlam_b + lam_b dlam_a)
        for e, (a, b) in enumerate(_EDGES):
            out[q, 4 + e] = 4 * (lam[a] * dl[b] + lam[b] * dl[a])
    return out


DNDXI = _dndxi_table()  # (4, 10, 3)


@dataclass
class Tet10Mesh:
    """Quadratic mesh derived from a tet4 Mesh."""

    mesh4: Mesh
    tet10: np.ndarray  # (T,10) int32
    edge_endpoints: np.ndarray  # (M,2) int32 corner-node ids per midpoint node
    surf_t6: np.ndarray  # (F,6) int32 quadratic boundary triangles (outward)
    num_nodes: int  # N4 + M
    station_id: np.ndarray | None = None  # doubled-grid stations (structured only)
    slot: np.ndarray | None = None
    num_stations: int = 0
    slots_per_station: int = 0

    def nodes10(self, nodes4: np.ndarray | jnp.ndarray):
        """Node coordinates: corners then straight-edge midpoints (works with
        numpy or traced jnp arrays — the midpoint map is linear, so the
        vmapped params->nodes pipeline extends to tet10 unchanged)."""
        xp = jnp if not isinstance(nodes4, np.ndarray) else np
        mids = 0.5 * (nodes4[self.edge_endpoints[:, 0]] + nodes4[self.edge_endpoints[:, 1]])
        return xp.concatenate([nodes4, mids], axis=0)


def tet10_from_tet4(mesh: Mesh) -> Tet10Mesh:
    """Promote a tet4 mesh: unique edges -> midpoint nodes, T6 boundary faces,
    and (for structured wing meshes) doubled-grid station/slot assignment for
    the thickness-line preconditioner."""
    tets = mesh.tets.astype(np.int64)
    N4 = mesh.num_nodes
    edges = np.sort(tets[:, _EDGES].reshape(-1, 2), axis=1)  # (T*6, 2)
    uniq, inv = np.unique(edges, axis=0, return_inverse=True)
    mid_id = N4 + np.arange(len(uniq))
    tet10 = np.concatenate([tets, mid_id[inv].reshape(-1, 6)], axis=1).astype(np.int32)

    # boundary T6 faces: corner faces from mesh.surf_faces + their edge midpoints
    edge_lookup = {tuple(e): i for i, e in enumerate(map(tuple, uniq))}
    sf = mesh.surf_faces.astype(np.int64)
    fe = []
    for pair in ((0, 1), (1, 2), (2, 0)):
        key = np.sort(sf[:, pair], axis=1)
        idx = np.array([edge_lookup[tuple(k)] for k in map(tuple, key)], dtype=np.int64)
        fe.append(N4 + idx)
    surf_t6 = np.concatenate([sf, np.stack(fe, axis=1)], axis=1).astype(np.int32)

    st = sl = None
    S = K = 0
    meta = mesh.meta or {}
    if "station_id" in meta and "num_span_stations" in meta:
        # every tet10 node is a point of the 2x-refined structured grid:
        # corner (i,j,k) -> (2i,2j,2k); midpoint -> sum of endpoints' indices
        st4 = np.asarray(meta["station_id"], dtype=np.int64)
        sl4 = np.asarray(meta["slot"], dtype=np.int64)
        NJ = int(meta["num_span_stations"])  # station = i*NJ + j
        i4, j4 = st4 // NJ, st4 % NJ
        i2 = np.concatenate([2 * i4, i4[uniq[:, 0]] + i4[uniq[:, 1]]])
        j2 = np.concatenate([2 * j4, j4[uniq[:, 0]] + j4[uniq[:, 1]]])
        k2 = np.concatenate([2 * sl4, sl4[uniq[:, 0]] + sl4[uniq[:, 1]]])
        NJ2 = 2 * NJ - 1
        st = (i2 * NJ2 + j2).astype(np.int32)
        sl = k2.astype(np.int32)
        NI2 = int(i2.max()) + 1
        S = NI2 * NJ2
        K = int(k2.max()) + 1

    return Tet10Mesh(
        mesh4=mesh,
        tet10=tet10,
        edge_endpoints=uniq.astype(np.int32),
        surf_t6=surf_t6,
        num_nodes=N4 + len(uniq),
        station_id=st,
        slot=sl,
        num_stations=S,
        slots_per_station=K,
    )


def tet10_setup(nodes10, tet10, tet_mask=None):
    """Constant per-element inv(J) and volume (straight-edge tet10)."""
    x = nodes10[tet10[:, :4]]  # corner geometry defines the affine map
    e = x[:, 1:] - x[:, :1]
    det = jnp.linalg.det(e)
    vols = det / 6.0
    safe_det = jnp.where(jnp.abs(det) > 0, det, 1.0)
    c0 = jnp.cross(e[:, 1], e[:, 2])
    c1 = jnp.cross(e[:, 2], e[:, 0])
    c2 = jnp.cross(e[:, 0], e[:, 1])
    inv = jnp.stack([c0, c1, c2], axis=2) / safe_det[:, None, None]  # inv(J)
    valid = jnp.abs(det) > 0
    if tet_mask is not None:
        valid = valid & (tet_mask > 0)
    inv = jnp.where(valid[:, None, None], inv, 0.0)
    vols = jnp.where(valid, vols, 0.0)
    return inv, vols


def _quad_grads(Jinv, dtype):
    """(T,Q,10,3) physical gradients.

    With x = x0 + J^T xi (J rows = corner edge vectors), grad_x xi_i is column i
    of inv(J), so grad_x N = inv(J) @ dN/dxi — matching the tet4 convention
    (tpufem.fem.elements: g_a = columns of inv(J)).
    """
    table = jnp.asarray(DNDXI, dtype=dtype)  # (Q,10,3)
    # broadcast-sum (tiny batched einsums pad badly onto the TPU MXU)
    return (table[None, :, :, None, :] * Jinv[:, None, None, :, :]).sum(axis=-1)


def _tet10_fe(Jinv, vols, conn, u_nodes, lam, mu):
    """Per-element internal force (T,10,3) for y = K u."""
    g = _quad_grads(Jinv, u_nodes.dtype)  # (T,Q,10,3)
    ue = u_nodes[conn]  # (T,10,3)
    H = (g[:, :, :, :, None] * ue[:, None, :, None, :]).sum(axis=2)  # (T,Q,3,3)
    eps = 0.5 * (H + jnp.swapaxes(H, 2, 3))
    tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
    sigma = 2.0 * mu * eps
    idx = jnp.arange(3)
    sigma = sigma.at[..., idx, idx].add(lam * tr[..., None])
    w = (GAUSS_WEIGHT * vols)[:, None]  # (T,1) per-q weight
    sw = sigma * w[..., None, None]  # (T,Q,3,3)
    return (sw[:, :, None, :, :] * g[:, :, :, None, :]).sum(axis=(1, 4))  # (T,10,3)


def tet10_force(Jinv, vols, tet10, u_nodes, lam, mu, num_nodes, elem_chunk=None):
    """y = K u for tet10, quadrature-point tensor form.

    elem_chunk bounds the per-dispatch element temporaries: the dense form
    materializes (T,Q,10,3,3) intermediates — ~1.7 GB in f64 at the ~2.5M-DOF
    flagship mesh, several live at once, which OOMs a 16 GB chip (measured:
    TPU worker crash). Chunking scans element blocks and accumulates into the
    (N,3) output, trading one fused kernel for bounded HBM."""
    T = tet10.shape[0]
    if elem_chunk is None or T <= elem_chunk:
        fe = _tet10_fe(Jinv, vols, tet10, u_nodes, lam, mu)
        return jax.ops.segment_sum(
            fe.reshape(-1, 3), tet10.reshape(-1), num_segments=num_nodes
        )
    nc = -(-T // elem_chunk)
    pad = nc * elem_chunk - T
    # zero-volume padding contributes exactly zero force
    Jp = jnp.pad(Jinv, ((0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(vols, (0, pad))
    cp = jnp.pad(tet10, ((0, pad), (0, 0)))
    Jr = Jp.reshape(nc, elem_chunk, 3, 3)
    vr = vp.reshape(nc, elem_chunk)
    cr = cp.reshape(nc, elem_chunk, 10)

    def body(y, blk):
        Jc, vc, cc = blk
        fe = _tet10_fe(Jc, vc, cc, u_nodes, lam, mu)
        y = y + jax.ops.segment_sum(
            fe.reshape(-1, 3), cc.reshape(-1), num_segments=num_nodes
        )
        return y, None

    y0 = jnp.zeros((num_nodes, 3), dtype=u_nodes.dtype)
    y, _ = jax.lax.scan(body, y0, (Jr, vr, cr))
    return y


def tet10_operator(Jinv, vols, tet10, lam, mu, num_nodes, free_mask):
    free3 = free_mask.reshape(-1, 3)

    def apply(x_flat):
        u = x_flat.reshape(-1, 3) * free3
        y = tet10_force(Jinv, vols, tet10, u, lam, mu, num_nodes)
        y = y * free3 + x_flat.reshape(-1, 3) * (1.0 - free3)
        return y.reshape(-1)

    return apply


def tet10_diagonal(Jinv, vols, tet10, lam, mu, num_nodes, free_mask):
    g = _quad_grads(Jinv, Jinv.dtype)  # (T,Q,10,3)
    g2 = g**2
    gg = g2.sum(axis=3, keepdims=True)
    w = (GAUSS_WEIGHT * vols)[:, None, None, None]
    d = (w * ((lam + mu) * g2 + mu * gg)).sum(axis=1)  # (T,10,3)
    diag = jax.ops.segment_sum(d.reshape(-1, 3), tet10.reshape(-1), num_segments=num_nodes)
    diag = diag.reshape(-1)
    diag = jnp.where((free_mask > 0) & (diag > 0), diag, 1.0)
    return diag


def tet10_line_blocks(Jinv, vols, tet10, station_id, slot, lam, mu, free_mask, S: int, K: int):
    """Inverted per-station line blocks (S,D,D) for tet10.

    Loops over the 100 (a,b) corner combinations with SLICED gradient access —
    per-pair fancy gathers of (P, Q, 3) arrays pad 42x on TPU (measured: OOM at
    ~1M DOF), while slices g[:, :, a] are free. Same-station masks and segment
    bases come from the station/slot arrays; off-station pairs contribute zero.
    """
    from tpufem.fem.precond import spd_block_inverse

    g = _quad_grads(Jinv, Jinv.dtype)  # (T,Q,10,3)
    w = GAUSS_WEIGHT * vols  # (T,) per-quad-point weight (equal weights)
    eye = jnp.eye(3, dtype=Jinv.dtype)
    D = 3 * K
    st = station_id[tet10]  # (T,10)
    sl = slot[tet10]
    flat = jnp.zeros((S * D * D,), Jinv.dtype)
    offs = jnp.arange(3)
    for a in range(10):
        ga = g[:, :, a]  # (T,Q,3)
        for b in range(10):
            gb = g[:, :, b]
            same = (st[:, a] == st[:, b]).astype(Jinv.dtype)  # (T,)
            wv = w * same
            # sum over quadrature points: wv * [lam ga gb^T + mu gb ga^T + mu (ga.gb) I]
            outer_ab = (ga[:, :, :, None] * gb[:, :, None, :]).sum(axis=1)  # (T,3,3)
            outer_ba = jnp.swapaxes(outer_ab, 1, 2)
            dot = (ga * gb).sum(axis=(1, 2))  # (T,)
            kab = wv[:, None, None] * (lam * outer_ab + mu * outer_ba)
            kab = kab + (wv * mu * dot)[:, None, None] * eye
            base = st[:, a].astype(jnp.int64) * (D * D) + (3 * sl[:, a]) * D + 3 * sl[:, b]
            idx = (
                base[:, None, None] + offs[None, :, None] * D + offs[None, None, :]
            ).reshape(-1)
            flat = flat + jax.ops.segment_sum(kab.reshape(-1), idx, num_segments=S * D * D)
    B = flat.reshape(S, D, D)
    # BC/padding masking identical to line_blocks_from_pairs
    free3 = free_mask.reshape(-1, 3)
    # station_nodes map: build via scatter of node ids (host-free, traced ok)
    # caller passes masks through free_mask only; slots always valid for tet10
    # (every (station,slot) is occupied on the doubled grid)
    # -> mask rows/cols of constrained dofs:
    # dof (s, 3*k+i) is free iff the node at (s,k) is free; gather via argsort
    # trick is avoided by scattering free values:
    mvec = jnp.zeros((S, K, 3), Jinv.dtype)
    mvec = mvec.at[station_id, slot].set(free3)
    m = mvec.reshape(S, D)
    B = B * m[:, :, None] * m[:, None, :]
    B = B + jnp.eye(D, dtype=B.dtype)[None] * (1.0 - m)[:, :, None]
    return spd_block_inverse(B)


def pressure_loads_t6(nodes10, t6_faces, pressure, num_nodes, face_mask=None):
    """Consistent nodal loads for uniform pressure on quadratic triangles:
    corner shares are exactly 0 and each midside carries A*p/3 (standard T6
    consistent load vector with straight edges)."""
    v = nodes10[t6_faces[:, :3]]
    area_vec = 0.5 * jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])  # A n_hat
    f_mid = (-pressure / 3.0) * area_vec  # per midside node
    if face_mask is not None:
        f_mid = f_mid * face_mask[:, None]
    f6 = jnp.broadcast_to(f_mid[:, None, :], (t6_faces.shape[0], 3, 3))
    return jax.ops.segment_sum(
        f6.reshape(-1, 3), t6_faces[:, 3:].reshape(-1), num_segments=num_nodes
    )


def solve_tet10_case(
    t10: Tet10Mesh,
    nroot_nodes10: np.ndarray,
    upper_t6: np.ndarray,
    pressure: float,
    material=None,
    tol: float = 1e-6,
    maxiter: int = 20000,
    dtype=jnp.float32,
    chunk_iters: int = 0,
    two_level: bool = True,
    nj2: int | None = None,
):
    """Full tet10 linear-static solve (host-facing).

    Returns (u (N,3), vm (N,), iters, rel_residual, converged) over the tet10
    node set. Uses the thickness-line preconditioner (+ RBM two-level coarse
    correction when two_level and the doubled-grid stations are available;
    nj2 = span station count of the doubled grid, i.e. 2*(n_span+1)-1),
    Jacobi otherwise. chunk_iters > 0 bounds each device dispatch.
    """
    from tpufem.fem.bc import dirichlet_mask
    from tpufem.fem.material import Material, lame_params
    from tpufem.fem.precond import (
        build_rbm_groups,
        make_line_preconditioner,
        make_rbm_two_level,
        rbm_coarse_inverse,
    )
    from tpufem.fem.solver import pcg
    from tpufem.fem.vonmises import von_mises

    material = material or Material()
    lam, mu = lame_params(material)
    lam = jnp.asarray(lam, dtype)
    mu = jnp.asarray(mu, dtype)
    nodes10 = jnp.asarray(t10.nodes10(t10.mesh4.nodes), dtype)
    conn = jnp.asarray(t10.tet10)
    N = t10.num_nodes
    free = dirichlet_mask(N, nroot_nodes10, dtype=dtype)
    Jinv, vols = tet10_setup(nodes10, conn)
    f = pressure_loads_t6(nodes10, jnp.asarray(upper_t6), jnp.asarray(pressure, dtype), N)
    b = f.reshape(-1) * free
    A = tet10_operator(Jinv, vols, conn, lam, mu, N, free)

    if t10.station_id is not None:
        S, K = t10.num_stations, t10.slots_per_station
        st_j = jnp.asarray(t10.station_id.astype(np.int32))
        sl_j = jnp.asarray(t10.slot.astype(np.int32))
        Binv = jax.jit(
            lambda Jv, vl, fm: tet10_line_blocks(
                Jv, vl, conn, st_j, sl_j, lam, mu, fm, S=S, K=K
            ),
            static_argnames=(),
        )(Jinv, vols, free)
        station_nodes = np.zeros((S, K), np.int32)
        station_nodes[t10.station_id, t10.slot] = np.arange(N, dtype=np.int32)
        arrs = {
            "station_nodes": jnp.asarray(station_nodes),
            "node_station": st_j,
            "node_slot": sl_j,
        }
        M = make_line_preconditioner(arrs, Binv, S=S, K=K)
        if two_level and nj2 is not None:
            ni2 = t10.num_stations // nj2
            node_group, n_groups = build_rbm_groups(
                t10.station_id, t10.slot, ni2, nj2, group=(8, 8)
            )
            grads_c = _quad_grads(Jinv, dtype).mean(axis=1)  # (T,10,3) avg-point grads
            Ac_inv, dvec = rbm_coarse_inverse(
                jnp.asarray(node_group), n_groups, conn, nodes10,
                grads_c, vols, lam, mu, free,
            )
            M = make_rbm_two_level(M, Ac_inv, jnp.asarray(node_group), n_groups, dvec, free)
    else:
        diag = tet10_diagonal(Jinv, vols, conn, lam, mu, N, free)
        inv_diag = 1.0 / diag
        M = lambda r: inv_diag * r  # noqa: E731

    run = jax.jit(
        lambda rhs, x0, it: pcg(A, rhs, M=M, x0=x0, tol=tol, maxiter=it),
        static_argnames=("it",),
    )
    x = jnp.zeros_like(b)
    total = 0
    rel = np.inf
    conv = False
    step = chunk_iters or maxiter
    while total < maxiter:
        it = min(step, maxiter - total)
        res = run(b, x, it)
        x = res.x
        total += int(res.iters)
        rel = float(res.rel_residual)
        conv = bool(res.converged)
        if conv or int(res.iters) < it:
            break

    u = (x * free).reshape(-1, 3)
    s6 = tet10_stress_nodal(Jinv, vols, conn, u, lam, mu, N)
    vm = von_mises(s6)
    return (np.asarray(u), np.asarray(vm), total, rel, conv)


def tet10_root_nodes(t10: Tet10Mesh, y_tol: float = 1e-4) -> np.ndarray:
    nodes10 = t10.nodes10(t10.mesh4.nodes)
    return np.nonzero(nodes10[:, 1] <= y_tol)[0].astype(np.int32)


def tet10_upper_t6(t10: Tet10Mesh, upper_face_idx: np.ndarray) -> np.ndarray:
    """T6 faces corresponding to tet4 boundary-set face indices (the T6 face
    array is built in the same order as mesh.surf_faces)."""
    return t10.surf_t6[np.asarray(upper_face_idx)]


def tet10_stress_nodal(Jinv, vols, tet10, u_nodes, lam, mu, num_nodes):
    """Quad-point stresses -> volume-weighted nodal (N,6) Voigt average."""
    g = _quad_grads(Jinv, u_nodes.dtype)
    ue = u_nodes[tet10]
    H = (g[:, :, :, :, None] * ue[:, None, :, None, :]).sum(axis=2)
    eps = 0.5 * (H + jnp.swapaxes(H, 2, 3))
    tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
    sigma = 2.0 * mu * eps
    idx = jnp.arange(3)
    sigma = sigma.at[..., idx, idx].add(lam * tr[..., None])
    sig_mean = sigma.mean(axis=1)  # element-average stress (T,3,3)
    voigt = jnp.stack(
        [
            sig_mean[:, 0, 0],
            sig_mean[:, 1, 1],
            sig_mean[:, 2, 2],
            sig_mean[:, 0, 1],
            sig_mean[:, 1, 2],
            sig_mean[:, 2, 0],
        ],
        axis=1,
    )
    w = vols
    contrib = (w[:, None] * voigt)[:, None, :] * jnp.ones((1, 10, 1), voigt.dtype)
    num = jax.ops.segment_sum(contrib.reshape(-1, 6), tet10.reshape(-1), num_segments=num_nodes)
    den = jax.ops.segment_sum(
        jnp.broadcast_to(w[:, None], (w.shape[0], 10)).reshape(-1),
        tet10.reshape(-1),
        num_segments=num_nodes,
    )
    return num / jnp.maximum(den, 1e-300)[:, None]
