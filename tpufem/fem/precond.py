"""Thickness-line block-Jacobi preconditioner for the structured wing mesh.

Why: the wing is a thin structure; a tensor-grid tet mesh has through-thickness
cells orders of magnitude smaller than in-plane cells near the LE/TE, so the
Jacobi-preconditioned stiffness has kappa ~ 1e7+ and float32 CG diverges
(measured; SURVEY.md §7 hard part 2). The strong coupling is exactly along the
thickness "lines" — each (chord, span) grid station's (n_thick+1) nodes. Solving
those lines exactly (classic line relaxation for anisotropic problems) removes
the anisotropy-driven part of the spectrum; the remaining in-plane conditioning
is ordinary O(1/h^2).

TPU mapping: the welded node numbering is station-major (tpufem.mesher), so the
apply is   gather r -> (S, D) ; batched (S,D,D) matvec on the MXU ; scatter back
— no irregular access beyond one take/put. Block assembly reuses the element
gradients: only same-station node pairs contribute, enumerated once per topology
on the host; per-case values are a fused gather + 3x3 outer products +
segment_sum, all inside jit/vmap.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.mesher import WingTopology


@dataclass(frozen=True)
class LinePrecondPlan:
    """Topology-constant scatter plan (host-precomputed, hashable by identity)."""

    pair_t: np.ndarray  # (P,) tet index of each same-station node pair
    pair_a: np.ndarray  # (P,) local corner a in 0..3
    pair_b: np.ndarray  # (P,) local corner b in 0..3
    pair_seg: np.ndarray  # (P,) flat segment base: station*D*D + (3*slot_a)*D + 3*slot_b
    station_nodes: np.ndarray  # (S, K) node id per slot (duplicated node 0 on empty slots)
    slot_valid: np.ndarray  # (S, K) 1.0 where the slot holds a real node
    node_station: np.ndarray  # (N,) station of each node
    node_slot: np.ndarray  # (N,) slot of each node
    num_stations: int
    K: int  # slots per station
    D: int  # block dim = 3*K


def build_line_plan(topo: WingTopology) -> LinePrecondPlan:
    return build_line_plan_arrays(
        topo.tets, topo.station_id, topo.slot, topo.num_stations,
        topo.slots_per_station, topo.num_nodes,
    )


def build_line_plan_arrays(
    tets: np.ndarray,
    station_id: np.ndarray,
    slot: np.ndarray,
    num_stations: int,
    slots_per_station: int,
    num_nodes: int,
) -> LinePrecondPlan:
    st = np.asarray(station_id)
    sl = np.asarray(slot)
    S = int(num_stations)
    K = int(slots_per_station)
    D = 3 * K

    tets = np.asarray(tets).astype(np.int64)
    n_corners = tets.shape[1]  # 4 for tet4, 10 for tet10
    cst = st[tets]  # (T, n_corners)
    csl = sl[tets]
    ti, ai, bi = [], [], []
    for a in range(n_corners):
        for b in range(n_corners):
            same = cst[:, a] == cst[:, b]
            idx = np.nonzero(same)[0]
            ti.append(idx)
            ai.append(np.full(len(idx), a))
            bi.append(np.full(len(idx), b))
    pair_t = np.concatenate(ti)
    pair_a = np.concatenate(ai)
    pair_b = np.concatenate(bi)
    st_p = cst[pair_t, pair_a]
    sa = csl[pair_t, pair_a]
    sb = csl[pair_t, pair_b]
    pair_seg = st_p.astype(np.int64) * (D * D) + (3 * sa) * D + 3 * sb

    station_nodes = np.zeros((S, K), dtype=np.int32)
    slot_valid = np.zeros((S, K), dtype=np.float32)
    station_nodes[st, sl] = np.arange(num_nodes, dtype=np.int32)
    slot_valid[st, sl] = 1.0

    return LinePrecondPlan(
        pair_t=pair_t.astype(np.int32),
        pair_a=pair_a.astype(np.int8),
        pair_b=pair_b.astype(np.int8),
        pair_seg=pair_seg,
        station_nodes=station_nodes,
        slot_valid=slot_valid,
        node_station=st.astype(np.int32),
        node_slot=sl.astype(np.int32),
        num_stations=S,
        K=K,
        D=D,
    )


def plan_device_arrays(plan: LinePrecondPlan) -> dict:
    """Plan as a jit-traceable pytree of index arrays."""
    return {
        "pair_t": jnp.asarray(plan.pair_t),
        "pair_a": jnp.asarray(plan.pair_a.astype(np.int32)),
        "pair_b": jnp.asarray(plan.pair_b.astype(np.int32)),
        "pair_seg": jnp.asarray(plan.pair_seg),
        "station_nodes": jnp.asarray(plan.station_nodes),
        "slot_valid": jnp.asarray(plan.slot_valid),
        "node_station": jnp.asarray(plan.node_station),
        "node_slot": jnp.asarray(plan.node_slot),
    }


def line_blocks(plan, grads, vols, lam, mu, free_mask, S=None, K=None):
    """Assemble and invert the per-station blocks -> (S, D, D) inverse factors.

    K_{ai,bj} = V*(lam*g_ai*g_bj + mu*g_aj*g_bi + mu*delta_ij*(g_a.g_b)) for
    same-station pairs; constrained/padded dofs replaced by identity rows so the
    blocks stay SPD.

    `plan` is a LinePrecondPlan or the dict from plan_device_arrays (then S, K
    must be given).
    """
    if isinstance(plan, LinePrecondPlan):
        S, K = plan.num_stations, plan.K
        plan = plan_device_arrays(plan)
    ga = grads[plan["pair_t"], plan["pair_a"]]  # (P,3)
    gb = grads[plan["pair_t"], plan["pair_b"]]
    v = vols[plan["pair_t"]]
    eye = jnp.eye(3, dtype=grads.dtype)
    kab = v[:, None, None] * (
        lam * ga[:, :, None] * gb[:, None, :]
        + mu * gb[:, :, None] * ga[:, None, :]
        + mu * (ga * gb).sum(axis=1)[:, None, None] * eye
    )  # (P,3,3)
    return line_blocks_from_pairs(kab, plan, free_mask, S, K)


def line_blocks_from_pairs(kab, plan, free_mask, S, K):
    """Scatter precomputed (P,3,3) same-station pair blocks into per-station
    matrices, apply BC masking, scale, invert. Shared by the tet4 path
    (line_blocks); the tet10 path builds its blocks with sliced loops
    (tet10_line_blocks)."""
    D = 3 * K
    offs = jnp.arange(3)
    seg = (
        plan["pair_seg"][:, None, None]
        + offs[None, :, None] * D
        + offs[None, None, :]
    ).reshape(-1)
    flat = jax.ops.segment_sum(kab.reshape(-1), seg, num_segments=S * D * D)
    B = flat.reshape(S, D, D)

    # dof validity: slot present AND free
    free3 = free_mask.reshape(-1, 3)
    fm = free3[plan["station_nodes"]]  # (S,K,3)
    fm = fm * plan["slot_valid"][:, :, None]
    m = fm.reshape(S, D)
    B = B * m[:, :, None] * m[:, None, :]
    B = B + jnp.eye(D, dtype=B.dtype)[None] * (1.0 - m)[:, :, None]
    return spd_block_inverse(B)


# ----------------------------------------------------- RBM two-level (single)


def build_rbm_groups(station_id, slot, ni: int, nj: int, group=(4, 4)):
    """(node_group (N,) int32, n_groups) for rigid-body-mode aggregation:
    (group x group station) x full-thickness aggregates."""
    st = np.asarray(station_id).astype(np.int64)
    ii, jj = st // nj, st % nj
    ngj = (nj + group[1] - 1) // group[1]
    ngi = (ni + group[0] - 1) // group[0]
    node_group = ((ii // group[0]) * ngj + (jj // group[1])).astype(np.int32)
    return node_group, int(ngi * ngj)


def _rbm_basis(d):
    """(M,3) offsets -> (M,3,6) node RBM basis [I | e_k x d]."""
    z = jnp.zeros_like(d[:, 0])
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    rx = jnp.stack([z, -dz, dy], axis=1)
    ry = jnp.stack([dz, z, -dx], axis=1)
    rz = jnp.stack([-dy, dx, z], axis=1)
    ident = jnp.broadcast_to(jnp.eye(3, dtype=d.dtype)[None], (d.shape[0], 3, 3))
    rot = jnp.stack([rx, ry, rz], axis=2)
    return jnp.concatenate([ident, rot], axis=2)  # (M,3,6)


def rbm_coarse_inverse(
    node_group, n_groups: int, tets, nodes, grads, vols, lam, mu, free_mask,
    ridge: float = 3e-4,
):
    """(Ac_inv (nc,nc), dvec (N,3)) for the RBM coarse correction.

    See tpufem.fem.batched_t for the measured motivation: the line
    preconditioner alone leaves O(1/h^2) in-plane conditioning that defeats
    f32 CG at ~100k DOF, and piecewise-constant coarse spaces cannot represent
    bending; per-group rigid-body modes can.
    """
    G = n_groups
    nc = 6 * G
    N = nodes.shape[0]
    cnt = jax.ops.segment_sum(jnp.ones((N,), nodes.dtype), node_group, num_segments=G)
    xg = jax.ops.segment_sum(nodes, node_group, num_segments=G) / jnp.maximum(cnt, 1.0)[:, None]
    dvec = nodes - xg[node_group]  # (N,3)

    free3 = free_mask.reshape(-1, 3)
    eye3 = jnp.eye(3, dtype=nodes.dtype)
    tg = node_group[tets]  # (T, corners)
    n_corners = tets.shape[1]
    Ac_flat = jnp.zeros((nc * nc,), nodes.dtype)
    offs6 = jnp.arange(6)
    for a in range(n_corners):
        Pa = _rbm_basis(dvec[tets[:, a]])  # (T,3,6)
        ga = grads[:, a]
        fa = free3[tets[:, a]]
        for c in range(n_corners):
            gb = grads[:, c]
            kab = vols[:, None, None] * (
                lam * ga[:, :, None] * gb[:, None, :]
                + mu * gb[:, :, None] * ga[:, None, :]
                + mu * (ga * gb).sum(axis=1)[:, None, None] * eye3
            )
            fb = free3[tets[:, c]]
            kab = kab * fa[:, :, None] * fb[:, None, :]
            Pb = _rbm_basis(dvec[tets[:, c]])
            tmp = (Pa[:, :, :, None] * kab[:, :, None, :]).sum(axis=1)  # (T,6,3)
            blk = (tmp[:, :, :, None] * Pb[:, None, :, :]).sum(axis=2)  # (T,6,6)
            base = tg[:, a].astype(jnp.int64) * 6 * nc + tg[:, c].astype(jnp.int64) * 6
            idx = (base[:, None, None] + offs6[None, :, None] * nc + offs6[None, None, :]).reshape(-1)
            Ac_flat = Ac_flat + jax.ops.segment_sum(blk.reshape(-1), idx, num_segments=nc * nc)
    Ac = Ac_flat.reshape(nc, nc)
    dg = jnp.diagonal(Ac)
    act = (dg > 1e-8 * dg.max()).astype(nodes.dtype)
    Ac = Ac * act[:, None] * act[None, :] + jnp.eye(nc, dtype=nodes.dtype) * (1.0 - act)
    Ac_inv = spd_block_inverse(Ac[None], ns_iters=40, ridge=ridge)[0]
    return Ac_inv, dvec


def make_rbm_two_level(M_line, Ac_inv, node_group, n_groups: int, dvec, free_mask):
    """M(r) = M_line(r) + P Ac^-1 P^T r with RBM prolongation."""
    free3 = free_mask.reshape(-1, 3)

    def cross(u, v):
        return jnp.stack(
            [
                u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
                u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
                u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0],
            ],
            axis=1,
        )

    def M(r_flat):
        z1 = M_line(r_flat)
        r = r_flat.reshape(-1, 3) * free3
        rc_t = jax.ops.segment_sum(r, node_group, num_segments=n_groups)
        rc_r = jax.ops.segment_sum(cross(dvec, r), node_group, num_segments=n_groups)
        rc = jnp.concatenate([rc_t, rc_r], axis=1).reshape(-1)  # (nc,)
        zc = (Ac_inv * rc[None, :]).sum(axis=1).reshape(n_groups, 6)
        zt = zc[:, :3][node_group]
        zw = zc[:, 3:][node_group]
        z2 = (zt + cross(zw, dvec)) * free3
        return z1 + z2.reshape(-1)

    return M


def spd_block_inverse(B, ns_iters: int = 30, ridge: float = 0.0):
    """Batched SPD inverse: symmetric Jacobi scaling + Newton-Schulz iteration.

    Two reasons over jnp.linalg.inv: (1) raw blocks inherit the mesh's
    anisotropic conditioning (diag spread ~1e6+), which f32 LU cannot handle —
    scaling makes blocks O(1)-conditioned; (2) LU decompositions lower to long
    scalar loops on TPU (and LuDecomposition f64 is unsupported outright) while
    Newton-Schulz is nothing but batched MXU matmuls:
        X_{k+1} = X_k (2I - B X_k),  X_0 = I / lambda_max_bound,
    error contracting quadratically. 30 iterations reach ~machine precision
    for block condition numbers up to ~1e6.
    """
    S, D = B.shape[0], B.shape[-1]
    B = 0.5 * (B + jnp.swapaxes(B, 1, 2))  # kill accumulation asymmetry
    d = jnp.einsum("sii->si", B)
    s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))
    Bs = B * s[:, :, None] * s[:, None, :]
    eye = jnp.eye(D, dtype=B.dtype)
    if ridge:
        # f32 assembly round-off can leave the scaled matrix microscopically
        # indefinite (measured eig ~ -1e-5 on the 2k-dof coarse operator),
        # which makes Newton-Schulz diverge; a relative ridge restores SPD.
        Bs = Bs + ridge * eye[None]
    # Gershgorin upper bound on lambda_max of the scaled block
    lmax = jnp.abs(Bs).sum(axis=-1).max(axis=-1)  # (S,)
    X = eye[None] / lmax[:, None, None]
    two_eye = 2.0 * eye[None]

    def step(X, _):
        BX = jnp.einsum("sij,sjk->sik", Bs, X, precision="highest")
        X = jnp.einsum("sij,sjk->sik", X, two_eye - BX, precision="highest")
        return X, None

    X, _ = jax.lax.scan(step, X, None, length=ns_iters)
    X = 0.5 * (X + jnp.swapaxes(X, 1, 2))  # SPD apply needs exact symmetry
    return X * s[:, :, None] * s[:, None, :]


def make_line_preconditioner(plan, Binv, S=None, K=None):
    """Return M(r_flat) -> z_flat applying the inverted station blocks."""
    if isinstance(plan, LinePrecondPlan):
        S, K = plan.num_stations, plan.K
        plan = plan_device_arrays(plan)
    D = 3 * K
    station_nodes = plan["station_nodes"]
    node_station = plan["node_station"]
    node_slot = plan["node_slot"]

    def M(r_flat):
        r3 = r_flat.reshape(-1, 3)
        rs = r3[station_nodes].reshape(S, D)  # gather lines
        # broadcast matvec (tiny batched dims lower poorly as einsum on TPU)
        zs = (Binv * rs[:, None, :]).sum(axis=2)
        zs = zs.reshape(S, K, 3)
        return zs[node_station, node_slot].reshape(-1)  # scatter back

    return M
