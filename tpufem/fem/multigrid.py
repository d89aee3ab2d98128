"""Batched geometric multigrid preconditioner for the structured wing mesh.

STATUS: CROSS-CHECK / REFERENCE IMPLEMENTATION. The production engine is
tpufem.fem.stencil_mg (same mathematics re-expressed as grid slicing —
measured 4.4x faster SpMV); this layout-agnostic form remains because (a) its
coarsest-level host machinery (_level_host, coarsest_dense_inverse_host) is
imported by stencil_mg, and (b) tests/test_stencil.py asserts the two MG
preconditioners agree on the same system — the strongest cross-check of both.

Round-1 measurement: the thickness-line block-Jacobi + single RBM coarse level
leaves ~1500 CG iterations at 100k DOF (O(1/h^2) in-plane conditioning is
reduced but not eliminated by one coarse space). This module removes the h
dependence with classical geometric multigrid, exploiting that the wing mesher
(tpufem.mesher) produces NESTED station grids under 2x in-plane coarsening:
both `cosine_stations` and `le_stations` satisfy s_{2I}(n) == s_I(n/2), and
yfrac = j/n_span is trivially nested, so the coarse wing at
(n_chord/2, n_span/2, n_thick) is a true geometric coarsening of the fine wing
for ANY parameter vector in the PRD box.

Design (semi-coarsening + line smoothing — the textbook recipe for thin
anisotropic structures):
  - coarsen chord x span by 2 per level; keep the thickness axis (its strong
    coupling is solved exactly by the line blocks at every level);
  - smoother: fixed-degree Chebyshev polynomial preconditioned by the
    thickness-line block-Jacobi (tpufem.fem.precond rationale), with per-case
    lambda_max from a setup-time power iteration — a FIXED linear symmetric
    operation, so plain CG remains valid outside;
  - coarsest level: EXACT dense inverse (a few hundred dofs), Newton-Schulz in
    f64 (f32 NS on the fully-assembled coarsest matrix diverges on TPU —
    measured NaN lanes at DOF100K; the f64 work is a one-off setup matmul);
  - transfers: bilinear interpolation in station (i, j) index space, identity
    along thickness; welded LE/TE nodes interpolate from the welded coarse
    node. Restriction is the exact transpose (both directions are gathers
    built from one host-side COO list — TPU gathers beat scatters, see
    tpufem.ops).

Everything runs in the trailing-batch layout (N, 3, B) of tpufem.fem.batched_t
so one V-cycle serves the whole vmapped case batch.

Reference parity note: the reference (CalculiX SPOOLES, fem.py:524-533) is a
direct solver with no preconditioning story; this module is where the TPU
rebuild earns its >=20x headline (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assembly import build_incidence
from tpufem.fem.batched_t import _cross, _det3
from tpufem.fem.precond import LinePrecondPlan, build_line_plan, spd_block_inverse
from tpufem.mesher import WingMeshResolution, WingTopology, wing_topology


# --------------------------------------------------------------------- host


@dataclass(frozen=True)
class MGTransfer:
    """Prolongation P between a fine and the next-coarser level, stored twice
    (both as gathers): parents[f] = coarse nodes feeding fine node f;
    children[c] = fine nodes fed by coarse node c (exact transpose)."""

    parents: np.ndarray  # (N_f, 4) int32
    pweights: np.ndarray  # (N_f, 4) float32
    children: np.ndarray  # (N_c, C) int32
    cweights: np.ndarray  # (N_c, C) float32


@dataclass(frozen=True)
class MGLevelHost:
    res: WingMeshResolution
    topo: WingTopology
    plan: LinePrecondPlan
    free3: np.ndarray  # (N,3) float32, 0 at root (j==0) nodes
    inc: np.ndarray
    incm: np.ndarray


@dataclass(frozen=True)
class WingHierarchy:
    levels: tuple[MGLevelHost, ...]  # [0] = finest
    transfers: tuple[MGTransfer, ...]  # len = len(levels) - 1


def _level_host(res: WingMeshResolution) -> MGLevelHost:
    topo = wing_topology(res)
    plan = build_line_plan(topo)
    NJ = res.n_span + 1
    free3 = np.ones((topo.num_nodes, 3), np.float32)
    free3[topo.station_id % NJ == 0] = 0.0  # root stations j == 0
    inc, incm = build_incidence(topo.tets, topo.num_nodes)
    return MGLevelHost(res=res, topo=topo, plan=plan, free3=free3, inc=inc, incm=incm)


def _grid_node_lookup(level: MGLevelHost):
    """(i, j, k) -> node id, collapsing welded stations to their slot-0 node."""
    plan = level.plan
    NJ = level.res.n_span + 1

    def lookup(i, j, k):
        st = i * NJ + j
        kk = np.where(plan.slot_valid[st, k] > 0, k, 0)
        return plan.station_nodes[st, kk]

    return lookup


def _build_transfer(fine: MGLevelHost, coarse: MGLevelHost) -> MGTransfer:
    """Bilinear interpolation coefficients as a COO list, then packed into
    padded parent/child gather tables (exact transposes).

    Weights are linear in the PHYSICAL station coordinates (s, yfrac), not in
    index space: chord stations are LE-clustered (tpufem.geometry.le_stations),
    and index-space 0.5/0.5 averaging mis-interpolates smooth fields there badly
    enough that the rediscretized coarse correction overshoots (measured: CG
    residual blow-up x500 at DOF100K)."""
    from tpufem.geometry import cosine_stations, le_stations

    NJ_f = fine.res.n_span + 1
    st = fine.topo.station_id.astype(np.int64)
    ri, rj = st // NJ_f, st % NJ_f
    rk = fine.topo.slot.astype(np.int64)
    N_f = fine.topo.num_nodes
    lut = _grid_node_lookup(coarse)

    s_f = (le_stations if fine.res.spacing == "le" else cosine_stations)(fine.res.n_chord)

    rows, cols, wts = [], [], []
    # i-parents: even i -> exact coarse station; odd i -> neighbors i-1, i+1
    # weighted by s-distance (coarse stations are the even fine stations)
    even_i = (ri % 2) == 0
    iL = np.where(even_i, ri, ri - 1)
    iR = np.where(even_i, ri, ri + 1)
    span_s = np.maximum(s_f[iR] - s_f[iL], 1e-300)
    wL = np.where(even_i, 1.0, (s_f[iR] - s_f[ri]) / span_s)
    i_par = [(iL // 2, wL), (iR // 2, np.where(even_i, 0.0, 1.0 - wL))]
    # j-parents: span stations are uniform -> 0.5/0.5
    even_j = (rj % 2) == 0
    j_par = [(rj // 2, np.where(even_j, 1.0, 0.5))]
    j_par.append((np.where(even_j, rj // 2, (rj + 1) // 2), np.where(even_j, 0.0, 0.5)))
    # k-parents: identity when n_thick matches; else 2x-coarsened (zfrac is
    # uniform in the slot index, so plain 0.5/0.5 for odd slots)
    if coarse.res.n_thick == fine.res.n_thick:
        k_par = [(rk, np.ones(N_f)), (rk, np.zeros(N_f))]
    elif 2 * coarse.res.n_thick == fine.res.n_thick:
        even_k = (rk % 2) == 0
        k_par = [(rk // 2, np.where(even_k, 1.0, 0.5))]
        k_par.append((np.where(even_k, rk // 2, (rk + 1) // 2), np.where(even_k, 0.0, 0.5)))
    else:
        raise ValueError("coarse n_thick must equal fine or half of it")

    fid = np.arange(N_f, dtype=np.int64)
    for ii, wi in i_par:
        for jj, wj in j_par:
            for kk, wk in k_par:
                w = wi * wj * wk
                keep = w > 0
                rows.append(fid[keep])
                cols.append(lut(ii[keep], jj[keep], kk[keep]))
                wts.append(w[keep])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols).astype(np.int64)
    wts = np.concatenate(wts).astype(np.float32)

    # parents table (each fine node has <= 8 entries; duplicate (row,col)
    # pairs from welded-station collapse are kept as separate summands)
    order = np.argsort(rows, kind="stable")
    r_s, c_s, w_s = rows[order], cols[order], wts[order]
    counts = np.bincount(r_s, minlength=N_f)
    P = int(counts.max())
    starts = np.zeros(N_f + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(len(r_s)) - starts[r_s]
    parents = np.zeros((N_f, P), np.int32)
    pweights = np.zeros((N_f, P), np.float32)
    parents[r_s, rank] = c_s
    pweights[r_s, rank] = w_s

    # children table (transpose; padded to max fan-in, welded nodes widest)
    N_c = coarse.topo.num_nodes
    order = np.argsort(cols, kind="stable")
    r_s, c_s, w_s = rows[order], cols[order], wts[order]
    counts = np.bincount(c_s, minlength=N_c)
    C = int(counts.max())
    starts = np.zeros(N_c + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(len(c_s)) - starts[c_s]
    children = np.zeros((N_c, C), np.int32)
    cweights = np.zeros((N_c, C), np.float32)
    children[c_s, rank] = r_s
    cweights[c_s, rank] = w_s
    return MGTransfer(parents, pweights, children, cweights)


def build_hierarchy(
    res: WingMeshResolution,
    n_levels: int | None = None,
    min_stations: int = 3,
) -> WingHierarchy:
    """Coarsen (n_chord, n_span) by 2 while even and >= min_stations; also
    halve n_thick while even so per-element aspect ratios stay bounded —
    in-plane-only coarsening doubles element AR per level, and the coarser
    rediscretized operators then shear-lock progressively harder than the fine
    one (measured: cond(VA) 211 vs 23 on the thin PRD-corner wing), gutting
    the coarse correction for bending."""
    resolutions = [res]
    while n_levels is None or len(resolutions) < n_levels:
        r = resolutions[-1]
        if (
            r.n_chord % 2 or r.n_span % 2
            or r.n_chord // 2 < min_stations or r.n_span // 2 < min_stations
        ):
            break
        nt = r.n_thick // 2 if (r.n_thick % 2 == 0 and r.n_thick >= 2) else r.n_thick
        resolutions.append(
            WingMeshResolution(
                r.n_chord // 2, r.n_span // 2, nt, r.te_floor_frac, r.spacing
            )
        )
    if n_levels is not None and len(resolutions) != n_levels:
        raise ValueError(
            f"cannot build {n_levels} levels from {res} (got {len(resolutions)})"
        )
    levels = tuple(_level_host(r) for r in resolutions)
    transfers = tuple(
        _build_transfer(levels[i], levels[i + 1]) for i in range(len(levels) - 1)
    )
    return WingHierarchy(levels, transfers)


# ------------------------------------------------- trailing-layout primitives


def nodes_t(basis, te_floor, p4, dtype):
    """(N,3,B) node coords from (B,4) params (same map as mesher.nodes_from_params)."""
    s, yfrac, zfrac, zbase = (basis[:, i] for i in range(4))
    span, chord, sweep, t = (p4[:, i] for i in range(4))
    y = yfrac[:, None] * span[None, :]
    x = s[:, None] * chord[None, :] + jnp.tan(jnp.deg2rad(sweep))[None, :] * y
    half = jnp.maximum(t[None, :] * zbase[:, None], jnp.asarray(te_floor, dtype) * s[:, None])
    z = chord[None, :] * half * zfrac[:, None]
    return jnp.stack([x, y, z], axis=1)


def grads_vols_t(nodes, tets):
    """Element gradients/volumes, case axis trailing: (T,4,3,B), (T,B)."""
    xt = nodes[tets]  # (T,4,3,B)
    e = xt[:, 1:] - xt[:, :1]
    det = _det3(e)
    vols = det / 6.0
    safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
    c0 = _cross(e[:, 1], e[:, 2])
    c1 = _cross(e[:, 2], e[:, 0])
    c2 = _cross(e[:, 0], e[:, 1])
    g123 = jnp.stack([c0, c1, c2], axis=1) / safe[:, None, None]
    g0 = -g123.sum(axis=1, keepdims=True)
    return jnp.concatenate([g0, g123], axis=1), vols


def force_t(grads, vols, tets, inc, incm, u, lam, mu):
    """y = K u on (N,3,B) (broadcast-sum forms: tiny batched einsums pad badly
    on the TPU MXU — see tpufem.fem.batched_t)."""
    ue = u[tets]  # (T,4,3,B)
    H = (grads[:, :, :, None, :] * ue[:, :, None, :, :]).sum(axis=1)  # (T,3,3,B)
    eps = 0.5 * (H + jnp.swapaxes(H, 1, 2))
    tr = eps[:, 0, 0] + eps[:, 1, 1] + eps[:, 2, 2]
    sig = 2.0 * mu * eps
    idx = jnp.arange(3)
    sig = sig.at[:, idx, idx].add(lam * tr[:, None, :])
    fe = vols[:, None, None, :] * (sig[:, None, :, :, :] * grads[:, :, None, :, :]).sum(axis=3)
    fe_flat = fe.reshape(-1, 3, fe.shape[-1])
    return (fe_flat[inc] * incm[:, :, None, None]).sum(axis=1)


def line_blocks_t(lv, grads, vols, lam, mu, free, dtype):
    """Inverted per-station line blocks (S,D,D,B) — trailing-layout twin of
    tpufem.fem.precond.line_blocks.

    Formulated with SLICED corner loops + (T,)-segment scatters of (T, 9B)
    values: per-pair fancy gathers materialize (P,3,B) copies whose tiny minor
    dims lane-pad 42x on TPU (measured 16.8 GB HBM at B=4, DOF100K) while the
    sliced form keeps the minor axis at 9*B."""
    S, K, D = lv["S"], lv["K"], lv["D"]
    tst, tsl = lv["tet_station"], lv["tet_slot"]  # (T, 4)
    nb = grads.shape[-1]
    eye3 = jnp.eye(3, dtype=dtype)
    acc = jnp.zeros((S * K * K + 1, 9 * nb), dtype)
    for a in range(4):
        ga = grads[:, a]  # (T,3,B) slice, no gather
        for c in range(4):
            gb = grads[:, c]
            same = tst[:, a] == tst[:, c]
            seg = jnp.where(same, tst[:, a] * (K * K) + tsl[:, a] * K + tsl[:, c], S * K * K)
            dot = (ga * gb).sum(axis=1)
            kab = vols[:, None, None, :] * (
                lam * ga[:, :, None, :] * gb[:, None, :, :]
                + mu * gb[:, :, None, :] * ga[:, None, :, :]
                + mu * dot[:, None, None, :] * eye3[None, :, :, None]
            )  # (T,3,3,B)
            acc = acc + jax.ops.segment_sum(
                kab.reshape(-1, 9 * nb), seg, num_segments=S * K * K + 1
            )
    Bm = (
        acc[:-1]
        .reshape(S, K, K, 3, 3, nb)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(S, D, D, nb)
    )
    fm = lv["free"][lv["station_nodes"]] * lv["slot_valid"][:, :, None]  # (S,K,3)
    mvec = fm.reshape(S, D)
    Bm = Bm * mvec[:, :, None, None] * mvec[:, None, :, None]
    Bm = Bm + jnp.eye(D, dtype=dtype)[None, :, :, None] * (1.0 - mvec)[:, :, None, None]
    nb = Bm.shape[-1]
    Bsq = jnp.moveaxis(Bm, -1, 1).reshape(S * nb, D, D)
    Binv = spd_block_inverse(Bsq)
    return jnp.moveaxis(Binv.reshape(S, nb, D, D), 1, -1)


def line_apply_t(lv, Binv, r):
    """z = Binv r per station line, (N,3,B) -> (N,3,B)."""
    S, K, D = lv["S"], lv["K"], lv["D"]
    rs = r[lv["station_nodes"]].reshape(S, D, -1)
    zs = (Binv * rs[:, None, :, :]).sum(axis=2)
    zs = zs.reshape(S, K, 3, -1)
    return zs[lv["node_station"], lv["node_slot"]]


def rbm_setup_t(lv, node_group, n_groups, nodes, grads, vols, lam, mu, dtype):
    """(Ac_inv (B,nc,nc), dvec (N,3,B)) — trailing-layout twin of
    tpufem.fem.precond.rbm_coarse_inverse (see there for the design notes)."""
    tets = lv["tets"]
    free3 = lv["free"]
    G = n_groups
    nc = 6 * G
    N = nodes.shape[0]
    nb = nodes.shape[-1]
    eye3 = jnp.eye(3, dtype=dtype)
    cnt = jax.ops.segment_sum(jnp.ones((N,), dtype), node_group, num_segments=G)
    xg = jax.ops.segment_sum(nodes, node_group, num_segments=G) / jnp.maximum(cnt, 1.0)[:, None, None]
    dvec = nodes - xg[node_group]  # (N,3,B)
    tet_group = node_group[tets]  # (T,4)

    def rbm(dn):  # (T,3,B) -> (T,3,6,B)
        z = jnp.zeros_like(dn[:, 0])
        dx, dy, dz = dn[:, 0], dn[:, 1], dn[:, 2]
        rx = jnp.stack([z, -dz, dy], axis=1)
        ry = jnp.stack([dz, z, -dx], axis=1)
        rz = jnp.stack([-dy, dx, z], axis=1)
        ident = jnp.broadcast_to(eye3[None, :, :, None], (dn.shape[0], 3, 3, dn.shape[-1]))
        rot = jnp.stack([rx, ry, rz], axis=2)
        return jnp.concatenate([ident, rot], axis=2)

    Ac_flat = jnp.zeros((nc * nc, nb), dtype)
    offs6 = jnp.arange(6)
    for a in range(4):
        Pa = rbm(dvec[tets[:, a]])
        ga = grads[:, a]
        fa = free3[tets[:, a]]
        for c in range(4):
            gb = grads[:, c]
            dot = (ga * gb).sum(axis=1)
            kab = vols[:, None, None, :] * (
                lam * ga[:, :, None, :] * gb[:, None, :, :]
                + mu * gb[:, :, None, :] * ga[:, None, :, :]
                + mu * dot[:, None, None, :] * eye3[None, :, :, None]
            )
            fb = free3[tets[:, c]]
            kab = kab * fa[:, :, None, None] * fb[:, None, :, None]
            Pb = rbm(dvec[tets[:, c]])
            tmp = (Pa[:, :, :, None, :] * kab[:, :, None, :, :]).sum(axis=1)
            blk = (tmp[:, :, :, None, :] * Pb[:, None, :, :, :]).sum(axis=2)
            base = (
                tet_group[:, a].astype(jnp.int64) * 6 * nc
                + tet_group[:, c].astype(jnp.int64) * 6
            )
            idx = (base[:, None, None] + offs6[None, :, None] * nc + offs6[None, None, :]).reshape(-1)
            Ac_flat = Ac_flat + jax.ops.segment_sum(blk.reshape(-1, nb), idx, num_segments=nc * nc)
    Ac = Ac_flat.reshape(nc, nc, nb)
    dg = Ac[jnp.arange(nc), jnp.arange(nc), :]
    act = (dg > 1e-8 * dg.max(axis=0, keepdims=True)).astype(dtype)
    Ac = Ac * act[:, None, :] * act[None, :, :]
    Ac = Ac + jnp.eye(nc, dtype=dtype)[:, :, None] * (1.0 - act)[None, :, :]
    Ac_inv = spd_block_inverse(jnp.moveaxis(Ac, -1, 0), ns_iters=40, ridge=3e-4)
    return Ac_inv, dvec


def rbm_apply_t(lv, node_group, n_groups, Ac_inv, dvec, r):
    free3 = lv["free"]
    rm = r * free3[:, :, None]
    rot = _cross(dvec, rm)
    rc_t = jax.ops.segment_sum(rm, node_group, num_segments=n_groups)
    rc_r = jax.ops.segment_sum(rot, node_group, num_segments=n_groups)
    rc = jnp.concatenate([rc_t, rc_r], axis=1).reshape(6 * n_groups, -1)
    zc = jnp.einsum("bij,jb->ib", Ac_inv, rc, precision="highest").reshape(n_groups, 6, -1)
    zt = zc[:, :3][node_group]
    zw = zc[:, 3:][node_group]
    return (zt + _cross(zw, dvec)) * free3[:, :, None]


def dense_stiffness_t(lv, grads, vols, lam, mu, dtype):
    """Fully-assembled (3N, 3N, B) stiffness with identity rows on constrained
    dofs — only for the tiny coarsest MG level (a few hundred dofs)."""
    tets = lv["tets"]
    N = lv["num_nodes"]
    nb = grads.shape[-1]
    eye3 = jnp.eye(3, dtype=dtype)
    acc = jnp.zeros((N * N, 9 * nb), dtype)
    for a in range(4):
        ga = grads[:, a]
        ta = tets[:, a]
        for c in range(4):
            gb = grads[:, c]
            seg = ta * N + tets[:, c]
            dot = (ga * gb).sum(axis=1)
            kab = vols[:, None, None, :] * (
                lam * ga[:, :, None, :] * gb[:, None, :, :]
                + mu * gb[:, :, None, :] * ga[:, None, :, :]
                + mu * dot[:, None, None, :] * eye3[None, :, :, None]
            )  # (T,3,3,B)
            acc = acc + jax.ops.segment_sum(
                kab.reshape(-1, 9 * nb), seg, num_segments=N * N
            )
    Kd = acc.reshape(N, N, 3, 3, nb).transpose(0, 2, 1, 3, 4).reshape(3 * N, 3 * N, nb)
    m = lv["free"].reshape(-1)  # (3N,)
    Kd = Kd * m[:, None, None] * m[None, :, None]
    Kd = Kd + jnp.eye(3 * N, dtype=dtype)[:, :, None] * (1.0 - m)[:, None, None]
    return Kd


# ------------------------------------------------------------ device-side MG


class WingMGT:
    """Device arrays + traced setup/apply for the batched V-cycle.

    `setup` and `apply` are pure traced functions (call them inside the
    caller's jit); the per-case state is a pytree. The V-cycle with
    fixed-degree Chebyshev smoothing and setup-frozen eigenvalue bounds is a
    fixed, linear, symmetric operator — a legal CG preconditioner.
    """

    def __init__(
        self,
        hier: WingHierarchy,
        dtype=jnp.float32,
        smooth_degree: int = 2,
        smooth_alpha: float = 0.25,
        power_iters: int = 10,
        lmax_safety: float = 1.2,
    ):
        self.dtype = dtype
        self.smooth_degree = smooth_degree
        self.smooth_alpha = smooth_alpha
        self.power_iters = power_iters
        self.lmax_safety = lmax_safety
        self.n_levels = len(hier.levels)
        self._coarsest_host = hier.levels[-1]

        self.levels = []
        for lh in hier.levels:
            plan = lh.plan
            self.levels.append(
                {
                    "basis": jnp.asarray(lh.topo.node_basis, dtype),
                    "te_floor": lh.topo.te_floor,
                    "tets": jnp.asarray(lh.topo.tets.astype(np.int32)),
                    "inc": jnp.asarray(lh.inc),
                    "incm": jnp.asarray(lh.incm, dtype),
                    "free": jnp.asarray(lh.free3, dtype),
                    "tet_station": jnp.asarray(lh.topo.station_id[lh.topo.tets].astype(np.int32)),
                    "tet_slot": jnp.asarray(lh.topo.slot[lh.topo.tets].astype(np.int32)),
                    "station_nodes": jnp.asarray(plan.station_nodes),
                    "slot_valid": jnp.asarray(plan.slot_valid, dtype),
                    "node_station": jnp.asarray(plan.node_station),
                    "node_slot": jnp.asarray(plan.node_slot),
                    "S": plan.num_stations,
                    "K": plan.K,
                    "D": plan.D,
                    "num_nodes": lh.topo.num_nodes,
                }
            )
        self.transfers = [
            {
                "parents": jnp.asarray(t.parents),
                "pweights": jnp.asarray(t.pweights, dtype),
                "children": jnp.asarray(t.children),
                "cweights": jnp.asarray(t.cweights, dtype),
            }
            for t in hier.transfers
        ]

    # -- per-level operator -------------------------------------------------
    def _apply_A(self, lv, st, x):
        free = lv["free"][:, :, None]
        y = force_t(st["grads"], st["vols"], lv["tets"], lv["inc"], lv["incm"], x * free,
                    st["lam"], st["mu"])
        return y * free + x * (1.0 - free)

    def _smoother(self, lv, st):
        """(A, M) pair for this level."""
        A = lambda x: self._apply_A(lv, st, x)  # noqa: E731
        M = lambda r: line_apply_t(lv, st["Binv"], r)  # noqa: E731
        return A, M

    def _coarsest_solve(self, st, r):
        rv = r.reshape(-1, r.shape[-1])  # (3N, B)
        z = jnp.einsum("bij,jb->ib", st["Kinv"], rv, precision="highest")
        return z.reshape(r.shape)

    def _power_lmax(self, A, M, lv, nb):
        """Per-case lambda_max of M^-1 A by power iteration (deterministic
        start vector; constrained dofs carry eigenvalue 1, harmless)."""
        N = lv["num_nodes"]
        v = jnp.sin(jnp.arange(N * 3, dtype=self.dtype) * 0.7311).reshape(N, 3)
        v = jnp.broadcast_to(v[:, :, None], (N, 3, nb)) * lv["free"][:, :, None]
        lam = jnp.ones((nb,), self.dtype)
        for _ in range(self.power_iters):
            w = M(A(v))
            nrm = jnp.sqrt((w * w).sum(axis=(0, 1)))
            lam = nrm
            v = w / jnp.maximum(nrm, 1e-30)[None, None, :]
        # power iteration approaches lambda_max from BELOW; Chebyshev AMPLIFIES
        # modes above the interval, so the safety margin must absorb the
        # remaining under-estimate (hypre uses 1.1-1.2x for the same reason)
        return lam * self.lmax_safety

    # -- setup ---------------------------------------------------------------
    def setup(self, p4, lam, mu, level0=None):
        """Per-level operator data; traced (call inside jit). p4: (B,4).

        level0 = (nodes, grads, vols) reuses the caller's finest-level
        geometry instead of recomputing it.
        """
        state = []
        nb = p4.shape[0]
        for li, lv in enumerate(self.levels):
            if li == 0 and level0 is not None:
                nodes, grads, vols = level0
            else:
                nodes = nodes_t(lv["basis"], lv["te_floor"], p4, self.dtype)
                grads, vols = grads_vols_t(nodes, lv["tets"])
            st = {"grads": grads, "vols": vols, "lam": lam, "mu": mu}
            if li == self.n_levels - 1:
                # exact coarsest: assembled AND inverted on the HOST in true
                # f64 (finalize()). Device f32 assembly cancels away the
                # global bending modes (coarsest cond ~1e13 — exactly the
                # modes the V-cycle needs from this level), and the TPU's
                # emulated-f64 matmuls are not accurate enough for the
                # inversion either (measured NaN via Newton-Schulz).
                pass
            else:
                st["Binv"] = line_blocks_t(lv, grads, vols, lam, mu, lv["free"], self.dtype)
                A, M = self._smoother(lv, st)
                st["lmax"] = self._power_lmax(A, M, lv, nb)
            state.append(st)
        return state

    def finalize(self, state, p4, lam: float, mu: float):
        """Host post-pass on the traced setup() output: assemble the coarsest
        dense stiffness in numpy f64 and attach its inverse (symmetric Jacobi
        scaling + LAPACK). Call once per setup, outside jit; p4 is the (B,4)
        parameter array as numpy."""
        Kinv = coarsest_dense_inverse_host(
            self._coarsest_host, np.asarray(p4, np.float64), float(lam), float(mu)
        )
        st = dict(state[-1])
        st["Kinv"] = jnp.asarray(Kinv, self.dtype)
        return state[:-1] + [st]


    # -- apply ---------------------------------------------------------------
    def _chebyshev(self, A, M, r0, lmax, degree, alpha):
        """x ~= A^-1 r0 by degree-`degree` preconditioned Chebyshev over
        [alpha*lmax, lmax]; x0 = 0. Fixed polynomial in M^-1 A -> linear,
        symmetric, safe inside CG."""
        lmin = alpha * lmax
        theta = 0.5 * (lmax + lmin)  # (B,)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma

        def bc(v):  # (B,) -> broadcast over (N,3,B)
            return v[None, None, :]

        d = M(r0) / bc(theta)
        x = d
        for _ in range(degree - 1):
            r = r0 - A(x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = bc(rho_new * rho) * d + bc(2.0 * rho_new / delta) * M(r)
            x = x + d
            rho = rho_new
        return x

    def apply(self, state, r):
        """z = V-cycle(r), r (N,3,B) — use as CG preconditioner."""
        return self._vcycle(state, 0, r)

    def _vcycle(self, state, li, r):
        lv = self.levels[li]
        st = state[li]
        if li == self.n_levels - 1:
            return self._coarsest_solve(st, r)
        A, M = self._smoother(lv, st)
        x = self._chebyshev(A, M, r, st["lmax"], self.smooth_degree, self.smooth_alpha)
        rr = r - A(x)
        tr = self.transfers[li]
        lvc = self.levels[li + 1]
        rc = (rr[tr["children"]] * tr["cweights"][:, :, None, None]).sum(axis=1)
        rc = rc * lvc["free"][:, :, None]
        xc = self._vcycle(state, li + 1, rc)
        dx = (xc[tr["parents"]] * tr["pweights"][:, :, None, None]).sum(axis=1)
        x = x + dx * lv["free"][:, :, None]
        rr = r - A(x)
        x = x + self._chebyshev(A, M, rr, st["lmax"], self.smooth_degree, self.smooth_alpha)
        return x


def coarsest_dense_inverse_host(lh: MGLevelHost, p4, lam, mu):
    """(B, 3N, 3N) f64 inverse of the coarsest welded stiffness, assembled in
    numpy f64 (the device f32 assembly cancels away the global bending modes
    — the coarsest sits at cond ~1e13) and inverted with symmetric Jacobi
    scaling + LAPACK."""
    Kb = _coarsest_dense_host(lh, p4, lam, mu)
    d = np.einsum("bii->bi", Kb)
    s = 1.0 / np.sqrt(np.maximum(d, 1e-300))
    Ks = Kb * s[:, :, None] * s[:, None, :]
    return np.linalg.inv(Ks) * s[:, :, None] * s[:, None, :]


def _coarsest_dense_host(lh: MGLevelHost, p4, lam, mu):
    """(B, 3N, 3N) f64 coarsest stiffness with identity rows on constrained
    dofs — numpy twin of dense_stiffness_t."""
    basis = lh.topo.node_basis  # f64
    tets = lh.topo.tets.astype(np.int64)
    N = lh.topo.num_nodes
    B = p4.shape[0]
    span, chord, sweep, t = (p4[:, i] for i in range(4))
    s_, yfrac, zfrac, zbase = (basis[:, i] for i in range(4))
    y = yfrac[:, None] * span[None, :]
    x = s_[:, None] * chord[None, :] + np.tan(np.deg2rad(sweep))[None, :] * y
    half = np.maximum(t[None, :] * zbase[:, None], lh.topo.te_floor * s_[:, None])
    z = chord[None, :] * half * zfrac[:, None]
    nodes = np.stack([x, y, z], axis=1)  # (N,3,B)
    xt = np.moveaxis(nodes[tets], -1, 0)  # (B,T,4,3)
    e = xt[:, :, 1:] - xt[:, :, :1]  # (B,T,3,3)
    det = np.linalg.det(e)
    vols = det / 6.0
    inv = np.linalg.inv(np.where(np.abs(det)[..., None, None] > 0, e, np.eye(3)))
    g123 = np.swapaxes(inv, -1, -2)  # rows = columns of inv(J)
    g0 = -g123.sum(axis=2, keepdims=True)
    grads = np.concatenate([g0, g123], axis=2)  # (B,T,4,3)
    K = np.zeros((B, 3 * N, 3 * N))
    eye3 = np.eye(3)
    for a in range(4):
        ga = grads[:, :, a]  # (B,T,3)
        ta = tets[:, a]
        for c in range(4):
            gb = grads[:, :, c]
            dot = (ga * gb).sum(axis=-1)
            kab = vols[..., None, None] * (
                lam * ga[..., :, None] * gb[..., None, :]
                + mu * gb[..., :, None] * ga[..., None, :]
                + mu * dot[..., None, None] * eye3
            )  # (B,T,3,3)
            for b in range(B):
                np.add.at(
                    K[b].reshape(N, 3, N, 3),
                    (ta, slice(None), tets[:, c], slice(None)),
                    kab[b],
                )
    m = lh.free3.reshape(-1).astype(np.float64)  # (3N,)
    K = K * m[None, :, None] * m[None, None, :]
    K += np.eye(3 * N)[None] * (1.0 - m)[None, :, None]
    return K
