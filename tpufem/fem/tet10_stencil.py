"""Grid-native tet10 operator on the DOUBLED structured grid: gather-free
quadratic-element SpMV + p-multigrid, all in stencil (shifted-slice) form.

Every tet10 node of the structured wing mesh occupies one position of the
doubled grid (i2, k2, j2) in NI2 x NK2 x NJ2 = (2NI-1)(2NK-1)(2NJ-1):
all-even positions are tet4 corners; any other parity pattern o in {0,1}^3 is
the midpoint of the unique Kuhn-lattice edge (I, I+o) with I = pos//2 (the 7
positive offsets of tpufem.fem.stencil.OFFSETS are exactly the nonzero
patterns). The tet10 operator therefore reads/writes strided slices of a
dense (3, B, NI2, NK2, NJ2) state array — no incidence gathers, the same
transformation that made the tet4 stencil engine 4.4x faster than the gather
SpMV (stencil.py:9-13). This is the flagship-scale (2.5M-DOF tet10,
BASELINE.json config 5) hot operator; the gather form (tpufem.fem.tet10)
materialized (T,Q,10,3,3) temporaries and needed element chunking to fit HBM,
while the stencil form's temporaries are O(grid) and fuse.

Weld embedding (LE always; TE when te_floor == 0): beyond the tet4-style
column weld at i2 = 0 (all k2 merge to slot 0), the doubled grid has PAIR
merges at i2 = 1: the midpoint of diagonal edge ((0,j,k),(1,j,k+1)) at slot
2k+1 and of axis edge ((0,j,k+1),(1,j,k+1)) at slot 2k+2 are the SAME welded
tet10 node (their endpoint pairs weld identically). The active form keeps
duplicates at zero; weld_spread2 / weld_reduce2 implement S and R = S^T so
the wrapped operator R K_full S reproduces the welded tet10 stiffness exactly
(degenerate full-grid elements have zero volume and drop out). grid_meta2
verifies the merge pattern numerically per resolution (exact bijection
active positions <-> welded tet10 nodes).

Replaces the CalculiX solve role (reference fem.py:524-533) at the refined
quadratic configuration the reference never reaches.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.stencil import (
    OFFSETS,
    cell_geometry,
    grid_meta,
    nodes_grid,
    weld_reduce,
    weld_spread,
)
from tpufem.fem.tet10 import _EDGES, DNDXI, GAUSS_WEIGHT
from tpufem.mesher import _HEX_CORNERS, _KUHN_TETS, WingMeshResolution

# (t, m) -> doubled-grid offset (oi, ok, oj) of tet10 node m of Kuhn tet t
# relative to the cell origin (2i, 2k, 2j). HEX_CORNERS rows are (di, dj, dk).
_OFF2 = np.zeros((6, 10, 3), np.int64)
for _t in range(6):
    for _a in range(4):
        di, dj, dk = _HEX_CORNERS[_KUHN_TETS[_t, _a]]
        _OFF2[_t, _a] = (2 * di, 2 * dk, 2 * dj)
    for _e, (_a, _b) in enumerate(_EDGES):
        ca = _HEX_CORNERS[_KUHN_TETS[_t, _a]]
        cb = _HEX_CORNERS[_KUHN_TETS[_t, _b]]
        _OFF2[_t, 4 + _e] = (ca[0] + cb[0], ca[2] + cb[2], ca[1] + cb[1])

# S2[m, m', j, j'] = sum_q DNDXI[q,m,j] * DNDXI[q,m',j'] — the quadrature sum
# of shape-gradient coefficient products (equal Gauss weights fold into one
# constant tensor; pair stiffness blocks become w * sum_{jj'} S2 * G_{jj'}).
_S2 = np.einsum("qmj,qnk->mnjk", DNDXI, DNDXI)

# positive lattice offsets (di, dj, dk) — edge directions of the Kuhn lattice
_POS_OFFSETS = [o for o in OFFSETS if o > (0, 0, 0)]
assert len(_POS_OFFSETS) == 7


@lru_cache(maxsize=8)
def grid_meta2(res: WingMeshResolution):
    """Doubled-grid facts + welded-tet10-node <-> grid index maps.

    Builds the full->welded map numerically and ASSERTS the active-position
    bijection the weld_spread2/weld_reduce2 slice pattern relies on.
    """
    from tpufem.fem.tet10 import tet10_from_tet4
    from tpufem.mesher import structured_wing_mesh, wing_topology

    topo = wing_topology(res)
    mesh = structured_wing_mesh(1.0, 0.35, 10.0, 0.10, res)  # topology-invariant
    t10 = tet10_from_tet4(mesh)
    NI, NJ, NK = res.n_chord + 1, res.n_span + 1, res.n_thick + 1
    NI2, NJ2, NK2 = 2 * NI - 1, 2 * NJ - 1, 2 * NK - 1
    sharp_te = res.te_floor_frac == 0.0

    # full tet4 grid -> welded tet4 id
    m4 = grid_meta(res)
    weld4 = np.full((NI, NJ, NK), -1, np.int64)
    weld4[m4["gi"], m4["gj"], m4["gk"]] = np.arange(topo.num_nodes)
    weld4[0, :, 1:] = weld4[0, :, 0:1]
    if sharp_te:
        weld4[-1, :, 1:] = weld4[-1, :, 0:1]
    assert (weld4 >= 0).all()

    # welded identity of every doubled position
    I2, K2g, J2 = np.meshgrid(
        np.arange(NI2), np.arange(NK2), np.arange(NJ2), indexing="ij"
    )
    oi, ok, oj = I2 % 2, K2g % 2, J2 % 2
    bi, bk, bj = I2 // 2, K2g // 2, J2 // 2
    wa = weld4[bi, bj, bk]
    wb = weld4[bi + oi, bj + oj, bk + ok]
    corner = (oi == 0) & (ok == 0) & (oj == 0)
    welded_id = np.where(corner, wa, -1)
    edge_mask = (~corner) & (wa != wb)
    ee = t10.edge_endpoints.astype(np.int64)  # (M,2) sorted pairs, lex-sorted
    big = np.int64(topo.num_nodes)
    ekey = ee[:, 0] * big + ee[:, 1]
    key = np.minimum(wa, wb) * big + np.maximum(wa, wb)
    pos = np.searchsorted(ekey, key.ravel()).reshape(key.shape)
    posc = np.minimum(pos, len(ekey) - 1)
    found = ekey[posc] == key
    missing = edge_mask & ~found
    assert not missing.any(), "nondegenerate full edge absent from welded mesh"
    welded_id = np.where(edge_mask, topo.num_nodes + posc, welded_id)

    # active (representative) positions: the slice-expressible weld pattern
    active = np.ones((NI2, NK2, NJ2), bool)
    active[0, 1:, :] = False  # LE column: rep at k2=0
    active[1, 1::2, :] = False  # LE-adjacent: odd k2 merges into even k2+1
    if sharp_te:
        active[-1, 1:, :] = False
        active[-2, 1::2, :] = False  # TE-adjacent: odd k2 merges into even k2-1
    ai, ak, aj = np.nonzero(active)
    ids = welded_id[ai, ak, aj]
    assert (ids >= 0).all()
    assert len(ids) == t10.num_nodes, (len(ids), t10.num_nodes)
    assert len(np.unique(ids)) == t10.num_nodes, "active positions not a bijection"
    gi2 = np.empty(t10.num_nodes, np.int32)
    gk2 = np.empty(t10.num_nodes, np.int32)
    gj2 = np.empty(t10.num_nodes, np.int32)
    gi2[ids], gk2[ids], gj2[ids] = ai, ak, aj

    return {
        "NI2": NI2,
        "NJ2": NJ2,
        "NK2": NK2,
        "gi2": gi2,
        "gk2": gk2,
        "gj2": gj2,
        "sharp_te": sharp_te,
        "num_nodes": t10.num_nodes,
        "t10": t10,
    }


def dup_mask2(res: WingMeshResolution, dtype):
    """(1,1,NI2,NK2,NJ2) zero at duplicate (non-representative) positions."""
    m = grid_meta2(res)
    a = np.ones((1, 1, m["NI2"], m["NK2"], m["NJ2"]), np.float32)
    a[:, :, 0, 1:, :] = 0.0
    a[:, :, 1, 1::2, :] = 0.0
    if m["sharp_te"]:
        a[:, :, -1, 1:, :] = 0.0
        a[:, :, -2, 1::2, :] = 0.0
    return jnp.asarray(a, dtype)


def free_mask2(res: WingMeshResolution, dtype):
    """(1,1,1,1,NJ2) Dirichlet root mask (j2 = 0 clamped)."""
    NJ2 = 2 * res.n_span + 1
    f = np.ones((1, 1, 1, 1, NJ2), np.float32)
    f[..., 0] = 0.0
    return jnp.asarray(f, dtype)


def weld_spread2(res: WingMeshResolution, u):
    """S on the doubled grid: copy representative values into duplicates."""
    # LE column i2=0: all k2 read slot 0
    u = u.at[:, :, 0].set(jnp.broadcast_to(u[:, :, 0, 0:1, :], u[:, :, 0].shape))
    # i2=1: odd k2 = value of even k2+1
    u = u.at[:, :, 1, 1::2, :].set(u[:, :, 1, 2::2, :])
    if res.te_floor_frac == 0.0:
        u = u.at[:, :, -1].set(
            jnp.broadcast_to(u[:, :, -1, 0:1, :], u[:, :, -1].shape)
        )
        # i2=NI2-2: odd k2 = value of even k2-1
        u = u.at[:, :, -2, 1::2, :].set(u[:, :, -2, 0:-1:2, :])
    return u


def weld_reduce2(res: WingMeshResolution, y):
    """R = S^T: fold duplicate contributions into representatives, zero dups."""
    NK2 = y.shape[3]
    mask0 = jnp.zeros((NK2,), y.dtype).at[0].set(1.0)
    tot = y[:, :, 0].sum(axis=2, keepdims=True)  # (3,B,1,NJ2)
    y = y.at[:, :, 0].set(tot * mask0[:, None])
    y = y.at[:, :, 1, 2::2, :].add(y[:, :, 1, 1::2, :])
    y = y.at[:, :, 1, 1::2, :].set(0.0)
    if res.te_floor_frac == 0.0:
        tot = y[:, :, -1].sum(axis=2, keepdims=True)
        y = y.at[:, :, -1].set(tot * mask0[:, None])
        y = y.at[:, :, -2, 0:-1:2, :].add(y[:, :, -2, 1::2, :])
        y = y.at[:, :, -2, 1::2, :].set(0.0)
    return y


def nodes_grid2(res: WingMeshResolution, p4, dtype):
    """Full doubled-grid coordinates (3, B, NI2, NK2, NJ2) from (B,4) params.

    Even positions = tet4 corner coords; odd-pattern positions = exact edge
    midpoints (straight-edge tet10)."""
    X4 = nodes_grid(res, p4, dtype)  # (3,B,NI,NK,NJ)
    NI, NK, NJ = X4.shape[2], X4.shape[3], X4.shape[4]
    B = X4.shape[1]
    X2 = jnp.zeros((3, B, 2 * NI - 1, 2 * NK - 1, 2 * NJ - 1), dtype)
    X2 = X2.at[:, :, ::2, ::2, ::2].set(X4)
    for di, dj, dk in _POS_OFFSETS:
        A = X4[:, :, : NI - di, : NK - dk, : NJ - dj]
        Bp = X4[:, :, di:, dk:, dj:]
        X2 = X2.at[:, :, di::2, dk::2, dj::2].set(0.5 * (A + Bp))
    return X2


def cell_geometry2(res: WingMeshResolution, X2):
    """Per-tet gradients/volumes from the doubled grid's corner sublattice.

    Straight-edge tet10: the affine map (and so inv(J), V) is set by the 4
    corners, so the tet4 cell geometry is reused verbatim."""
    return cell_geometry(res, X2[:, :, ::2, ::2, ::2])


def _slab(us, off, nc, nt, ns):
    oi, ok, oj = off
    return us[:, :, oi : oi + 2 * nc - 1 : 2, ok : ok + 2 * nt - 1 : 2,
              oj : oj + 2 * ns - 1 : 2]


def strain_apply10(res: WingMeshResolution, geo, u2, free2, lam, mu):
    """y = A_w u for tet10: strain-first, slice-only, f32-safe.

    Per Kuhn tet and Gauss point: v_j = sum_m DNDXI[q,m,j] u_m (constant
    sparse combinations of the 10 node slabs), H = sum_j grad(lambda_j) o v_j,
    sigma(eps(H)), then forces fold back through the same constants. All
    temporaries are O(cells) and slice-addressed.
    """
    g, vol = geo  # (6,4,3,B,nc,nt,ns), (6,B,nc,nt,ns)
    us = weld_spread2(res, u2 * free2)
    NI2, NK2, NJ2 = us.shape[2], us.shape[3], us.shape[4]
    nc, nt, ns = (NI2 - 1) // 2, (NK2 - 1) // 2, (NJ2 - 1) // 2
    idx3 = jnp.arange(3)
    slabs: dict = {}
    acc: dict = {}
    for t in range(6):
        gv = (g[t, 1], g[t, 2], g[t, 3])  # grad lambda_1..3
        un = []
        for m in range(10):
            key = tuple(_OFF2[t, m])
            if key not in slabs:
                slabs[key] = _slab(us, key, nc, nt, ns)
            un.append(slabs[key])
        wq = GAUSS_WEIGHT * vol[t]  # (B,nc,nt,ns); equal Gauss weights
        for q in range(4):
            v = []
            for j in range(3):
                av = None
                for m in range(10):
                    c = float(DNDXI[q, m, j])
                    if abs(c) < 1e-14:
                        continue
                    term = c * un[m]
                    av = term if av is None else av + term
                v.append(av)
            H = None
            for j in range(3):
                term = gv[j][:, None] * v[j][None, :]
                H = term if H is None else H + term
            eps = 0.5 * (H + jnp.swapaxes(H, 0, 1))
            tr = eps[0, 0] + eps[1, 1] + eps[2, 2]
            sig = 2.0 * mu * eps
            sig = sig.at[idx3, idx3].add(lam * tr[None])
            sw = sig * wq[None, None]
            s = [(sw * gv[j][None, :]).sum(axis=1) for j in range(3)]  # (3,B,...)
            for m in range(10):
                fm = None
                for j in range(3):
                    c = float(DNDXI[q, m, j])
                    if abs(c) < 1e-14:
                        continue
                    term = c * s[j]
                    fm = term if fm is None else fm + term
                if fm is None:
                    continue
                key = tuple(_OFF2[t, m])
                acc[key] = fm if key not in acc else acc[key] + fm
    y = jnp.zeros_like(us)
    for (oi, ok, oj), vterm in acc.items():
        y = y.at[:, :, oi : oi + 2 * nc - 1 : 2, ok : ok + 2 * nt - 1 : 2,
                 oj : oj + 2 * ns - 1 : 2].add(vterm)
    y = weld_reduce2(res, y) * free2
    return y + u2 * (1.0 - free2)


# ------------------------------------------------------------ p-transfers


def prolong_p(res: WingMeshResolution, x4, dup2, free2):
    """tet4 active grid (3,B,NI,NK,NJ) -> tet10 active doubled grid: the P1
    embedding into P2 (corners copied, midpoints = edge-endpoint means)."""
    xs = weld_spread(res, x4)
    NI, NK, NJ = xs.shape[2], xs.shape[3], xs.shape[4]
    B = xs.shape[1]
    X2 = jnp.zeros((3, B, 2 * NI - 1, 2 * NK - 1, 2 * NJ - 1), xs.dtype)
    X2 = X2.at[:, :, ::2, ::2, ::2].set(xs)
    for di, dj, dk in _POS_OFFSETS:
        A = xs[:, :, : NI - di, : NK - dk, : NJ - dj]
        Bp = xs[:, :, di:, dk:, dj:]
        X2 = X2.at[:, :, di::2, dk::2, dj::2].set(0.5 * (A + Bp))
    return X2 * dup2 * free2


def restrict_p(res: WingMeshResolution, r2, free4):
    """Exact transpose of prolong_p: (3,B,NI2,NK2,NJ2) active -> tet4 grid."""
    NI2, NK2, NJ2 = r2.shape[2], r2.shape[3], r2.shape[4]
    NI, NK, NJ = (NI2 + 1) // 2, (NK2 + 1) // 2, (NJ2 + 1) // 2
    y4 = r2[:, :, ::2, ::2, ::2]
    for di, dj, dk in _POS_OFFSETS:
        mid = 0.5 * r2[:, :, di::2, dk::2, dj::2]
        y4 = y4.at[:, :, : NI - di, : NK - dk, : NJ - dj].add(mid)
        y4 = y4.at[:, :, di:, dk:, dj:].add(mid)
    y4 = weld_reduce(res, y4)
    return y4 * free4


# ------------------------------------------------------- thickness lines


def line_blocks10_raw(res: WingMeshResolution, geo, lam, mu, dtype):
    """Raw per-(i2,j2)-station thickness-line blocks (NI2,NJ2,NK2,3,NK2,3,B)
    BEFORE weld folds / Dirichlet masking / inversion.

    Same-station pairs (same i2 AND j2 offsets) of each Kuhn tet contribute
    w * sum_{jj'} S2[m,m',j,j'] * (lam G_jj' + mu G_j'j + mu D_jj' I); the
    quadrature constants fold into the precomputed _S2 tensor. The span axis
    length follows geo (a span-sharded slab assembles its local stations; the
    sharded solver syncs shared-layer partials before finalizing).
    """
    g, vol = geo
    nb = vol.shape[1]
    nc, nt, ns = vol.shape[-3], vol.shape[-2], vol.shape[-1]
    NI2, NK2, NJ2 = 2 * nc + 1, 2 * nt + 1, 2 * ns + 1
    # accumulate in (NI2, NJ2, NK2, 3, dk+2, 3, B) layout: one slice-add per
    # same-station pair; dk = k2' - k2 in [-2, 2]
    Bacc = jnp.zeros((NI2, NJ2, NK2, 3, 5, 3, nb), dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    for t in range(6):
        gv = (g[t, 1], g[t, 2], g[t, 3])
        w = GAUSS_WEIGHT * vol[t]  # (B,nc,nt,ns)
        G = {}
        D = {}
        for j in range(3):
            for jp in range(3):
                G[(j, jp)] = (gv[j][:, None] * gv[jp][None, :])  # (3,3,B,...)
                D[(j, jp)] = (gv[j] * gv[jp]).sum(axis=0)  # (B,...)
        for m in range(10):
            oi, okm, ojm = _OFF2[t, m]
            for mp in range(10):
                oip, okp, ojp_ = _OFF2[t, mp]
                if oi != oip or ojm != ojp_:
                    continue  # different station
                S = _S2[m, mp]  # (3,3) constants
                kblk = None
                dterm = None
                for j in range(3):
                    for jp in range(3):
                        c = float(S[j, jp])
                        if abs(c) < 1e-14:
                            continue
                        term = c * (lam * G[(j, jp)] + mu * G[(jp, j)])
                        kblk = term if kblk is None else kblk + term
                        dt_ = c * D[(j, jp)]
                        dterm = dt_ if dterm is None else dterm + dt_
                if kblk is None:
                    continue
                kblk = kblk + mu * dterm[None, None] * eye3[:, :, None, None, None, None]
                kblk = kblk * w[None, None]  # (3,3,B,nc,nt,ns)
                # scatter: (i2=oi+2ci, j2=ojm+2cj, k2=okm+2ck, :, dk, :, B)
                dk = okp - okm + 2
                add = jnp.transpose(kblk, (3, 5, 4, 0, 1, 2))  # (nc,ns,nt,3,3,B)
                Bacc = Bacc.at[
                    oi : oi + 2 * nc - 1 : 2,
                    ojm : ojm + 2 * ns - 1 : 2,
                    okm : okm + 2 * nt - 1 : 2,
                    :,
                    dk,
                    :,
                    :,
                ].add(add)
    # expand (k2, dk) -> dense (D2, D2) per station
    Bm = jnp.zeros((NI2, NJ2, NK2, 3, NK2, 3, nb), dtype)
    for dk in range(-2, 3):
        for k2 in range(max(0, -dk), min(NK2, NK2 - dk)):
            Bm = Bm.at[:, :, k2, :, k2 + dk, :, :].add(
                Bacc[:, :, k2, :, dk + 2, :, :]
            )
    return Bm


def line_blocks10_finalize(res: WingMeshResolution, Bm, dup2, free2):
    """Weld folds + duplicate/Dirichlet identity masking + inversion of raw
    station blocks -> (NI2, NJ2loc, D2, D2, B) inverses."""
    from tpufem.fem.precond import spd_block_inverse

    dtype = Bm.dtype
    NI2, NJ2, NK2 = Bm.shape[0], Bm.shape[1], Bm.shape[2]
    nb = Bm.shape[-1]
    D2 = 3 * NK2
    # weld folds (R ... S on both block axes), mirroring weld_reduce2:
    # i2=0: all k2 sum into slot 0 (rows and columns)
    row0 = Bm[0].sum(axis=(1, 3))  # (NJ2,3,3,B)
    col = jnp.zeros_like(Bm[0]).at[:, 0, :, 0, :, :].set(row0)
    Bm = Bm.at[0].set(col)
    # i2=1: odd k2 folds into even k2+1 on both axes
    b1 = Bm[1]
    b1 = b1.at[:, 2::2].add(b1[:, 1::2])
    b1 = b1.at[:, 1::2].set(0.0)
    b1 = b1.at[:, :, :, 2::2].add(b1[:, :, :, 1::2])
    b1 = b1.at[:, :, :, 1::2].set(0.0)
    Bm = Bm.at[1].set(b1)
    if res.te_floor_frac == 0.0:
        rowN = Bm[-1].sum(axis=(1, 3))
        colN = jnp.zeros_like(Bm[-1]).at[:, 0, :, 0, :, :].set(rowN)
        Bm = Bm.at[-1].set(colN)
        bN = Bm[-2]
        bN = bN.at[:, 0:-1:2].add(bN[:, 1::2])
        bN = bN.at[:, 1::2].set(0.0)
        bN = bN.at[:, :, :, 0:-1:2].add(bN[:, :, :, 1::2])
        bN = bN.at[:, :, :, 1::2].set(0.0)
        Bm = Bm.at[-2].set(bN)
    Bm = Bm.reshape(NI2, NJ2, D2, D2, nb)
    # mask: slot active iff representative AND free (j2 > 0)
    mvec = (dup2 * free2 * jnp.ones((1, 1, NI2, NK2, NJ2), dtype))[0, 0]
    mvec = jnp.transpose(mvec, (0, 2, 1))  # (NI2,NJ2,NK2)
    mvec = jnp.repeat(mvec[:, :, :, None], 3, axis=3).reshape(NI2, NJ2, D2)
    Bm = Bm * mvec[:, :, :, None, None] * mvec[:, :, None, :, None]
    eyeD = jnp.eye(D2, dtype=dtype)
    Bm = Bm + eyeD[None, None, :, :, None] * (1.0 - mvec)[:, :, :, None, None]
    flat = jnp.moveaxis(Bm, -1, 2).reshape(NI2 * NJ2 * nb, D2, D2)
    inv = spd_block_inverse(flat)
    return jnp.moveaxis(inv.reshape(NI2, NJ2, nb, D2, D2), 2, -1)


def line_blocks10(res: WingMeshResolution, geo, lam, mu, dup2, free2, dtype):
    """Single-device convenience: raw assembly + finalize in one call."""
    return line_blocks10_finalize(
        res, line_blocks10_raw(res, geo, lam, mu, dtype), dup2, free2
    )


def line_apply10(res: WingMeshResolution, Binv, rg, dup2, free2):
    """z = line-block solve; rg (3,B,NI2,NK2,NJ2) active form."""
    NI2, NK2, NJ2 = rg.shape[2], rg.shape[3], rg.shape[4]
    D2 = 3 * NK2
    rs = jnp.transpose(rg, (2, 4, 3, 0, 1)).reshape(NI2, NJ2, D2, -1)
    zs = (Binv * rs[:, :, None, :, :]).sum(axis=3)
    z = jnp.transpose(zs.reshape(NI2, NJ2, NK2, 3, -1), (3, 4, 0, 2, 1))
    return z * dup2 * free2


def to_grid2(res: WingMeshResolution, v_nodes):
    """Welded tet10 node vector (N10,3,B) -> active grid (3,B,NI2,NK2,NJ2)."""
    m = grid_meta2(res)
    g = jnp.zeros(
        (3, v_nodes.shape[2], m["NI2"], m["NK2"], m["NJ2"]), v_nodes.dtype
    )
    vb = jnp.moveaxis(v_nodes, 1, 0)  # (3,N,B)
    return g.at[:, :, m["gi2"], m["gk2"], m["gj2"]].set(jnp.moveaxis(vb, 2, 1))


def from_grid2(res: WingMeshResolution, g):
    """Active grid form -> welded tet10 node vector (N10,3,B)."""
    m = grid_meta2(res)
    v = g[:, :, m["gi2"], m["gk2"], m["gj2"]]  # (3,B,N)
    return jnp.transpose(v, (2, 0, 1))


# ----------------------------------------------------------- solver class


class Tet10StencilT:
    """Batched grid-native tet10 solver: p-MG-PCG on the doubled grid.

    The stencil-form successor of tpufem.fem.tet10_mg.Tet10MGSolver (same
    p-multigrid mathematics: tet10 line-Chebyshev smoothing, exact P2->P1
    restriction, tet4 stencil-MG correction, exact dense coarsest), with the
    operator and all transfers as shifted-slice grid computations and a
    TRAILING case batch axis. Supports outer_f64 (f64 operator/state, f32
    V-cycle preconditioner) for true-f64-residual convergence.
    """

    def __init__(
        self,
        res: WingMeshResolution,
        dtype=jnp.float32,
        smooth_degree: int = 2,
        smooth_alpha: float = 0.25,
        power_iters: int = 10,
        lmax_safety: float = 1.2,
        mg_levels: int | None = None,
    ):
        from tpufem.fem.stencil_mg import StencilMG

        self.res = res
        self.dtype = dtype
        self.smooth_degree = smooth_degree
        self.smooth_alpha = smooth_alpha
        self.power_iters = power_iters
        self.lmax_safety = lmax_safety
        self.meta2 = grid_meta2(res)
        self.t10 = self.meta2["t10"]
        self.N10 = self.meta2["num_nodes"]
        self.dup2 = dup_mask2(res, dtype)
        self.free2 = free_mask2(res, dtype)
        self.smg = StencilMG(
            res, dtype=dtype, n_levels=mg_levels, smooth_degree=smooth_degree,
            smooth_alpha=smooth_alpha, power_iters=power_iters,
            lmax_safety=lmax_safety,
        )
        self._jit_setup = jax.jit(self._setup)
        self._jit_init = jax.jit(self._init)
        self._jit_chunk = jax.jit(self._chunk, static_argnames=("tol", "maxiter"))
        self._jit_finish64 = jax.jit(self._finish64)
        self._jit_init64 = jax.jit(self._init64)
        self._jit_chunk64 = jax.jit(self._chunk64, static_argnames=("tol", "maxiter"))
        self._jit_resid64 = jax.jit(self._resid64)
        self._cpu0 = jax.devices("cpu")[0]
        # one persistent wrapper: a fresh jit(lambda ...) per solve would
        # recompile the host node map on every call
        self._jit_nodes64 = jax.jit(lambda p: nodes_grid2(self.res, p, jnp.float64))

    def _host_setup64(self, p464, press64, upper_t6, device_system=True):
        """f64 system built on the HOST CPU backend, then shipped to device.

        TPU f64 is double-float emulated; the elementwise operator apply is
        accurate (~5e-15 measured vs CPU) but the GEOMETRY pipeline
        (transcendentals/divisions in nodes_grid2 -> cell_geometry2) only
        reaches ~7e-9 relative on TPU. kappa-amplified, that bias makes the
        on-device "f64 system" disagree with the true discrete system by
        ~5e-4 in residual at flagship conditioning (measured: engine 8.6e-7
        vs 80-bit host truth 5.0e-4 on the same u). Building geometry and
        loads in real host f64 and transferring once removes the bias; the
        device-side apply on exact inputs stays at its ~5e-15 fidelity.

        Only the COORDINATES need host precision: the bias enters through
        the transcendental parameter->node map (1.0e-8 on TPU, measured),
        while cell_geometry2 from exact nodes is ~5e-12 and the load
        vector's error is unamplified. Shipping just the doubled node grid
        (3,B,NI2,NK2,NJ2) instead of the gradient tensors cuts the
        per-solve host->device transfer ~20x.

        Also returns a CPU-resident copy of the system (real IEEE f64):
        convergence is JUDGED on the host, because the device's double-float
        emulated evaluation floors at eps_dd*kappa_elem (measured 1.4e-6
        relative on the 16x24x4 tet10 mesh) and cannot certify tol 1e-6
        no matter how good the solution is."""
        cpu0 = self._cpu0
        X64_h = self._jit_nodes64(jax.device_put(np.asarray(p464, np.float64), cpu0))
        ut6_h = jax.device_put(np.asarray(upper_t6), cpu0)
        geo64_h, bg64_h = self._jit_finish64(
            X64_h, jax.device_put(np.float64(press64), cpu0), ut6_h
        )  # CPU (committed inputs)
        if not device_system:  # refine path: host judges, f32 engine corrects
            return None, None, (geo64_h, bg64_h)
        dev = jax.devices()[0]
        X64 = jax.device_put(np.asarray(X64_h), dev)
        geo64, bg64 = self._jit_finish64(
            X64,
            jnp.asarray(np.float64(press64)),
            jax.device_put(np.asarray(upper_t6), dev),
        )
        return geo64, bg64, (geo64_h, bg64_h)

    def _host_resid(self, host_sys, x_np):
        """TRUE residual of the host-resident f64 system, evaluated on the
        CPU in real f64 (the judge; the device only solves corrections)."""
        geo_h, bg_h = host_sys
        return self._jit_resid64(
            geo_h, bg_h, jax.device_put(np.asarray(x_np, np.float64), self._cpu0)
        )

    def _finish64(self, X64, press64, upper_t6):
        """Device half of the f64 setup: geometry + loads from exact nodes."""
        from tpufem.fem.tet10 import pressure_loads_t6

        geo64 = cell_geometry2(self.res, X64)
        n10 = from_grid2(self.res, X64)  # (N10,3,B)
        f = jax.vmap(
            lambda nb: pressure_loads_t6(nb, upper_t6, press64, self.N10),
            in_axes=2, out_axes=2,
        )(n10)
        bg64 = to_grid2(self.res, f) * self.free2
        return geo64, bg64

    # ------------------------------------------------------------- loads
    def _loads_grid2(self, p4, pressure, upper_t6, dtype):
        """Pressure load vector in doubled-grid form from traced params."""
        from tpufem.fem.tet10 import pressure_loads_t6
        from tpufem.mesher import nodes_from_params, wing_topology

        topo = wing_topology(self.res)
        basis = jnp.asarray(topo.node_basis, dtype)

        def one(p):
            n4 = nodes_from_params(basis, p[0], p[1], p[2], p[3], topo.te_floor)
            n10 = self.t10.nodes10(n4)
            return pressure_loads_t6(n10, upper_t6, pressure, self.N10)

        f = jax.vmap(one, in_axes=0, out_axes=2)(p4)  # (N10,3,B)
        return to_grid2(self.res, f) * self.free2

    # ------------------------------------------------------------- setup
    def _setup(self, p4, pressure, upper_t6, lam, mu):
        X2 = nodes_grid2(self.res, p4, self.dtype)
        geo = cell_geometry2(self.res, X2)
        Binv = line_blocks10(
            self.res, geo, lam, mu, self.dup2, self.free2, self.dtype
        )
        bg = self._loads_grid2(p4, pressure, upper_t6, self.dtype)
        A = lambda x: strain_apply10(self.res, geo, x, self.free2, lam, mu)  # noqa: E731
        M = lambda r: line_apply10(self.res, Binv, r, self.dup2, self.free2)  # noqa: E731
        nb = p4.shape[0]
        NI2, NK2, NJ2 = self.meta2["NI2"], self.meta2["NK2"], self.meta2["NJ2"]
        v = jnp.sin(jnp.arange(NI2 * NK2 * NJ2 * 3, dtype=self.dtype) * 0.7311)
        v = v.reshape(3, 1, NI2, NK2, NJ2)
        v = jnp.broadcast_to(v, (3, nb, NI2, NK2, NJ2)) * self.dup2 * self.free2
        lmax = jnp.ones((nb,), self.dtype)
        for _ in range(self.power_iters):
            w = M(A(v))
            nrm = jnp.sqrt((w * w).sum(axis=(0, 2, 3, 4)))
            lmax = nrm
            v = w / jnp.maximum(nrm, 1e-30)[None, :, None, None, None]
        lmax = lmax * self.lmax_safety
        smg_state = self.smg.setup(p4, lam, mu)
        return geo, Binv, bg, lmax, smg_state

    def finalize(self, smg_state, p4, lam, mu):
        return self.smg.finalize(smg_state, np.asarray(p4), float(lam), float(mu))

    # ---------------------------------------------------------- V-cycle
    def _chebyshev(self, A, M, r0, lmax, degree):
        lmin = self.smooth_alpha * lmax
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma

        def bc(v):  # (B,) scalars over grid arrays
            return v[None, :, None, None, None]

        d = M(r0) / bc(theta)
        x = d
        for _ in range(degree - 1):
            r = r0 - A(x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = bc(rho_new * rho) * d + bc(2.0 * rho_new / delta) * M(r)
            x = x + d
            rho = rho_new
        return x

    def apply_M(self, geo, Binv, lmax, smg_state, lam, mu, r):
        """One p-MG V-cycle on the doubled grid."""
        A = lambda x: strain_apply10(self.res, geo, x, self.free2, lam, mu)  # noqa: E731
        Ml = lambda rr: line_apply10(self.res, Binv, rr, self.dup2, self.free2)  # noqa: E731
        x = self._chebyshev(A, Ml, r, lmax, self.smooth_degree)
        rr = r - A(x)
        r4 = restrict_p(self.res, rr, self.smg.free_masks[0])
        r4 = r4 * self.smg.dup_masks[0]
        z4 = self.smg._vcycle(smg_state, 0, r4)
        x = x + prolong_p(self.res, z4, self.dup2, self.free2)
        rr = r - A(x)
        x = x + self._chebyshev(A, Ml, rr, lmax, self.smooth_degree)
        return x

    # ------------------------------------------------------------ CG ops
    def _ops(self, geo, Binv, lmax, smg_state, lam, mu):
        A = lambda x: strain_apply10(self.res, geo, x, self.free2, lam, mu)  # noqa: E731
        M = lambda r: self.apply_M(geo, Binv, lmax, smg_state, lam, mu, r)  # noqa: E731

        def dot(u_, v_):
            acc = (u_.astype(jnp.float64) * v_.astype(jnp.float64)).sum(
                axis=(0, 2, 3, 4)
            )
            return acc.astype(u_.dtype)

        return A, M, dot

    def _init(self, geo, Binv, bg, lmax, smg_state, lam, mu, x0):
        from tpufem.fem.stencil_mg import _cg_grid_init

        A, M, dot = self._ops(geo, Binv, lmax, smg_state, lam, mu)
        return _cg_grid_init(A, M, dot, bg, x0)

    def _chunk(self, geo, Binv, lmax, smg_state, lam, mu, cg, tol, maxiter):
        from tpufem.fem.stencil_mg import _cg_grid_run

        A, M, dot = self._ops(geo, Binv, lmax, smg_state, lam, mu)
        return _cg_grid_run(A, M, dot, cg, tol, maxiter)

    # ----------------------------------------------------------- f64 path
    def _ops64(self, geo64, geo, Binv, lmax, smg_state, lam64, mu64):
        f64 = jnp.float64
        free64 = self.free2.astype(f64)
        lam32 = lam64.astype(self.dtype)
        mu32 = mu64.astype(self.dtype)

        def A(x):
            return strain_apply10(self.res, geo64, x, free64, lam64, mu64)

        def M(r):
            z = self.apply_M(
                geo, Binv, lmax, smg_state, lam32, mu32, r.astype(self.dtype)
            )
            return z.astype(f64)

        def dot(u_, v_):
            return (u_ * v_).sum(axis=(0, 2, 3, 4))

        return A, M, dot

    def _init64(self, geo64, bg64, geo, Binv, lmax, smg_state, lam64, mu64, x0):
        from tpufem.fem.stencil_mg import _cg_grid_init

        A, M, dot = self._ops64(geo64, geo, Binv, lmax, smg_state, lam64, mu64)
        return _cg_grid_init(A, M, dot, bg64, x0)

    def _chunk64(self, geo64, geo, Binv, lmax, smg_state, lam64, mu64, cg, tol, maxiter):
        from tpufem.fem.stencil_mg import _cg_grid_run

        A, M, dot = self._ops64(geo64, geo, Binv, lmax, smg_state, lam64, mu64)
        return _cg_grid_run(A, M, dot, cg, tol, maxiter)

    def _resid64(self, geo64, bg64, x64):
        f64 = jnp.float64
        free64 = self.free2.astype(f64)
        lam64 = self._lam64
        mu64 = self._mu64
        r = bg64 - strain_apply10(self.res, geo64, x64, free64, lam64, mu64)
        bn = jnp.sqrt((bg64 * bg64).sum(axis=(0, 2, 3, 4)))
        rn = jnp.sqrt((r * r).sum(axis=(0, 2, 3, 4)))
        return r, rn / jnp.where(bn > 0, bn, 1.0)

    # ---------------------------------------------------------------- API
    def solve(
        self,
        params4,
        upper_face_idx,
        pressure: float = 5e3,
        material=None,
        tol: float = 1e-6,
        maxiter: int = 2000,
        chunk_iters: int = 100,
        outer_f64: bool = False,
        refine_steps: int = 0,
        inner_tol: float = 1e-4,
        progress: bool = False,
    ):
        """Batched tet10 p-MG-PCG solve over the trailing case axis.

        Returns an object with fields (u (N10,3,B), vm (N10,B), iters,
        rel_residual (B,), converged (B,)). u is f64 on the f64-certified
        paths (outer_f64 / refine_steps>0)."""
        from dataclasses import dataclass as _dc

        from tpufem.fem.material import Material, lame_params
        from tpufem.fem.tet10 import tet10_setup, tet10_upper_t6

        material = material or Material()
        lam_exact, mu_exact = lame_params(material)
        lam = jnp.asarray(lam_exact, self.dtype)
        mu = jnp.asarray(mu_exact, self.dtype)
        p4 = jnp.asarray(np.asarray(params4), self.dtype)
        nb = p4.shape[0]
        press = jnp.asarray(pressure, self.dtype)
        upper_t6 = jnp.asarray(tet10_upper_t6(self.t10, upper_face_idx))

        geo, Binv, bg, lmax, smg_state = self._jit_setup(
            p4, press, upper_t6, lam, mu
        )
        smg_state = self.finalize(smg_state, p4, lam, mu)

        @_dc
        class _Result:
            u: np.ndarray
            vm: np.ndarray
            iters: int
            rel_residual: np.ndarray
            converged: np.ndarray

        def run_chunks(chunk_fn, cg, tol_, maxiter_):
            total = 0
            rel = conv = None
            while total < maxiter_:
                step = min(chunk_iters, maxiter_ - total)
                cg, k, rel, conv = chunk_fn(cg, tol_, step)
                total += int(k)
                if progress:
                    print(
                        f"  [tet10-stencil] iters {total}: "
                        f"max rel {float(jnp.max(rel)):.3e}",
                        flush=True,
                    )
                if bool(jnp.all(conv)) or int(k) < step:
                    break
            return cg, total, rel, conv

        def recover(xg):
            """Gather-path nodal stress recovery (once per solve, f64)."""
            f64r = jnp.float64
            x = from_grid2(self.res, xg.astype(f64r))  # (N10,3,B)
            p464 = np.asarray(params4, np.float64)
            from tpufem.fem.tet10 import tet10_stress_nodal
            from tpufem.fem.vonmises import von_mises
            from tpufem.mesher import nodes_from_params, wing_topology

            topo = wing_topology(self.res)
            lam_r = jnp.asarray(lam_exact, f64r)
            mu_r = jnp.asarray(mu_exact, f64r)
            vms = []
            for b in range(nb):
                n4 = nodes_from_params(
                    jnp.asarray(topo.node_basis, f64r), *p464[b], topo.te_floor
                )
                n10 = self.t10.nodes10(n4)
                Jinv, vols = tet10_setup(n10, jnp.asarray(self.t10.tet10))
                s6 = tet10_stress_nodal(
                    Jinv, vols, jnp.asarray(self.t10.tet10), x[:, :, b],
                    lam_r, mu_r, self.N10,
                )
                vms.append(np.asarray(von_mises(s6)))
            return np.stack(vms, axis=1)  # (N10,B)

        if outer_f64 or refine_steps > 0:
            f64 = jnp.float64
            p464 = jnp.asarray(np.asarray(params4), f64)
            press64 = jnp.asarray(pressure, f64)
            self._lam64 = jnp.asarray(lam_exact, f64)
            self._mu64 = jnp.asarray(mu_exact, f64)
            geo64, bg64, host_sys = self._host_setup64(
                p464, press64, upper_t6, device_system=outer_f64
            )

        if outer_f64:
            cg = self._jit_init64(
                geo64, bg64, geo, Binv, lmax, smg_state, self._lam64,
                self._mu64, jnp.zeros_like(bg64),
            )
            chunk_fn = lambda c, t_, s: self._jit_chunk64(  # noqa: E731
                geo64, geo, Binv, lmax, smg_state, self._lam64, self._mu64,
                c, tol=t_, maxiter=s,
            )
            cg, total, rel, conv = run_chunks(chunk_fn, cg, tol, maxiter)
            # Judge on the HOST in real f64, never on the device: the
            # emulated-f64 evaluation floors at eps_dd*kappa_elem (measured
            # 1.4e-6 relative on the 16x24x4 tet10 mesh — above tol 1e-6 —
            # and restarts from a device-evaluated residual stall exactly
            # there). The host residual is exact; the device only solves
            # scaled CORRECTION systems (classical iterative refinement,
            # same scheme as WingStencilT.solve outer64).
            x_np = np.asarray(cg[0])
            prev = np.inf
            for _ in range(6):
                r_h, rel = self._host_resid(host_sys, x_np)
                conv = rel <= tol
                relmax = float(jnp.max(rel))
                if progress:
                    print(f"  [tet10-stencil] host judge: rel {relmax:.3e}",
                          flush=True)
                if bool(jnp.all(conv)) or total >= maxiter or relmax > 0.9 * prev:
                    break
                prev = relmax
                rn = np.sqrt((np.asarray(r_h) ** 2).sum(axis=(0, 2, 3, 4)))
                safe = np.where(rn > 0, rn, 1.0)[None, :, None, None, None]
                rb = jax.device_put(np.asarray(r_h) / safe, jax.devices()[0])
                ccg = self._jit_init64(
                    geo64, rb, geo, Binv, lmax, smg_state, self._lam64,
                    self._mu64, jnp.zeros_like(rb),
                )
                ccg, t2, _, _ = run_chunks(chunk_fn, ccg, 1e-2, maxiter - total)
                total += t2
                x_np = x_np + np.asarray(ccg[0]) * safe
            x64 = jnp.asarray(x_np)
            vm = recover(x64)
            # u stays f64: the reported residual certifies the f64 state
            u = np.asarray(from_grid2(self.res, x64))
            return _Result(u, vm, total, np.asarray(rel), np.asarray(conv))

        chunk_fn = lambda c, t_, s: self._jit_chunk(  # noqa: E731
            geo, Binv, lmax, smg_state, lam, mu, c, tol=t_, maxiter=s
        )
        cg = self._jit_init(geo, Binv, bg, lmax, smg_state, lam, mu,
                            jnp.zeros_like(bg))

        if refine_steps <= 0:
            cg, total, rel, conv = run_chunks(chunk_fn, cg, tol, maxiter)
            xg = cg[0]
            vm = recover(xg)
            u = np.asarray(from_grid2(self.res, xg))
            return _Result(u, vm, total, np.asarray(rel), np.asarray(conv))

        # mixed-precision refinement: f32 solve to inner_tol, then rounds of
        # (true f64 residual -> f32 correction), judged on the f64 residual
        cg, total, _, _ = run_chunks(chunk_fn, cg, inner_tol, maxiter)
        x_np = np.asarray(cg[0], np.float64)
        rel = None
        prev = np.inf
        for _ in range(refine_steps):
            # host-evaluated TRUE residual (see outer_f64 branch): the
            # device's emulated-f64 evaluation cannot judge below its
            # eps_dd*kappa_elem floor
            r_h, rel = self._host_resid(host_sys, x_np)
            relmax = float(jnp.max(rel))
            if progress:
                print(f"  [tet10-stencil] refine: TRUE f64 rel {relmax:.3e}",
                      flush=True)
            if relmax <= tol or total >= maxiter:
                break
            if relmax > 0.5 * prev:
                break  # f32 correction-operator floor reached
            prev = relmax
            rn = np.sqrt((np.asarray(r_h) ** 2).sum(axis=(0, 2, 3, 4)))
            safe = np.where(rn > 0, rn, 1.0)[None, :, None, None, None]
            rb = jax.device_put(
                (np.asarray(r_h) / safe).astype(np.asarray(bg).dtype),
                jax.devices()[0],
            )
            cg2 = self._jit_init(
                geo, Binv, rb, lmax, smg_state, lam, mu, jnp.zeros_like(bg)
            )
            cg2, k, _, _ = run_chunks(chunk_fn, cg2, inner_tol, maxiter - total)
            total += k
            x_np = x_np + np.asarray(cg2[0], np.float64) * safe
        _, rel = self._host_resid(host_sys, x_np)
        x64 = jnp.asarray(x_np)
        vm = recover(x64)
        u = np.asarray(from_grid2(self.res, x64))
        rel = np.asarray(rel)
        return _Result(u, vm, total, rel, rel <= tol)
