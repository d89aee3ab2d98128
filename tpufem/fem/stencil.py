"""Stencil-form wing stiffness: gather-free SpMV on the structured grid.

The Kuhn-subdivided structured wing mesh couples each node only to the 15
lattice offsets {0} u +-{(1,0,0),(0,1,0),(0,0,1),(1,1,0),(0,1,1),(1,0,1),
(1,1,1)} (the Kuhn diagonal runs along (1,1,1)). This module assembles the
stiffness as per-offset (3,3)-block coefficient grids and applies K u as 15
shifted-slice multiply-adds — no gathers, no scatters, no incidence tables.

Why: the incidence-gather SpMV (tpufem.fem.batched_t) measures ~43 ms per
109k-DOF batch-8 application on the v5e while its HBM roofline is ~0.2 ms;
the irregular gathers and their layout padding dominate. The stencil form is
pure dense slicing in the (i, k, j) grid layout (j = span minor axis -> lane
dimension), the formulation XLA tiles well.

Welded nodes (LE always; TE when te_floor == 0) are handled by embedding the
welded system in the full grid: state vectors keep duplicates at ZERO, the
operator wraps K_full as R K_full S with S = spread (k=0 -> all k on weld
lines) and R = S^T = reduce (sum k -> k=0, zero the rest), which reproduces
the welded stiffness exactly (degenerate full-grid tets at welds have zero
volume and contribute nothing, matching the welded mesher's dropped tets).

Grid array layout: state (3, B, NI, NK, NJ); stencil coefficient per offset
(3, 3, B, NI, NK, NJ) stored at the row node. Dirichlet (root, j = 0) by
masking with identity on fixed dofs, as everywhere else in tpufem.fem.

Replaces the CalculiX SpMV role (reference fem.py:524-533) on the hot path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.mesher import _HEX_CORNERS, _KUHN_TETS, WingMeshResolution, wing_topology

# (t, a, b) -> lattice offset of corner b relative to corner a, and the base
# corner offset of a within the cell; precomputed once.
_PAIRS = []
for _t in range(6):
    for _a in range(4):
        for _b in range(4):
            ca = _HEX_CORNERS[_KUHN_TETS[_t, _a]]
            cb = _HEX_CORNERS[_KUHN_TETS[_t, _b]]
            _PAIRS.append((_t, _a, _b, tuple(ca), tuple(cb - ca)))

OFFSETS = sorted({p[4] for p in _PAIRS})  # 15 lattice offsets (di, dj, dk)


@lru_cache(maxsize=16)
def grid_meta(res: WingMeshResolution):
    """Static grid facts + welded-node <-> grid index maps for a resolution."""
    topo = wing_topology(res)
    NI, NJ, NK = res.n_chord + 1, res.n_span + 1, res.n_thick + 1
    st = topo.station_id.astype(np.int64)
    gi = (st // NJ).astype(np.int32)
    gj = (st % NJ).astype(np.int32)
    gk = topo.slot.astype(np.int32)
    weld_te = res.te_floor_frac == 0.0
    return {
        "NI": NI,
        "NJ": NJ,
        "NK": NK,
        "gi": gi,
        "gj": gj,
        "gk": gk,
        "weld_te": weld_te,
        "num_nodes": topo.num_nodes,
    }


def nodes_grid(res: WingMeshResolution, p4, dtype, yfrac=None):
    """Full-grid node coordinates (3, B, NI, NK, NJ) from (B,4) params.

    yfrac overrides the span-fraction vector (default: the full 0..1 grid);
    a device-local slice of it yields that device's span-slab coordinates —
    the hook the span-sharded solver (tpufem.parallel.shard_stencil) uses to
    build per-slab geometry without any host-side global array."""
    from tpufem.geometry import cosine_stations, le_stations, naca00xx_half_thickness

    NI, NK = res.n_chord + 1, res.n_thick + 1
    s = jnp.asarray(
        (le_stations if res.spacing == "le" else cosine_stations)(res.n_chord), dtype
    )  # (NI,)
    zbase = jnp.asarray(
        naca00xx_half_thickness(
            np.asarray(
                (le_stations if res.spacing == "le" else cosine_stations)(res.n_chord)
            ),
            1.0,
        ),
        dtype,
    )  # (NI,)
    if yfrac is None:
        yfrac = jnp.asarray(np.arange(res.n_span + 1) / res.n_span, dtype)  # (NJ,)
    else:
        yfrac = jnp.asarray(yfrac, dtype)
    NJ = yfrac.shape[0]
    zfrac = jnp.asarray(2.0 * np.arange(NK) / res.n_thick - 1.0, dtype)  # (NK,)
    span, chord, sweep, t = (p4[:, i] for i in range(4))  # (B,)

    y = span[:, None] * yfrac[None, :]  # (B, NJ)
    x = (
        chord[:, None, None] * s[None, :, None]
        + jnp.tan(jnp.deg2rad(sweep))[:, None, None] * y[:, None, :]
    )  # (B, NI, NJ)
    half = jnp.maximum(
        t[:, None] * zbase[None, :], jnp.asarray(res.te_floor_frac, dtype) * s[None, :]
    )  # (B, NI)
    z = chord[:, None, None] * half[:, :, None] * zfrac[None, None, :]  # (B, NI, NK)
    B = p4.shape[0]
    X = jnp.zeros((3, B, NI, NK, NJ), dtype)
    X = X.at[0].set(x[:, :, None, :])
    X = X.at[1].set(jnp.broadcast_to(y[:, None, None, :], (B, NI, NK, NJ)))
    X = X.at[2].set(z[:, :, :, None])
    return X


def _cross0(u, v):
    """Cross product on axis 0 of (3, ...) arrays."""
    return jnp.stack(
        [
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        ],
        axis=0,
    )


def assemble_stencil(res: WingMeshResolution, X, lam, mu, offsets=None):
    """Per-offset stiffness coefficient grids from full-grid coords X.

    Returns {offset: (3,3,B,NI,NK,NJ)}; coefficients of degenerate (zero-
    volume) tets at weld lines vanish automatically. `offsets` restricts
    assembly to a subset (e.g. the (0,0,dk) same-station offsets feeding the
    thickness-line blocks).

    NOTE (f32): assembled coefficients are fine for building the line-block
    preconditioner, but do NOT use them as the CG operator in f32 — see
    cell_geometry/strain_apply for why.
    """
    NI, NK, NJ = X.shape[2], X.shape[3], X.shape[4]
    nc, nt, ns = NI - 1, NK - 1, NJ - 1
    B = X.shape[1]
    dtype = X.dtype

    def corner(c):
        di, dj, dk = _HEX_CORNERS[c]
        return X[:, :, di : di + nc, dk : dk + nt, dj : dj + ns]

    corners = [corner(c) for c in range(8)]
    keep = set(OFFSETS if offsets is None else offsets)
    C = {o: jnp.zeros((3, 3, B, NI, NK, NJ), dtype) for o in OFFSETS if o in keep}
    eye3 = jnp.eye(3, dtype=dtype)

    for t in range(6):
        c0, c1, c2, c3 = (_KUHN_TETS[t, a] for a in range(4))
        x0 = corners[c0]
        e1 = corners[c1] - x0
        e2 = corners[c2] - x0
        e3 = corners[c3] - x0
        det = (e1 * _cross0(e2, e3)).sum(axis=0)  # (B,nc,nt,ns)
        # Degeneracy must be judged RELATIVE to the edge scale: collapsed weld
        # tets have det = rounding residue (~eps * |e|^3, measured 5e-20 in
        # f64), and vol * (c/det)^2 on that residue produces 1e25 garbage.
        # Real thin wing tets sit at |det|/scale ~ 1e-3, far above the cut.
        scale = (
            jnp.sqrt((e1 * e1).sum(axis=0))
            * jnp.sqrt((e2 * e2).sum(axis=0))
            * jnp.sqrt((e3 * e3).sum(axis=0))
        )
        degen = jnp.abs(det) <= 1e-6 * scale
        # |det|: collapsed weld cells also contain inverted tets in the
        # canonical corner order (the welded mesher pre-flips them); gradients
        # g = c/det are orientation-invariant, so only the volume takes abs.
        vol = jnp.where(degen, 0.0, jnp.abs(det) / 6.0)
        safe = jnp.where(degen, 1.0, det)
        g1 = _cross0(e2, e3) / safe
        g2 = _cross0(e3, e1) / safe
        g3 = _cross0(e1, e2) / safe
        g0 = -(g1 + g2 + g3)
        g = [g0, g1, g2, g3]  # each (3,B,nc,nt,ns)
        for a in range(4):
            ga = g[a]
            ia, ja, ka = _HEX_CORNERS[_KUHN_TETS[t, a]]
            for b in range(4):
                off = tuple(_HEX_CORNERS[_KUHN_TETS[t, b]] - _HEX_CORNERS[_KUHN_TETS[t, a]])
                if off not in keep:
                    continue
                gb = g[b]
                dot = (ga * gb).sum(axis=0)
                kab = vol[None, None] * (
                    lam * ga[:, None] * gb[None, :]
                    + mu * gb[:, None] * ga[None, :]
                    + mu * dot[None, None] * eye3[:, :, None, None, None, None]
                )  # (3,3,B,nc,nt,ns)
                C[off] = C[off].at[
                    :, :, :, ia : ia + nc, ka : ka + nt, ja : ja + ns
                ].add(kab)
    return C


def cell_geometry(res: WingMeshResolution, X):
    """Per-tet gradients/volumes in cell-grid layout.

    Returns (g (6,4,3,B,nc,nt,ns), vol (6,B,nc,nt,ns)). Feeds strain_apply —
    the f32-SAFE operator: pre-assembled stencil coefficients lose the small
    force residual of large cancelling K entries (thin wing: |y| ~ 1e-4
    |C||u|, so f32 assembly noise is ~1e-3 RELATIVE to the result and CG
    diverges — measured), while computing strain first keeps everything at
    physical scale.
    """
    NI, NK, NJ = X.shape[2], X.shape[3], X.shape[4]
    nc, nt, ns = NI - 1, NK - 1, NJ - 1

    def corner(c):
        di, dj, dk = _HEX_CORNERS[c]
        return X[:, :, di : di + nc, dk : dk + nt, dj : dj + ns]

    corners = [corner(c) for c in range(8)]
    gs, vols = [], []
    for t in range(6):
        c0, c1, c2, c3 = (_KUHN_TETS[t, a] for a in range(4))
        x0 = corners[c0]
        e1 = corners[c1] - x0
        e2 = corners[c2] - x0
        e3 = corners[c3] - x0
        det = (e1 * _cross0(e2, e3)).sum(axis=0)
        scale = (
            jnp.sqrt((e1 * e1).sum(axis=0))
            * jnp.sqrt((e2 * e2).sum(axis=0))
            * jnp.sqrt((e3 * e3).sum(axis=0))
        )
        degen = jnp.abs(det) <= 1e-6 * scale
        vol = jnp.where(degen, 0.0, jnp.abs(det) / 6.0)
        safe = jnp.where(degen, 1.0, det)
        g1 = _cross0(e2, e3) / safe
        g2 = _cross0(e3, e1) / safe
        g3 = _cross0(e1, e2) / safe
        g0 = -(g1 + g2 + g3)
        gs.append(jnp.stack([g0, g1, g2, g3], axis=0))  # (4,3,B,nc,nt,ns)
        vols.append(vol)
    return jnp.stack(gs, axis=0), jnp.stack(vols, axis=0)


def strain_apply(res: WingMeshResolution, geo, u, free, lam, mu):
    """y = A_w u, strain-first matrix-free on the grid (f32-safe, no gathers).

    Same wrap semantics as stencil_apply; per cell the 6 Kuhn tets read their
    corner slabs (slices), compute sigma(eps(u)), and force contributions are
    written back with shifted-slice adds.
    """
    g, vol = geo
    us = weld_spread(res, u * free)
    NI, NK, NJ = us.shape[2], us.shape[3], us.shape[4]
    nc, nt, ns = NI - 1, NK - 1, NJ - 1

    def corner_slab(c):
        di, dj, dk = _HEX_CORNERS[c]
        return us[:, :, di : di + nc, dk : dk + nt, dj : dj + ns]

    uc = [corner_slab(c) for c in range(8)]
    y = jnp.zeros_like(us)
    idx3 = jnp.arange(3)
    for t in range(6):
        # H_{de} = sum_a g[t,a,d] * u_a[e]
        H = None
        for a in range(4):
            term = g[t, a][:, None] * uc[_KUHN_TETS[t, a]][None, :]  # (3,3,B,...)
            H = term if H is None else H + term
        eps = 0.5 * (H + jnp.swapaxes(H, 0, 1))
        tr = eps[0, 0] + eps[1, 1] + eps[2, 2]
        sig = 2.0 * mu * eps
        sig = sig.at[idx3, idx3].add(lam * tr[None])
        sw = sig * vol[t][None, None]
        for a in range(4):
            fe = (sw * g[t, a][None, :]).sum(axis=1)  # (3,B,nc,nt,ns)
            ia, ja, ka = _HEX_CORNERS[_KUHN_TETS[t, a]]
            y = y.at[:, :, ia : ia + nc, ka : ka + nt, ja : ja + ns].add(fe)
    y = weld_reduce(res, y) * free
    return y + u * (1.0 - free)


def weld_spread(res: WingMeshResolution, u):
    """S: copy k=0 values across the thickness on weld lines (LE; TE if sharp)."""
    NK = u.shape[-2]
    u = u.at[..., 0, :, :].set(jnp.broadcast_to(u[..., 0, 0:1, :], u[..., 0, :, :].shape))
    if res.te_floor_frac == 0.0:
        u = u.at[..., -1, :, :].set(
            jnp.broadcast_to(u[..., -1, 0:1, :], u[..., -1, :, :].shape)
        )
    return u


def weld_reduce(res: WingMeshResolution, y):
    """R = S^T: sum thickness values into k=0 on weld lines, zero the rest."""
    NK = y.shape[-2]
    mask = jnp.zeros((NK,), y.dtype).at[0].set(1.0)
    tot = y[..., 0, :, :].sum(axis=-2, keepdims=True)  # (..., 1, NJ)
    y = y.at[..., 0, :, :].set(tot * mask[:, None])
    if res.te_floor_frac == 0.0:
        tot = y[..., -1, :, :].sum(axis=-2, keepdims=True)
        y = y.at[..., -1, :, :].set(tot * mask[:, None])
    return y


def root_mask(shape, dtype):
    """(1,1,1,1,NJ) Dirichlet mask zeroing j = 0."""
    NJ = shape[-1]
    m = jnp.ones((NJ,), dtype).at[0].set(0.0)
    return m[None, None, None, None, :]


def stencil_apply(res: WingMeshResolution, C, u, free):
    """y = A_w u: welded + Dirichlet-wrapped stencil SpMV.

    u: (3,B,NI,NK,NJ) active form (zero at duplicates and fixed dofs encoded
    by `free`, a broadcastable 0/1 mask). Returns same-shape y with identity
    on fixed dofs.
    """
    us = weld_spread(res, u * free)
    NI, NK, NJ = us.shape[2], us.shape[3], us.shape[4]
    up = jnp.pad(us, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    y = None
    for (di, dj, dk), Co in C.items():
        sl = up[:, :, 1 + di : 1 + di + NI, 1 + dk : 1 + dk + NK, 1 + dj : 1 + dj + NJ]
        term = (Co * sl[None]).sum(axis=1)  # (3,B,NI,NK,NJ)
        y = term if y is None else y + term
    y = weld_reduce(res, y) * free
    return y + u * (1.0 - free)


def to_grid(res: WingMeshResolution, v_nodes):
    """Welded node vector (N,3,B) -> active grid form (3,B,NI,NK,NJ)."""
    m = grid_meta(res)
    g = jnp.zeros((3, v_nodes.shape[2], m["NI"], m["NK"], m["NJ"]), v_nodes.dtype)
    vb = jnp.moveaxis(v_nodes, 1, 0)  # (3,N,B)
    return g.at[:, :, m["gi"], m["gk"], m["gj"]].set(jnp.moveaxis(vb, 2, 1))


def from_grid(res: WingMeshResolution, g):
    """Active grid form -> welded node vector (N,3,B)."""
    m = grid_meta(res)
    v = g[:, :, m["gi"], m["gk"], m["gj"]]  # (3,B,N)
    return jnp.transpose(v, (2, 0, 1))
