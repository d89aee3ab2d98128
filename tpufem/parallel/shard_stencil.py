"""Span-sharded stencil multigrid: the flagship-scale mesh-sharded solver.

BASELINE config 5 ("tet10 ~1M-DOF mesh-sharded PCG over ICI") demands the
FULL production preconditioner — geometric/p multigrid — inside the sharded
operator: the round-2 halo solver carried only line+RBM, which needs O(10^3)
iterations at flagship conditioning (VERDICT round 2, next-round #1). This
module shards the grid-native engines (tpufem.fem.stencil_mg for tet4,
tpufem.fem.tet10_stencil for tet10) along the SPAN axis of the structured
grid over a 1-D jax.sharding.Mesh with explicit ppermute halo traffic.

Decomposition: overlapping slabs. Each device holds c+1 node layers
[d*c, (d+1)*c] (tet10: 2c+1 doubled layers) — the boundary layer is HELD BY
BOTH neighbors and kept numerically consistent, so the device computes
exactly its c span-cells with NO read halo; every operator/assembly output
is repaired by one `_sync` = 2 ppermutes (exchange the partial sums both
copies of a shared layer computed). Transpose-type ops (restriction) zero
the non-owned copy first (`_own`), compute locally, then `_sync`. All other
MG machinery — thickness-line solves, Chebyshev, chord/thickness transfers,
weld wraps — is span-local and runs unmodified single-device code on slabs.

The hierarchy stays sharded while the span cell count divides the device
count (flagship DOF1M_TET10 over 8 devices: tet10 fine + tet4 levels
128/64/32/16 all sharded); coarser levels are REPLICATED — the level's
residual is all_gather'ed once and the tiny tail (including the exact dense
coarsest) runs redundantly on every device via the unmodified StencilMG.

Per-CG-iteration ICI traffic: a handful of single-layer exchanges (operator
sync, per-level transfer syncs) + psum scalars — O(NI*NK) halo bytes vs
O(grid/D) compute, the standard surface-to-volume scaling.

Replaces: reference CalculiX single-node solve (fem.py:524-533) at scales
one chip cannot hold.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.fem.material import Material, lame_params
from tpufem.fem.stencil import (
    assemble_stencil,
    cell_geometry,
    nodes_grid,
    strain_apply,
    weld_reduce,
    weld_spread,
)
from tpufem.fem.stencil_mg import (
    StencilMG,
    _interp_axis,
    _LINE_OFFSETS,
    _restrict_axis,
    hierarchy_resolutions,
)
from tpufem.mesher import WingMeshResolution


# ------------------------------------------------------------ collectives


def _sync(y, axis, span_axis=-1):
    """Repair shared span layers: both copies := sum of the two partials.

    Device d's LAST layer and device d+1's FIRST layer are the same global
    layer; each holds a partial (contributions from its own cells)."""
    L = y.shape[span_axis]
    first = jax.lax.slice_in_dim(y, 0, 1, axis=span_axis)
    last = jax.lax.slice_in_dim(y, L - 1, L, axis=span_axis)
    n = jax.lax.psum(1, axis)  # device count (static under shard_map)
    fwd = [(d, d + 1) for d in range(n - 1)]
    bwd = [(d + 1, d) for d in range(n - 1)]
    from_next = jax.lax.ppermute(first, axis, bwd) if n > 1 else jnp.zeros_like(first)
    from_prev = jax.lax.ppermute(last, axis, fwd) if n > 1 else jnp.zeros_like(last)
    idx = [slice(None)] * y.ndim
    idx[span_axis] = slice(L - 1, L)
    y = y.at[tuple(idx)].add(from_next)
    idx[span_axis] = slice(0, 1)
    y = y.at[tuple(idx)].add(from_prev)
    return y


def _own(y, axis, span_axis=-1):
    """Ownership mask for transpose-type reads: zero the FIRST span layer on
    every device but the first (the shared layer's owner is the earlier
    device), so each global layer is read exactly once."""
    d = jax.lax.axis_index(axis)
    L = y.shape[span_axis]
    m = jnp.ones((L,), y.dtype).at[0].set(jnp.where(d == 0, 1.0, 0.0))
    shape = [1] * y.ndim
    shape[span_axis] = L
    return y * m.reshape(shape)


def _gather_full(y, axis, span_axis=-1):
    """Assemble the full span axis from consistent overlapping slabs; the
    result is REPLICATED on every device."""
    g = jax.lax.all_gather(y, axis)  # (D, ..., c+1)
    D = g.shape[0]
    sa = span_axis if span_axis >= 0 else y.ndim + span_axis
    parts = [jax.lax.slice_in_dim(g[d], 0, g.shape[sa + 1] - 1, axis=sa)
             for d in range(D - 1)]
    parts.append(g[D - 1])
    return jnp.concatenate(parts, axis=sa)


def _slice_local(y_full, c, axis, span_axis=-1):
    """Device-local overlapping slab [d*c, d*c + c] of a replicated array."""
    d = jax.lax.axis_index(axis)
    sa = span_axis if span_axis >= 0 else y_full.ndim + span_axis
    return jax.lax.dynamic_slice_in_dim(y_full, d * c, c + 1, axis=sa)


# -------------------------------------------------------------- planning


@dataclass(frozen=True)
class ShardPlan:
    res: WingMeshResolution
    n_devices: int
    element: str
    n_shard: int  # leading tet4 levels kept sharded
    cells: tuple  # per-device span cells per sharded level


def make_plan(res: WingMeshResolution, n_devices: int, element: str = "tet4"):
    levels = hierarchy_resolutions(res)
    D = n_devices
    n_shard = 0
    for li, rl in enumerate(levels[:-1]):  # coarsest is always replicated
        if rl.n_span % D or rl.n_span // D < 1:
            break
        if li > 0 and (levels[li - 1].n_span // D) % 2:
            break  # sharded->sharded restriction needs even fine cells/device
        n_shard += 1
    if n_shard == 0:
        raise ValueError(
            f"span cells {res.n_span} not shardable over {D} devices"
        )
    cells = tuple(levels[li].n_span // D for li in range(n_shard))
    return ShardPlan(res, D, element, n_shard, cells), levels


# ---------------------------------------------------- per-level local ops


def _dup_local(smg: StencilMG, li: int):
    """Span-uniform duplicate mask slice (1,1,NI,NK,1) of level li."""
    return smg.dup_masks[li][..., :1]


def _free_local(axis, L, dtype):
    """(1,1,1,1,L) Dirichlet mask: global j=0 lives on device 0 only."""
    d = jax.lax.axis_index(axis)
    m = jnp.ones((L,), dtype).at[0].set(jnp.where(d == 0, 0.0, 1.0))
    return m.reshape(1, 1, 1, 1, L)


def _line_blocks_local(res, C, dtype, axis):
    """StencilMG._line_blocks on a local slab: C are SYNCED per-offset
    stencil coefficients (3,3,B,NI,NK,L); Dirichlet identity applied only on
    device 0 via a traced select."""
    from tpufem.fem.precond import spd_block_inverse

    NI, NK = res.n_chord + 1, res.n_thick + 1
    L = C[(0, 0, 0)].shape[-1]
    D = 3 * NK
    nb = C[(0, 0, 0)].shape[2]
    Bm = jnp.zeros((NI, L, NK, 3, NK, 3, nb), dtype)
    for dk in (-1, 0, 1):
        Co = C.get((0, 0, dk))
        if Co is None:
            continue
        Cp = jnp.transpose(Co, (3, 5, 4, 0, 1, 2))  # (NI,L,NK,3,3,B)
        for k in range(NK):
            k2 = k + dk
            if 0 <= k2 < NK:
                Bm = Bm.at[:, :, k, :, k2, :].set(Cp[:, :, k])
    Bm = Bm.reshape(NI, L, D, D, nb)
    welds = [0] + ([NI - 1] if res.te_floor_frac == 0.0 else [])
    eyeD = jnp.eye(D, dtype=dtype)
    for iw in welds:
        blk = Bm[iw].reshape(L, NK, 3, NK, 3, nb).sum(axis=(1, 3))
        row = jnp.broadcast_to(eyeD[None, :, :, None], (L, D, D, nb))
        row = row.at[:, :3, :3, :].set(blk)
        Bm = Bm.at[iw].set(row)
    # Dirichlet j=0 on device 0 only
    dflag = (jax.lax.axis_index(axis) == 0).astype(dtype)
    eye_row = jnp.broadcast_to(eyeD[None, :, :, None], (NI, D, D, nb))
    Bm = Bm.at[:, 0].set(dflag * eye_row + (1.0 - dflag) * Bm[:, 0])
    flat = jnp.moveaxis(Bm, -1, 2).reshape(NI * L * nb, D, D)
    inv = spd_block_inverse(flat)
    return jnp.moveaxis(inv.reshape(NI, L, nb, D, D), 2, -1)


def _line_apply_local(res, Binv, rg, dup1, freeL):
    NI, NK = res.n_chord + 1, res.n_thick + 1
    L = rg.shape[-1]
    D = 3 * NK
    rs = jnp.transpose(rg, (2, 4, 3, 0, 1)).reshape(NI, L, D, -1)
    zs = (Binv * rs[:, :, None, :, :]).sum(axis=3)
    z = jnp.transpose(zs.reshape(NI, L, NK, 3, -1), (3, 4, 0, 2, 1))
    return z * dup1 * freeL


def _restrict_span_local(x):
    """Span-axis restriction on an owned (first-layer-zeroed) slab; caller
    syncs the result. fine c+1 layers (c even) -> coarse c/2+1 layers."""
    even = x[..., 0::2]
    odd = x[..., 1::2]
    out = even
    out = out.at[..., :-1].add(0.5 * odd)
    out = out.at[..., 1:].add(0.5 * odd)
    return out


def _interp_span_local(xc):
    """Span-axis prolongation: coarse c/2+1 -> fine c+1 layers; shared-layer
    consistency is automatic (even layers copy the shared coarse layer)."""
    cshape = list(xc.shape)
    cshape[-1] = 2 * (xc.shape[-1] - 1) + 1
    out = jnp.zeros(cshape, xc.dtype)
    out = out.at[..., 0::2].set(xc)
    out = out.at[..., 1::2].set(0.5 * (xc[..., :-1] + xc[..., 1:]))
    return out


# ------------------------------------------------------------- the solver


class ShardedStencilSolver:
    """Span-sharded MG-PCG for the structured wing (tet4 or tet10, B=1).

    All per-device state (geometry, line-block inverses, smoothing bounds) is
    computed INSIDE shard_map from the wing parameters and the device index —
    no host-side global arrays at the sharded levels; only the replicated
    coarse tail and the load vector are built globally (both tiny relative to
    the fine grid).
    """

    def __init__(
        self,
        res: WingMeshResolution,
        n_devices: int,
        element: str = "tet4",
        dtype=jnp.float32,
        axis: str = "mesh",
        smooth_degree: int = 2,
        smooth_alpha: float = 0.25,
        power_iters: int = 10,
        lmax_safety: float = 1.2,
    ):
        self.res = res
        self.element = element
        self.dtype = dtype
        self.axis = axis
        self.smooth_degree = smooth_degree
        self.smooth_alpha = smooth_alpha
        self.power_iters = power_iters
        self.lmax_safety = lmax_safety
        self.plan, self.levels = make_plan(res, n_devices, element)
        self.smg = StencilMG(res, dtype=dtype, smooth_degree=smooth_degree,
                             smooth_alpha=smooth_alpha, power_iters=power_iters,
                             lmax_safety=lmax_safety)
        assert self.smg.resolutions == self.levels
        self.rep_smg = StencilMG(
            self.levels[self.plan.n_shard], dtype=dtype,
            smooth_degree=smooth_degree, smooth_alpha=smooth_alpha,
            power_iters=power_iters, lmax_safety=lmax_safety,
        )
        if element == "tet10":
            from tpufem.fem.tet10_stencil import dup_mask2, grid_meta2

            self.meta2 = grid_meta2(res)
            self.dup2_local = dup_mask2(res, dtype)[..., :1]  # span-uniform

    # ------------------------------------------------- sharded level setup
    def _yfrac_local(self, li):
        c = self.plan.cells[li]
        n_span = self.levels[li].n_span

        def f(axis):
            d = jax.lax.axis_index(axis)
            return (d * c + jnp.arange(c + 1, dtype=jnp.float64)) / n_span

        return f

    def _setup_level(self, li, p4, lam, mu, dtype):
        """Per-device state of sharded tet4 level li (called inside shard_map)."""
        axis = self.axis
        rl = self.levels[li]
        c = self.plan.cells[li]
        yfrac = self._yfrac_local(li)(axis)
        X = nodes_grid(rl, p4, dtype, yfrac=yfrac)
        geo = cell_geometry(rl, X)
        C = assemble_stencil(rl, X, lam, mu, offsets=_LINE_OFFSETS)
        C = {o: _sync(v, axis) for o, v in C.items()}
        Binv = _line_blocks_local(rl, C, dtype, axis)
        freeL = _free_local(axis, c + 1, dtype)
        dup1 = _dup_local(self.smg, li)

        def A(x):
            return _sync(strain_apply(rl, geo, x, freeL, lam, mu), axis)

        def M(r):
            return _line_apply_local(rl, Binv, r, dup1, freeL)

        lmax = self._power_lmax(li, A, M, p4.shape[0], c, dtype)
        return {"geo": geo, "Binv": Binv, "lmax": lmax, "freeL": freeL,
                "dup1": dup1}

    def _power_lmax(self, li, A, M, nb, c, dtype):
        axis = self.axis
        rl = self.levels[li]
        NI, NK = rl.n_chord + 1, rl.n_thick + 1
        d = jax.lax.axis_index(axis)
        jg = d * c + jnp.arange(c + 1)
        gidx = (
            jnp.arange(NI)[:, None, None] * (NK * (rl.n_span + 1))
            + jnp.arange(NK)[None, :, None] * (rl.n_span + 1)
            + jg[None, None, :]
        )
        v = jnp.sin(gidx.astype(dtype) * 0.7311)[None, None]
        v = jnp.broadcast_to(v * jnp.ones((3, nb, 1, 1, 1), dtype),
                             (3, nb, NI, NK, c + 1))
        v = v * _dup_local(self.smg, li) * _free_local(axis, c + 1, dtype)
        lam_ = jnp.ones((nb,), dtype)
        for _ in range(self.power_iters):
            w = M(A(v))
            nrm = jnp.sqrt(jax.lax.psum(
                (_own(w, axis) * _own(w, axis)).sum(axis=(0, 2, 3, 4)), axis))
            lam_ = nrm
            v = w / jnp.maximum(nrm, 1e-30)[None, :, None, None, None]
        return lam_ * self.lmax_safety

    # ------------------------------------------------------ sharded V-cycle
    def _chebyshev(self, A, M, r0, lmax, degree):
        lmin = self.smooth_alpha * lmax
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma

        def bc(v):
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

    def _restrict_shard(self, li, vec, lam, mu):
        """Sharded level li -> li+1 (both sharded)."""
        axis = self.axis
        rf, rc = self.levels[li], self.levels[li + 1]
        cf = self.plan.cells[li]
        x = vec * _dup_local(self.smg, li) * _free_local(axis, cf + 1, vec.dtype)
        x = _own(x, axis)
        x = _restrict_span_local(x)
        if rc.n_thick != rf.n_thick:
            x = _restrict_axis(x, 3, 0.5, 0.5)
        wL, wR = self.smg.chord_w[li]
        x = _restrict_axis(x, 2, wL.astype(x.dtype), wR.astype(x.dtype))
        x = weld_reduce(rc, x)
        x = _sync(x, axis)
        return x * _free_local(axis, self.plan.cells[li + 1] + 1, vec.dtype)

    def _prolong_shard(self, li, xc):
        rf, rc = self.levels[li], self.levels[li + 1]
        axis = self.axis
        x = weld_spread(rc, xc)
        wL, wR = self.smg.chord_w[li]
        x = _interp_axis(x, 2, rf.n_chord + 1, wL.astype(x.dtype), wR.astype(x.dtype))
        if rc.n_thick != rf.n_thick:
            x = _interp_axis(x, 3, rf.n_thick + 1, 0.5, 0.5)
        x = _interp_span_local(x)
        cf = self.plan.cells[li]
        return x * _dup_local(self.smg, li) * _free_local(axis, cf + 1, x.dtype)

    def _restrict_to_rep(self, li, vec):
        """Sharded level li -> replicated level li+1 == n_shard."""
        axis = self.axis
        rf, rc = self.levels[li], self.levels[li + 1]
        full = _gather_full(vec, axis)
        # single-device restriction (StencilMG._restrict semantics)
        x = full * self.smg.dup_masks[li] * self.smg.free_masks[li]
        x = _restrict_axis(x, 4, 0.5, 0.5)
        if rc.n_thick != rf.n_thick:
            x = _restrict_axis(x, 3, 0.5, 0.5)
        wL, wR = self.smg.chord_w[li]
        x = _restrict_axis(x, 2, wL.astype(x.dtype), wR.astype(x.dtype))
        x = weld_reduce(rc, x)
        return x * self.smg.free_masks[li + 1]

    def _prolong_from_rep(self, li, xc_full):
        """Replicated level li+1 -> sharded level li local slab."""
        axis = self.axis
        rf, rc = self.levels[li], self.levels[li + 1]
        x = weld_spread(rc, xc_full)
        wL, wR = self.smg.chord_w[li]
        x = _interp_axis(x, 2, rf.n_chord + 1, wL.astype(x.dtype), wR.astype(x.dtype))
        if rc.n_thick != rf.n_thick:
            x = _interp_axis(x, 3, rf.n_thick + 1, 0.5, 0.5)
        x = _interp_axis(x, 4, rf.n_span + 1, 0.5, 0.5)
        x = x * self.smg.dup_masks[li] * self.smg.free_masks[li]
        return _slice_local(x, self.plan.cells[li], axis)

    def _vcycle_shard(self, li, sstate, rep_state, rg, lam, mu):
        axis = self.axis
        n_shard = self.plan.n_shard
        st = sstate[li]
        rl = self.levels[li]

        def A(x):
            return _sync(strain_apply(rl, st["geo"], x, st["freeL"], lam, mu), axis)

        def M(r):
            return _line_apply_local(rl, st["Binv"], r, st["dup1"], st["freeL"])

        x = self._chebyshev(A, M, rg, st["lmax"], self.smooth_degree)
        rr = rg - A(x)
        if li + 1 == n_shard:
            rc_full = self._restrict_to_rep(li, rr)
            zc_full = self.rep_smg._vcycle(rep_state, 0, rc_full)
            x = x + self._prolong_from_rep(li, zc_full)
        else:
            rc = self._restrict_shard(li, rr, lam, mu)
            zc = self._vcycle_shard(li + 1, sstate, rep_state, rc, lam, mu)
            x = x + self._prolong_shard(li, zc)
        rr = rg - A(x)
        x = x + self._chebyshev(A, M, rr, st["lmax"], self.smooth_degree)
        return x

    # -------------------------------------------------------- tet10 layer
    def _setup_tet10(self, p4, lam, mu, dtype):
        """Per-device tet10 fine-level state (doubled-grid slab)."""
        from tpufem.fem.tet10_stencil import (
            cell_geometry2,
            line_blocks10_finalize,
            line_blocks10_raw,
            nodes_grid2,
        )

        axis = self.axis
        res = self.res
        c = self.plan.cells[0]
        # doubled-grid slab coords: corner slab from local yfrac, midpoints
        # interpolated locally (nodes_grid2 on a span slab)
        yfrac = self._yfrac_local(0)(axis)

        # local doubled grid via nodes_grid2's machinery on the slab: rebuild
        # by interpolating the local corner grid (2c+1 doubled layers)
        X4 = nodes_grid(res, p4, dtype, yfrac=yfrac)  # (3,B,NI,NK,c+1)
        from tpufem.fem.tet10_stencil import _POS_OFFSETS

        NI, NK = res.n_chord + 1, res.n_thick + 1
        B = X4.shape[1]
        X2 = jnp.zeros((3, B, 2 * NI - 1, 2 * NK - 1, 2 * c + 1), dtype)
        X2 = X2.at[:, :, ::2, ::2, ::2].set(X4)
        for di, dj, dk in _POS_OFFSETS:
            A_ = X4[:, :, : NI - di, : NK - dk, : c + 1 - dj]
            Bp = X4[:, :, di:, dk:, dj:]
            X2 = X2.at[:, :, di::2, dk::2, dj::2].set(0.5 * (A_ + Bp))

        geo = cell_geometry2(res, X2)
        Bm = line_blocks10_raw(res, geo, lam, mu, dtype)
        Bm = _sync(Bm, axis, span_axis=1)
        free2 = _free_local(axis, 2 * c + 1, dtype)
        Binv = line_blocks10_finalize(res, Bm, self.dup2_local, free2)

        from tpufem.fem.tet10_stencil import line_apply10, strain_apply10

        def A(x):
            return _sync(strain_apply10(res, geo, x, free2, lam, mu), axis)

        def M(r):
            return line_apply10(res, Binv, r, self.dup2_local, free2)

        # lmax by power iteration (global dots)
        NI2, NK2 = 2 * NI - 1, 2 * NK - 1
        d = jax.lax.axis_index(axis)
        jg = 2 * d * c + jnp.arange(2 * c + 1)
        gidx = (
            jnp.arange(NI2)[:, None, None] * (NK2 * (2 * res.n_span + 1))
            + jnp.arange(NK2)[None, :, None] * (2 * res.n_span + 1)
            + jg[None, None, :]
        )
        nb = p4.shape[0]
        v = jnp.sin(gidx.astype(dtype) * 0.7311)[None, None]
        v = jnp.broadcast_to(v * jnp.ones((3, nb, 1, 1, 1), dtype),
                             (3, nb, NI2, NK2, 2 * c + 1))
        v = v * self.dup2_local * free2
        lam_ = jnp.ones((nb,), dtype)
        for _ in range(self.power_iters):
            w = M(A(v))
            nrm = jnp.sqrt(jax.lax.psum(
                (_own(w, axis) ** 2).sum(axis=(0, 2, 3, 4)), axis))
            lam_ = nrm
            v = w / jnp.maximum(nrm, 1e-30)[None, :, None, None, None]
        return {"geo": geo, "Binv": Binv, "lmax": lam_ * self.lmax_safety,
                "free2": free2}

    def _apply_M10(self, st10, sstate, rep_state, r, lam, mu):
        """Sharded p-MG V-cycle: tet10 smoothing + sharded tet4 correction."""
        from tpufem.fem.tet10_stencil import (
            line_apply10,
            prolong_p,
            restrict_p,
            strain_apply10,
        )

        axis = self.axis
        res = self.res

        def A(x):
            return _sync(strain_apply10(res, st10["geo"], x, st10["free2"], lam, mu), axis)

        def Ml(rr):
            return line_apply10(res, st10["Binv"], rr, self.dup2_local, st10["free2"])

        x = self._chebyshev(A, Ml, r, st10["lmax"], self.smooth_degree)
        rr = r - A(x)
        cf = self.plan.cells[0]
        free4 = _free_local(axis, cf + 1, rr.dtype)
        r4 = restrict_p(res, _own(rr, axis), free4)
        r4 = _sync(r4, axis) * _dup_local(self.smg, 0)
        z4 = self._vcycle_shard(0, sstate, rep_state, r4, lam, mu)
        x = x + prolong_p(res, z4, self.dup2_local, st10["free2"])
        rr = r - A(x)
        x = x + self._chebyshev(A, Ml, rr, st10["lmax"], self.smooth_degree)
        return x

    # --------------------------------------------------------------- solve
    def _loads_host(self, params4, pressure, material, dtype):
        """Global load grid on host, sliced into overlapping slabs (D, ...)."""
        from tpufem.mesher import structured_wing_mesh
        from tpufem.sets import build_boundary_sets

        res = self.res
        mesh = structured_wing_mesh(*params4, res)
        bs = build_boundary_sets(mesh)
        if self.element == "tet4":
            from tpufem.fem.stencil import to_grid

            faces = mesh.surf_faces[bs.surf_upper_faces]
            v = mesh.nodes[faces]
            area = 0.5 * np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
            fv = (-pressure / 3.0) * area
            f = np.zeros((mesh.num_nodes, 3))
            np.add.at(f, faces.reshape(-1), np.repeat(fv, 3, axis=0))
            bg = np.asarray(to_grid(res, jnp.asarray(f[:, :, None], dtype)))
            span_layers = res.n_span + 1
            c = self.plan.cells[0]
        else:
            from tpufem.fem.tet10 import (
                pressure_loads_t6,
                tet10_from_tet4,
                tet10_upper_t6,
            )
            from tpufem.fem.tet10_stencil import to_grid2

            t10 = self.meta2["t10"]
            n10 = t10.nodes10(mesh.nodes)
            upper_t6 = tet10_upper_t6(t10, bs.surf_upper_faces)
            f = np.asarray(
                pressure_loads_t6(
                    jnp.asarray(n10, dtype), jnp.asarray(upper_t6),
                    jnp.asarray(pressure, dtype), t10.num_nodes,
                )
            )
            bg = np.asarray(to_grid2(res, jnp.asarray(f[:, :, None], dtype)))
            span_layers = 2 * res.n_span + 1
            c = 2 * self.plan.cells[0]
        D = self.plan.n_devices
        slabs = np.stack([bg[..., d * c : d * c + c + 1] for d in range(D)])
        # Dirichlet: zero global j=0 (slab 0's first layer)
        slabs[0, ..., 0] = 0.0
        return slabs  # (D, 3, 1, NI*, NK*, c+1)

    def solve(
        self,
        params4,
        mesh: Mesh,
        pressure: float = 5e3,
        material: Material = Material(),
        tol: float = 1e-6,
        maxiter: int = 2000,
        chunk_iters: int | None = None,
    ):
        """Sharded MG-PCG solve. Returns (u (N,3) welded node order, iters,
        rel_residual). `mesh` is the jax device mesh (1-D, axis `self.axis`)."""
        dtype = self.dtype
        lam_f, mu_f = lame_params(material)
        lam = jnp.asarray(lam_f, dtype)
        mu = jnp.asarray(mu_f, dtype)
        p4 = jnp.asarray(np.asarray(params4, np.float64)[None, :], dtype)  # (1,4)

        # replicated coarse tail state (host finalize for the dense coarsest)
        rep_state = jax.jit(self.rep_smg.setup)(p4, lam, mu)
        rep_state = self.rep_smg.finalize(
            rep_state, np.asarray(params4, np.float64)[None, :], float(lam), float(mu)
        )

        b_slabs = self._loads_host(params4, pressure, material, dtype)
        axis = self.axis
        n_shard = self.plan.n_shard

        def setup_body(b_loc):
            del b_loc  # only here to give shard_map a sharded operand
            sstate = [
                self._setup_level(li, p4, lam, mu, dtype) for li in range(n_shard)
            ]
            st10 = (
                self._setup_tet10(p4, lam, mu, dtype)
                if self.element == "tet10"
                else {}
            )
            return jax.tree.map(lambda a: a[None], (sstate, st10))

        def body(state_in, b_loc, rep_state_b, cg_x, cg_r, cg_p, cg_z, cg_rz,
                 warm, n_iters):
            b_loc = b_loc[0]
            cg_x, cg_r, cg_p, cg_z = (a[0] for a in (cg_x, cg_r, cg_p, cg_z))
            sstate, st10 = jax.tree.map(lambda a: a[0], state_in)
            if self.element == "tet10":
                free_top = st10["free2"]
                dup_top = self.dup2_local

                from tpufem.fem.tet10_stencil import strain_apply10

                def A(x):
                    return _sync(
                        strain_apply10(self.res, st10["geo"], x, free_top, lam, mu),
                        axis,
                    )

                def M(r):
                    return self._apply_M10(st10, sstate, rep_state_b, r, lam, mu)
            else:
                st0 = sstate[0]
                free_top = st0["freeL"]
                dup_top = st0["dup1"]
                rl = self.levels[0]

                def A(x):
                    return _sync(
                        strain_apply(rl, st0["geo"], x, free_top, lam, mu), axis
                    )

                def M(r):
                    return self._vcycle_shard(0, sstate, rep_state_b, r, lam, mu)

            def dot(u_, v_):
                loc = (_own(u_, axis).astype(jnp.float64)
                       * _own(v_, axis).astype(jnp.float64)).sum()
                return jax.lax.psum(loc, axis).astype(dtype)

            b = b_loc * dup_top * free_top

            z0 = M(b)
            x = warm * cg_x
            r = jnp.where(warm > 0, cg_r, b)
            z = jnp.where(warm > 0, cg_z, z0)
            p = jnp.where(warm > 0, cg_p, z0)
            rz = jnp.where(warm > 0, cg_rz, dot(b, z0))
            bnorm = jnp.sqrt(dot(b, b))
            bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
            tol2 = (tol * bnorm) ** 2

            def cond(state):
                _, r_, _, _, _, k = state
                return (dot(r_, r_) > tol2) & (k < n_iters)

            def step(state):
                x_, r_, p_, z_, rz_, k = state
                Ap = A(p_)
                alpha = rz_ / dot(p_, Ap)
                x_ = x_ + alpha * p_
                r_ = r_ - alpha * Ap
                z_ = M(r_)
                rz_new = dot(r_, z_)
                p_ = z_ + rz_new / rz_ * p_
                return (x_, r_, p_, z_, rz_new, k + 1)

            x, r, p, z, rz, k = jax.lax.while_loop(
                cond, step, (x, r, p, z, rz, jnp.int32(0))
            )
            rel = jnp.sqrt(dot(r, r)) / bnorm
            return x[None], r[None], p[None], z[None], rz, k, rel

        spec = P(axis)
        setup_fn = jax.jit(
            shard_map(
                setup_body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                check_vma=False,
            )
        )
        fn = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                in_specs=(spec, spec, P(), spec, spec, spec, spec, P(), P(), P()),
                out_specs=(spec, spec, spec, spec, P(), P(), P()),
                check_vma=False,
            )
        )

        put = lambda a: jax.device_put(  # noqa: E731
            jnp.asarray(a), NamedSharding(mesh, spec)
        )
        b_dev = put(b_slabs.astype(np.dtype(dtype)))
        state_dev = setup_fn(b_dev)
        zero = put(np.zeros_like(b_slabs, dtype=np.dtype(dtype)))
        sx, sr, sp, sz = zero, zero, zero, zero
        srz = jnp.asarray(0.0, dtype)
        warm = jnp.asarray(0.0, dtype)
        chunk = maxiter if chunk_iters is None else chunk_iters
        total = 0
        rel = None
        while True:
            step_n = min(chunk, maxiter - total)
            sx, sr, sp, sz, srz, k, rel = fn(
                state_dev, b_dev, rep_state, sx, sr, sp, sz, srz, warm,
                jnp.asarray(step_n, jnp.int32),
            )
            total += int(k)
            warm = jnp.asarray(1.0, dtype)
            if float(rel) <= tol or total >= maxiter or int(k) < step_n:
                break

        # reassemble the global grid and map to welded node order
        xg = np.asarray(sx)  # (D, 3, 1, NI*, NK*, c+1)
        parts = [xg[d][..., :-1] for d in range(self.plan.n_devices - 1)]
        parts.append(xg[-1])
        full = np.concatenate(parts, axis=-1)
        if self.element == "tet10":
            from tpufem.fem.tet10_stencil import from_grid2

            u = np.asarray(from_grid2(self.res, jnp.asarray(full)))[:, :, 0]
        else:
            from tpufem.fem.stencil import from_grid

            u = np.asarray(from_grid(self.res, jnp.asarray(full)))[:, :, 0]
        return u, total, float(rel)
