"""Trailing-batch batched solver: case axis LAST for TPU lane utilization.

tpufem.fem.batched vmaps over a leading case axis, which leaves every gather in
the SpMV fetching 12-byte rows (one node's (3,) f32) — measured ~7 ms/case/iter
at 181k tets, ~100x off HBM speed. This module hand-vectorizes the batch with
the case axis TRAILING: node states are (N, 3, B), so each gathered row is a
contiguous (3, B) block (96+ bytes at B=8) and all elementwise algebra
vectorizes along lanes. Same math as tpufem.fem: tensor-form element operator,
thickness-line block-Jacobi (Newton-Schulz inverses), chunked PCG.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.material import Material, lame_params
from tpufem.fem.precond import build_line_plan
from tpufem.fem.assembly import build_incidence
from tpufem.mesher import WingMeshResolution, structured_wing_mesh, wing_topology
from tpufem.sets import build_boundary_sets


class BatchTSolveResult(NamedTuple):
    nodes: jnp.ndarray  # (N,3,B)
    u: jnp.ndarray  # (N,3,B)
    stress6: jnp.ndarray  # (N,6,B)
    vm: jnp.ndarray  # (N,B)
    iters: int
    rel_residual: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,) bool


def _det3(e):
    """det of (T,3,3,B) over the 3x3 axes."""
    a, b, c = e[:, 0], e[:, 1], e[:, 2]  # rows (T,3,B)
    cross0 = b[:, 1] * c[:, 2] - b[:, 2] * c[:, 1]
    cross1 = b[:, 2] * c[:, 0] - b[:, 0] * c[:, 2]
    cross2 = b[:, 0] * c[:, 1] - b[:, 1] * c[:, 0]
    return a[:, 0] * cross0 + a[:, 1] * cross1 + a[:, 2] * cross2  # (T,B)


def _cross(u, v):
    """cross product on axis 1 of (T,3,B)."""
    return jnp.stack(
        [
            u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
            u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
            u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0],
        ],
        axis=1,
    )


class WingBatchT:
    """Fixed-topology trailing-batch wing solver at one resolution.

    mg_levels != 0 swaps the line+RBM two-level preconditioner for the
    geometric multigrid V-cycle (tpufem.fem.multigrid) — measured necessary to
    reach the >=20x headline (BASELINE.md): MG removes the O(1/h^2) iteration
    growth the two-level only dampens. mg_levels=None auto-sizes the
    hierarchy; an int pins the level count.
    """

    def __init__(
        self,
        res: WingMeshResolution,
        dtype=jnp.float32,
        mg_levels: int | None = 0,
        mg_kwargs: dict | None = None,
    ):
        topo = wing_topology(res)
        self.res = res
        self.dtype = dtype
        self.num_nodes = topo.num_nodes
        self.te_floor = topo.te_floor
        self.basis = jnp.asarray(topo.node_basis, dtype)
        self.tets = jnp.asarray(topo.tets.astype(np.int32))
        ref = structured_wing_mesh(1.2, 0.35, 10.0, 0.10, res)
        self.sets = build_boundary_sets(ref)
        self.surf_faces = topo.surf_faces
        self.upper = jnp.asarray(topo.surf_faces[self.sets.surf_upper_faces])
        free = np.ones((self.num_nodes, 3), np.float32)
        free[self.sets.nroot_nodes] = 0.0
        self.free = jnp.asarray(free, dtype)  # (N,3)

        plan = build_line_plan(topo)
        self.plan = plan
        self.S, self.K = plan.num_stations, plan.K
        self.D = 3 * self.K
        self.pair_t = jnp.asarray(plan.pair_t)
        self.pair_a = jnp.asarray(plan.pair_a.astype(np.int32))
        self.pair_b = jnp.asarray(plan.pair_b.astype(np.int32))
        self.pair_seg = jnp.asarray(plan.pair_seg)
        self.station_nodes = jnp.asarray(plan.station_nodes)
        self.slot_valid = jnp.asarray(plan.slot_valid, dtype)
        self.node_station = jnp.asarray(plan.node_station)
        self.node_slot = jnp.asarray(plan.node_slot)

        inc, incm = build_incidence(topo.tets, self.num_nodes)
        self.inc = jnp.asarray(inc)
        self.incm = jnp.asarray(incm, dtype)
        # corner-major incidence for the (…,B,T) fast layout: flat pos = a*T + t
        inc_am, incm_am = build_incidence(topo.tets.T.copy(), self.num_nodes)
        self.inc_am = jnp.asarray(inc_am)
        self.incm_am = jnp.asarray(incm_am, dtype)
        self.tets_cols = [jnp.asarray(topo.tets[:, a].copy()) for a in range(4)]

        # Two-level coarse correction with RIGID-BODY-MODE aggregation
        # (smoothed-aggregation style): one-level line preconditioning leaves
        # O(1/h^2) in-plane conditioning that defeats f32 CG at ~100k DOF, and
        # a piecewise-constant coarse space cannot represent the dominant
        # bending modes (measured: hard PRD-corner cases still diverge).
        # Groups = (4x4 station) x full-thickness aggregates; 6 RBM dofs each.
        group = (4, 4)
        NI, NJ = res.n_chord + 1, res.n_span + 1
        st = topo.station_id.astype(np.int64)
        ii, jj = st // NJ, st % NJ
        ngj = (NJ + group[1] - 1) // group[1]
        ngi = (NI + group[0] - 1) // group[0]
        node_group = ((ii // group[0]) * ngj + (jj // group[1])).astype(np.int32)
        self.n_groups = ngi * ngj
        self.nc = 6 * self.n_groups
        self.node_group = jnp.asarray(node_group)
        # per-tet group of each corner
        self.tet_group = jnp.asarray(node_group[topo.tets])  # (T,4)

        self.mg = None
        if mg_levels != 0:
            from tpufem.fem.multigrid import WingMGT, build_hierarchy

            hier = build_hierarchy(res, n_levels=mg_levels)
            self.mg = WingMGT(hier, dtype=dtype, **(mg_kwargs or {}))

        self._jit_setup = jax.jit(self._setup)
        self._jit_chunk = jax.jit(self._chunk, static_argnames=("tol", "maxiter"))
        self._jit_chunk_fast = jax.jit(self._chunk_fast, static_argnames=("tol", "maxiter"))
        self._jit_setup_mg = jax.jit(self._setup_mg)
        self._jit_chunk_mg = jax.jit(self._chunk_mg, static_argnames=("tol", "maxiter"))
        self._jit_recover = jax.jit(self._recover)

    # ---------------------------------------------------------------- pieces
    def _nodes(self, p4):
        """(N,3,B) node coords from (B,4) params."""
        s, yfrac, zfrac, zbase = (self.basis[:, i] for i in range(4))
        span, chord, sweep, t = (p4[:, i] for i in range(4))  # (B,)
        y = yfrac[:, None] * span[None, :]
        x = s[:, None] * chord[None, :] + jnp.tan(jnp.deg2rad(sweep))[None, :] * y
        half = jnp.maximum(
            t[None, :] * zbase[:, None], jnp.asarray(self.te_floor, self.dtype) * s[:, None]
        )
        z = chord[None, :] * half * zfrac[:, None]
        return jnp.stack([x, y, z], axis=1)  # (N,3,B)

    def _grads_vols(self, nodes):
        xt = nodes[self.tets]  # (T,4,3,B)
        e = xt[:, 1:] - xt[:, :1]  # (T,3,3,B) rows = edges
        det = _det3(e)  # (T,B)
        vols = det / 6.0
        safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
        c0 = _cross(e[:, 1], e[:, 2])  # (T,3,B)
        c1 = _cross(e[:, 2], e[:, 0])
        c2 = _cross(e[:, 0], e[:, 1])
        inv_cols = jnp.stack([c0, c1, c2], axis=1) / safe[:, None, None]  # (T,3rows=a,3,B)
        # g_a for a=1..3 are columns of inv(J): inv_cols[:, a-1] IS column a
        g123 = inv_cols  # (T,3,3,B) with axis1 = a-1, axis2 = xyz
        g0 = -g123.sum(axis=1, keepdims=True)
        grads = jnp.concatenate([g0, g123], axis=1)  # (T,4,3,B)
        return grads, vols

    def _force(self, grads, vols, u, lam, mu):
        """y = K u on (N,3,B)."""
        ue = u[self.tets]  # (T,4,3,B)
        # broadcast-sum forms (einsum lowers tiny batched contractions onto the
        # MXU with heavy padding — measured 5x slower)
        H = (grads[:, :, :, None, :] * ue[:, :, None, :, :]).sum(axis=1)  # (T,3,3,B)
        eps = 0.5 * (H + jnp.swapaxes(H, 1, 2))
        tr = eps[:, 0, 0] + eps[:, 1, 1] + eps[:, 2, 2]  # (T,B)
        sig = 2.0 * mu * eps
        idx = jnp.arange(3)
        sig = sig.at[:, idx, idx].add(lam * tr[:, None, :])
        fe = vols[:, None, None, :] * (
            sig[:, None, :, :, :] * grads[:, :, None, :, :]
        ).sum(axis=3)  # (T,4,3,B)
        fe_flat = fe.reshape(-1, 3, fe.shape[-1])
        return (fe_flat[self.inc] * self.incm[:, :, None, None]).sum(axis=1)  # (N,3,B)

    # -------------------------------------------------- fast (…,B,T) layout
    # EXPERIMENTAL (fast_layout=False by default): minor axis = elements
    # (lane-tiled), batch = one f32 sublane tile. Measured 1.8x faster per
    # iteration (23.5 vs 42.6 ms/batch-iter at 109k DOF) and bit-identical to
    # the default layout in f64, BUT its different f32 reduction ordering can
    # stall CG ~10x above tight tolerances on the hardest lanes — net slower
    # until paired with higher-precision dot products (round-2 work).

    def _force_fast(self, grads_n, vols_n, u, lam, mu):
        """y = K u with u (3,B,N), grads_n (4,3,B,T), vols_n (B,T)."""
        ue = jnp.stack([u.take(c, axis=2) for c in self.tets_cols], axis=0)  # (4,3,B,T)
        H = (grads_n[:, :, None] * ue[:, None, :, :, :]).sum(axis=0)  # (3,3,B,T)
        eps = 0.5 * (H + jnp.swapaxes(H, 0, 1))
        tr = eps[0, 0] + eps[1, 1] + eps[2, 2]  # (B,T)
        sig = 2.0 * mu * eps
        idx = jnp.arange(3)
        sig = sig.at[idx, idx].add(lam * tr[None])
        fe = vols_n[None, None] * (sig[None] * grads_n[:, None]).sum(axis=2)  # (4,3,B,T)
        fe_flat = jnp.moveaxis(fe, 0, 2).reshape(3, fe.shape[2], -1)  # (3,B,4T) a-major
        y = (fe_flat[:, :, self.inc_am] * self.incm_am[None, None]).sum(axis=-1)
        return y  # (3,B,N)

    def _apply_A_fast(self, grads_n, vols_n, x, lam, mu, free_n):
        u = x * free_n
        y = self._force_fast(grads_n, vols_n, u, lam, mu)
        return y * free_n + x * (1.0 - free_n)

    def _chunk_fast(self, grads_n, vols_n, b_n, Binv, Ac_inv, dvec, x0, lam, mu, tol, maxiter):
        free_n = jnp.swapaxes(self.free, 0, 1)[:, None, :]  # (3,1,N)

        def to_old(v):  # (3,B,N) -> (N,3,B)
            return jnp.transpose(v, (2, 0, 1))

        def to_new(v):  # (N,3,B) -> (3,B,N)
            return jnp.transpose(v, (1, 2, 0))

        def dot(u_, v_):
            # f64 accumulation (emulated on TPU, requires jax_enable_x64;
            # silently stays f32 otherwise): this layout's f32 reduction
            # ordering can stall CG on the hardest lanes without it
            acc = (u_.astype(jnp.float64) * v_.astype(jnp.float64)).sum(axis=(0, 2))
            return acc.astype(self.dtype)  # (B,)

        def M(r):
            return to_new(self._apply_M(Binv, Ac_inv, dvec, to_old(r)))

        x = x0
        r = b_n - self._apply_A_fast(grads_n, vols_n, x, lam, mu, free_n)
        z = M(r)
        p = z
        rz = dot(r, z)
        bn = jnp.sqrt(dot(b_n, b_n))
        bn = jnp.where(bn > 0, bn, 1.0)
        tol2 = (tol * bn) ** 2

        def cond(st):
            _, r, _, _, _, k = st
            return jnp.any(dot(r, r) > tol2) & (k < maxiter)

        def step(st):
            x, r, p, z, rz, k = st
            rr = dot(r, r)
            done = (rr <= tol2) | ~jnp.isfinite(rr)
            Ap = self._apply_A_fast(grads_n, vols_n, p, lam, mu, free_n)
            denom = dot(p, Ap)
            alpha = jnp.where(done | (denom == 0), 0.0, rz / jnp.where(denom == 0, 1.0, denom))
            x = x + alpha[None, :, None] * p
            r = r - alpha[None, :, None] * Ap
            z = M(r)
            rz_new = dot(r, z)
            beta = jnp.where(done | (rz == 0), 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
            p = z + beta[None, :, None] * p
            return (x, r, p, z, jnp.where(done, rz, rz_new), k + 1)

        x, r, p, z, rz, k = jax.lax.while_loop(cond, step, (x, r, p, z, rz, jnp.int32(0)))
        rel = jnp.sqrt(dot(r, r)) / bn
        return x, k, rel, rel <= tol

    def _setup(self, p4, pressure, lam, mu):
        nodes = self._nodes(p4)
        grads, vols = self._grads_vols(nodes)
        # pressure loads on upper faces
        v = nodes[self.upper]  # (F,3,3,B)
        area_vec = 0.5 * _cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])  # (F,3,B)
        f_vert = (-pressure / 3.0) * area_vec
        F = self.upper.shape[0]
        f3 = jnp.broadcast_to(f_vert[:, None, :, :], (F, 3, 3, f_vert.shape[-1]))
        b = jax.ops.segment_sum(
            f3.reshape(-1, 3, f_vert.shape[-1]), self.upper.reshape(-1),
            num_segments=self.num_nodes,
        )
        b = b * self.free[:, :, None]

        # line blocks (S*D*D, B) -> NS inverse (S,D,D,B)
        ga = grads[self.pair_t, self.pair_a]  # (P,3,B)
        gb = grads[self.pair_t, self.pair_b]
        vv = vols[self.pair_t]  # (P,B)
        gagb = ga[:, :, None, :] * gb[:, None, :, :]  # (P,3,3,B)
        gbga = gb[:, :, None, :] * ga[:, None, :, :]
        dot = (ga * gb).sum(axis=1)  # (P,B)
        eye3 = jnp.eye(3, dtype=self.dtype)
        kab = vv[:, None, None, :] * (
            lam * gagb + mu * gbga + mu * dot[:, None, None, :] * eye3[None, :, :, None]
        )
        offs = jnp.arange(3)
        seg = (
            self.pair_seg[:, None, None] + offs[None, :, None] * self.D + offs[None, None, :]
        ).reshape(-1)
        B_flat = jax.ops.segment_sum(
            kab.reshape(-1, kab.shape[-1]), seg, num_segments=self.S * self.D * self.D
        )
        Bm = B_flat.reshape(self.S, self.D, self.D, -1)
        fm = self.free[self.station_nodes] * self.slot_valid[:, :, None]  # (S,K,3)
        mvec = fm.reshape(self.S, self.D)
        Bm = Bm * mvec[:, :, None, None] * mvec[:, None, :, None]
        Bm = Bm + (jnp.eye(self.D, dtype=self.dtype)[None, :, :, None]
                   * (1.0 - mvec)[:, :, None, None])
        # NS inverse batched over (S*B, D, D)
        nb = Bm.shape[-1]
        Bsq = jnp.moveaxis(Bm, -1, 1).reshape(self.S * nb, self.D, self.D)
        from tpufem.fem.precond import spd_block_inverse

        Binv = spd_block_inverse(Bsq)
        Binv = jnp.moveaxis(Binv.reshape(self.S, nb, self.D, self.D), 1, -1)  # (S,D,D,B)

        # ---- coarse Galerkin operator Ac = P^T (m A m) P with P = per-group
        # rigid-body modes [I | (x - x_g) x ] — dense (nc,nc,B)
        nc = self.nc
        G = self.n_groups
        free3 = self.free  # (N,3)
        eye3 = jnp.eye(3, dtype=self.dtype)

        cnt = jax.ops.segment_sum(
            jnp.ones((self.num_nodes,), self.dtype), self.node_group, num_segments=G
        )
        xg = jax.ops.segment_sum(nodes, self.node_group, num_segments=G) / jnp.maximum(
            cnt, 1.0
        )[:, None, None]  # (G,3,B)
        dvec = nodes - xg[self.node_group]  # (N,3,B)

        def rbm(dn):
            """(T,3,B) offsets -> (T,3,6,B) node RBM basis [I | e_k x d]."""
            z = jnp.zeros_like(dn[:, 0])
            dx, dy, dz = dn[:, 0], dn[:, 1], dn[:, 2]
            rx = jnp.stack([z, -dz, dy], axis=1)  # column for omega = e_x
            ry = jnp.stack([dz, z, -dx], axis=1)
            rz = jnp.stack([-dy, dx, z], axis=1)
            ident = jnp.broadcast_to(
                eye3[None, :, :, None], (dn.shape[0], 3, 3, dn.shape[-1])
            )
            rot = jnp.stack([rx, ry, rz], axis=2)  # (T,3,3cols,B)
            return jnp.concatenate([ident, rot], axis=2)  # (T,3,6,B)

        Ac_flat = jnp.zeros((nc * nc, nb), self.dtype)
        for a in range(4):
            Pa = rbm(dvec[self.tets[:, a]])  # (T,3,6,B)
            ga = grads[:, a]
            fa = free3[self.tets[:, a]]  # (T,3)
            for c in range(4):
                gb = grads[:, c]
                dot = (ga * gb).sum(axis=1)  # (T,B)
                kab = vols[:, None, None, :] * (
                    lam * ga[:, :, None, :] * gb[:, None, :, :]
                    + mu * gb[:, :, None, :] * ga[:, None, :, :]
                    + mu * dot[:, None, None, :] * eye3[None, :, :, None]
                )  # (T,3,3,B)
                fb = free3[self.tets[:, c]]
                kab = kab * fa[:, :, None, None] * fb[:, None, :, None]
                Pb = rbm(dvec[self.tets[:, c]])
                tmp = (Pa[:, :, :, None, :] * kab[:, :, None, :, :]).sum(axis=1)  # (T,6,3,B)
                blk = (tmp[:, :, :, None, :] * Pb[:, None, :, :, :]).sum(axis=2)  # (T,6,6,B)
                base = (
                    self.tet_group[:, a].astype(jnp.int64) * 6 * nc
                    + self.tet_group[:, c].astype(jnp.int64) * 6
                )
                offs6 = jnp.arange(6)
                idx = (
                    base[:, None, None] + offs6[None, :, None] * nc + offs6[None, None, :]
                ).reshape(-1)
                Ac_flat = Ac_flat + jax.ops.segment_sum(
                    blk.reshape(-1, nb), idx, num_segments=nc * nc
                )
        Ac = Ac_flat.reshape(nc, nc, nb)
        dg = Ac[jnp.arange(nc), jnp.arange(nc), :]  # (nc,B)
        # Deactivate near-singular coarse dofs (e.g. rotation about the axis of
        # a single-station boundary group, whose RBM column is ~zero): zero the
        # row/col and put a unit diagonal, else the Newton-Schulz inverse blows
        # up on the kappa ~ 1/eps mode.
        act = (dg > 1e-8 * dg.max(axis=0, keepdims=True)).astype(self.dtype)  # (nc,B)
        Ac = Ac * act[:, None, :] * act[None, :, :]
        Ac = Ac + jnp.eye(nc, dtype=self.dtype)[:, :, None] * (1.0 - act)[None, :, :]
        Acsq = jnp.moveaxis(Ac, -1, 0)  # (B,nc,nc)
        # keep batch-major: a (nc,nc,B) layout pads the B minor to 128 lanes
        # (measured 6.3 ms per coarse matvec vs ~0.2 ms in this layout)
        Ac_inv = spd_block_inverse(Acsq, ns_iters=40, ridge=3e-4)  # (B,nc,nc)
        return nodes, grads, vols, b, Binv, Ac_inv, dvec

    def _setup_mg(self, p4, pressure, lam, mu):
        """Geometry + loads + multigrid state (preconditioner = V-cycle)."""
        nodes = self._nodes(p4)
        grads, vols = self._grads_vols(nodes)
        v = nodes[self.upper]
        area_vec = 0.5 * _cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        f_vert = (-pressure / 3.0) * area_vec
        F = self.upper.shape[0]
        f3 = jnp.broadcast_to(f_vert[:, None, :, :], (F, 3, 3, f_vert.shape[-1]))
        b = jax.ops.segment_sum(
            f3.reshape(-1, 3, f_vert.shape[-1]), self.upper.reshape(-1),
            num_segments=self.num_nodes,
        )
        b = b * self.free[:, :, None]
        mg_state = self.mg.setup(p4, lam, mu, level0=(nodes, grads, vols))
        return nodes, grads, vols, b, mg_state

    def _chunk_mg(self, grads, vols, b, mg_state, x0, lam, mu, tol, maxiter):
        def dot(u_, v_):
            return (u_ * v_).sum(axis=(0, 1))  # (B,)

        x = x0
        r = b - self._apply_A(grads, vols, x, lam, mu)
        z = self.mg.apply(mg_state, r)
        p = z
        rz = dot(r, z)
        bn = jnp.sqrt(dot(b, b))
        bn = jnp.where(bn > 0, bn, 1.0)
        tol2 = (tol * bn) ** 2

        def cond(st):
            _, r, _, _, _, k = st
            return jnp.any(dot(r, r) > tol2) & (k < maxiter)

        def step(st):
            x, r, p, z, rz, k = st
            rr = dot(r, r)
            done = (rr <= tol2) | ~jnp.isfinite(rr)
            Ap = self._apply_A(grads, vols, p, lam, mu)
            denom = dot(p, Ap)
            alpha = jnp.where(done | (denom == 0), 0.0, rz / jnp.where(denom == 0, 1.0, denom))
            x = x + alpha[None, None, :] * p
            r = r - alpha[None, None, :] * Ap
            z = self.mg.apply(mg_state, r)
            rz_new = dot(r, z)
            beta = jnp.where(done | (rz == 0), 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
            p = z + beta[None, None, :] * p
            return (x, r, p, z, jnp.where(done, rz, rz_new), k + 1)

        x, r, p, z, rz, k = jax.lax.while_loop(cond, step, (x, r, p, z, rz, jnp.int32(0)))
        rel = jnp.sqrt(dot(r, r)) / bn
        return x, k, rel, rel <= tol

    def _apply_M(self, Binv, Ac_inv, dvec, r):
        # line-block solve
        rs = r[self.station_nodes].reshape(self.S, self.D, -1)  # (S,D,B)
        zs = (Binv * rs[:, None, :, :]).sum(axis=2)  # (S,D,B)
        zs = zs.reshape(self.S, self.K, 3, -1)
        z = zs[self.node_station, self.node_slot]  # (N,3,B)
        # RBM coarse correction (additive): P^T r = [sum r | sum d x r] per group
        G = self.n_groups
        rm = r * self.free[:, :, None]  # (N,3,B)
        rot = _cross(dvec, rm)  # (N,3,B)
        rc_t = jax.ops.segment_sum(rm, self.node_group, num_segments=G)
        rc_r = jax.ops.segment_sum(rot, self.node_group, num_segments=G)
        rc = jnp.concatenate([rc_t, rc_r], axis=1).reshape(self.nc, -1)  # (nc,B)
        zc = jnp.einsum(
            "bij,jb->ib", Ac_inv, rc, precision="highest"
        ).reshape(G, 6, -1)
        zt = zc[:, :3][self.node_group]  # (N,3,B)
        zw = zc[:, 3:][self.node_group]
        z2 = (zt + _cross(zw, dvec)) * self.free[:, :, None]
        return z + z2

    def _apply_A(self, grads, vols, x, lam, mu):
        u = x * self.free[:, :, None]
        y = self._force(grads, vols, u, lam, mu)
        return y * self.free[:, :, None] + x * (1.0 - self.free)[:, :, None]

    def _chunk(self, grads, vols, b, Binv, Ac_inv, dvec, x0, lam, mu, tol, maxiter):
        def dot(u_, v_):
            return (u_ * v_).sum(axis=(0, 1))  # (B,)

        x = x0
        r = b - self._apply_A(grads, vols, x, lam, mu)
        z = self._apply_M(Binv, Ac_inv, dvec, r)
        p = z
        rz = dot(r, z)
        bn = jnp.sqrt(dot(b, b))
        bn = jnp.where(bn > 0, bn, 1.0)
        tol2 = (tol * bn) ** 2

        def cond(st):
            _, r, _, _, _, k = st
            return jnp.any(dot(r, r) > tol2) & (k < maxiter)

        def step(st):
            x, r, p, z, rz, k = st
            # freeze converged lanes (0/0 alpha otherwise) and lanes that blew
            # up (f32 divergence on extreme cases) so they stop polluting work;
            # blown lanes surface as converged=False for per-case fallback
            rr = dot(r, r)
            done = (rr <= tol2) | ~jnp.isfinite(rr)
            Ap = self._apply_A(grads, vols, p, lam, mu)
            denom = dot(p, Ap)
            alpha = jnp.where(done | (denom == 0), 0.0, rz / jnp.where(denom == 0, 1.0, denom))
            x = x + alpha[None, None, :] * p
            r = r - alpha[None, None, :] * Ap
            z = self._apply_M(Binv, Ac_inv, dvec, r)
            rz_new = dot(r, z)
            beta = jnp.where(done | (rz == 0), 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
            p = z + beta[None, None, :] * p
            return (x, r, p, z, jnp.where(done, rz, rz_new), k + 1)

        x, r, p, z, rz, k = jax.lax.while_loop(cond, step, (x, r, p, z, rz, jnp.int32(0)))
        rel = jnp.sqrt(dot(r, r)) / bn
        return x, k, rel, rel <= tol

    def _recover(self, grads, vols, x, lam, mu):
        u = x * self.free[:, :, None]
        ue = u[self.tets]
        H = (grads[:, :, :, None, :] * ue[:, :, None, :, :]).sum(axis=1)
        eps = 0.5 * (H + jnp.swapaxes(H, 1, 2))
        tr = eps[:, 0, 0] + eps[:, 1, 1] + eps[:, 2, 2]
        sig = 2.0 * mu * eps
        idx = jnp.arange(3)
        sig = sig.at[:, idx, idx].add(lam * tr[:, None, :])
        voigt = jnp.stack(
            [sig[:, 0, 0], sig[:, 1, 1], sig[:, 2, 2], sig[:, 0, 1], sig[:, 1, 2], sig[:, 2, 0]],
            axis=1,
        )  # (T,6,B)
        w = vols  # (T,B)
        contrib = (w[:, None, :] * voigt)[:, None, :, :] * jnp.ones(
            (1, 4, 1, 1), voigt.dtype
        )
        num = jax.ops.segment_sum(
            contrib.reshape(-1, 6, w.shape[-1]), self.tets.reshape(-1),
            num_segments=self.num_nodes,
        )
        den = jax.ops.segment_sum(
            jnp.broadcast_to(w[:, None, :], (w.shape[0], 4, w.shape[-1])).reshape(-1, w.shape[-1]),
            self.tets.reshape(-1),
            num_segments=self.num_nodes,
        )
        s6 = num / jnp.maximum(den, 1e-30)[:, None, :]
        sxx, syy, szz, sxy, syz, szx = (s6[:, i] for i in range(6))
        vm = jnp.sqrt(
            0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
            + 3.0 * (sxy**2 + syz**2 + szx**2)
        )
        return u, s6, vm

    # ------------------------------------------------------------------ API
    def solve(
        self,
        params4,
        pressure: float = 5e3,
        material: Material = Material(),
        tol: float = 1e-6,
        maxiter: int = 20000,
        chunk_iters: int = 1000,
        fast_layout: bool = False,
    ) -> BatchTSolveResult:
        p4 = jnp.asarray(params4, self.dtype)
        lam, mu = lame_params(material)
        lam = jnp.asarray(lam, self.dtype)
        mu = jnp.asarray(mu, self.dtype)
        press = jnp.asarray(pressure, self.dtype)
        B = p4.shape[0]
        total = 0
        rel = conv = None
        if self.mg is not None:
            nodes, grads, vols, b, mg_state = self._jit_setup_mg(p4, press, lam, mu)
            mg_state = self.mg.finalize(mg_state, np.asarray(p4), float(lam), float(mu))
            x = jnp.zeros((self.num_nodes, 3, B), self.dtype)
            while total < maxiter:
                step = min(chunk_iters, maxiter - total)
                x, k, rel, conv = self._jit_chunk_mg(
                    grads, vols, b, mg_state, x, lam, mu, tol=tol, maxiter=step
                )
                total += int(k)
                if bool(jnp.all(conv)) or int(k) < step:
                    break
            u, s6, vm = self._jit_recover(grads, vols, x, lam, mu)
            return BatchTSolveResult(nodes, u, s6, vm, total, rel, conv)
        nodes, grads, vols, b, Binv, Ac_inv, dvec = self._jit_setup(p4, press, lam, mu)
        if fast_layout:
            grads_n = jnp.transpose(grads, (1, 2, 3, 0))  # (4,3,B,T)
            vols_n = jnp.swapaxes(vols, 0, 1)  # (B,T)
            b_n = jnp.transpose(b, (1, 2, 0))  # (3,B,N)
            xf = jnp.zeros((3, B, self.num_nodes), self.dtype)
            while total < maxiter:
                step = min(chunk_iters, maxiter - total)
                xf, k, rel, conv = self._jit_chunk_fast(
                    grads_n, vols_n, b_n, Binv, Ac_inv, dvec, xf, lam, mu,
                    tol=tol, maxiter=step,
                )
                total += int(k)
                if bool(jnp.all(conv)) or int(k) < step:
                    break
            x = jnp.transpose(xf, (2, 0, 1))  # (N,3,B)
        else:
            x = jnp.zeros((self.num_nodes, 3, B), self.dtype)
            while total < maxiter:
                step = min(chunk_iters, maxiter - total)
                x, k, rel, conv = self._jit_chunk(
                    grads, vols, b, Binv, Ac_inv, dvec, x, lam, mu, tol=tol, maxiter=step
                )
                total += int(k)
                if bool(jnp.all(conv)) or int(k) < step:
                    break
        u, s6, vm = self._jit_recover(grads, vols, x, lam, mu)
        return BatchTSolveResult(nodes, u, s6, vm, total, rel, conv)
