"""p-multigrid for the ~1M-DOF tet10 wing (BASELINE config 5).

Round-1 status: the tet10 system at DOF1M_TET10 did not converge (rel 8e-2
after 6000 two-level iterations). This module fixes it with p-multigrid:

    tet10 level   — Chebyshev smoothing on the tet10 thickness-line blocks
                    (tpufem.fem.tet10.tet10_line_blocks on the doubled grid)
    p-transfer    — the natural P2 -> P1 embedding: corner dofs identity,
                    midside = mean of its edge endpoints (a linear function's
                    midside value IS that mean, so prolongation is exact on
                    the P1 subspace); restriction is the exact transpose
    tet4 level(s) — one V-cycle of the grid-native stencil multigrid
                    (tpufem.fem.stencil_mg) on the SAME resolution, which
                    continues the geometric hierarchy down to the exact dense
                    coarsest

The whole preconditioner is a fixed linear symmetric operator, so the outer
loop is plain chunked PCG (chunks bounded for the axon worker); `outer_f64`
runs the outer operator/state in f64 with the f32 preconditioner, removing
the f32 true-residual floor (same design as stencil_mg.WingStencilT).

MEASURED PRECISION BEHAVIOR (16x16x4 wing, kappa ~1e9; cross-checked with
the 80-bit host evaluator tpufem.fem.xprec):
  - f32 recurred residual: meaningless at this conditioning — recurred
    9.9e-5 while the true f64 residual was 6.0e+2 after the inner solve.
  - f64 CG RECURRENCE DRIFT: a pure-f64 CG run to recurred rel 8.6e-12 has
    TRUE residual 2.4e-6 (xprec-certified — the one-shot f64 evaluation
    agrees, so the drift is in the recurrence, not the measurement). This
    is the classic ~eps*kappa*iters CG bound made concrete.
  - mixed-precision refinement BEATS pure f64 CG: every round restarts from
    a freshly COMPUTED residual, resetting recurrence drift, so the refined
    f32 solution reaches true rel ~1.8e-7 — 13x below what uninterrupted
    f64 CG attains at the same conditioning.
  - the f64 solution state must survive to the caller: casting u to f32 at
    the output boundary costs ~kappa*eps_f32 relative residual (measured
    7e+1 via xprec), so refined/f64 paths return u in f64.
  - the refinement floor (~1.8e-7 here, ~7.6e-6 at the 2.5M-DOF flagship)
    scales with conditioning; flagship tol 1e-5 sits above it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.stencil import from_grid, to_grid
from tpufem.fem.stencil_mg import StencilMG
from tpufem.fem.tet10 import (
    Tet10Mesh,
    pressure_loads_t6,
    tet10_force,
    tet10_line_blocks,
    tet10_root_nodes,
    tet10_setup,
    tet10_stress_nodal,
    tet10_upper_t6,
)
from tpufem.mesher import WingMeshResolution


@dataclass
class Tet10MGResult:
    u: np.ndarray  # (N10, 3)
    vm: np.ndarray  # (N10,)
    iters: int
    rel_residual: float
    converged: bool


class Tet10MGSolver:
    """Single-case tet10 MG-PCG solver for the structured wing."""

    def __init__(
        self,
        res: WingMeshResolution,
        t10: Tet10Mesh,
        dtype=jnp.float32,
        smooth_degree: int = 2,
        smooth_alpha: float = 0.25,
        power_iters: int = 10,
        lmax_safety: float = 1.2,
        elem_chunk: int | None = None,
    ):
        assert t10.station_id is not None, "structured wing tet10 mesh required"
        self.res = res
        self.t10 = t10
        self.dtype = dtype
        self.smooth_degree = smooth_degree
        self.smooth_alpha = smooth_alpha
        self.power_iters = power_iters
        self.lmax_safety = lmax_safety
        # bounds tet10_force element temporaries (HBM; see tet10.tet10_force)
        self.elem_chunk = elem_chunk
        self.N10 = t10.num_nodes
        self.N4 = t10.mesh4.num_nodes
        self.conn = jnp.asarray(t10.tet10)
        self.edges = jnp.asarray(t10.edge_endpoints.astype(np.int32))  # (M,2)
        self.S2, self.K2 = t10.num_stations, t10.slots_per_station
        self.st2 = jnp.asarray(t10.station_id.astype(np.int32))
        self.sl2 = jnp.asarray(t10.slot.astype(np.int32))
        station_nodes = np.zeros((self.S2, self.K2), np.int32)
        station_nodes[t10.station_id, t10.slot] = np.arange(self.N10, dtype=np.int32)
        self.station_nodes = jnp.asarray(station_nodes)
        # free mask (root clamp) on tet10 nodes
        free = np.ones((self.N10, 3), np.float32)
        free[tet10_root_nodes(t10)] = 0.0
        self.free = jnp.asarray(free, dtype)
        # tet4 coarse hierarchy, batch lane B=1
        self.smg = StencilMG(
            res, dtype=dtype, smooth_degree=smooth_degree,
            smooth_alpha=smooth_alpha, power_iters=power_iters,
            lmax_safety=lmax_safety,
        )
        self._jit_setup = jax.jit(self._setup)
        self._jit_init = jax.jit(self._init)
        self._jit_init64 = jax.jit(self._init64)
        self._jit_chunk = jax.jit(self._chunk, static_argnames=("tol", "maxiter"))
        self._jit_chunk64 = jax.jit(self._chunk64, static_argnames=("tol", "maxiter"))
        self._jit_recover = jax.jit(self._recover)
        self._jit_resid64 = jax.jit(self._resid64)

    # ---------------------------------------------------------- p-transfers
    def prolong(self, u4):
        """(N4,3) tet4 -> (N10,3) tet10: P1 embedding into P2."""
        mids = 0.5 * (u4[self.edges[:, 0]] + u4[self.edges[:, 1]])
        return jnp.concatenate([u4, mids], axis=0) * self.free

    def restrict(self, r10):
        """Exact transpose of prolong."""
        r10 = r10 * self.free
        r4 = r10[: self.N4]
        half = 0.5 * r10[self.N4 :]
        r4 = r4 + jax.ops.segment_sum(half, self.edges[:, 0], num_segments=self.N4)
        r4 = r4 + jax.ops.segment_sum(half, self.edges[:, 1], num_segments=self.N4)
        return r4

    # ------------------------------------------------------------- operator
    def _apply_A(self, Jinv, vols, lam, mu, x):
        u = x * self.free
        y = tet10_force(
            Jinv, vols, self.conn, u, lam, mu, self.N10,
            elem_chunk=self.elem_chunk,
        )
        return y * self.free + x * (1.0 - self.free)

    def _line_apply(self, Binv, r):
        rs = r[self.station_nodes].reshape(self.S2, 3 * self.K2, 1)
        zs = (Binv * rs[:, None, :, 0]).sum(axis=2)
        zs = zs.reshape(self.S2, self.K2, 3)
        return zs[self.st2, self.sl2] * self.free

    # ----------------------------------------------------------------- setup
    def _setup(self, nodes10, p4, pressure, lam, mu):
        Jinv, vols = tet10_setup(nodes10, self.conn)
        Binv = tet10_line_blocks(
            Jinv, vols, self.conn, self.st2, self.sl2, lam, mu,
            self.free.reshape(-1), S=self.S2, K=self.K2,
        )
        # lambda_max of M_line^-1 A by power iteration
        A = lambda x: self._apply_A(Jinv, vols, lam, mu, x)  # noqa: E731
        M = lambda r: self._line_apply(Binv, r)  # noqa: E731
        v = jnp.sin(jnp.arange(self.N10 * 3, dtype=self.dtype) * 0.7311).reshape(-1, 3)
        v = v * self.free
        lmax = jnp.asarray(1.0, self.dtype)
        for _ in range(self.power_iters):
            w = M(A(v))
            nrm = jnp.sqrt((w * w).sum())
            lmax = nrm
            v = w / jnp.maximum(nrm, 1e-30)
        lmax = lmax * self.lmax_safety
        # tet4 coarse state (stencil MG, batch lane 1)
        smg_state = self.smg.setup(p4[None, :], lam, mu)
        return Jinv, vols, Binv, lmax, smg_state

    # --------------------------------------------------------- preconditioner
    def _chebyshev(self, A, M, r0, lmax, degree):
        lmin = self.smooth_alpha * lmax
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        d = M(r0) / theta
        x = d
        for _ in range(degree - 1):
            r = r0 - A(x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * M(r)
            x = x + d
            rho = rho_new
        return x

    def apply_M(self, Jinv, vols, Binv, lmax, smg_state, lam, mu, r):
        """One p-MG V-cycle: tet10 smoothing + tet4 stencil-MG correction."""
        A = lambda x: self._apply_A(Jinv, vols, lam, mu, x)  # noqa: E731
        Ml = lambda rr: self._line_apply(Binv, rr)  # noqa: E731
        x = self._chebyshev(A, Ml, r, lmax, self.smooth_degree)
        rr = r - A(x)
        r4 = self.restrict(rr)  # (N4,3)
        rg = to_grid(self.res, r4[:, :, None])  # (3,1,NI,NK,NJ)
        rg = rg * self.smg.free_masks[0] * self.smg.dup_masks[0]
        zg = self.smg._vcycle(smg_state, 0, rg)
        z4 = from_grid(self.res, zg)[:, :, 0]
        x = x + self.prolong(z4)
        rr = r - A(x)
        x = x + self._chebyshev(A, Ml, rr, lmax, self.smooth_degree)
        return x

    # --------------------------------------------------------------- CG loop
    def _init(self, Jinv, vols, Binv, lmax, smg_state, lam, mu, b, x0):
        A = lambda x: self._apply_A(Jinv, vols, lam, mu, x)  # noqa: E731
        M = lambda r: self.apply_M(Jinv, vols, Binv, lmax, smg_state, lam, mu, r)  # noqa: E731
        return _pcg_init(A, M, b, x0)

    def _chunk(self, Jinv, vols, Binv, lmax, smg_state, lam, mu, state, tol, maxiter):
        A = lambda x: self._apply_A(Jinv, vols, lam, mu, x)  # noqa: E731
        M = lambda r: self.apply_M(Jinv, vols, Binv, lmax, smg_state, lam, mu, r)  # noqa: E731
        return _pcg_flat(A, M, state, tol, maxiter)

    def _chunk64(self, Jinv64, vols64, Binv, lmax, smg_state, lam64, mu64, state, tol, maxiter):
        free64 = self.free.astype(jnp.float64)

        def A(x):
            u = x * free64
            y = tet10_force(
                Jinv64, vols64, self.conn, u, lam64, mu64, self.N10,
                elem_chunk=self.elem_chunk,
            )
            return y * free64 + x * (1.0 - free64)

        lam32 = lam64.astype(self.dtype)
        mu32 = mu64.astype(self.dtype)

        def M(r):
            z = self.apply_M(
                Jinv64.astype(self.dtype), vols64.astype(self.dtype), Binv, lmax,
                smg_state, lam32, mu32, r.astype(self.dtype),
            )
            return z.astype(jnp.float64)

        return _pcg_flat(A, M, state, tol, maxiter)

    def _init64(self, Jinv64, vols64, Binv, lmax, smg_state, lam64, mu64, b64, x0):
        free64 = self.free.astype(jnp.float64)

        def A(x):
            u = x * free64
            y = tet10_force(
                Jinv64, vols64, self.conn, u, lam64, mu64, self.N10,
                elem_chunk=self.elem_chunk,
            )
            return y * free64 + x * (1.0 - free64)

        lam32 = lam64.astype(self.dtype)
        mu32 = mu64.astype(self.dtype)

        def M(r):
            z = self.apply_M(
                Jinv64.astype(self.dtype), vols64.astype(self.dtype), Binv, lmax,
                smg_state, lam32, mu32, r.astype(self.dtype),
            )
            return z.astype(jnp.float64)

        return _pcg_init(A, M, b64, x0)

    def _resid64(self, Jinv64, vols64, lam64, mu64, b64, x64):
        """TRUE f64 residual of the f64-assembled system — ONE chunked
        operator application, not a full f64 CG (the full emulated-f64
        while_loop at the 2.5M-DOF flagship crashed the TPU worker; a single
        apply per refinement step keeps peak HBM bounded)."""
        free64 = self.free.astype(jnp.float64)
        u = x64 * free64
        y = tet10_force(
            Jinv64, vols64, self.conn, u, lam64, mu64, self.N10,
            elem_chunk=self.elem_chunk,
        )
        r = b64 - (y * free64 + x64 * (1.0 - free64))
        bn = jnp.sqrt((b64 * b64).sum())
        rn = jnp.sqrt((r * r).sum())
        return r, rn / jnp.where(bn > 0, bn, 1.0)

    def _recover(self, Jinv, vols, x, lam, mu):
        u = x * self.free.astype(x.dtype)
        s6 = tet10_stress_nodal(Jinv, vols, self.conn, u, lam, mu, self.N10)
        from tpufem.fem.vonmises import von_mises

        return u, von_mises(s6)

    # ------------------------------------------------------------------- API
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
    ) -> Tet10MGResult:
        """refine_steps > 0 selects mixed-precision iterative refinement:
        f32 MG-PCG to `inner_tol`, then up to refine_steps rounds of
        (f64 true residual -> f32 correction solve), convergence judged on
        the TRUE f64 residual against `tol`. This is the flagship-scale
        path: the f64 work is one chunked operator application per round,
        where outer_f64's full emulated-f64 CG exceeds the chip."""
        from tpufem.fem.material import Material, lame_params

        material = material or Material()
        lam_exact, mu_exact = lame_params(material)  # python floats (f64)
        lam = jnp.asarray(lam_exact, self.dtype)
        mu = jnp.asarray(mu_exact, self.dtype)
        p4 = jnp.asarray(np.asarray(params4), self.dtype)
        nodes10 = jnp.asarray(self.t10.nodes10(self.t10.mesh4.nodes), self.dtype)
        upper_t6 = jnp.asarray(tet10_upper_t6(self.t10, upper_face_idx))
        press = jnp.asarray(pressure, self.dtype)

        Jinv, vols, Binv, lmax, smg_state = self._jit_setup(nodes10, p4, press, lam, mu)
        smg_state = self.smg.finalize(
            smg_state, np.asarray(params4)[None, :], float(lam), float(mu)
        )
        f = pressure_loads_t6(nodes10, upper_t6, press, self.N10)
        b = f * self.free

        if refine_steps > 0:
            return self._solve_refine(
                Jinv, vols, Binv, lmax, smg_state, lam, mu, b, upper_t6,
                pressure, tol, maxiter, chunk_iters, refine_steps, inner_tol,
                progress, lam_exact=lam_exact, mu_exact=mu_exact,
            )

        if outer_f64:
            f64 = jnp.float64
            nodes64 = jnp.asarray(self.t10.nodes10(self.t10.mesh4.nodes), f64)
            Jinv64, vols64 = tet10_setup(nodes64, self.conn)
            # exact material constants: rebuilding them from the f32-cast
            # values perturbs the f64 system by ~eps_f32 relative, which at
            # element-force magnitudes costs ~5e-5 relative residual against
            # the exact-material system (measured via xprec)
            lam64 = jnp.asarray(lam_exact, f64)
            mu64 = jnp.asarray(mu_exact, f64)
            b64 = pressure_loads_t6(nodes64, upper_t6, jnp.asarray(pressure, f64), self.N10)
            b64 = b64 * self.free.astype(f64)
            state = self._jit_init64(
                Jinv64, vols64, Binv, lmax, smg_state, lam64, mu64, b64,
                jnp.zeros_like(b64),
            )
            run = lambda st, n: self._jit_chunk64(  # noqa: E731
                Jinv64, vols64, Binv, lmax, smg_state, lam64, mu64, st,
                tol=tol, maxiter=n,
            )
        else:
            state = self._jit_init(
                Jinv, vols, Binv, lmax, smg_state, lam, mu, b, jnp.zeros_like(b)
            )
            run = lambda st, n: self._jit_chunk(  # noqa: E731
                Jinv, vols, Binv, lmax, smg_state, lam, mu, st, tol=tol, maxiter=n
            )

        total = 0
        rel = np.inf
        conv = False
        while total < maxiter:
            step = min(chunk_iters, maxiter - total)
            state, k, rel, conv = run(state, step)
            total += int(k)
            rel = float(rel)
            conv = bool(conv)
            if progress:
                print(f"  [tet10-mg] iters {total}: rel {rel:.3e}", flush=True)
            if conv or int(k) < step:
                break
        x = state[0]
        _, vm = self._jit_recover(Jinv, vols, x.astype(self.dtype), lam, mu)
        # u keeps the solve dtype: casting the f64-outer solution to f32 at
        # the output boundary would forfeit its certified residual (eps_f32
        # rounding of u alone costs ~kappa*eps_f32 ~ 7e+1 relative residual
        # at this conditioning — measured via the xprec evaluator)
        u = np.asarray(x) * np.asarray(self.free.astype(x.dtype))
        return Tet10MGResult(
            u=u, vm=np.asarray(vm), iters=total,
            rel_residual=rel, converged=conv,
        )

    def _run_f32(self, Jinv, vols, Binv, lmax, smg_state, lam, mu, b, x,
                 tol, maxiter, chunk_iters, progress, tag="tet10-mg"):
        state = self._jit_init(Jinv, vols, Binv, lmax, smg_state, lam, mu, b, x)
        total = 0
        rel, conv = np.inf, False
        while total < maxiter:
            step = min(chunk_iters, maxiter - total)
            state, k, rel, conv = self._jit_chunk(
                Jinv, vols, Binv, lmax, smg_state, lam, mu, state,
                tol=tol, maxiter=step,
            )
            total += int(k)
            rel, conv = float(rel), bool(conv)
            if progress:
                print(f"  [{tag}] iters {total}: rel {rel:.3e}", flush=True)
            if conv or int(k) < step:
                break
        return state[0], total, rel, conv

    def _solve_refine(self, Jinv, vols, Binv, lmax, smg_state, lam, mu, b,
                      upper_t6, pressure, tol, maxiter, chunk_iters,
                      refine_steps, inner_tol, progress,
                      lam_exact=None, mu_exact=None):
        """Mixed-precision refinement loop (see solve docstring)."""
        f64 = jnp.float64
        nodes64 = jnp.asarray(self.t10.nodes10(self.t10.mesh4.nodes), f64)
        Jinv64, vols64 = tet10_setup(nodes64, self.conn)
        # exact material constants (see solve's outer_f64 branch): f32-cast
        # lam/mu would define a system ~eps_f32 away, costing ~5e-5 relative
        # residual against the exact-material one (measured via xprec)
        lam64 = jnp.asarray(float(lam) if lam_exact is None else lam_exact, f64)
        mu64 = jnp.asarray(float(mu) if mu_exact is None else mu_exact, f64)
        b64 = pressure_loads_t6(nodes64, upper_t6, jnp.asarray(pressure, f64), self.N10)
        b64 = b64 * self.free.astype(f64)

        x, total, _, _ = self._run_f32(
            Jinv, vols, Binv, lmax, smg_state, lam, mu, b,
            jnp.zeros_like(b), inner_tol, maxiter, chunk_iters, progress,
        )
        x64 = x.astype(f64)
        rel = np.inf

        def refine_rounds(x64, total, rel):
            prev_rel = np.inf
            for it in range(refine_steps):
                r64, rel = self._jit_resid64(Jinv64, vols64, lam64, mu64, b64, x64)
                rel = float(rel)
                if progress:
                    print(f"  [tet10-mg] refine {it}: TRUE f64 rel {rel:.3e}", flush=True)
                if rel <= tol or total >= maxiter:
                    break
                if rel > 0.5 * prev_rel:
                    # refinement floor: the f32-assembled correction operator
                    # differs from the f64 one by ~eps_f32 relative, which at
                    # kappa ~1e10 (2.5M-DOF flagship) floors the computed
                    # residual (measured) — further f32 rounds chase noise
                    break
                prev_rel = rel
                rnorm = jnp.sqrt((r64 * r64).sum())
                safe = jnp.where(rnorm > 0, rnorm, 1.0)
                cg, k, _, _ = self._run_f32(
                    Jinv, vols, Binv, lmax, smg_state, lam, mu,
                    (r64 / safe).astype(self.dtype), jnp.zeros_like(b),
                    inner_tol, maxiter - total, chunk_iters, progress,
                    tag="tet10-mg corr",
                )
                x64 = x64 + cg.astype(f64) * safe
                total += k
            return x64, total, rel

        x64, total, rel = refine_rounds(x64, total, rel)
        if rel > tol and total < maxiter:
            # f64-outer polish: chunked f64-operator CG (f32 V-cycle
            # preconditioner) warm-started from the refined solution removes
            # the f32 correction-operator floor; it only has to contract the
            # residual from that floor toward tol, so a handful of
            # (expensive, emulated-f64) iterations suffice. Small chunks keep
            # each dispatch under the axon worker's ~1-min kill; warm Krylov
            # state makes the chunked loop identical to one uninterrupted CG.
            chunk64 = max(2, chunk_iters // 2)
            st64 = self._jit_init64(
                Jinv64, vols64, Binv, lmax, smg_state, lam64, mu64, b64, x64
            )
            conv = False
            while total < maxiter and not conv:
                step = min(chunk64, maxiter - total)
                st64, k, rel, conv = self._jit_chunk64(
                    Jinv64, vols64, Binv, lmax, smg_state, lam64, mu64, st64,
                    tol=tol, maxiter=step,
                )
                total += int(k)
                rel, conv = float(rel), bool(conv)
                if progress:
                    print(f"  [tet10-mg f64] iters {total}: rel {rel:.3e}", flush=True)
                if int(k) < step:
                    break
            x64 = st64[0]
            # the polish minimizes its own RECURRED residual, which drifts
            # from the true one by ~eps_f64*kappa per the classic CG bound
            # (measured: recurred 8.7e-10 while the true residual was still
            # ~2e-6). A final refinement pass — each round restarts from a
            # freshly computed residual, resetting recurrence drift — drives
            # the TRUE residual to the refinement floor.
            x64, total, rel = refine_rounds(x64, total, rel)
        _, rel = self._jit_resid64(Jinv64, vols64, lam64, mu64, b64, x64)
        rel = float(rel)
        _, vm = self._jit_recover(Jinv, vols, x64.astype(self.dtype), lam, mu)
        # return u in f64: the refined solution's residual is certified at
        # the f64 state — an f32 cast alone costs ~kappa*eps_f32 relative
        # residual (measured 7e+1 at the 16x16x4 mesh via xprec)
        u64 = np.asarray(x64) * np.asarray(self.free.astype(jnp.float64))
        return Tet10MGResult(
            u=u64, vm=np.asarray(vm), iters=total,
            rel_residual=rel, converged=rel <= tol,
        )


def _dot64(u_, v_, out_dtype):
    """f64-accumulated dot (emulated on TPU; needs jax_enable_x64, silently
    stays f32 otherwise): plain f32 reductions at ~2.5M DOF carry ~sqrt(N)*eps
    ~ 2e-4 relative noise into alpha/beta, which stalls the recurred residual
    around 1e-2 at the flagship mesh (measured)."""
    acc = (u_.astype(jnp.float64) * v_.astype(jnp.float64)).sum()
    return acc.astype(out_dtype)


def _pcg_init(A, M, b, x0):
    """Initial Krylov state (x, r, p, z, rz, bn) for chunk-bounded PCG."""
    r = b - A(x0)
    z = M(r)
    rz = _dot64(r, z, b.dtype)
    bn = jnp.sqrt(_dot64(b, b, b.dtype))
    bn = jnp.where(bn > 0, bn, 1.0)
    return (x0, r, z, z, rz, bn)


def _pcg_flat(A, M, state, tol, maxiter):
    """Chunk-bounded PCG on (N,3) arrays with lane-free scalars.

    `state` is the tuple from `_pcg_init` (or a previous `_pcg_flat` call);
    carrying (r, p, z, rz) across device dispatches makes the chunked loop
    MATHEMATICALLY IDENTICAL to one uninterrupted PCG — restarting from x
    each chunk (round-1 behavior) discards the Krylov direction and, with
    the small chunk sizes the axon worker's ~1-min dispatch kill forces,
    collapses convergence to steepest-descent-like rates (measured: 0.95x
    vs 0.3x residual contraction per 8 iterations at the 2.5M-DOF flagship).
    """
    x0, r0, p0, z0, rz0, bn = state
    dtype = x0.dtype
    tol2 = (tol * bn) ** 2

    def cond(st):
        _, r, _, _, _, k = st
        return (_dot64(r, r, dtype) > tol2) & (k < maxiter)

    def step(st):
        x, r, p, z, rz, k = st
        Ap = A(p)
        denom = _dot64(p, Ap, dtype)
        alpha = jnp.where(denom == 0, 0.0, rz / jnp.where(denom == 0, 1.0, denom))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot64(r, z, dtype)
        beta = jnp.where(rz == 0, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
        p = z + beta * p
        return (x, r, p, z, rz_new, k + 1)

    x, r, p, z, rz, k = jax.lax.while_loop(
        cond, step, (x0, r0, p0, z0, rz0, jnp.int32(0))
    )
    rel = jnp.sqrt(_dot64(r, r, dtype)) / bn
    return (x, r, p, z, rz, bn), k, rel, rel <= tol
