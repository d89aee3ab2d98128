"""Linearized buckling analysis: critical load factors of the loaded wing.

Solves the initial-stress eigenproblem (K + lambda K_G(sigma0)) phi = 0 —
the classical linearized-buckling pencil — where sigma0 is the element
stress field of the static pre-solve under the reference pressure load.
The smallest positive lambda is the buckling load factor: the multiple of
the applied load at which the linearized structure loses stability. The
reference pipeline (reference src/deep_fem_uav_wing/fem.py) is static-only;
like tpufem.fem.modal this is a beyond-parity capability of the rebuild.

TPU-native design:

- **Grid-native geometric stiffness.** For tet4, K_G[ai,bj] =
  delta_ij * (g_a^T sigma g_b) * V — a scalar (metric-weighted Laplacian)
  coupling replicated over the three displacement components. Its matrix-free
  apply (`geom_apply`) mirrors tpufem.fem.stencil.strain_apply's
  slice-slab structure exactly: per cell the 6 Kuhn tets read corner slabs,
  form H[d,i] = sum_b (sigma g_b)[d] u_b[i], and write back V * g_a.H — no
  gathers, fuses like the elastic stencil. `element_stress` produces the
  per-Kuhn-tet sigma from the converged static grid solution with the same
  corner-slab reads.
- **Same block engine as modal.** Subspace iteration on the pencil
  K phi = (1/lambda) * S phi with S = -K_G: the q subspace vectors ride the
  trailing batch axis, each sweep's K^{-1} block solve is one chunk-bounded
  MG-PCG dispatch (tpufem.fem.modal.GridBlockSolver), and the reduced pencil
  (Sbar, Kbar) — Kbar SPD, S indefinite on the A-side where eigh allows it —
  is solved host-side. Eigenvalues nu of the reduced pencil estimate 1/lambda;
  the largest positive nu gives the critical factor lambda_cr = 1/nu_max.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from tpufem.fem.modal import (
    GridBlockSolver,
    ModalResult,
    _subspace_smallest,
    lumped_mass,
)
from tpufem.fem.stencil import (
    _HEX_CORNERS,
    _KUHN_TETS,
    from_grid,
    strain_apply,
    to_grid,
    weld_reduce,
    weld_spread,
)
from tpufem.fem.stencil_mg import _cg_grid_init, _cg_grid_run
from tpufem.mesher import WingMeshResolution


def _corner_slabs(u_spread):
    NI, NK, NJ = u_spread.shape[2], u_spread.shape[3], u_spread.shape[4]
    nc, nt, ns = NI - 1, NK - 1, NJ - 1

    def corner(c):
        di, dj, dk = _HEX_CORNERS[c]
        return u_spread[:, :, di : di + nc, dk : dk + nt, dj : dj + ns]

    return [corner(c) for c in range(8)], (nc, nt, ns)


def element_stress(res: WingMeshResolution, geo, u, lam, mu):
    """Per-Kuhn-tet Cauchy stress sig (6,3,3,B,nc,nt,ns) from a converged
    grid displacement u (3,B,NI,NK,NJ); geo from cell_geometry. Symmetric in
    the two component axes."""
    g, _vol = geo
    us = weld_spread(res, u)
    uc, _ = _corner_slabs(us)
    sigs = []
    idx3 = jnp.arange(3)
    for t in range(6):
        H = None
        for a in range(4):
            term = g[t, a][:, None] * uc[_KUHN_TETS[t, a]][None, :]
            H = term if H is None else H + term  # H[d,e]
        eps = 0.5 * (H + jnp.swapaxes(H, 0, 1))
        tr = eps[0, 0] + eps[1, 1] + eps[2, 2]
        sig = 2.0 * mu * eps
        sig = sig.at[idx3, idx3].add(lam * tr[None])
        sigs.append(sig)
    return jnp.stack(sigs, axis=0)


def geom_apply(res: WingMeshResolution, geo, sig, u, free):
    """y = K_G(sigma) u, matrix-free on the grid (strain_apply's slab
    pattern): y[a,i] = sum_t V_t * g_a . H_i with H[d,i] = sum_b
    (sigma g_b)[d] u_b[i]."""
    g, vol = geo
    us = weld_spread(res, u * free)
    uc, _ = _corner_slabs(us)
    y = jnp.zeros_like(us)
    for t in range(6):
        # sg[b] = sigma @ g_b : (3,B,nc,nt,ns)
        H = None
        for b in range(4):
            sgb = (sig[t] * g[t, b][None, :]).sum(axis=1)  # (3,B,...)
            term = sgb[:, None] * uc[_KUHN_TETS[t, b]][None, :]  # (3d,3i,B,...)
            H = term if H is None else H + term
        Hw = H * vol[t][None, None]
        for a in range(4):
            fe = (Hw * g[t, a][:, None]).sum(axis=0)  # (3i,B,...)
            ia, ja, ka = _HEX_CORNERS[_KUHN_TETS[t, a]]
            nc, nt_, ns = fe.shape[2], fe.shape[3], fe.shape[4]
            y = y.at[:, :, ia : ia + nc, ka : ka + nt_, ja : ja + ns].add(fe)
    return weld_reduce(res, y) * free


@dataclass
class BucklingResult:
    load_factor: float  # smallest positive lambda (critical multiple of load)
    factors: np.ndarray  # (k,) positive lambdas ascending (inf-padded)
    modes: np.ndarray  # (N,3,k) buckling mode shapes (K-normalized)
    sweeps: int
    converged: bool


class WingBuckling(GridBlockSolver):
    """Subspace-iteration buckling eigensolver: pre-solve -> sigma0 -> pencil
    (K, -K_G) via the shared block MG-PCG engine."""

    def __init__(self, res: WingMeshResolution, p4, pressure: float = 5e3, **kw):
        super().__init__(res, p4, **kw)
        self.pressure = float(pressure)
        self._sig = None

    def _prepare_stress(self) -> None:
        """Static pre-solve at the reference pressure; per-tet sigma0."""
        if getattr(self, "_u0", None) is not None:
            return
        out = self.st.solve(
            self.p4[None], pressure=self.pressure, tol=1e-8, maxiter=2000,
            chunk_iters=self.chunk_iters, outer_f64=True,
        )
        if not bool(np.all(np.asarray(out.converged))):
            raise RuntimeError(
                f"static pre-solve did not converge: rel "
                f"{float(np.max(np.asarray(out.rel_residual))):.2e}"
            )
        self._u0 = np.asarray(out.u, np.float64)  # (N,3,1)
        self._block_u0 = None

    def _prepare_pencil(self, q: int) -> None:
        """sigma0 tiled to q lanes + the jitted S = -K_G block apply."""
        self._prepare_stress()
        self._prepare(q)  # MG state + geo64 at q lanes
        if self._block_u0 == q:
            return
        u0 = np.tile(self._u0, (1, 1, q))  # (N,3,q)
        u0g = to_grid(self.res, jnp.asarray(u0))
        sig = element_stress(self.res, self._geo64, u0g, self._lam64, self._mu64)
        self._sig = jax.device_put(sig)
        free = self._free64
        res = self.res
        geo = self._geo64

        @jax.jit
        def s_apply(xg):
            return -geom_apply(res, geo, self._sig, xg, free)

        self._jit_s = s_apply
        self._block_u0 = q

    def _S(self, X_np: np.ndarray) -> np.ndarray:
        """Mesh-space S X = -K_G X for a block (N,3,q)."""
        xg = to_grid(self.res, jnp.asarray(X_np))
        return np.array(from_grid(self.res, self._jit_s(xg)), np.float64)

    def solve(
        self,
        n_modes: int = 4,
        block: int | None = None,
        tol: float = 1e-8,
        max_sweeps: int = 60,
        seed: int = 0,
    ) -> BucklingResult:
        k = int(n_modes)
        # the K^{-1}K_G spectrum is CLUSTERED (neighboring factors within
        # ~20% on the 19.8k-DOF demo), so subspace separation needs a
        # generous buffer: q = k+6 burned 60 sweeps without reaching 1e-7
        # there; the 2k+8 default buys separation at linear per-sweep cost
        q = block or (2 * k + 8)
        self._prepare_pencil(q)

        rng = np.random.default_rng(seed)
        X = rng.standard_normal((self.num_nodes, 3, q))
        X[~self.free_rows] = 0.0

        import scipy.linalg as sla

        # wall-clock levers shared with tpufem.fem.modal._subspace_smallest:
        # Ritz warm start (S x = nu K x near convergence, so K Y = S X has
        # the prediction Y ~ X diag(nu)) + inexact early sweeps (inner tol
        # tracks the factor movement; accept convergence only from a sweep
        # run at the full inner_tol)
        inner_tol = float(self.inner_tol)
        loose_cap = max(inner_tol, 1e-3)
        lam_prev = None
        nu_cols = None
        rel_last = None
        sweeps = 0
        converged = False
        nu = None
        for sweeps in range(1, max_sweeps + 1):
            if rel_last is None:
                tol_sweep = loose_cap
            else:
                tol_sweep = min(max(0.1 * rel_last, inner_tol), loose_cap)
            tol_sweep = max(10.0 ** np.floor(np.log10(tol_sweep)), inner_tol)
            SX = self._S(X)
            Y0 = X * nu_cols[None, None, :] if nu_cols is not None else None
            Y, _ = self._block_solve(SX, Y0, tol_sweep)  # K Y = S X
            Y[~self.free_rows] = 0.0
            Kbar = np.einsum("niq,nip->qp", Y, SX)  # Y^T K Y
            SY = self._S(Y)
            Sbar = np.einsum("niq,nip->qp", Y, SY)  # Y^T S Y (indefinite)
            Kbar = 0.5 * (Kbar + Kbar.T)
            Sbar = 0.5 * (Sbar + Sbar.T)
            nu, Q = sla.eigh(Sbar, Kbar)  # ascending; K-orthonormal Q
            # dominant |nu| subspace is retained automatically (all q kept)
            X = np.einsum("niq,qp->nip", Y, Q)
            nu_cols = nu  # per-column Ritz values for the next warm start
            pos = nu[nu > 0]
            lam_now = np.sort(1.0 / pos)[:k] if len(pos) else np.array([])
            if lam_prev is not None and len(lam_now) and len(lam_prev) == len(
                lam_now
            ):
                rel = np.abs(lam_now - lam_prev) / np.maximum(lam_now, 1e-300)
                rel_last = float(rel.max())
                if rel_last < tol and tol_sweep <= inner_tol * (1 + 1e-12):
                    converged = True
                    break
            lam_prev = lam_now.copy() if len(lam_now) else None

        order = np.argsort(-nu)  # descending nu = ascending lambda
        nu_sorted = nu[order]
        factors = np.full(k, np.inf)
        modes = np.zeros((self.num_nodes, 3, k))
        j = 0
        for idx, v in zip(order, nu_sorted):
            if v <= 0 or j >= k:
                continue
            factors[j] = 1.0 / v
            modes[:, :, j] = X[:, :, idx]
            j += 1
        return BucklingResult(
            load_factor=float(factors[0]),
            factors=factors,
            modes=modes,
            sweeps=sweeps,
            converged=converged,
        )


class WingPrestressedModal(WingBuckling):
    """Stress-stiffened vibration spectrum: (K + p K_G(sigma0)) phi = w^2 M phi.

    Couples the two dynamic analyses of this package: at load factor p = 0
    it IS the free-vibration pencil (tpufem.fem.modal.WingModal), and as p
    approaches the critical factor lambda_cr (WingBuckling.solve) the lowest
    frequency collapses to zero — the classic frequency-vs-load curve used
    to read buckling margins from vibration tests. Beyond-parity: the
    reference pipeline (reference src/deep_fem_uav_wing/fem.py) is
    static-only.

    TPU-native posture is unchanged from the parent classes: sigma0 comes
    from one converged static pre-solve, K + p K_G is applied matrix-free on
    the grid (strain_apply + geom_apply fused into one jitted f64 operator),
    the K-built f32 V-cycle stays the preconditioner (spectrally close for p
    below critical; CG absorbs the K_G perturbation), and the load factor p
    is a TRACED scalar argument so ONE compilation serves an entire load
    sweep."""

    def __init__(self, res: WingMeshResolution, p4, pressure: float = 5e3, **kw):
        super().__init__(res, p4, pressure=pressure, **kw)
        self.mass = lumped_mass(
            self.mesh.nodes.astype(np.float64), self.mesh.tets, self.material.rho
        )
        self._pg = None
        self._load_block = None

    def _prepare_load(self, q: int) -> None:
        """sigma0 at q lanes + jitted (K + p K_G) CG with p as a traced arg."""
        self._prepare_pencil(q)
        if self._load_block == q:
            return
        res, geo, sig, free = self.res, self._geo64, self._sig, self._free64
        lam64, mu64 = self._lam64, self._mu64
        mstate, smg = self._mstate, self.st.smg
        inner_tol = self.inner_tol

        def A(pg, x):
            return strain_apply(res, geo, x, free, lam64, mu64) + pg * geom_apply(
                res, geo, sig, x, free
            )

        def Mpre(r):
            return smg.apply(mstate, r.astype(jnp.float32)).astype(jnp.float64)

        def dot(u_, v_):
            return (u_ * v_).sum(axis=(0, 2, 3, 4))

        del inner_tol  # tol is traced per solve (inexact subspace sweeps)

        @jax.jit
        def init(pg, bg, x0g):
            return _cg_grid_init(partial(A, pg), Mpre, dot, bg, x0g)

        @jax.jit
        def run(pg, cg, tol, maxiter):
            return _cg_grid_run(partial(A, pg), Mpre, dot, cg, tol, maxiter)

        self._jit_initp = init
        self._jit_runp = run
        self._jit_Ap = jax.jit(A)
        self._load_block = q

    def _block_solve(
        self,
        B_np: np.ndarray,
        x0_np: np.ndarray | None = None,
        tol: float | None = None,
    ) -> tuple[np.ndarray, int]:
        """Y = (K + p K_G)^{-1} B, chunk-bounded (same dispatch policy, warm
        start, and per-solve tol as GridBlockSolver._block_solve)."""
        tol = self.inner_tol if tol is None else float(tol)
        bg = to_grid(self.res, jnp.asarray(B_np))
        x0g = (
            to_grid(self.res, jnp.asarray(x0_np))
            if x0_np is not None
            else jnp.zeros_like(bg)
        )
        cg = self._jit_initp(self._pg, bg, x0g)
        total = 0
        while total < self.inner_maxiter:
            step = min(self.chunk_iters, self.inner_maxiter - total)
            cg, k, rel, conv = self._jit_runp(self._pg, cg, tol, step)
            total += int(k)
            if bool(jnp.all(conv)) or int(k) < step:
                break
        return np.array(from_grid(self.res, cg[0]), np.float64), total

    def _apply_K(self, X_np: np.ndarray) -> np.ndarray:
        xg = to_grid(self.res, jnp.asarray(X_np))
        return np.asarray(
            from_grid(self.res, self._jit_Ap(self._pg, xg)), np.float64
        )

    def solve(
        self,
        n_modes: int = 6,
        load_factor: float = 1.0,
        block: int | None = None,
        tol: float = 1e-9,
        max_sweeps: int = 40,
        seed: int = 0,
        X0: np.ndarray | None = None,
    ) -> ModalResult:
        k = int(n_modes)
        q = block or min(2 * k, k + 8)
        q = max(q, k + 2)
        self._prepare_load(q)
        self._pg = jnp.asarray(float(load_factor), jnp.float64)
        return _subspace_smallest(self, k, q, tol, max_sweeps, seed, X0=X0)

    def frequency_sweep(
        self, load_factors, n_modes: int = 4, **kw
    ) -> list[ModalResult]:
        """Modal spectra across load factors. One compilation serves the
        whole sweep (p is traced); each step warm-starts from the previous
        subspace, so the per-point cost drops along the curve."""
        outs: list[ModalResult] = []
        X0 = None
        for p in load_factors:
            out = self.solve(n_modes=n_modes, load_factor=float(p), X0=X0, **kw)
            X0 = out.modes
            outs.append(out)
        return outs
