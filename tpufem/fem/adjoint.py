"""Differentiable wing FEM: adjoint gradients through the stencil MG-PCG solve.

Capability beyond the reference pipeline (reference fem.py:524-533 shells out
to CalculiX, a black box): because the whole discrete system here is traced
JAX — parameter -> node grid (stencil.nodes_grid) -> cell geometry -> operator
apply — the solve can expose exact design derivatives d(objective)/d(params)
via the adjoint method, enabling gradient-based wing design on TPU.

Mathematics: with K(p) u = b(p) (SPD, Dirichlet rows/cols projected by the
free mask) and an objective J(p, u), the total derivative is

    dJ/dp = ∂J/∂p − λᵀ ∂F/∂p,   K λ = ∂J/∂u,   F(p) ≜ K(p) u − b(p)

where u is held fixed in ∂F/∂p. Both linear solves (primal and adjoint) use
the SAME grid-native MG-PCG (K is symmetric), expressed with lax.while_loop so
the entire optimization step jits as one XLA program.

Two structural choices keep this TPU-clean:

  - `jax.custom_vjp` around the solve: autodiff never unrolls the CG loop
    (O(iters) memory and garbage gradients); the backward pass is one more
    MG-PCG solve plus one `jax.vjp` of the residual form at fixed u.
  - FROZEN preconditioner: the V-cycle state (stencil coefficients, line-block
    inverses, host-f64 dense coarsest) is built once at the initial designs
    and reused across optimizer steps. A preconditioner never changes the
    solution — only the iteration count — so its p-dependence carries zero
    true gradient, and freezing it keeps the host-side coarsest factorization
    out of the traced path. Call `refresh(p)` between steps if designs drift
    far from the reference point.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.material import Material, lame_params
from tpufem.fem.stencil import (
    cell_geometry,
    from_grid,
    nodes_grid,
    strain_apply,
)
from tpufem.fem.stencil_mg import WingStencilT, _cg_grid_init, _cg_grid_run
from tpufem.mesher import WingMeshResolution


class DifferentiableWingFEM:
    """Batched differentiable solve u(p4) on the stencil grid.

    p4: (B, 4) [span_m, chord_m, sweep_deg, thickness_ratio], f64.
    solve(p4) -> u grid (3, B, NI, NK, NJ) f64, differentiable wrt p4.
    """

    def __init__(
        self,
        res: WingMeshResolution,
        p_ref,
        pressure: float = 5e3,
        material: Material | None = None,
        tol: float = 1e-10,
        maxiter: int = 2000,
    ):
        self.res = res
        self.pressure = float(pressure)
        self.material = material or Material()
        self.tol = float(tol)
        self.maxiter = int(maxiter)
        self.st = WingStencilT(res, dtype=jnp.float32)
        lam, mu = lame_params(self.material)
        self._lam64 = jnp.asarray(lam, jnp.float64)
        self._mu64 = jnp.asarray(mu, jnp.float64)
        self._free64 = self.st.smg.free_masks[0].astype(jnp.float64)
        self._dup64 = self.st.smg.dup_masks[0].astype(jnp.float64)
        self.refresh(p_ref)
        self._solve = self._make_solve()

    # ---- preconditioner (frozen, solution-invariant)
    def refresh(self, p_ref) -> None:
        """(Re)build the V-cycle state at `p_ref` (host coarsest included)."""
        st = self.st
        p32 = jnp.asarray(np.asarray(p_ref), jnp.float32)
        lam32 = jnp.asarray(float(self._lam64), jnp.float32)
        mu32 = jnp.asarray(float(self._mu64), jnp.float32)
        _, _, _, _, state = st._jit_setup(
            p32, jnp.asarray(self.pressure, jnp.float32), lam32, mu32
        )
        state = st.smg.finalize(
            state, np.asarray(p_ref, np.float64), float(self._lam64), float(self._mu64)
        )
        self._mstate = state

    # ---- traced pieces
    def _system(self, p4):
        """(geo, b) of the f64 discrete system, traced from parameters."""
        X = nodes_grid(self.res, p4, jnp.float64)
        geo = cell_geometry(self.res, X)
        nodes = from_grid(self.res, X)
        bg = self.st._loads_grid(nodes, jnp.asarray(self.pressure, jnp.float64), jnp.float64)
        return geo, bg

    def _ops(self, geo):
        smg = self.st.smg
        mstate = self._mstate

        def A(x):
            return strain_apply(self.res, geo, x, self._free64, self._lam64, self._mu64)

        def M(r):
            return smg.apply(mstate, r.astype(jnp.float32)).astype(jnp.float64)

        def dot(u_, v_):
            return (u_ * v_).sum(axis=(0, 2, 3, 4))

        return A, M, dot

    def _pcg(self, geo, rhs):
        A, M, dot = self._ops(geo)
        cg = _cg_grid_init(A, M, dot, rhs, jnp.zeros_like(rhs))
        st, _, rel, conv = _cg_grid_run(A, M, dot, cg, self.tol, self.maxiter)
        return st[0], rel, conv

    def _make_solve(self):
        @jax.custom_vjp
        def solve(p4):
            geo, bg = self._system(p4)
            u, _, _ = self._pcg(geo, bg)
            return u

        def fwd(p4):
            geo, bg = self._system(p4)
            u, _, _ = self._pcg(geo, bg)
            return u, (p4, u)

        def bwd(saved, gu):
            p4, u = saved
            # cotangents on constrained/duplicate slots are inert (u is
            # identically zero there); project them out so the adjoint RHS
            # stays in the free welded subspace where K is SPD
            gu = gu * self._free64 * self._dup64
            geo, _ = self._system(p4)
            lam_adj, _, _ = self._pcg(geo, gu)

            def F(p):
                geo_p, bg_p = self._system(p)
                return (
                    strain_apply(
                        self.res, geo_p, u, self._free64, self._lam64, self._mu64
                    )
                    - bg_p
                )

            _, vjp = jax.vjp(F, p4)
            (gp,) = vjp(lam_adj)
            return (-gp,)

        solve.defvjp(fwd, bwd)
        return solve

    def solve(self, p4):
        """u grid (3,B,NI,NK,NJ), f64, differentiable wrt p4 (B,4)."""
        return self._solve(jnp.asarray(p4, jnp.float64))

    # ---- differentiable post-processing / objectives
    def displacements(self, p4, u_grid):
        """Node displacements (N,3,B) from the grid solution."""
        return from_grid(self.res, u_grid)

    def compliance(self, p4, u_grid):
        """Per-lane compliance bᵀu (work of the pressure load; lower =
        stiffer wing). Differentiable in both arguments."""
        _, bg = self._system(p4)
        return (bg * u_grid).sum(axis=(0, 2, 3, 4))

    def volume(self, p4):
        """Per-lane wing volume (mass proxy), traced from parameters."""
        nodes = self.st.bt._nodes(jnp.asarray(p4, jnp.float64))
        _, vols = self.st.bt._grads_vols(nodes)
        return vols.sum(axis=0)

    def smooth_max_vm(self, p4, u_grid, sharpness: float = 30.0):
        """Differentiable upper envelope of the von Mises field per lane.

        Uses a log-sum-exp over the per-node vM normalized by its mean:
        smooth_max >= max is approached as `sharpness` grows; moderate values
        keep gradients distributed over the stressed region (better-behaved
        optimization than a hard max on a discrete field).
        """
        nodes = self.st.bt._nodes(jnp.asarray(p4, jnp.float64))
        grads, vols = self.st.bt._grads_vols(nodes)
        x = from_grid(self.res, u_grid)
        _, _, vm = self.st.bt._recover(grads, vols, x, self._lam64, self._mu64)
        scale = vm.mean(axis=0) + 1e-30  # (B,)
        z = sharpness * vm / scale[None, :]
        return scale / sharpness * jax.scipy.special.logsumexp(z, axis=0)
