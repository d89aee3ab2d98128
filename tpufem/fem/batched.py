"""Batched FEM dataset generation: vmapped assembly+PCG over wing cases.

STATUS: CROSS-CHECK ENGINE ONLY. The production batched engine is
tpufem.fem.stencil_mg.WingStencilT (grid-layout MG-PCG, the bench.py path and
`generate_fem_dataset --batched` default since round 3); this leading-axis
vmap form gathers 12-byte rows per node and measures ~100x off HBM speed
(batched_t.py:3-6). It remains as the independent implementation the
batched==sequential equivalence tests cross-check against.

The reference generates its FEM dataset with one CalculiX subprocess per case,
sequentially, "minutes per case" (scripts/generate_fem_dataset.py:91,
README.md:34). tpufem exploits the structured mesher's fixed topology
(tpufem.mesher: identical tets/faces/sets for every wing in the PRD box) to run
the WHOLE dataset as one jit call:

    params (B,4)  --nodes_from_params-->  nodes (B,N,3)
                  --vmap(assemble + Jacobi-PCG + stress recovery)--> results

No per-case padding, no host round-trips: geometry evaluation, stiffness setup,
load vectors, the CG loop and von Mises recovery are all fused into a single
XLA program (BASELINE.json config 4, the >=20x target).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assembly import stiffness_operator
from tpufem.fem.bc import dirichlet_mask
from tpufem.fem.elements import tet4_setup
from tpufem.fem.loads import pressure_loads
from tpufem.fem.material import Material, lame_params
from tpufem.fem.solver import pcg
from tpufem.fem.vonmises import element_stress, nodal_stress, von_mises
from tpufem.mesher import WingMeshResolution, nodes_from_params, wing_topology
from tpufem.sets import build_boundary_sets
from tpufem.mesher import structured_wing_mesh


class BatchSolveResult(NamedTuple):
    nodes: jnp.ndarray  # (B,N,3)
    u: jnp.ndarray  # (B,N,3)
    stress6: jnp.ndarray  # (B,N,6)
    vm: jnp.ndarray  # (B,N)
    iters: jnp.ndarray  # (B,) or scalar
    rel_residual: jnp.ndarray  # (B,)
    converged: jnp.ndarray  # (B,)


class WingBatchContext:
    """Host-side prep shared by every case at one resolution: topology arrays,
    boundary sets (topology-invariant for the structured mesher), free mask."""

    def __init__(self, res: WingMeshResolution, dtype=jnp.float32):
        topo = wing_topology(res)
        self.res = res
        self.dtype = dtype
        self.num_nodes = topo.num_nodes
        self.node_basis = jnp.asarray(topo.node_basis, dtype=dtype)
        self.te_floor = topo.te_floor
        self.tets = jnp.asarray(topo.tets)
        # boundary sets from a representative geometry; indices are topological
        # so they hold for every wing in the PRD box
        ref_mesh = structured_wing_mesh(1.2, 0.35, 10.0, 0.10, res)
        self.sets = build_boundary_sets(ref_mesh)
        self.surf_faces = topo.surf_faces
        self.upper_faces = jnp.asarray(topo.surf_faces[self.sets.surf_upper_faces])
        self.free_mask = dirichlet_mask(self.num_nodes, self.sets.nroot_nodes, dtype=dtype)
        from tpufem.fem.assembly import build_incidence
        from tpufem.fem.precond import build_line_plan, plan_device_arrays

        inc, inc_mask = build_incidence(topo.tets, self.num_nodes)
        self.incidence = jnp.asarray(inc)
        self.inc_mask = jnp.asarray(inc_mask, dtype=dtype)
        self.line_plan = build_line_plan(topo)
        self._plan_arrays = plan_device_arrays(self.line_plan)
        # RBM two-level coarse correction (see tpufem.fem.precond /
        # batched_t: required for f32 convergence at ~100k DOF)
        from tpufem.fem.precond import build_rbm_groups

        node_group, self.n_groups = build_rbm_groups(
            topo.station_id, topo.slot, res.n_chord + 1, res.n_span + 1
        )
        self.node_group = jnp.asarray(node_group)
        self._jit_chunk = jax.jit(self._cg_chunk, static_argnames=("tol", "maxiter"))
        self._jit_recover = jax.jit(self._recover)

    def _case_system(self, p, pressure, lam, mu):
        from tpufem.fem.precond import (
            line_blocks,
            make_line_preconditioner,
            make_rbm_two_level,
            rbm_coarse_inverse,
        )

        nodes = nodes_from_params(
            self.node_basis, p[0], p[1], p[2], p[3], te_floor=self.te_floor
        )
        grads, vols = tet4_setup(nodes, self.tets)
        f = pressure_loads(nodes, self.upper_faces, pressure, self.num_nodes)
        b = f.reshape(-1) * self.free_mask
        A = stiffness_operator(
            grads, vols, self.tets, lam, mu, self.num_nodes, self.free_mask,
            incidence=self.incidence, inc_mask=self.inc_mask,
        )
        Binv = line_blocks(
            self._plan_arrays, grads, vols, lam, mu, self.free_mask,
            S=self.line_plan.num_stations, K=self.line_plan.K,
        )
        M = make_line_preconditioner(
            self._plan_arrays, Binv,
            S=self.line_plan.num_stations, K=self.line_plan.K,
        )
        Ac_inv, dvec = rbm_coarse_inverse(
            self.node_group, self.n_groups, self.tets, nodes, grads, vols,
            lam, mu, self.free_mask,
        )
        M = make_rbm_two_level(M, Ac_inv, self.node_group, self.n_groups, dvec, self.free_mask)
        return nodes, grads, vols, b, A, M

    def _cg_chunk(self, params4, pressure, lam, mu, x0, tol, maxiter):
        def one(p, x0_i):
            _, _, _, b, A, M = self._case_system(p, pressure, lam, mu)
            res = pcg(A, b, M=M, x0=x0_i, tol=tol, maxiter=maxiter)
            return res.x, res.iters, res.rel_residual, res.converged

        return jax.vmap(one)(params4, x0)

    def _recover(self, params4, pressure, lam, mu, x):
        def one(p, x_i):
            nodes, grads, vols, _, _, _ = self._case_system(p, pressure, lam, mu)
            u = (x_i * self.free_mask).reshape(-1, 3)
            sigma_e = element_stress(grads, vols, self.tets, u, lam, mu)
            s6 = nodal_stress(sigma_e, vols, self.tets, self.num_nodes)
            return nodes, u, s6, von_mises(s6)

        return jax.vmap(one)(params4, x)

    def solve(
        self, params4, pressure, lam, mu, tol=1e-6, maxiter=20000, chunk_iters=1000
    ) -> BatchSolveResult:
        """Batched solve over (B,4) parameter rows (span, chord, sweep, t/c).

        The CG loop runs in host-bounded chunks of `chunk_iters` dispatches
        (vmapped across the whole batch inside each dispatch); the while_loop
        inside a chunk exits early once every lane converges."""
        B = params4.shape[0]
        x = jnp.zeros((B, self.num_nodes * 3), dtype=self.dtype)
        total = jnp.zeros((B,), dtype=jnp.int32)
        rel = None
        conv = None
        done = 0
        maxiter = int(maxiter)
        chunk_iters = int(chunk_iters) if chunk_iters else maxiter
        while done < maxiter:
            step = min(chunk_iters, maxiter - done)
            x, it, rel, conv = self._jit_chunk(
                params4, pressure, lam, mu, x, tol=tol, maxiter=step
            )
            total = total + it
            done += step
            if bool(jnp.all(conv)):
                break
        nodes, u, s6, vm = self._jit_recover(params4, pressure, lam, mu, x)
        return BatchSolveResult(nodes, u, s6, vm, total, rel, conv)


def solve_wing_batch(
    params_list: list[dict],
    res: WingMeshResolution,
    pressure: float = 5e3,
    material: Material = Material(),
    tol: float = 1e-6,
    maxiter: int = 20000,
    dtype=jnp.float32,
    ctx: WingBatchContext | None = None,
) -> tuple[BatchSolveResult, WingBatchContext]:
    """Host-facing batched solve for a list of wing parameter dicts."""
    ctx = ctx or WingBatchContext(res, dtype=dtype)
    p4 = np.array(
        [
            [p["span_m"], p["chord_m"], p["sweep_deg"], p["thickness_ratio"]]
            for p in params_list
        ],
        dtype=np.float32 if dtype == jnp.float32 else np.float64,
    )
    lam, mu = lame_params(material)
    out = ctx.solve(
        jnp.asarray(p4, dtype=dtype),
        jnp.asarray(pressure, dtype=dtype),
        jnp.asarray(lam, dtype=dtype),
        jnp.asarray(mu, dtype=dtype),
        tol=tol,
        maxiter=maxiter,
    )
    return out, ctx
