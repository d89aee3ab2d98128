"""Mesh-sharded FEM solve via GSPMD sharding annotations (CROSS-CHECK PATH).

This module expresses the wing solve with global semantics + `NamedSharding`
annotations and lets XLA's SPMD partitioner insert the collectives (the
scaling-book recipe: pick a mesh, annotate, let XLA insert collectives).
Node-state vectors (x, r, p, z) are sharded over the 'mesh' axis; element
arrays (tets, grads, vols) likewise. The irregular gather/scatter induces
all-gather/reduce-scatter pairs over ICI.

STATUS: correctness cross-check, not the production sharded path. It uses a
plain Jacobi preconditioner, which on wing meshes only converges reliably with
f64 CG state (tpufem/fem/precond.py's measured finding); `sharded_pcg_solve`
therefore requires float64 inputs and raises otherwise. The PRODUCTION
sharded solver — two-level (thickness-line + RBM coarse) preconditioning,
tet4/tet10, uneven slabs, hand-scheduled ppermute halo exchange over ICI —
is tpufem.parallel.halo_pcg (BASELINE.json config 5). Tests use this module
to cross-validate halo_pcg against an independently-derived parallel solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.fem.assembly import stiffness_diagonal, stiffness_operator
from tpufem.fem.elements import tet4_setup
from tpufem.fem.loads import pressure_loads
from tpufem.fem.solver import pcg


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sharded_pcg_solve(
    mesh: Mesh,
    nodes,
    tets,
    upper_faces,
    free_mask,
    pressure: float,
    lam: float,
    mu: float,
    tol: float = 1e-6,
    maxiter: int = 10000,
    axis: str = "mesh",
):
    """Solve the wing system with node/element arrays sharded over `mesh`.

    Shapes are padded up to multiples of the device count so every shard is
    equal-sized (padded tets are degenerate -> zero contribution; padded nodes
    get unit diagonal via the free-mask trick).

    Returns (u (N,3), iters, rel_residual) with N the original node count.
    """
    import numpy as np

    if np.asarray(nodes).dtype != np.float64:
        raise TypeError(
            "sharded_pcg_solve is a Jacobi-preconditioned f64 cross-check path; "
            "f32 Jacobi CG diverges on wing meshes (tpufem/fem/precond.py). "
            "Use tpufem.parallel.halo_pcg for production sharded solves."
        )

    n_dev = mesh.devices.size
    N = nodes.shape[0]
    T = tets.shape[0]
    F = upper_faces.shape[0]
    Np = _round_up(N, n_dev)
    Tp = _round_up(T, n_dev)
    Fp = _round_up(F, n_dev)

    nodes_p = np.zeros((Np, 3), dtype=nodes.dtype)
    nodes_p[:N] = np.asarray(nodes)
    tets_p = np.zeros((Tp, 4), dtype=np.int32)
    tets_p[:T] = np.asarray(tets)  # padded tets all point at node 0 -> degenerate
    faces_p = np.zeros((Fp, 3), dtype=np.int32)
    faces_p[:F] = np.asarray(upper_faces)
    face_mask = np.zeros((Fp,), dtype=nodes.dtype)
    face_mask[:F] = 1.0
    free_p = np.zeros((Np * 3,), dtype=nodes.dtype)
    free_p[: N * 3] = np.asarray(free_mask)  # padded nodes constrained

    node_sh = NamedSharding(mesh, P(axis, None))
    elem_sh = NamedSharding(mesh, P(axis, None))
    vec_sh = NamedSharding(mesh, P(axis))

    nodes_d = jax.device_put(nodes_p, node_sh)
    tets_d = jax.device_put(tets_p, elem_sh)
    faces_d = jax.device_put(faces_p, elem_sh)
    fmask_d = jax.device_put(face_mask, vec_sh)
    free_d = jax.device_put(free_p, vec_sh)

    @partial(jax.jit, static_argnames=("num_nodes", "tol", "maxiter"))
    def run(nodes, tets, faces, fmask, free, pressure, lam, mu, num_nodes, tol, maxiter):
        grads, vols = tet4_setup(nodes, tets)
        f = pressure_loads(nodes, faces, pressure, num_nodes, fmask)
        b = f.reshape(-1) * free
        A0 = stiffness_operator(grads, vols, tets, lam, mu, num_nodes, free)

        def A(x):
            # keep CG state sharded across iterations
            x = jax.lax.with_sharding_constraint(x.reshape(-1, 3), node_sh).reshape(-1)
            return A0(x)

        diag = stiffness_diagonal(grads, vols, tets, lam, mu, num_nodes, free)
        res = pcg(A, b, diag, tol=tol, maxiter=maxiter)
        u = (res.x * free).reshape(-1, 3)
        return u, res.iters, res.rel_residual

    dt = nodes_d.dtype
    u, iters, rel = run(
        nodes_d,
        tets_d,
        faces_d,
        fmask_d,
        free_d,
        jnp.asarray(pressure, dt),
        jnp.asarray(lam, dt),
        jnp.asarray(mu, dt),
        num_nodes=Np,
        tol=tol,
        maxiter=maxiter,
    )
    return u[:N], iters, rel
