"""Jacobi-preconditioned conjugate gradients, entirely on-device.

Replaces CalculiX's SPOOLES direct factorization (reference fem.py:524-533) with
an iterative solve that lives in HBM: `lax.while_loop` with static shapes, so it
jits once, vmaps over batched cases (the loop runs until every lane converges),
and composes with shard_map for the node-sharded ~1M-DOF config.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # int32
    rel_residual: jnp.ndarray  # ||r|| / ||b||
    converged: jnp.ndarray  # bool


def pcg(
    A: Callable,
    b,
    diag=None,
    x0=None,
    tol: float = 1e-8,
    maxiter: int = 2000,
    dot=jnp.vdot,
    M: Callable | None = None,
) -> PCGResult:
    """Solve A x = b, preconditioned.

    Preconditioner: either `diag` (Jacobi, M = diag^-1) or an explicit SPD apply
    `M(r) -> z` (e.g. the thickness-line block-Jacobi in tpufem.fem.precond,
    which is what makes f32 CG converge on the anisotropic wing meshes).
    A must be SPD (the masked stiffness operator). Everything is traceable:
    no host synchronization inside the loop.
    """
    if M is None:
        inv_diag = 1.0 / diag
        M = lambda r: inv_diag * r  # noqa: E731
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = M(r)
    p = z
    rz = dot(r, z)
    b_norm = jnp.sqrt(dot(b, b))
    b_norm = jnp.where(b_norm > 0, b_norm, 1.0)
    tol_abs2 = (tol * b_norm) ** 2

    def cond(state):
        _, r, _, _, _, k = state
        return (dot(r, r) > tol_abs2) & (k < maxiter)

    def body(state):
        x, r, p, z, rz, k = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, z, rz_new, k + 1)

    x, r, p, z, rz, k = jax.lax.while_loop(cond, body, (x, r, p, z, rz, jnp.int32(0)))
    rel = jnp.sqrt(dot(r, r)) / b_norm
    return PCGResult(x=x, iters=k, rel_residual=rel, converged=rel <= tol)


@partial(jax.jit, static_argnames=("A", "n_iters", "M"))
def pcg_fixed(A, b, diag=None, n_iters: int = 100, M=None):
    """Fixed-iteration PCG via lax.scan — deterministic work for benchmarking
    and for pipelined multi-case batches where early exit wins nothing."""
    if M is None:
        inv_diag = 1.0 / diag
        M = lambda r: inv_diag * r  # noqa: E731
    x = jnp.zeros_like(b)
    r = b
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)

    def step(carry, _):
        x, r, p, z, rz = carry
        Ap = A(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, z, rz_new), None

    (x, r, _, _, _), _ = jax.lax.scan(step, (x, r, p, z, rz), None, length=n_iters)
    return x, jnp.sqrt(jnp.vdot(r, r)) / jnp.sqrt(jnp.vdot(b, b))
