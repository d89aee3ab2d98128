#!/usr/bin/env python
"""Gradient-based wing sizing with adjoint FEM derivatives (TPU-native).

Minimizes structural mass (wing volume) subject to a stress constraint,
using EXACT design gradients from tpufem.fem.adjoint — each optimizer step
differentiates through the full MG-PCG solve (adjoint method; backward pass
is one extra solve). A batch of B designs with different fixed (span, sweep)
optimizes IN PARALLEL in the solver's trailing batch lanes — the same
batching that powers dataset generation (BASELINE config 4) here powers
multi-point design.

    L(p) = V(p)/V_ref + w * softplus(smax_vM(p)/sigma_allow - 1)^2

Free variables: chord and thickness_ratio (bounded to the PRD box via a
sigmoid reparameterization); span and sweep stay at their per-lane values.
The optimizer thins each wing until the stress constraint binds.

Capability note: the reference pipeline (fem.py:524-533) treats the solver
as a black-box subprocess (CalculiX) — no derivatives exist; design search
there means finite-differencing whole pipeline runs.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import os

import jax
import jax.numpy as jnp
import numpy as np

# axon's sitecustomize force-registers the TPU platform and ignores
# JAX_PLATFORMS; honor an explicit cpu request through jax.config (same
# pattern as __graft_entry__.py)
if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001
        pass
jax.config.update("jax_enable_x64", True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_chord", type=int, default=32)
    ap.add_argument("--n_span", type=int, default=40)
    ap.add_argument("--n_thick", type=int, default=4)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--pressure", type=float, default=5e3)
    ap.add_argument("--sigma_allow", type=float, default=4e7,
                    help="allowable smooth-max von Mises [Pa]")
    ap.add_argument("--penalty", type=float, default=25.0)
    ap.add_argument("--refresh_every", type=int, default=20,
                    help="rebuild the frozen V-cycle at the current designs "
                         "every K steps (0 = never)")
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--out", default="results/wing_optimization.json")
    args = ap.parse_args()

    import optax

    from tpufem.fem.adjoint import DifferentiableWingFEM
    from tpufem.mesher import WingMeshResolution
    from tpufem.pipeline.types import PRD_RANGES

    res = WingMeshResolution(args.n_chord, args.n_span, args.n_thick, 0.006, "le")
    # four design points: (span, sweep) fixed per lane, chord+thickness free
    fixed = np.array(
        [[1.0, 5.0], [1.4, 15.0], [1.8, 25.0], [2.2, 35.0]], np.float64
    )
    B = fixed.shape[0]
    c_lo, c_hi = PRD_RANGES["chord_m"]
    t_lo, t_hi = PRD_RANGES["thickness_ratio"]

    def assemble_p4(theta):
        """theta (B,2) unconstrained -> p4 (B,4) inside the PRD box."""
        c = c_lo + (c_hi - c_lo) * jax.nn.sigmoid(theta[:, 0])
        t = t_lo + (t_hi - t_lo) * jax.nn.sigmoid(theta[:, 1])
        return jnp.stack(
            [jnp.asarray(fixed[:, 0]), c, jnp.asarray(fixed[:, 1]), t], axis=1
        )

    # start mid-box
    theta = jnp.zeros((B, 2), jnp.float64)
    p0 = np.asarray(assemble_p4(theta))
    fem = DifferentiableWingFEM(
        res, p0, pressure=args.pressure, tol=args.tol, maxiter=3000
    )
    v_ref = np.asarray(fem.volume(jnp.asarray(p0)))

    def loss(theta):
        p4 = assemble_p4(theta)
        u = fem.solve(p4)
        v = fem.volume(p4) / jnp.asarray(v_ref)
        smax = fem.smooth_max_vm(p4, u)
        viol = jax.nn.softplus((smax / args.sigma_allow - 1.0) * 20.0) / 20.0
        lanes = v + args.penalty * viol**2
        return lanes.sum(), (v, smax)

    vg = jax.jit(jax.value_and_grad(loss, has_aux=True))
    opt = optax.adam(args.lr)
    state = opt.init(theta)

    hist = []
    t0 = time.time()
    for k in range(args.steps):
        (val, (v, smax)), g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
        if args.refresh_every and (k + 1) % args.refresh_every == 0:
            fem.refresh(np.asarray(assemble_p4(theta)))
        rec = {
            "step": k,
            "loss": float(val),
            "volume_ratio": [round(float(x), 4) for x in np.asarray(v)],
            "smax_MPa": [round(float(x) / 1e6, 2) for x in np.asarray(smax)],
        }
        hist.append(rec)
        if k % 5 == 0 or k == args.steps - 1:
            print(json.dumps(rec), flush=True)

    p_fin = np.asarray(assemble_p4(theta))
    out = {
        "resolution": [args.n_chord, args.n_span, args.n_thick],
        "dof": int(fem.st.num_nodes * 3),
        "sigma_allow_MPa": args.sigma_allow / 1e6,
        "fixed_span_sweep": fixed.tolist(),
        "final_params": p_fin.tolist(),
        "final_volume_ratio": hist[-1]["volume_ratio"],
        "final_smax_MPa": hist[-1]["smax_MPa"],
        "initial_volume_m3": [float(x) for x in v_ref],
        "steps": args.steps,
        "wall_s": round(time.time() - t0, 1),
        "history": hist,
        "device": str(jax.devices()[0]),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}: final volume ratios {hist[-1]['volume_ratio']} "
          f"smax {hist[-1]['smax_MPa']} MPa (allow {args.sigma_allow/1e6:.0f})",
          flush=True)


if __name__ == "__main__":
    main()
