#!/usr/bin/env python
"""Headline benchmark: per-wing assembly+PCG wall-clock at ~100k DOF (tet4).

BASELINE.json metric: "per-wing assembly+PCG wall-clock (100k-DOF tet4)".
Reference baseline: CalculiX takes "minutes" per case on local CPU
(README.md:34, docs/prd.md:169-172); we take 60 s/case as the conservative
baseline, so vs_baseline = 60 / per_case_seconds (speedup, higher is better).

Measures the BATCHED path (BASELINE config 4): B wing cases solved in one
grid-layout MG-PCG run (tpufem.fem.stencil_mg.WingStencilT — stencil-slice
operators, geometric multigrid preconditioner, f64-operator outer CG), at
tol 1e-6 judged on the TRUE f64 residual. Prints ONE JSON line.

Optional: --trace DIR writes a jax.profiler trace of the timed solve
(tpufem.utils.profiling.trace) for TensorBoard.
"""

from __future__ import annotations

import argparse
import json
import time

import jax

jax.config.update("jax_enable_x64", True)  # f64-outer CG (emulated on TPU)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_SECONDS_PER_CASE = 60.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", choices=("refine", "outer64"), default="outer64",
                    help="outer64 (default): emulated-f64 operator CG with the "
                         "f32 V-cycle — reaches tol 1e-6 on the TRUE residual "
                         "in ~230 iters. 'refine' (measured 2026-08-17): the "
                         "f32-correction floor at this conditioning is ~3.3e-6, "
                         "ABOVE tol 1e-6 (321 iters, not converged) — kept "
                         "only for comparison runs")
    ap.add_argument("--warm_f32", action="store_true",
                    help="outer64 only: run the legacy f32 warm start before "
                         "the f64 correction cascade (measured NET LOSS at "
                         "DOF100K: the f32 recurrence drifts eps_f32*kappa "
                         "from the true residual, so its 'solution' starts "
                         "the cascade no closer than zero does)")
    ap.add_argument("--dd_main", action="store_true",
                    help="outer64 only: run the legacy full-strength emulated-"
                         "f64 CG phase to tol before the host-judged "
                         "correction rounds (the round-3 bench path; ~146 "
                         "extra dd iterations grinding at the dd noise floor)")
    ap.add_argument("--smooth_degree", type=int, default=None,
                    help="override StencilMG Chebyshev degree (default 2)")
    ap.add_argument("--smooth_alpha", type=float, default=None,
                    help="override StencilMG Chebyshev lmin/lmax ratio (default 0.25)")
    args = ap.parse_args()

    from tpufem.fem.stencil_mg import WingStencilT
    from tpufem.mesher import DOF100K
    from tpufem.pipeline.types import PRD_RANGES
    from tpufem.utils.profiling import trace

    batch = args.batch
    tol = 1e-6
    maxiter = 2000
    chunk = 250

    mg_kwargs = {}
    if args.smooth_degree is not None:
        mg_kwargs["smooth_degree"] = args.smooth_degree
    if args.smooth_alpha is not None:
        mg_kwargs["smooth_alpha"] = args.smooth_alpha
    st = WingStencilT(DOF100K, dtype=jnp.float32, mg_kwargs=mg_kwargs or None)
    rng = np.random.default_rng(42)

    def sample(n):
        return np.stack(
            [
                rng.uniform(*PRD_RANGES["span_m"], n),
                rng.uniform(*PRD_RANGES["chord_m"], n),
                rng.uniform(*PRD_RANGES["sweep_deg"], n),
                rng.uniform(*PRD_RANGES["thickness_ratio"], n),
            ],
            axis=1,
        ).astype(np.float32)

    # warmup/compile on a DIFFERENT batch: the timed run must pay the full
    # per-case cost (setup + solve) — WingStencilT caches setup state per
    # param batch, so timing the warmup batch again would skip real work
    warm_p4 = sample(batch)
    p4 = sample(batch)
    kw = (
        dict(outer_f64=True, warm_f32=args.warm_f32, dd_main=args.dd_main)
        if args.mode == "outer64"
        else dict(refine_steps=4, inner_tol=1e-3)
    )
    out = st.solve(warm_p4, pressure=5e3, tol=tol, maxiter=maxiter,
                   chunk_iters=chunk, **kw)

    t0 = time.perf_counter()
    with trace(args.trace):
        out = st.solve(
            p4, pressure=5e3, tol=tol, maxiter=maxiter, chunk_iters=chunk, **kw
        )
    elapsed = time.perf_counter() - t0
    per_case = elapsed / batch

    print(
        json.dumps(
            {
                "metric": "fem_tet4_100kdof_batched_assembly_pcg_per_case",
                "value": round(per_case, 4),
                "unit": "s/case",
                "vs_baseline": round(BASELINE_SECONDS_PER_CASE / per_case, 1),
                "detail": {
                    "batch": batch,
                    "dof": int(st.num_nodes * 3),
                    "iters": int(out.iters),
                    "tol": tol,
                    "residual_metric": "true f64 residual of the f64-assembled system",
                    "max_rel_residual": float(np.max(np.asarray(out.rel_residual))),
                    "all_converged": bool(np.all(np.asarray(out.converged))),
                    "total_s": round(elapsed, 3),
                    "solver": (
                        "stencil-grid MG-PCG (f64 operator, f32 V-cycle)"
                        if args.mode == "outer64"
                        else "stencil-grid MG-PCG (f32 + mixed-precision "
                             "refinement, TRUE f64 residual)"
                    ),
                    "device": str(jax.devices()[0]),
                    "mg": mg_kwargs or {"smooth_degree": 2, "smooth_alpha": 0.25},
                    "warm_f32": args.mode == "outer64" and args.warm_f32,
                    "dd_main": bool(args.dd_main),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
