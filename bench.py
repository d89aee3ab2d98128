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
    ap.add_argument("--runs", type=int, default=3,
                    help="timed runs (fresh param batch each); value of "
                         "record is the min, median/spread reported")
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
    kw = (
        dict(outer_f64=True, warm_f32=args.warm_f32, dd_main=args.dd_main)
        if args.mode == "outer64"
        else dict(refine_steps=4, inner_tol=1e-3)
    )
    out = st.solve(warm_p4, pressure=5e3, tol=tol, maxiter=maxiter,
                   chunk_iters=chunk, **kw)
    if args.mode == "outer64" and not args.dd_main:
        # precompile the crtol=1e-1 correction variant: the cascade only
        # picks it when the host judge lands within a half-decade of tol
        # (0.3*tol/rel >= 1e-1), so the main warmup solve never traces it —
        # and a timed run that DOES hit it would pay a ~40 s compile
        # (measured: 67.4 s outlier vs 11.0 s min in the same 3-run set).
        # tol=0.34 makes the first host round choose crtol 1e-1 cheaply.
        st.solve(warm_p4, pressure=5e3, tol=0.34, maxiter=maxiter,
                 chunk_iters=chunk, **kw)

    # 3 timed runs of the SAME batch (setup cache cleared between runs, so
    # every run pays the full per-case cost); the value of record is the MIN
    # and the spread isolates SYSTEM noise — host load over the tunnel
    # perturbs individual runs (round-4 verdict weak #2: the driver measured
    # 2.58 s/case on the same solve the builder measured 1.40 s/case at
    # identical iters). Same-batch repeats keep problem difficulty out of
    # the spread; the batch itself is a fresh seeded PRD sample.
    p4 = sample(batch)
    runs = []
    for ri in range(args.runs):
        st._setup_cache = None
        t0 = time.perf_counter()
        with trace(args.trace if ri == 0 else None):
            out = st.solve(
                p4, pressure=5e3, tol=tol, maxiter=maxiter, chunk_iters=chunk,
                **kw
            )
        elapsed = time.perf_counter() - t0
        runs.append((elapsed, out, dict(st.last_timing or {})))

    runs_s = sorted(r[0] for r in runs)
    best_s, best_out, best_tm = min(runs, key=lambda r: r[0])
    median_s = runs_s[len(runs_s) // 2]
    spread = (runs_s[-1] - runs_s[0]) / runs_s[0] if runs_s[0] > 0 else 0.0
    per_case = best_s / batch

    # roofline: lower-bound HBM traffic per CG iteration (heavy operands of
    # the dd operator apply + the f32 V-cycle; perfect-fusion model, so the
    # achieved-bandwidth fraction is conservative). Per V-cycle level:
    # Chebyshev degree d costs 2d A-applies + 2d line applies (see
    # StencilMG._vcycle/_chebyshev); each A-apply streams the level's cell
    # geometry (78 scalars/cell: g 6x4x3 + vol 6).
    d = (mg_kwargs or {}).get("smooth_degree", 2)
    res_l = st.smg.resolutions
    geo_bytes = [78 * r.n_chord * r.n_thick * r.n_span * batch for r in res_l]
    grid_b64 = 3 * batch * st.num_nodes * 8
    bytes_iter = (
        geo_bytes[0] * 8                      # dd A-apply (f64 geometry)
        + sum(g * 4 * 2 * d for g in geo_bytes[:-1])  # f32 V-cycle A-applies
        + 12 * grid_b64                       # CG vector traffic (f64 grids)
    )
    dev_s = best_tm.get("device_s", 0.0)
    iters = int(best_out.iters)
    achieved_bw = bytes_iter * iters / dev_s if dev_s > 0 else 0.0
    HBM_BW = 1.0e12  # measured elementwise ~1 TB/s on this chip (ARCHITECTURE)

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
                    "iters": iters,
                    "tol": tol,
                    "residual_metric": "true f64 residual of the f64-assembled system",
                    "max_rel_residual": float(np.max(np.asarray(best_out.rel_residual))),
                    "all_converged": bool(np.all(np.asarray(best_out.converged))),
                    "total_s": round(best_s, 3),
                    "runs_s": [round(s, 3) for s in runs_s],
                    "median_s": round(median_s, 3),
                    "spread": round(spread, 3),
                    "timing": {k: round(v, 3) for k, v in best_tm.items()},
                    "roofline": {
                        "bytes_per_iter_model": int(bytes_iter),
                        "device_s": round(dev_s, 3),
                        "achieved_gb_s": round(achieved_bw / 1e9, 1),
                        "hbm_fraction": round(achieved_bw / HBM_BW, 3),
                        "model": "lower-bound traffic: dd A-apply geometry + "
                                 "2*degree f32 V-cycle applies/level + 12 f64 "
                                 "grid vectors",
                    },
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
