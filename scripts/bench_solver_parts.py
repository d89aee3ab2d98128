#!/usr/bin/env python
"""Per-op cost split of the stencil MG-PCG bench path (DOF100K, batch 8).

Times each building block of tpufem.fem.stencil_mg.WingStencilT on the
current backend so BENCH s/case can be attributed: f32/f64 operator apply,
V-cycle, line smoother, per-iteration cost of the f32 and f64 CG chunk loops,
setup, and the host-side f64 judge. The reference-relative context is
SURVEY.md section 7 / BASELINE config 4 (per-wing assembly+PCG wall-clock);
this script exists because round-2 measured ~51 ms/iter against a ~0.2 ms
HBM-roofline apply (stencil.py:9-13) and the gap needs attribution, not
guesses.

Prints one JSON line per part plus a summary.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, n=20, warm=2):
    for _ in range(warm):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from tpufem.fem.material import Material, lame_params
    from tpufem.fem.stencil import strain_apply
    from tpufem.fem.stencil_mg import WingStencilT
    from tpufem.mesher import DOF100K
    from tpufem.pipeline.types import PRD_RANGES

    batch = args.batch
    st = WingStencilT(DOF100K, dtype=jnp.float32)
    smg = st.smg
    rng = np.random.default_rng(42)
    p4 = np.stack(
        [
            rng.uniform(*PRD_RANGES["span_m"], batch),
            rng.uniform(*PRD_RANGES["chord_m"], batch),
            rng.uniform(*PRD_RANGES["sweep_deg"], batch),
            rng.uniform(*PRD_RANGES["thickness_ratio"], batch),
        ],
        axis=1,
    ).astype(np.float32)
    lam, mu = lame_params(Material())
    lam32 = jnp.asarray(lam, jnp.float32)
    mu32 = jnp.asarray(mu, jnp.float32)

    parts: dict[str, float] = {}

    t0 = time.perf_counter()
    nodes, grads, vols, bg, state = st._jit_setup(
        jnp.asarray(p4), jnp.asarray(5e3, jnp.float32), lam32, mu32
    )
    jax.block_until_ready(bg)
    parts["setup_device_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = smg.finalize(state, np.asarray(p4, np.float64), float(lam), float(mu))
    parts["setup_host_coarsest_s"] = time.perf_counter() - t0

    f64 = jnp.float64
    p464 = jnp.asarray(p4, f64)
    press64 = jnp.asarray(5e3, f64)
    lam64, mu64 = (jnp.asarray(v, f64) for v in lame_params(Material()))
    t0 = time.perf_counter()
    geo64, bg64, host_sys = st._host_setup64(p464, press64)
    jax.block_until_ready(bg64)
    parts["host_setup64_s"] = time.perf_counter() - t0

    # ---- individual ops (all jitted standalone)
    free32 = smg.free_masks[0]
    free64v = free32.astype(f64)
    x32 = bg
    x64 = bg64

    apply32 = jax.jit(
        lambda x: strain_apply(st.res, state[0]["geo"], x, free32, lam32, mu32)
    )
    apply64 = jax.jit(
        lambda x: strain_apply(st.res, geo64, x, free64v, lam64, mu64)
    )
    vcycle = jax.jit(lambda r: smg.apply(state, r))
    line = jax.jit(lambda r: smg._line_apply(0, state[0]["Binv"], r))
    dot64 = jax.jit(
        lambda u, v: (u.astype(f64) * v.astype(f64)).sum(axis=(0, 2, 3, 4))
    )

    parts["apply_f32_ms"] = timeit(lambda: apply32(x32), args.reps) * 1e3
    parts["apply_f64_ms"] = timeit(lambda: apply64(x64), args.reps) * 1e3
    parts["vcycle_f32_ms"] = timeit(lambda: vcycle(x32), args.reps) * 1e3
    parts["line_smooth_ms"] = timeit(lambda: line(x32), args.reps) * 1e3
    parts["dot_f64acc_ms"] = timeit(lambda: dot64(x32, x32), args.reps) * 1e3

    # ---- full CG chunk loops, amortized per iteration
    cg32 = st._jit_init(bg, state, jnp.zeros_like(bg))
    jax.block_until_ready(cg32[0])
    k_iters = 30
    chunk32 = lambda: st._jit_chunk(state, cg32, tol=0.0, maxiter=k_iters)  # noqa: E731
    parts["cg32_iter_ms"] = timeit(chunk32, max(3, args.reps // 4)) * 1e3 / k_iters

    cg64 = st._jit_init64(geo64, bg64, state, jnp.zeros_like(bg64), lam64, mu64)
    jax.block_until_ready(cg64[0])
    chunk64 = lambda: st._jit_chunk64(  # noqa: E731
        geo64, state, cg64, lam64, mu64, tol=0.0, maxiter=k_iters
    )
    parts["cg64_iter_ms"] = timeit(chunk64, max(3, args.reps // 4)) * 1e3 / k_iters

    # ---- host judge
    t0 = time.perf_counter()
    r_h, rel = st._host_resid(host_sys, lam64, mu64, np.asarray(cg64[0]))
    jax.block_until_ready(rel)
    parts["host_resid_s"] = time.perf_counter() - t0

    # one dispatch round-trip (tunnel latency floor)
    tiny = jax.jit(lambda x: x + 1.0)
    tiny(jnp.zeros(8)).block_until_ready()
    parts["dispatch_rt_ms"] = timeit(lambda: tiny(jnp.zeros(8)), args.reps) * 1e3

    for k, v in parts.items():
        print(json.dumps({"part": k, "value": round(float(v), 4)}), flush=True)
    est = {
        "est_outer64_iter_ms": round(parts["cg64_iter_ms"], 3),
        "est_f32_iter_ms": round(parts["cg32_iter_ms"], 3),
        "device": str(jax.devices()[0]),
        "batch": batch,
    }
    print(json.dumps({"summary": est}), flush=True)


if __name__ == "__main__":
    main()
