#!/usr/bin/env python
"""Headline benchmark: per-wing assembly+PCG wall-clock at ~100k DOF (tet4).

BASELINE.json metric: "per-wing assembly+PCG wall-clock (100k-DOF tet4)".
Reference baseline: CalculiX takes "minutes" per case on local CPU
(README.md:34, docs/prd.md:169-172); we take 60 s/case as the conservative
baseline, so vs_baseline = 60 / per_case_seconds (speedup, higher is better).

Measures the BATCHED path (BASELINE config 4): B wing cases solved in one
vmapped jit call on the real chip, amortized per case. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SECONDS_PER_CASE = 60.0


def main() -> None:
    from tpufem.fem.batched_t import WingBatchT
    from tpufem.mesher import DOF100K
    from tpufem.pipeline.types import PRD_RANGES

    batch = 8
    tol = 1e-5
    maxiter = 12000
    chunk = 500

    bt = WingBatchT(DOF100K, dtype=jnp.float32)
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

    # warmup/compile (few iterations)
    out = bt.solve(p4, pressure=5e3, tol=tol, maxiter=200, chunk_iters=200)
    out.u.block_until_ready()

    t0 = time.perf_counter()
    out = bt.solve(p4, pressure=5e3, tol=tol, maxiter=maxiter, chunk_iters=chunk)
    out.u.block_until_ready()
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
                    "dof": int(bt.num_nodes * 3),
                    "num_tets": int(bt.tets.shape[0]),
                    "iters": int(out.iters),
                    "max_rel_residual": float(np.max(np.asarray(out.rel_residual))),
                    "all_converged": bool(np.all(np.asarray(out.converged))),
                    "total_s": round(elapsed, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
