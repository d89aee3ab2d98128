#!/usr/bin/env python
"""Batch geometry generation — parity with reference
scripts/generate_geometry_dataset.py:84-181: seeded uniform sampling in the PRD
ranges (span 1-2 m, chord 0.2-0.5 m, sweep 0-30 deg, t/c 0.05-0.15), sequential
case ids 001..N overriding the hash (:117-124), params.csv + manifest
geometry_index + last_run summary (:139-178).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpufem.pipeline.config import get_paths  # noqa: E402
from tpufem.pipeline.geometry_stage import run_geometry_case  # noqa: E402
from tpufem.pipeline.reports import append_csv, update_manifest  # noqa: E402
from tpufem.pipeline.types import PRD_RANGES, WingParams  # noqa: E402


def sample_params(rng: np.random.Generator) -> WingParams:
    return WingParams(
        span_m=float(rng.uniform(*PRD_RANGES["span_m"])),
        chord_m=float(rng.uniform(*PRD_RANGES["chord_m"])),
        sweep_deg=float(rng.uniform(*PRD_RANGES["sweep_deg"])),
        thickness_ratio=float(rng.uniform(*PRD_RANGES["thickness_ratio"])),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data_root", type=str, default=None)
    ap.add_argument("--sequential_ids", action="store_true", default=True)
    ap.add_argument("--hash_ids", dest="sequential_ids", action="store_false")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--no_glb", action="store_true")
    args = ap.parse_args(argv)

    paths = get_paths(args.data_root).ensure()
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    n_ok = 0
    entries = []
    for i in range(1, args.count + 1):
        params = sample_params(rng)
        case_id = f"{i:03d}" if args.sequential_ids else None
        rep = run_geometry_case(
            params, paths, case_id=case_id, force=args.force, make_glb=not args.no_glb
        )
        n_ok += rep.status == "success"
        print(f"[{i}/{args.count}] {rep.case_id} {rep.status}"
              + (f" ({rep.failure_reason})" if rep.failure_reason else ""))
        row = {"case_id": rep.case_id, **params.as_dict(), "status": rep.status}
        append_csv(paths.data / "params.csv", row)
        entries.append(row)

    update_manifest(
        paths.manifest,
        "geometry_last_run",
        {
            "count": args.count,
            "success": n_ok,
            "seed": args.seed,
            "elapsed_s": time.time() - t0,
        },
    )
    from tpufem.pipeline.reports import append_manifest_index

    append_manifest_index(paths.manifest, "geometry_index", entries)
    print(f"done: {n_ok}/{args.count} success in {time.time()-t0:.1f}s")
    return 0 if n_ok == args.count else 1


if __name__ == "__main__":
    raise SystemExit(main())
