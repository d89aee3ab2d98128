#!/usr/bin/env python
"""Batch FEM solves — parity with reference scripts/generate_fem_dataset.py:40-143
(reads success rows from mesh.csv, flags --E 69e9 --nu 0.33 --pressure 5e3,
appends fem.csv + manifest fem_index) PLUS the TPU-native `--batched` mode:
all cases solved in ONE vmapped jit call via the shared structured topology
(BASELINE.json config 4), then artifacts written per case on the host.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpufem.fem import WingSolveConfig  # noqa: E402
from tpufem.fem.driver import FemSolution, surface_results  # noqa: E402
from tpufem.fem.material import Material  # noqa: E402
from tpufem.pipeline.config import get_paths  # noqa: E402
from tpufem.pipeline.fem_stage import (  # noqa: E402
    run_fem_case,
    write_case_artifacts,
)
from tpufem.pipeline.mesh_stage import load_mesh_npz  # noqa: E402
from tpufem.pipeline.reports import (  # noqa: E402
    append_csv,
    append_manifest_index,
    read_csv_rows,
    update_manifest,
    write_report,
)
from tpufem.pipeline.types import StepReport, WingParams  # noqa: E402


def _load_params(paths, case_id: str) -> WingParams:
    pf = json.loads((paths.geometry_case(case_id) / "params.json").read_text())
    return WingParams(**pf["params"])


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", type=str, default=None)
    ap.add_argument("--E", type=float, default=69e9)
    ap.add_argument("--nu", type=float, default=0.33)
    ap.add_argument("--pressure", type=float, default=5e3)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=20000)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--batched", action="store_true",
                    help="solve all cases in one vmapped jit call (needs shared "
                         "structured topology, i.e. all meshes at one resolution)")
    ap.add_argument("--batch_size", type=int, default=0,
                    help="chunk batched solve (0 = all at once)")
    ap.add_argument("--engine", choices=("twolevel", "stencil"), default="stencil",
                    help="batched solver engine: 'stencil' (default) = grid-layout "
                         "MG-PCG with f64 outer CG (the production/bench path, "
                         "true-f64 residuals); 'twolevel' = vmapped gather-path "
                         "line+RBM PCG (slow cross-check only)")
    ap.add_argument("--no_glb", action="store_true",
                    help="skip wing_result/arrow GLB emission (npz + report only)")
    ap.add_argument("--chunk_iters", type=int, default=200,
                    help="CG iterations per device dispatch (axon worker kills "
                         "dispatches over ~1 min wall-clock)")
    args = ap.parse_args(argv)

    if args.engine == "stencil":
        import jax

        jax.config.update("jax_enable_x64", True)  # f64-outer CG

    paths = get_paths(args.data_root).ensure()
    material = Material(E=args.E, nu=args.nu)
    rows = [r for r in read_csv_rows(paths.data / "mesh.csv") if r["status"] == "success"]
    seen = set()
    rows = [r for r in rows if not (r["case_id"] in seen or seen.add(r["case_id"]))]
    if args.limit:
        rows = rows[: args.limit]
    case_ids = [r["case_id"] for r in rows]

    t0 = time.time()
    if args.batched:
        reports = run_batched(paths, case_ids, args, material)
    else:
        reports = []
        for i, cid in enumerate(case_ids, 1):
            params = _load_params(paths, cid)
            rep = run_fem_case(
                params, cid, paths,
                pressure=args.pressure, material=material,
                solve_config=WingSolveConfig(
                    pressure=args.pressure, material=material,
                    tol=args.tol, maxiter=args.maxiter,
                ),
                force=args.force,
            )
            print(f"[{i}/{len(case_ids)}] {cid} {rep.status}"
                  + (f" ({rep.failure_reason})" if rep.failure_reason else ""))
            reports.append(rep)

    n_ok = 0
    entries = []
    for rep in reports:
        n_ok += rep.status == "success"
        row = {
            "case_id": rep.case_id,
            "status": rep.status,
            "pressure_pa": args.pressure,
            "max_vm_mpa": rep.extra.get("stress_stats", {})
            .get("masked_nodes", {})
            .get("max", 0.0)
            / 1e6,
        }
        append_csv(paths.data / "fem.csv", row)
        entries.append(row)

    update_manifest(
        paths.manifest,
        "fem_last_run",
        {
            "count": len(case_ids),
            "success": n_ok,
            "pressure_pa": args.pressure,
            "batched": args.batched,
            "elapsed_s": time.time() - t0,
        },
    )
    append_manifest_index(paths.manifest, "fem_index", entries)
    print(f"done: {n_ok}/{len(case_ids)} success in {time.time()-t0:.1f}s"
          + (" (batched)" if args.batched else ""))
    return 0 if n_ok == len(case_ids) else 1


def run_batched(paths, case_ids, args, material) -> list[StepReport]:
    """One (or a few chunked) vmapped jit calls for the whole dataset."""
    from tpufem.fem.batched import solve_wing_batch
    from tpufem.mesher import WingMeshResolution

    if not case_ids:
        return []
    # all meshes must share one structured resolution
    res_keys = set()
    params_list = []
    for cid in case_ids:
        rep = json.loads((paths.mesh_case(cid) / "mesh_report.json").read_text())
        res_keys.add(tuple(rep["extra"]["resolution"]))
        params_list.append(_load_params(paths, cid))
    if len(res_keys) != 1:
        raise SystemExit(f"--batched needs a single shared resolution, got {res_keys}")
    res = WingMeshResolution(*res_keys.pop())

    # crash resume: a long batched run that loses the TPU worker mid-flight
    # (it happens — the axon worker can die under sustained load) must not
    # redo finished solves; skip cases whose report already says success
    done_reports = []
    if not args.force:
        pend_ids, pend_params = [], []
        for cid, p in zip(case_ids, params_list):
            rp = paths.fem_case(cid) / "fem_report.json"
            rep = None
            if rp.exists():
                try:
                    rep = StepReport(**json.loads(rp.read_text()))
                except Exception:  # noqa: BLE001
                    rep = None
            if rep is not None and rep.status == "success":
                done_reports.append(rep)
            else:
                pend_ids.append(cid)
                pend_params.append(p)
        if done_reports:
            print(f"[batched] resume: {len(done_reports)} cases already solved, "
                  f"{len(pend_ids)} remaining")
        case_ids, params_list = pend_ids, pend_params
    if not case_ids:
        return done_reports

    ctx = None
    stencil = None
    reports = []
    retry_queue = []  # (cid, params, reason): failed lanes, retried at the END
    chunk = args.batch_size or len(case_ids)
    for lo in range(0, len(case_ids), chunk):
        ids = case_ids[lo : lo + chunk]
        plist = params_list[lo : lo + chunk]
        if args.engine == "stencil":
            from tpufem.fem.stencil_mg import WingStencilT

            if stencil is None:
                stencil = WingStencilT(res)
            p4 = np.array(
                [[p.span_m, p.chord_m, p.sweep_deg, p.thickness_ratio] for p in plist],
                dtype=np.float32,
            )
            out = stencil.solve(
                p4, pressure=args.pressure, material=material,
                tol=args.tol, maxiter=args.maxiter, outer_f64=True,
                chunk_iters=args.chunk_iters,
            )

            class _Ctx:  # same fields run_batched's writer consumes
                tets = stencil.bt.tets
                surf_faces = stencil.bt.surf_faces
                sets = stencil.bt.sets

            ctx = _Ctx()
            # trailing-batch (N,·,B) -> batch-first (B,N,·)
            nodes = np.moveaxis(np.asarray(out.nodes), -1, 0)
            u = np.moveaxis(np.asarray(out.u), -1, 0)
            s6 = np.moveaxis(np.asarray(out.stress6), -1, 0)
            vm = np.moveaxis(np.asarray(out.vm), -1, 0)
        else:
            out, ctx = solve_wing_batch(
                [p.as_dict() for p in plist], res,
                pressure=args.pressure, material=material,
                tol=args.tol, maxiter=args.maxiter, ctx=ctx,
            )
            nodes = np.asarray(out.nodes)
            u = np.asarray(out.u)
            s6 = np.asarray(out.stress6)
            vm = np.asarray(out.vm)
        rel = np.asarray(out.rel_residual)
        conv = np.asarray(out.converged)
        iters = np.asarray(out.iters)

        for k, cid in enumerate(ids):
            t_case = time.perf_counter()
            case_dir = paths.fem_case(cid)
            case_dir.mkdir(parents=True, exist_ok=True)
            from tpufem.mesh_types import Mesh

            mesh = Mesh(
                nodes=nodes[k].astype(np.float64),
                tets=np.asarray(ctx.tets),
                surf_faces=ctx.surf_faces,
            )
            sol = FemSolution(
                u=u[k], stress6=s6[k], vm=vm[k],
                iters=int(iters[k]) if iters.ndim else int(iters),
                rel_residual=float(rel[k]), converged=bool(conv[k]),
            )
            status, reason = "success", None
            try:
                if not sol.converged:
                    raise ValueError(f"PCG not converged: rel_res {sol.rel_residual:.2e}")
                if not np.isfinite(sol.u).all() or not np.isfinite(sol.vm).all():
                    raise ValueError("nan/inf in solution")
                surf = surface_results(mesh, ctx.sets, sol, span_m=plist[k].span_m)
                # full artifact parity with the sequential path: npz + result
                # GLB + arrow GLB + disp/color blocks via the SAME writer
                # (reference fem.py:642-693, 695-751)
                extra = {
                    "pressure_pa": args.pressure,
                    "batched": True,
                    "engine": args.engine,
                    "solver": {
                        "iters": sol.iters,
                        "rel_residual": sol.rel_residual,
                        "converged": sol.converged,
                    },
                }
                extra.update(
                    write_case_artifacts(
                        case_dir, cid, surf,
                        mesh.surf_faces[ctx.sets.surf_all_faces],
                        mesh.surf_faces[ctx.sets.surf_upper_faces],
                        mesh.nodes,
                        make_glb=not args.no_glb,
                    )
                )
            except Exception as e:  # noqa: BLE001
                status, reason = "failed", f"{type(e).__name__}: {e}"
                extra = {"pressure_pa": args.pressure, "batched": True,
                         "engine": args.engine}
            if status == "failed":
                # per-lane recovery: queue for the sequential driver's ladder
                # (refined -> f64). Deferred to AFTER all batches so a slow
                # retry (B=1 compiles take minutes over the tunnel) never
                # blocks the healthy lanes' reports — the crash-resume
                # watchdog reads report progress
                print(f"[batched] {cid} failed ({reason}); queued for "
                      "sequential retry")
                retry_queue.append((cid, plist[k], reason))
                continue
            else:
                rep = StepReport(
                    case_id=cid, step="fem", status=status, failure_reason=reason,
                    elapsed_ms=(time.perf_counter() - t_case) * 1e3,
                    artifacts={
                        key: str(p)
                        for key, p in {
                            "surface_results": case_dir / "surface_results.npz",
                            "wing_result_glb": case_dir / "wing_result.glb",
                            "wing_result_arrows_glb": case_dir / "wing_result_arrows.glb",
                        }.items()
                        if p.exists()
                    },
                    extra=extra,
                )
                write_report(case_dir, rep)
            reports.append(rep)
            print(f"[batched] {cid} {rep.status}"
                  + (f" ({rep.failure_reason})" if rep.failure_reason else ""))
    for cid, params, reason in retry_queue:
        print(f"[batched] retrying {cid} sequentially ({reason})")
        rep = run_fem_case(
            params, cid, paths,
            pressure=args.pressure, material=material,
            solve_config=WingSolveConfig(
                pressure=args.pressure, material=material,
                tol=args.tol, maxiter=args.maxiter,
            ),
            force=True, make_glb=not args.no_glb,
        )
        rep.extra["batched_lane_failure"] = reason
        write_report(paths.fem_case(cid), rep)
        reports.append(rep)
        print(f"[batched] {cid} {rep.status}"
              + (f" ({rep.failure_reason})" if rep.failure_reason else ""))
    return done_reports + reports


if __name__ == "__main__":
    raise SystemExit(main())
