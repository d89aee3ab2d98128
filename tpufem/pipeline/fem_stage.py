"""FEM stage driver — parity with reference fem.py:427-762 (`run_fem_case`).

Artifacts in data/raw/fem/{case_id}/:
  surface_results.npz  — node_id/pos/normal/stress_vm/disp/loss_mask
                         (schema parity with fem.py:642-650)
  wing_result.glb      — viridis-colored stress GLB
  wing_result_arrows.glb — result + sampled pressure arrows
  fem_report.json      — StepReport with solver info + all/masked percentile
                         stress stats (fem.py:695-751)

The solve itself is tpufem.fem.driver.solve_wing_case (JAX PCG on device)
instead of the ccx subprocess + FRD parse.
"""

from __future__ import annotations

import json

import numpy as np

from tpufem.fem import WingSolveConfig, solve_wing_case
from tpufem.fem.driver import surface_results
from tpufem.fem.material import Material
from tpufem.pipeline.config import Paths
from tpufem.pipeline.mesh_stage import load_mesh_npz
from tpufem.pipeline.reports import timed, write_report
from tpufem.utils.profiling import StageTimer, solver_stats
from tpufem.pipeline.types import StepReport, WingParams
from tpufem.sets import BoundarySets
from tpufem.viz.arrows import make_pressure_arrows
from tpufem.viz.glb import GLBMesh
from tpufem.viz.results import surface_results_to_glb, surface_results_to_glb_with_extras


def _stats(values: np.ndarray) -> dict:
    """min/max/mean/std/p50/p95/p99 block (reference fem.py:724-743)."""
    if len(values) == 0:
        return {k: 0.0 for k in ("min", "max", "mean", "std", "p50", "p95", "p99")}
    return {
        "min": float(values.min()),
        "max": float(values.max()),
        "mean": float(values.mean()),
        "std": float(values.std()),
        "p50": float(np.percentile(values, 50)),
        "p95": float(np.percentile(values, 95)),
        "p99": float(np.percentile(values, 99)),
    }


_STENCIL_ENGINES: dict = {}


def _stencil_resolution(paths: Paths, case_id: str):
    """WingMeshResolution recorded by the mesh stage, if the stencil MG
    engine supports it (a real coarsening hierarchy with a small dense
    coarsest); None otherwise."""
    from tpufem.fem.stencil_mg import hierarchy_resolutions
    from tpufem.mesher import WingMeshResolution, wing_topology

    rep_path = paths.mesh_case(case_id) / "mesh_report.json"
    try:
        rep = json.loads(rep_path.read_text())
        res = WingMeshResolution(*rep["extra"]["resolution"])
    except (OSError, KeyError, TypeError, ValueError):
        return None
    try:
        levels = hierarchy_resolutions(res)
    except ValueError:
        return None
    if len(levels) < 2 or wing_topology(levels[-1]).num_nodes > 2000:
        return None  # dense coarsest would be the whole system
    return res


def solve_structured_stencil(
    params: WingParams, res, config: WingSolveConfig
) -> "FemSolution":
    """Single-case solve through the stencil-grid MG engine (B=1).

    The production engine for structured wing meshes: grid-layout MG-PCG
    with f64-outer CG, converging in ~100-350 iterations where the gather
    two-level driver needs thousands (the reference-replacing solve,
    fem.py:524-533, at bench speed for the E2E path too).
    """
    import jax

    if not jax.config.jax_enable_x64:
        # the f64-outer CG and its true-residual convergence bar need x64
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tpufem.fem.driver import FemSolution
    from tpufem.fem.stencil_mg import WingStencilT

    key = res.key
    engine = _STENCIL_ENGINES.get(key)
    if engine is None:
        engine = WingStencilT(res, dtype=jnp.float32)
        _STENCIL_ENGINES[key] = engine
    p4 = np.array(
        [[params.span_m, params.chord_m, params.sweep_deg, params.thickness_ratio]],
        dtype=np.float64,  # exact params: solve() derives its f64 system from these
    )
    out = engine.solve(
        p4,
        pressure=config.pressure,
        material=config.material,
        tol=config.tol,
        maxiter=config.maxiter,
        outer_f64=True,
        chunk_iters=config.chunk_iters or 250,
    )
    return FemSolution(
        u=np.asarray(out.u)[:, :, 0],
        stress6=np.asarray(out.stress6)[:, :, 0],
        vm=np.asarray(out.vm)[:, 0],
        iters=int(out.iters),
        rel_residual=float(np.asarray(out.rel_residual)[0]),
        converged=bool(np.asarray(out.converged)[0]),
    )


def write_case_artifacts(
    case_dir,
    case_id: str,
    surf: dict,
    faces_global: np.ndarray,
    upper_faces_global: np.ndarray,
    nodes: np.ndarray,
    make_glb: bool = True,
) -> dict:
    """Write the full per-case FEM artifact set and return the report blocks.

    The ONE writer both the sequential and the batched production paths call,
    so every case dir carries the reference's artifact contract
    (fem.py:642-693: surface_results.npz + wing_result.glb + arrows GLB) and
    the same stats schema (fem.py:695-751) regardless of which engine solved
    it.
    """
    npz_path = case_dir / "surface_results.npz"
    glb_path = case_dir / "wing_result.glb"
    arrows_path = case_dir / "wing_result_arrows.glb"
    np.savez_compressed(npz_path, **surf)
    extra: dict = {}
    if make_glb:
        vmin, vmax = surface_results_to_glb(glb_path, surf, faces_global)
        av, af = make_pressure_arrows(nodes, upper_faces_global, case_id)
        arrow_colors = np.tile(np.array([0.9, 0.45, 0.1, 1.0]), (len(av), 1))
        surface_results_to_glb_with_extras(
            arrows_path,
            surf,
            faces_global,
            [GLBMesh(av, af, arrow_colors, name="pressure_arrows")],
            vmin=vmin,
            vmax=vmax,
        )
        extra["color_range"] = [vmin, vmax]
    masked = surf["stress_vm"][surf["loss_mask"]]
    extra["stress_stats"] = {
        "all_nodes": _stats(surf["stress_vm"]),
        "masked_nodes": _stats(masked),
    }
    extra["disp_stats"] = {
        "max_abs_mm": float(np.abs(surf["disp"]).max() * 1e3),
        "mean_z_mm": float(surf["disp"][:, 2].mean() * 1e3),
    }
    return extra


def run_fem_case(
    params: WingParams,
    case_id: str,
    paths: Paths,
    pressure: float = 5e3,
    material: Material = Material(),
    solve_config: WingSolveConfig | None = None,
    force: bool = False,
    make_glb: bool = True,
) -> StepReport:
    mesh_dir = paths.mesh_case(case_id)
    case_dir = paths.fem_case(case_id)
    case_dir.mkdir(parents=True, exist_ok=True)
    npz_path = case_dir / "surface_results.npz"
    glb_path = case_dir / "wing_result.glb"
    arrows_path = case_dir / "wing_result_arrows.glb"
    extra: dict = {"pressure_pa": pressure, "E": material.E, "nu": material.nu}

    with timed() as t:
        try:
            if npz_path.exists() and not force:
                extra["cache_hit"] = True
                status, reason = "success", None
            else:
                mesh = load_mesh_npz(mesh_dir / "mesh.npz")
                sets_data = json.loads((mesh_dir / "boundary_sets.json").read_text())
                bs = BoundarySets(
                    nroot_nodes=np.asarray(sets_data["nroot_nodes"], dtype=np.int32),
                    surf_all_faces=np.asarray(sets_data["surf_all_faces"], dtype=np.int32),
                    surf_upper_faces=np.asarray(sets_data["surf_upper_faces"], dtype=np.int32),
                    nz_min_used=sets_data["nz_min_used"],
                    upper_area_ratio=sets_data["upper_area_ratio"],
                )
                if len(bs.nroot_nodes) == 0 or len(bs.surf_upper_faces) == 0:
                    raise ValueError("empty NROOT or SURF_UPPER set")

                cfg = solve_config or WingSolveConfig(pressure=pressure, material=material)
                # Solver recovery ladder (tpufem-native version of the spec'd
                # retry policy, docs/spec.md:240-250 — which the reference
                # never implemented): on PCG non-convergence or nan/inf,
                # retry with mixed-precision refinement, then full f64.
                import dataclasses

                import jax.numpy as jnp

                timer = StageTimer()
                ladder = []
                # primary: the stencil-grid MG engine (B=1) for structured
                # wing meshes — the production solve path (~10x fewer
                # iterations than the gather two-level driver)
                stencil_res = (
                    _stencil_resolution(paths, case_id)
                    if cfg.engine in ("auto", "stencil")
                    else None
                )
                if stencil_res is not None:
                    from tpufem.mesher import wing_topology

                    if wing_topology(stencil_res).num_nodes != mesh.num_nodes:
                        stencil_res = None  # user mesh under a stale report
                if stencil_res is not None:
                    ladder.append(
                        ("stencil", cfg,
                         lambda c, r=stencil_res: solve_structured_stencil(params, r, c))
                    )
                ladder.append(("primary", cfg, lambda c: solve_wing_case(mesh, bs, c)))
                if cfg.dtype != jnp.float64:
                    ladder.append(
                        ("refined",
                         dataclasses.replace(cfg, refine_steps=max(cfg.refine_steps, 2)),
                         lambda c: solve_wing_case(mesh, bs, c))
                    )
                    ladder.append(
                        ("float64",
                         dataclasses.replace(cfg, dtype=jnp.float64, refine_steps=0),
                         lambda c: solve_wing_case(mesh, bs, c))
                    )
                attempts = []
                sol = None
                for name, c, solve_fn in ladder:
                    with timer.span(f"solve_{name}"):
                        sol = solve_fn(c)
                    ok = (
                        bool(np.isfinite(sol.u).all())
                        and bool(np.isfinite(sol.vm).all())
                        and sol.converged
                    )
                    attempts.append(
                        {"attempt": name, "dtype": np.dtype(c.dtype).name, "ok": ok,
                         **solver_stats(sol.iters, sol.rel_residual, sol.converged)}
                    )
                    if ok:
                        break
                if len(attempts) > 1:
                    extra["solve_ladder"] = attempts
                if not np.isfinite(sol.u).all() or not np.isfinite(sol.vm).all():
                    raise ValueError("nan/inf in solution")  # fem.py:620-631 parity
                if not sol.converged:
                    raise ValueError(
                        f"PCG not converged: rel_res {sol.rel_residual:.2e} after {sol.iters} iters "
                        f"(after {len(attempts)} ladder attempts)"
                    )

                surf = surface_results(mesh, bs, sol, span_m=params.span_m)
                extra.update(
                    write_case_artifacts(
                        case_dir,
                        case_id,
                        surf,
                        mesh.surf_faces[bs.surf_all_faces],
                        mesh.surf_faces[bs.surf_upper_faces],
                        mesh.nodes,
                        make_glb=make_glb,
                    )
                )
                extra["solver"] = solver_stats(sol.iters, sol.rel_residual, sol.converged)
                extra["spans"] = timer.report()
                status, reason = "success", None
        except Exception as e:  # noqa: BLE001
            status, reason = "failed", f"{type(e).__name__}: {e}"

    artifacts = {
        k: str(p)
        for k, p in {
            "surface_results": npz_path,
            "wing_result_glb": glb_path,
            "wing_result_arrows_glb": arrows_path,
        }.items()
        if p.exists()
    }
    report = StepReport(
        case_id=case_id,
        step="fem",
        status=status,
        failure_reason=reason,
        elapsed_ms=t["elapsed_ms"],
        artifacts=artifacts,
        extra=extra,
    )
    write_report(case_dir, report)
    return report
