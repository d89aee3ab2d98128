"""Pipeline tests: case identity, reports/CSV/manifest, stage drivers E2E,
dataset discovery/splits, validation checklist, app core."""

import json

import numpy as np
import pytest

from tpufem.mesher import COARSE
from tpufem.pipeline.case_id import compute_case_id, normalize_params
from tpufem.pipeline.config import get_paths
from tpufem.pipeline.fem_stage import run_fem_case
from tpufem.pipeline.geometry_stage import run_geometry_case
from tpufem.pipeline.mesh_stage import load_mesh_npz, run_mesh_case
from tpufem.pipeline.reports import (
    append_csv,
    read_csv_rows,
    success_case_ids,
    update_manifest,
)
from tpufem.pipeline.types import WingParams
from tpufem.pipeline.validate import ValidationThresholds, run_validation

PARAMS = WingParams(span_m=1.2, chord_m=0.35, sweep_deg=0.0, thickness_ratio=0.10)


# ------------------------------------------------------------------- identity


def test_case_id_quantization():
    a = compute_case_id({"span_m": 1.2001, "chord_m": 0.35, "sweep_deg": 0.04, "thickness_ratio": 0.1})
    b = compute_case_id({"span_m": 1.2004, "chord_m": 0.35, "sweep_deg": 0.0, "thickness_ratio": 0.1})
    assert a == b  # below quantization steps
    c = compute_case_id({"span_m": 1.21, "chord_m": 0.35, "sweep_deg": 0.0, "thickness_ratio": 0.1})
    assert a != c
    assert len(a) == 16


def test_case_id_version_dependence():
    p = PARAMS.as_dict()
    assert compute_case_id(p, version="a") != compute_case_id(p, version="b")


def test_normalize_params_precision():
    n = normalize_params({"span_m": 1.23456, "chord_m": 0.3, "sweep_deg": 12.34, "thickness_ratio": 0.12346})
    assert n["span_m"] == 1.235
    assert n["sweep_deg"] == 12.3
    assert n["thickness_ratio"] == 0.1235  # quantized to 1e-4 step


# --------------------------------------------------------------- reports/CSVs


def test_csv_append_and_gate(tmp_path):
    p = tmp_path / "params.csv"
    append_csv(p, {"case_id": "a", "status": "success"})
    append_csv(p, {"case_id": "b", "status": "failed"})
    append_csv(p, {"case_id": "c", "status": "success"})
    assert len(read_csv_rows(p)) == 3
    assert success_case_ids(p) == ["a", "c"]


def test_manifest_merge(tmp_path):
    mp = tmp_path / "manifest.json"
    update_manifest(mp, "geometry_last_run", {"count": 3})
    m = update_manifest(mp, "validation", {"ok": True})
    assert m["geometry_last_run"]["count"] == 3
    assert m["validation"]["ok"]
    assert "updated_at" in m


# ------------------------------------------------------------- stage pipeline


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_root")
    paths = get_paths(root).ensure()
    g = run_geometry_case(PARAMS, paths, case_id="001")
    m = run_mesh_case(PARAMS, "001", paths, resolution=COARSE)
    f = run_fem_case(PARAMS, "001", paths, pressure=100.0)
    return paths, g, m, f


def test_geometry_stage(pipeline_run):
    paths, g, _, _ = pipeline_run
    assert g.status == "success"
    assert (paths.geometry_case("001") / "wing.stl").exists()
    assert (paths.geometry_case("001") / "wing_viz.glb").exists()
    pf = json.loads((paths.geometry_case("001") / "params.json").read_text())
    assert pf["case_id"] == "001"
    # cache hit on rerun
    g2 = run_geometry_case(PARAMS, paths, case_id="001")
    assert g2.status == "success" and g2.extra["cache_hit"]


def test_mesh_stage(pipeline_run):
    paths, _, m, _ = pipeline_run
    assert m.status == "success", m.failure_reason
    mesh = load_mesh_npz(paths.mesh_case("001") / "mesh.npz")
    assert mesh.num_nodes == m.extra["num_nodes"]
    sets = json.loads((paths.mesh_case("001") / "boundary_sets.json").read_text())
    assert len(sets["nroot_nodes"]) >= 10
    assert (paths.mesh_case("001") / "surf_sets.glb").exists()


def test_fem_stage(pipeline_run):
    paths, _, _, f = pipeline_run
    assert f.status == "success", f.failure_reason
    z = np.load(paths.fem_case("001") / "surface_results.npz")
    assert set(z.files) == {"node_id", "pos", "normal", "stress_vm", "disp", "loss_mask"}
    assert np.isfinite(z["stress_vm"]).all()
    assert (paths.fem_case("001") / "wing_result.glb").exists()
    assert (paths.fem_case("001") / "wing_result_arrows.glb").exists()
    assert f.extra["solver"]["converged"]
    # physics: downward deflection
    assert z["disp"][:, 2].mean() < 0


def test_validation_checklist(pipeline_run):
    paths, _, _, _ = pipeline_run
    append_csv(paths.data / "fem.csv", {"case_id": "001", "status": "success"})
    report = run_validation(paths, ValidationThresholds(min_solved_cases=1))
    assert report["num_cases"] == 1
    assert report["checklist"]["no_nan_inf"]
    assert report["checklist"]["enough_solved_cases"]
    assert (paths.data / "validation_report.json").exists()


def test_dataset_discovery_and_split(pipeline_run):
    paths, _, _, _ = pipeline_run
    from tpufem.models.dataset import discover_cases, load_case_graph, split_cases

    cases = discover_cases(paths)
    assert "001" in cases
    g = load_case_graph("001", paths)
    assert g.x.shape[1] == 10
    assert g.num_edges > 0
    ids = [f"{i:03d}" for i in range(20)]
    s = split_cases(ids, seed=42)
    assert len(s["train"]) == 14 and len(s["val"]) == 3 and len(s["test"]) == 3
    assert set(s["train"]) | set(s["val"]) | set(s["test"]) == set(ids)
    s2 = split_cases(ids, seed=42)
    assert s == s2  # reproducible


def test_app_core(pipeline_run):
    paths, _, _, _ = pipeline_run
    from tpufem.app_core import (
        case_glbs,
        engineering_report,
        list_cases,
        safety_factor_band,
    )

    append_csv(paths.data / "params.csv", {"case_id": "001", "status": "success"})
    assert "001" in list_cases(paths)
    rep = engineering_report(paths, "001")
    assert "Safety factor" in rep and "AL6061" in rep
    glbs = case_glbs(paths, "001", "FEM Only")
    assert glbs["left"] is not None and glbs["left"].exists()
    sf, band = safety_factor_band(100.0)
    assert band == "SAFE" and sf == pytest.approx(2.76)
    assert safety_factor_band(200.0)[1] == "MARGINAL"
    assert safety_factor_band(300.0)[1] == "YIELD EXCEEDED"


def test_histogram_overlays_cached_predictions(pipeline_run, tmp_path):
    """FEM-vs-AI comparison histogram (reference app.py:306-391): with a
    cached pred_results.npz the PNG must include the AI distribution, and the
    AI status line must report the inference metrics."""
    paths, _, _, _ = pipeline_run
    from tpufem.app_core import ai_status, stress_histogram_png

    fem_dir = paths.fem_case("001")
    z = np.load(fem_dir / "surface_results.npz")
    assert "run scripts/inference_gnn.py" in ai_status(paths, "001")
    png_fem_only = stress_histogram_png(paths, "001", tmp_path / "fem_only.png")
    assert png_fem_only is not None and png_fem_only.exists()

    # fake cached predictions + inference report (as the inference CLI writes)
    np.savez_compressed(
        fem_dir / "pred_results.npz",
        node_id=z["node_id"],
        pred_pa=(z["stress_vm"] * 1.05).astype(np.float32),
        loss_mask=z["loss_mask"],
    )
    (fem_dir / "inference_report.json").write_text(json.dumps({
        "case_id": "001",
        "metrics": {"masked_nodes": {"mae_pa": 2.0e5, "rmse_pa": 3.0e5,
                                     "max_err_pa": 1.0e6, "rel_mae": 0.02}},
        "inference_time_ms": 12.0,
    }))
    png = stress_histogram_png(paths, "001", tmp_path / "overlay.png")
    assert png is not None and png.exists()
    assert png.stat().st_size != png_fem_only.stat().st_size  # AI series drawn
    assert "MAE 0.200 MPa" in ai_status(paths, "001")


def test_static_dashboard(pipeline_run, tmp_path):
    paths, _, _, _ = pipeline_run
    import app as app_mod

    idx = app_mod.build_static_site(paths, tmp_path / "site")
    assert idx.exists()
    assert (tmp_path / "site" / "001.html").exists()
    assert (tmp_path / "site" / "001" / "fem.glb").exists()


def test_verify_easy_case(tmp_path):
    from tpufem.pipeline.verify import SPEC_CASES, verify_pipeline

    results = verify_pipeline(tmp_path, pressure=100.0, resolution=COARSE,
                              cases=SPEC_CASES[:1])
    assert results[0].passed, results[0].details


def _write_msh2(path, mesh):
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(mesh.num_nodes)]
    for i, p in enumerate(mesh.nodes, 1):
        lines.append(f"{i} {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}")
    lines += ["$EndNodes", "$Elements", str(mesh.num_tets)]
    for i, t in enumerate(mesh.tets + 1, 1):
        lines.append(f"{i} 4 2 0 1 {t[0]} {t[1]} {t[2]} {t[3]}")
    lines += ["$EndElements", ""]
    path.write_text("\n".join(lines))


def test_external_msh_ingestion_end_to_end(tmp_path):
    """User-supplied .msh -> mesh.npz + boundary sets -> FEM solve -> artifacts
    (the reference's external-mesh path, meshing.py:602-753 / fem.py:468)."""
    import jax.numpy as jnp

    from tpufem.fem.driver import WingSolveConfig
    from tpufem.mesher import COARSE, structured_wing_mesh
    from tpufem.pipeline.config import get_paths
    from tpufem.pipeline.fem_stage import run_fem_case
    from tpufem.pipeline.mesh_stage import run_mesh_case
    from tpufem.pipeline.types import WingParams

    params = WingParams(span_m=1.2, chord_m=0.35, sweep_deg=10.0, thickness_ratio=0.10)
    src = structured_wing_mesh(1.2, 0.35, 10.0, 0.10, COARSE)
    msh = tmp_path / "user_wing.msh"
    _write_msh2(msh, src)

    paths = get_paths(tmp_path / "data")
    m = run_mesh_case(params, "ext1", paths, user_msh=msh)
    assert m.status == "success", m.failure_reason
    assert m.extra["mesh_source"].startswith("user_msh:")
    assert m.extra["num_nodes"] == src.num_nodes

    # external meshes have no thickness-line structure -> structure-free path
    # (Jacobi PCG; f64 for reliable convergence without the line blocks)
    cfg = WingSolveConfig(pressure=100.0, tol=1e-8, dtype=jnp.float64, two_level=False)
    f = run_fem_case(params, "ext1", paths, pressure=100.0, solve_config=cfg)
    assert f.status == "success", f.failure_reason
    z = np.load(paths.fem_case("ext1") / "surface_results.npz")
    assert np.isfinite(z["stress_vm"]).all()
    assert z["disp"][:, 2].mean() < 0  # downward under upper pressure


def test_fem_retry_ladder_rescues_f32_divergence(tmp_path):
    """The hard spec case (span 2.0, chord 0.2, sweep 30, t/c 0.05) on a
    sharp-TE mesh makes f32 PCG blow up (nan after 1 iter — the known failure
    mode of the PRD corner); the recovery ladder must rescue it with the f64
    attempt and record every attempt (spec.md:240-250's retry policy, tpufem-
    native)."""
    import jax.numpy as jnp

    from tpufem.fem.driver import WingSolveConfig
    from tpufem.mesher import WingMeshResolution
    from tpufem.pipeline.geometry_stage import run_geometry_case

    hard = WingParams(span_m=2.0, chord_m=0.2, sweep_deg=30.0, thickness_ratio=0.05)
    paths = get_paths(tmp_path / "data").ensure()
    run_geometry_case(hard, paths, case_id="hard")
    m = run_mesh_case(hard, "hard", paths, resolution=WingMeshResolution(32, 16, 3))
    assert m.status == "success", m.failure_reason
    # engine="gather" pins the gather-path driver so the f32 failure -> f64
    # rescue is actually exercised (the default "auto" routes structured
    # meshes through the stencil MG engine, which handles this case outright)
    cfg = WingSolveConfig(pressure=5e3, tol=1e-6, dtype=jnp.float32,
                          maxiter=3000, refine_steps=0, engine="gather")
    f = run_fem_case(hard, "hard", paths, pressure=5e3, solve_config=cfg)
    assert f.status == "success", f.failure_reason
    ladder = f.extra["solve_ladder"]
    assert ladder[0]["attempt"] == "primary" and not ladder[0]["ok"]
    assert ladder[-1]["ok"] and ladder[-1]["dtype"] == "float64"
    assert "spans" in f.extra and any(k.startswith("solve_") for k in f.extra["spans"])


@pytest.mark.slow
def test_fem_auto_routes_structured_mesh_through_stencil_engine(tmp_path):
    """The default engine="auto" must solve a structured-resolution case via
    the stencil MG engine (the production path) in ONE attempt, converging in
    far fewer iterations than the gather two-level driver needs, and the f64
    state's residual must be the one reported."""
    from tpufem.fem.driver import WingSolveConfig
    from tpufem.mesher import WingMeshResolution
    from tpufem.pipeline.geometry_stage import run_geometry_case

    p = WingParams(span_m=1.2, chord_m=0.35, sweep_deg=10.0, thickness_ratio=0.10)
    paths = get_paths(tmp_path / "data").ensure()
    run_geometry_case(p, paths, case_id="stencil_route")
    m = run_mesh_case(p, "stencil_route", paths, resolution=WingMeshResolution(16, 16, 4))
    assert m.status == "success", m.failure_reason
    f = run_fem_case(
        p, "stencil_route", paths, pressure=5e3,
        solve_config=WingSolveConfig(pressure=5e3, tol=1e-6, maxiter=2000),
    )
    assert f.status == "success", f.failure_reason
    assert "solve_ladder" not in f.extra  # first attempt succeeded
    assert "solve_stencil_ms" in f.extra["spans"]
    solver = f.extra["solver"]
    assert solver["converged"] and solver["rel_residual"] <= 1e-6
    assert solver["iters"] < 600  # MG iteration counts, not two-level's 1000s


def test_dynamics_entries(tmp_path):
    """Dashboard Dynamics section: scans results dirs for modal/buckling
    reports and mode GLBs (no reference counterpart — static-only app)."""
    import json

    from tpufem.app_core import dynamics_entries

    d = tmp_path / "modal_demo"
    d.mkdir()
    (d / "modal_report.json").write_text(json.dumps(
        {"freqs_hz": [25.9, 154.4], "n_dof": 19803, "sweeps": 7}))
    (d / "mode_01_25.9hz.glb").write_bytes(b"glTF")
    b = tmp_path / "buckling_demo"
    b.mkdir()
    (b / "buckling_report.json").write_text(json.dumps(
        {"load_factor": 9543.1, "pressure_pa": 5e3, "n_dof": 825}))

    entries = dynamics_entries(tmp_path)
    assert [e["label"] for e in entries] == ["buckling_demo", "modal_demo"]
    modal = entries[1]
    assert "25.9" in modal["summary"] and len(modal["glbs"]) == 1
    assert "9543" in entries[0]["summary"]
    assert dynamics_entries(tmp_path / "missing") == []
