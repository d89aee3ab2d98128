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
