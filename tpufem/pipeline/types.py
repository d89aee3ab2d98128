"""Typed schemas for parameters and stage reports.

Parity with reference src/deep_fem_uav_wing/types.py:9-39 (pydantic WingParams /
ParamsFile / StepReport with status in {success, failed}) and the PRD parameter
ranges (reference scripts/generate_geometry_dataset.py:25-30).
"""

from __future__ import annotations

from typing import Any, Literal, Optional

from pydantic import BaseModel, Field

# PRD sampling ranges (reference generate_geometry_dataset.py:25-30, docs/prd.md).
PRD_RANGES: dict[str, tuple[float, float]] = {
    "span_m": (1.0, 2.0),
    "chord_m": (0.2, 0.5),
    "sweep_deg": (0.0, 30.0),
    "thickness_ratio": (0.05, 0.15),
}


class WingParams(BaseModel):
    """Wing design parameters (reference types.py:9-13, validated ranges)."""

    span_m: float = Field(gt=0)
    chord_m: float = Field(gt=0)
    sweep_deg: float = Field(ge=0)
    thickness_ratio: float = Field(gt=0)

    def as_dict(self) -> dict[str, float]:
        return {
            "span_m": self.span_m,
            "chord_m": self.chord_m,
            "sweep_deg": self.sweep_deg,
            "thickness_ratio": self.thickness_ratio,
        }


class ParamsFile(BaseModel):
    """params.json schema written into every geometry case dir (reference types.py)."""

    case_id: str
    params: WingParams
    pipeline_version: str
    source: str = "tpufem"  # geometry backend that produced wing.stl


class StepReport(BaseModel):
    """Uniform per-stage report (reference types.py:33-39).

    Every stage (geometry / mesh / fem / inference) emits one of these as
    ``*_report.json``; ``stdout_tail``-style fields are kept for schema parity even
    though tpufem stages run in-process (no subprocess output to capture).
    """

    case_id: str
    step: str
    status: Literal["success", "failed"]
    failure_reason: Optional[str] = None
    elapsed_ms: float = 0.0
    stdout_tail: str = ""
    stderr_tail: str = ""
    artifacts: dict[str, str] = Field(default_factory=dict)
    extra: dict[str, Any] = Field(default_factory=dict)
