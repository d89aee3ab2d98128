"""Pipeline layer: config, case identity, typed schemas, artifacts, stage drivers.

Mirrors the reference's L0/L7 contracts (src/deep_fem_uav_wing/config.py,
case_id.py, types.py and scripts/*.py) so datasets remain content-addressed,
resumable and validatable, while all compute goes through tpufem's JAX core.
"""

from tpufem.pipeline.config import Paths, get_paths  # noqa: F401
from tpufem.pipeline.case_id import compute_case_id, normalize_params  # noqa: F401
from tpufem.pipeline.types import (  # noqa: F401
    WingParams,
    ParamsFile,
    StepReport,
    PRD_RANGES,
)
