"""Visualization layer: pure-Python binary GLB writer, colormaps, arrows.

Replaces the reference's PyVista/VTK + trimesh export stack (viz.py:18-99,
viz_results.py) — neither library exists in this environment, and GLB is a
simple JSON+BIN container (reference docs/spec.md:37-41 already standardizes on
vertex-color GLB).
"""

from tpufem.viz.glb import write_glb, GLBMesh, is_binary_glb  # noqa: F401
from tpufem.viz.colormaps import viridis, hot  # noqa: F401
from tpufem.viz.results import (  # noqa: F401
    stl_to_glb,
    surface_results_to_glb,
    surface_results_to_glb_with_extras,
)
from tpufem.viz.arrows import make_pressure_arrows  # noqa: F401
