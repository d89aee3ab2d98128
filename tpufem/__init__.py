"""tpufem — a TPU-native (JAX/XLA/Pallas) rebuild of the Deep-FEM-UAV-Wing pipeline.

The reference (LUKE-hyungjin/Deep-FEM-UAV-Wing) is a five-stage surrogate-modeling
pipeline for UAV wing structural analysis that orchestrates three external native
binaries (Blender, Gmsh, CalculiX) plus PyTorch-Geometric via subprocess and
filesystem artifacts (reference README.md:14-18, docs/prd.md:14-32).

tpufem re-designs every stage TPU-first, fully in-house:

  geometry   — pure-numpy NACA-00xx wing loft            (replaces Blender bpy)
  mesher     — structured tet4/tet10 wing mesher + MSH2  (replaces Gmsh)
  fem        — JAX tet4/tet10 linear statics: vectorized element stiffness,
               segment-sum scatter assembly, Jacobi-PCG in HBM, vmapped batched
               solves, shard_map mesh-sharded SpMV       (replaces CalculiX ccx)
  models     — GraphSAGE surrogate in JAX/flax with Pallas gather/scatter
               message passing                           (replaces PyTorch-Geometric)
  viz        — pure-Python binary GLB writer + colormaps (replaces PyVista/trimesh)
  pipeline   — case-id hashing, artifact/report/CSV/manifest contract, stage
               drivers, dataset validation, E2E verification
  parallel   — jax.sharding / shard_map utilities (DP over padded case batches,
               node-sharded PCG over ICI)
"""

__version__ = "0.1.0"

PIPELINE_VERSION = "tpu-v0.1.0"

# Persistent XLA compilation cache: repeat CLI invocations (bench, dataset
# resume, demos) skip minutes of recompilation. Opt out: TPUFEM_NO_XLA_CACHE=1.
from tpufem.utils.xla_cache import enable as _enable_xla_cache  # noqa: E402

_enable_xla_cache()
