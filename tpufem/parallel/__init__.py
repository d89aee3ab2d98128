"""Parallelism layer: device meshes, sharded FEM solves, data-parallel training.

The reference has NO parallelism (SURVEY.md §2.3: sequential case loops, single-
GPU training, subprocess+filesystem as the only 'communication backend').
tpufem's equivalents, per the BASELINE north star:

  - batched case parallelism: vmap over padded/shared-topology cases
    (tpufem.fem.batched) — replaces the sequential ccx loop
  - node-sharded PCG SpMV over ICI: shard_map halo exchange along the spanwise
    axis of the structured wing topology (tpufem.parallel.halo_pcg), plus a
    GSPMD-annotation variant where XLA inserts the collectives
    (tpufem.parallel.sharded_solver)
  - data-parallel surrogate training: batch-axis sharding with psum gradient
    reduction (tpufem.parallel.data_parallel)
"""

from tpufem.parallel.meshes import make_mesh  # noqa: F401
from tpufem.parallel.sharded_solver import sharded_pcg_solve  # noqa: F401
from tpufem.parallel.data_parallel import make_dp_train_step  # noqa: F401
