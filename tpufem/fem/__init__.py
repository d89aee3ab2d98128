"""JAX linear-static FEM — the in-house replacement for CalculiX ccx.

The reference writes a CalculiX .inp deck and shells out to `ccx`
(src/deep_fem_uav_wing/fem.py:150-215, 524-533); tpufem keeps the whole solve on
the accelerator: vectorized tet4 element setup, matrix-free stiffness SpMV
(gather -> per-element strain/stress -> scatter via segment_sum), Dirichlet masks,
Jacobi-preconditioned CG in `lax.while_loop`, and nodal von Mises recovery.
Everything is jit/vmap/shard_map-compatible.
"""

from tpufem.fem.material import Material, lame_params  # noqa: F401
from tpufem.fem.elements import tet4_setup  # noqa: F401
from tpufem.fem.assembly import stiffness_operator, stiffness_diagonal  # noqa: F401
from tpufem.fem.loads import pressure_loads  # noqa: F401
from tpufem.fem.bc import dirichlet_mask  # noqa: F401
from tpufem.fem.solver import pcg  # noqa: F401
from tpufem.fem.vonmises import element_stress, nodal_stress, von_mises  # noqa: F401
from tpufem.fem.driver import solve_wing_case, WingSolveConfig, FemSolution  # noqa: F401
