"""lammps_ani_tpu — a TPU-native molecular dynamics engine for ANI
neural-network potentials.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
roitberg-group/lammps-ani (LAMMPS + pair_style ani + TorchScript ANI +
cuaev CUDA kernels): the entire MD inner loop — neighbor construction,
AEV symmetry functions, per-species MLP ensembles, integrators,
thermostats/barostats, periodic ghost handling, and multi-chip domain
decomposition — compiles into XLA programs resident on TPU.
"""

from .ops.neighbors import Box, NeighborList, Ghosts
from .models.aev import AEVSpec, ani1x_aev_spec, ani2x_aev_spec, compute_aev
from .models.networks import EnergyShifter, NetworkSpec
from .models.potential import (
    ANIPotential,
    ANISpec,
    atomic_energies,
    energy_forces,
    energy_forces_virial,
    potential_energy,
)
from .models.repulsion import RepulsionSpec
from .md.simulation import NeighborConfig, Simulation
from .md.state import MDState
from .md import bias, constraints, integrate, minimize
from . import units

__version__ = "0.1.0"
