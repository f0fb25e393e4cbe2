"""lammps_ani_tpu — a TPU-native molecular dynamics engine for ANI
neural-network potentials.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
roitberg-group/lammps-ani (LAMMPS + pair_style ani + TorchScript ANI +
cuaev CUDA kernels): the entire MD inner loop — neighbor construction,
AEV symmetry functions, per-species MLP ensembles, integrators,
thermostats/barostats, periodic ghost handling, and multi-chip domain
decomposition — compiles into XLA programs resident on TPU.
"""

import os as _os

import jax as _jax

# fp32 matmuls at full precision by default — the TPU analog of the
# reference's TF32-off policy (/root/reference/models/lammps_ani.py:10-12;
# SURVEY.md §7 hard part 5). XLA's default TPU f32 dot may use bf16
# passes: at a 120 A box that rounds coordinates routed through
# `frac @ h` / `shift @ h` by ~0.25 A — silently wrong forces. Geometry-
# critical products are ALSO pinned to highest explicitly, so
# LAT_MATMUL_PRECISION=default only relaxes the NN matmuls.
_prec = _os.environ.get("LAT_MATMUL_PRECISION", "highest")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

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
