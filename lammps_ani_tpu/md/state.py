"""Simulation state pytree.

The TPU-native analog of LAMMPS's Atom/Domain state (SURVEY.md L5): the
whole MD state is one pytree resident in HBM, advanced by a jitted step
function. Checkpoint/restart = serializing this pytree (io/restart.py),
which — unlike the reference's `write_restart` (pair_ani.cpp:408-455) —
captures integrator/thermostat state and RNG too.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.neighbors import Box, NeighborList


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ThermostatState:
    """Nose-Hoover chain state (also reused for barostat chains)."""

    eta: jax.Array  # [chain] thermostat positions
    eta_dot: jax.Array  # [chain] thermostat velocities


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BarostatState:
    omega: jax.Array  # [3] cell momentum (iso: identical entries)
    omega_chain: ThermostatState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MDState:
    """Everything that evolves during a run (units: LAMMPS `real`)."""

    pos: jax.Array  # [n, 3] Angstrom
    vel: jax.Array  # [n, 3] Angstrom/fs
    force: jax.Array  # [n, 3] kcal/mol/Angstrom
    box: Box
    step: jax.Array  # [] int64/int32
    rng: jax.Array  # PRNG key (thermostats)
    pe: jax.Array  # [] kcal/mol (potential energy at `pos`)
    virial: jax.Array  # [3, 3] kcal/mol
    nlist: NeighborList
    pos_at_rebuild: jax.Array  # [n, 3] for skin-based rebuild checks
    thermostat: Optional[ThermostatState] = None
    barostat: Optional[BarostatState] = None
    # owner/shift/mirror neighbor form for the scatter-free force path
    # (ops/nbr_grad.MirrorNeighbors); rebuilt with nlist
    nbrs: Optional[object] = None
    # cell-roll bins for the gather-free radial channel (ops/cell_roll)
    bins: Optional[object] = None

    def replace(self, **kw) -> "MDState":
        return dataclasses.replace(self, **kw)
