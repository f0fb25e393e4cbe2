"""Integrators and thermostats (LAMMPS-`real`-unit velocity Verlet family).

TPU-native equivalents of the LAMMPS fixes the reference relies on
(SURVEY.md L5/§7.5): `fix nve`, `fix langevin`, `fix nvt` (Nose-Hoover
chains), `fix npt` (iso barostat), `fix recenter`, `velocity create`.
All are pure functions over MDState; no per-step host logic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import units
from .state import BarostatState, MDState, ThermostatState
from ..ops.neighbors import Box


def kinetic_energy(vel: jax.Array, masses: jax.Array,
                   mask: jax.Array | None = None) -> jax.Array:
    """[] kcal/mol."""
    v2 = jnp.sum(vel * vel, axis=-1)
    if mask is not None:
        v2 = jnp.where(mask, v2, 0.0)
    return 0.5 * units.MVV2E * jnp.sum(masses * v2)


def temperature(vel: jax.Array, masses: jax.Array, dof: int | jax.Array,
                mask: jax.Array | None = None) -> jax.Array:
    """LAMMPS `compute temp`: T = 2 KE / (dof * kB), default dof = 3N - 3."""
    return 2.0 * kinetic_energy(vel, masses, mask) / (dof * units.BOLTZ)


def pressure_tensor(vel, masses, virial, volume, mask=None) -> jax.Array:
    """[3,3] pressure in atm: (kinetic tensor + virial) / V * nktv2p."""
    v = vel
    if mask is not None:
        v = jnp.where(mask[:, None], vel, 0.0)
    kin = units.MVV2E * jnp.einsum("i,ia,ib->ab", masses, v, v)
    return (kin + virial) / volume * units.NKTV2P


def create_velocities(key, masses, temp, dof=None, zero_momentum=True,
                      mask=None, dtype=jnp.float32):
    """LAMMPS `velocity all create T seed`: gaussian, COM-zeroed, exact-T."""
    n = masses.shape[0]
    if dof is None:
        dof = 3 * n - 3
    sigma = jnp.sqrt(units.BOLTZ * temp / (masses * units.MVV2E))
    vel = jax.random.normal(key, (n, 3), dtype) * sigma[:, None].astype(dtype)
    if mask is not None:
        vel = jnp.where(mask[:, None], vel, 0.0)
    if zero_momentum:
        mtot = jnp.sum(masses) if mask is None else jnp.sum(
            jnp.where(mask, masses, 0.0))
        p = jnp.sum(masses[:, None] * vel, axis=0)
        vel = vel - (p / mtot)[None, :]
        if mask is not None:
            vel = jnp.where(mask[:, None], vel, 0.0)
    t_now = temperature(vel, masses, dof, mask)
    return vel * jnp.sqrt(temp / jnp.maximum(t_now, 1e-30))


def nve_halfkick(vel, force, masses, dt):
    return vel + (0.5 * dt * units.FTM2V) * force / masses[:, None]


def nve_drift(pos, vel, dt):
    return pos + dt * vel


@dataclasses.dataclass(frozen=True)
class Langevin:
    """LAMMPS `fix langevin T T damp seed`: friction + stochastic force
    added to the NVE force (used with nve_halfkick/nve_drift)."""

    temp: float
    damp: float  # fs

    def force(self, key, vel, masses, dt):
        """Extra force in kcal/mol/A (LAMMPS gamma1/gamma2 form, gaussian).

        Fluctuation-dissipation in real units: a velocity kick
        dv = dt*FTM2V*f/m with stationary <v^2> = kB T/(m MVV2E) requires
        sigma_f = sqrt(2 kB T m MVV2E / (dt damp)).
        """
        gamma1 = -masses / (self.damp * units.FTM2V)
        sigma = jnp.sqrt(
            2.0 * units.BOLTZ * self.temp * masses * units.MVV2E
            / (dt * self.damp)
        )
        noise = jax.random.normal(key, vel.shape, vel.dtype)
        return gamma1[:, None] * vel + sigma[:, None] * noise


@dataclasses.dataclass(frozen=True)
class NoseHoover:
    """Nose-Hoover chain thermostat (LAMMPS `fix nvt temp T T tdamp`)."""

    temp: float
    tdamp: float  # fs
    chain: int = 3
    loops: int = 1

    def init(self, dtype=jnp.float32) -> ThermostatState:
        return ThermostatState(
            eta=jnp.zeros((self.chain,), dtype),
            eta_dot=jnp.zeros((self.chain,), dtype),
        )

    def masses_q(self, dof):
        """Chain masses Q_k (energy * time^2 units)."""
        kt = units.BOLTZ * self.temp
        q1 = dof * kt * self.tdamp**2
        qk = kt * self.tdamp**2
        return q1, qk

    def half_step(self, ts: ThermostatState, vel, masses, dof, dt, ke2=None):
        """Advance chain by dt/2 and scale velocities (Martyna-Tuckerman).

        `ke2` = 2x total kinetic energy; pass the globally psum-reduced
        value in sharded runs (parallel/sim.py) so every shard advances an
        identical replicated chain."""
        kt = units.BOLTZ * self.temp
        q1, qk = self.masses_q(dof)
        q = jnp.concatenate([
            jnp.asarray([q1], vel.dtype),
            jnp.full((self.chain - 1,), qk, vel.dtype),
        ])
        eta, eta_dot = ts.eta, ts.eta_dot
        if ke2 is None:
            ke2 = 2.0 * kinetic_energy(vel, masses)  # 2*KE
        scale = jnp.asarray(1.0, vel.dtype)
        dts = dt / (2.0 * self.loops)
        for _ in range(self.loops):
            # update chain tail -> head
            g = jnp.zeros_like(eta_dot)
            g = g.at[0].set((ke2 - dof * kt) / q[0])
            for k in range(1, self.chain):
                g = g.at[k].set((q[k - 1] * eta_dot[k - 1] ** 2 - kt) / q[k])
            for k in range(self.chain - 1, -1, -1):
                if k == self.chain - 1:
                    eta_dot = eta_dot.at[k].add(0.25 * dts * g[k])
                else:
                    f = jnp.exp(-0.125 * dts * eta_dot[k + 1])
                    eta_dot = eta_dot.at[k].set(
                        (eta_dot[k] * f + 0.25 * dts * g[k]) * f)
            s = jnp.exp(-0.5 * dts * eta_dot[0])
            scale = scale * s
            ke2 = ke2 * s * s
            eta = eta + 0.5 * dts * eta_dot
            # head -> tail with updated kinetic energy
            g = g.at[0].set((ke2 - dof * kt) / q[0])
            for k in range(self.chain):
                if k == self.chain - 1:
                    gk = (q[k - 1] * eta_dot[k - 1] ** 2 - kt) / q[k] \
                        if k > 0 else g[0]
                    eta_dot = eta_dot.at[k].add(0.25 * dts * gk)
                else:
                    f = jnp.exp(-0.125 * dts * eta_dot[k + 1])
                    gk = g[0] if k == 0 else \
                        (q[k - 1] * eta_dot[k - 1] ** 2 - kt) / q[k]
                    eta_dot = eta_dot.at[k].set(
                        (eta_dot[k] * f + 0.25 * dts * gk) * f)
        return ThermostatState(eta=eta, eta_dot=eta_dot), vel * scale


@dataclasses.dataclass(frozen=True)
class BerendsenBarostat:
    """LAMMPS `fix press/berendsen iso P P pdamp`: weak-coupling volume
    rescale toward the target pressure. Simple and robust; not a strict
    NPT ensemble (use NoseHooverNPT for that)."""

    press: float  # atm
    pdamp: float  # fs
    bulk_modulus: float = 2.2e4  # atm, water-like default (LAMMPS `modulus`)

    def scale_factor(self, p_now, dt):
        """Isotropic box/position scale for one step."""
        mu3 = 1.0 - dt / self.pdamp * (self.press - p_now) / self.bulk_modulus
        # clamp like LAMMPS does to keep single-step rescale sane
        mu3 = jnp.clip(mu3, 0.9, 1.1)
        return mu3 ** (1.0 / 3.0)


@dataclasses.dataclass(frozen=True)
class NoseHooverNPT:
    """MTK-style isotropic NPT (LAMMPS `fix npt temp T T tdamp iso P P
    pdamp`): Nose-Hoover chain thermostat on particles + Nose-Hoover
    piston on ln V, with the MTK velocity correction.

    Integration follows the Martyna-Tobias-Klein splitting in its common
    simplified form: piston velocity `omega` [1/fs] advances by half-steps
    driven by (P_int - P_target)·3V/W + MTK kinetic term; positions and the
    cell scale by exp(dt·omega); particle velocities pick up the
    exp(-dt·(1+3/dof)·omega) factor inside their half-kicks.
    """

    temp: float
    tdamp: float  # fs
    press: float  # atm
    pdamp: float  # fs
    chain: int = 3

    @property
    def thermostat(self) -> NoseHoover:
        return NoseHoover(temp=self.temp, tdamp=self.tdamp, chain=self.chain)

    def init(self, dtype=jnp.float32) -> BarostatState:
        return BarostatState(
            omega=jnp.zeros((), dtype),
            omega_chain=ThermostatState(
                eta=jnp.zeros((self.chain,), dtype),
                eta_dot=jnp.zeros((self.chain,), dtype),
            ),
        )

    def piston_mass(self, n_atoms: int) -> float:
        """W in (g/mol)(A/fs)^2 energy-time^2 form: (dof+3) kT pdamp^2."""
        return (3.0 * n_atoms + 3.0) * units.BOLTZ * self.temp * self.pdamp**2

    def piston_half(self, bs: BarostatState, p_now, volume, ke, n_atoms, dt,
                    dof=None):
        """Advance omega by dt/2. p_now in atm, volume in A^3, ke kcal/mol.

        The MTK kinetic correction uses N_f = `dof` (matching `vel_scale`'s
        1 + 3/dof factor); using N instead over-drives the piston ~3x."""
        if dof is None:
            dof = 3.0 * n_atoms - 3.0
        w = self.piston_mass(n_atoms)
        # pressure term converted to kcal/mol: (P - P0) V -> energy
        g = (
            3.0 * volume * (p_now - self.press) * units.ATM2ENGVOL
            + (3.0 / dof) * 2.0 * ke
        ) / w
        # piston thermostat (single NH on omega) for ergodicity
        kt = units.BOLTZ * self.temp
        q = kt * self.pdamp**2
        eta, eta_dot = bs.omega_chain.eta, bs.omega_chain.eta_dot
        g_eta = (w * bs.omega**2 - kt) / q
        eta_dot = eta_dot.at[0].add(0.25 * dt * g_eta)
        omega = bs.omega * jnp.exp(-0.5 * dt * eta_dot[0]) + 0.5 * dt * g
        eta = eta.at[0].add(0.5 * dt * eta_dot[0])
        return BarostatState(
            omega=omega,
            omega_chain=ThermostatState(eta=eta, eta_dot=eta_dot),
        )

    def vel_scale(self, omega, dof, n_atoms, dt):
        """exp factor applied to velocities over dt/2 (MTK correction)."""
        alpha = 1.0 + 3.0 / dof
        return jnp.exp(-0.5 * dt * alpha * omega)

    def box_scale(self, omega, dt):
        return jnp.exp(dt * omega)


def rescale_box(box: Box, scale) -> Box:
    """Isotropic cell rescale about the box origin."""
    return Box(h=box.h * scale, origin=box.origin)


def recenter(pos, masses, target_com):
    """LAMMPS `fix recenter`: shift so the COM sits at `target_com`."""
    com = jnp.sum(masses[:, None] * pos, axis=0) / jnp.sum(masses)
    return pos + (target_com - com)[None, :]


def zero_momentum(vel, masses, mask=None):
    m = masses if mask is None else jnp.where(mask, masses, 0.0)
    p = jnp.sum(m[:, None] * vel, axis=0)
    v = vel - (p / jnp.sum(m))[None, :]
    return v if mask is None else jnp.where(mask[:, None], v, 0.0)
