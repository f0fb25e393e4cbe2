"""Collective-variable bias forces (umbrella sampling / restraints).

The reference drives umbrella sampling through PLUMED
(/root/reference/examples/alanine-dipeptide-umbrella: per-window PLUMED
input + Slurm fan-out, SURVEY.md §7.7). Here the equivalent surface is a
differentiable bias energy added through `Simulation(extra_force=...)`:
define a CV as a pure function of positions, wrap it in a harmonic window,
and `jax.grad` supplies the bias force inside the same jitted step.

CVs provided: distance, angle, dihedral (the PLUMED basics the reference's
workloads use). Window fan-out is a host-level loop (`run_windows`), the
analog of submit_umbrella.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def distance_cv(i: int, j: int):
    def cv(pos, box):
        return jnp.linalg.norm(pos[i] - pos[j])
    return cv


def angle_cv(i: int, j: int, k: int):
    def cv(pos, box):
        a = pos[i] - pos[j]
        b = pos[k] - pos[j]
        cos = jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b))
        return jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    return cv


def dihedral_cv(i: int, j: int, k: int, l: int):
    """Signed dihedral in radians (PLUMED TORSION convention)."""
    def cv(pos, box):
        b0 = pos[i] - pos[j]
        b1 = pos[k] - pos[j]
        b2 = pos[l] - pos[k]
        b1n = b1 / jnp.linalg.norm(b1)
        v = b0 - jnp.dot(b0, b1n) * b1n
        w = b2 - jnp.dot(b2, b1n) * b1n
        return jnp.arctan2(jnp.dot(jnp.cross(b1n, v), w), jnp.dot(v, w))
    return cv


@dataclasses.dataclass(frozen=True)
class HarmonicBias:
    """E = 0.5 k (cv - center)^2 [kcal/mol]; periodic CVs wrap the delta."""

    cv: Callable
    k: float
    center: float
    periodic: float | None = None  # period (e.g. 2*pi for dihedrals)

    def energy(self, pos, box):
        d = self.cv(pos, box) - self.center
        if self.periodic is not None:
            d = d - self.periodic * jnp.round(d / self.periodic)
        return 0.5 * self.k * d * d

    def force(self, pos, box, step=None):
        """extra_force-compatible: [n, 3] bias force."""
        return -jax.grad(lambda p: self.energy(p, box))(pos)


def combine(biases: Sequence[HarmonicBias]):
    """Many restraints -> one extra_force callable."""
    def force(pos, box, step=None):
        e = lambda p: sum(b.energy(p, box) for b in biases)
        return -jax.grad(e)(pos)
    return force


def run_windows(make_sim, pos0, box, centers, k, cv_factory,
                steps_per_window: int, sample_every: int = 10, seed: int = 0,
                periodic: float | None = None):
    """Umbrella fan-out: one window per center (submit_umbrella.py analog).

    make_sim(extra_force) -> Simulation. Returns per-window CV samples for
    WHAM/MBAR post-processing.
    """
    samples = []
    for w, center in enumerate(centers):
        bias = HarmonicBias(cv=cv_factory(), k=k, center=float(center),
                            periodic=periodic)
        sim = make_sim(bias.force)
        state = sim.init_state(pos0, box, temp=getattr(
            sim.integrator, "temp", 300.0), seed=seed + w)
        cv_fn = jax.jit(lambda p, b: cv_factory()(p, b))
        traj = []
        done = 0
        while done < steps_per_window:
            state, _ = sim.run(state, sample_every)
            done += sample_every
            traj.append(float(cv_fn(
                jnp.asarray(sim.positions_input_order(state)), state.box)))
        samples.append(np.asarray(traj))
    return samples
