"""RATTLE bond-length constraints (LAMMPS `fix shake` equivalent).

The reference constrains X-H bonds with LAMMPS SHAKE as an alternative to
hydrogen-mass repartitioning (SURVEY.md §7.5; bonds prepared by
pdb2lmp.py:53-64). Here the velocity-Verlet constraint projection is
RATTLE with Jacobi (parallel) iterations — every constraint updates
simultaneously with mass-weighted corrections, which converges fast for
X-H clusters and maps to fixed-iteration `lax.fori_loop` (no data-dependent
control flow). HMR (`tools.hmr`) remains the recommended TPU path: it adds
zero per-step work; RATTLE costs two small scatter loops per step.

Constraint semantics: minimum-image bond vectors, so molecules may straddle
periodic boundaries. dof accounting: `Simulation` subtracts one dof per
constraint (LAMMPS does the same for temperature).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Rattle:
    """Static constraint set: bonds (i, j) fixed at length r0."""

    pairs: tuple  # [m, 2] int (host tuple-of-tuples for hashability)
    r0: tuple  # [m] float
    iters: int = 30
    tol: float = 1e-8  # informational; iterations are fixed-count

    @staticmethod
    def from_bonds(bonds, positions, box_h=None):
        """Constrain given (i, j) pairs at their current lengths."""
        pos = np.asarray(positions, float)
        pairs, r0 = [], []
        h = None if box_h is None else np.asarray(box_h, float)
        for ij in bonds:
            i, j = int(ij[-2]), int(ij[-1])
            d = pos[i] - pos[j]
            if h is not None:
                frac = d @ np.linalg.inv(h)
                d = (frac - np.round(frac)) @ h
            pairs.append((i, j))
            r0.append(float(np.linalg.norm(d)))
        return Rattle(pairs=tuple(pairs), r0=tuple(r0))

    @property
    def n_constraints(self) -> int:
        return len(self.pairs)

    def _arrays(self, dtype):
        ij = jnp.asarray(self.pairs, jnp.int32)
        return ij[:, 0], ij[:, 1], jnp.asarray(self.r0, dtype)

    def _min_image(self, d, box):
        frac = d @ jnp.linalg.inv(box.h)
        return (frac - jnp.round(frac)) @ box.h

    def project_positions(self, pos_new, pos_old, vel, masses, box, dt):
        """SHAKE stage: move pos_new onto the constraint manifold along the
        pre-step bond directions; velocities get the consistent impulse."""
        i, j, r0 = self._arrays(pos_new.dtype)
        inv_mi = 1.0 / masses[i]
        inv_mj = 1.0 / masses[j]
        d_old = self._min_image(pos_old[i] - pos_old[j], box)  # [m, 3]

        def body(_, carry):
            pos, = carry
            d = self._min_image(pos[i] - pos[j], box)
            c = jnp.sum(d * d, axis=1) - r0 * r0
            denom = 2.0 * (inv_mi + inv_mj) * jnp.sum(d * d_old, axis=1)
            lam = c / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
            corr = lam[:, None] * d_old
            pos = pos.at[i].add(-corr * inv_mi[:, None])
            pos = pos.at[j].add(corr * inv_mj[:, None])
            return (pos,)

        (pos_proj,) = jax.lax.fori_loop(0, self.iters, body, (pos_new,))
        vel = vel + (pos_proj - pos_new) / dt
        return pos_proj, vel

    def project_velocities(self, pos, vel, masses, box):
        """RATTLE stage: remove bond-directional relative velocities."""
        i, j, r0 = self._arrays(pos.dtype)
        inv_mi = 1.0 / masses[i]
        inv_mj = 1.0 / masses[j]
        d = self._min_image(pos[i] - pos[j], box)
        d2 = jnp.sum(d * d, axis=1)

        def body(_, carry):
            vel, = carry
            vrel = jnp.sum((vel[i] - vel[j]) * d, axis=1)
            lam = vrel / ((inv_mi + inv_mj) * d2)
            corr = lam[:, None] * d
            vel = vel.at[i].add(-corr * inv_mi[:, None])
            vel = vel.at[j].add(corr * inv_mj[:, None])
            return (vel,)

        (vel,) = jax.lax.fori_loop(0, self.iters, body, (vel,))
        return vel

    def max_violation(self, pos, box):
        i, j, r0 = self._arrays(pos.dtype)
        d = self._min_image(pos[i] - pos[j], box)
        return jnp.max(jnp.abs(jnp.linalg.norm(d, axis=1) - r0))
