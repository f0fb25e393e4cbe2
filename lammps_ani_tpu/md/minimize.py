"""FIRE energy minimization (LAMMPS `minimize` equivalent, `min_style fire`).

The reference relies on LAMMPS `minimize 1.0e-8 ...` (SURVEY.md §7.5,
examples/water-NPT). FIRE (fast inertial relaxation engine) suits the jitted
engine: it is velocity-Verlet plus a few scalar controls, so a whole
minimization segment compiles into one lax.scan like the MD chunks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import units


@dataclasses.dataclass(frozen=True)
class FireConfig:
    dt_start: float = 0.25  # fs
    dt_max: float = 1.0
    n_min: int = 5
    f_inc: float = 1.1
    f_dec: float = 0.5
    alpha_start: float = 0.1
    f_alpha: float = 0.99


def minimize(sim, state, max_steps: int = 1000, ftol: float = 1e-4,
             config: FireConfig = FireConfig()):
    """Relax `state` until max |F| < ftol (kcal/mol/A) or max_steps.

    Returns (state, info dict). Neighbor structure is rebuilt every
    `sim.nbr.rebuild_every` steps like the MD path.
    """
    c = config
    chunk = sim.nbr.rebuild_every

    def fire_chunk(state, carry, n_steps):
        from ..ops import neighbors as nbops
        from ..ops import nbr_grad

        pos_w = nbops.wrap_positions(state.pos, state.box)
        nlist = sim._build_nlist(pos_w, state.box)
        nbrs = sim._mirror(nlist, pos_w, state.box)
        bins = sim._bins(pos_w, state.box)
        state = state.replace(pos=pos_w, nlist=nlist, nbrs=nbrs, bins=bins)

        def body(sc, _):
            st, (dt, alpha, n_pos) = sc
            vel = st.vel + (0.5 * dt * units.FTM2V) * st.force \
                / sim.masses[:, None]
            pos = st.pos + dt * vel
            pe, force, virial, _ = sim._forces(pos, st.box, st.nbrs,
                                               st.bins, st.step)
            vel = vel + (0.5 * dt * units.FTM2V) * force \
                / sim.masses[:, None]

            p = jnp.sum(force * vel)
            fnorm = jnp.sqrt(jnp.sum(force * force))
            vnorm = jnp.sqrt(jnp.sum(vel * vel))
            vel_mix = (1.0 - alpha) * vel + alpha * vnorm * force \
                / jnp.maximum(fnorm, 1e-30)
            uphill = p <= 0.0
            vel = jnp.where(uphill, 0.0, vel_mix)
            n_pos = jnp.where(uphill, 0, n_pos + 1)
            grow = (~uphill) & (n_pos > c.n_min)
            dt = jnp.where(grow, jnp.minimum(dt * c.f_inc, c.dt_max),
                           jnp.where(uphill, dt * c.f_dec, dt))
            alpha = jnp.where(grow, alpha * c.f_alpha,
                              jnp.where(uphill, c.alpha_start, alpha))
            st = st.replace(pos=pos, vel=vel, force=force, pe=pe,
                            virial=virial, step=st.step + 1)
            fmax = jnp.max(jnp.abs(force))
            return (st, (dt, alpha, n_pos)), fmax

        (state, carry), fmaxes = jax.lax.scan(
            body, (state, carry), length=n_steps)
        if sim._pallas_asn:
            # match Simulation._chunk: keep the returned pytree structure
            # bins-free so subsequent chunks/runs compile once
            state = state.replace(bins=None)
        return state, carry, fmaxes[-1]

    jitted = jax.jit(lambda s, cr: fire_chunk(s, cr, chunk))
    dtype = state.pos.dtype
    carry = (jnp.asarray(c.dt_start, dtype), jnp.asarray(c.alpha_start, dtype),
             jnp.zeros((), jnp.int32))
    state = state.replace(vel=jnp.zeros_like(state.vel))
    steps = 0
    fmax = np.inf
    while steps < max_steps:
        state, carry, fmax = jitted(state, carry)
        steps += chunk
        if float(fmax) < ftol:
            break
    return state, {"steps": steps, "fmax": float(fmax),
                   "pe": float(state.pe)}
