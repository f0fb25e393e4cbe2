"""Checkpoint / restart.

Engine-level equivalent of LAMMPS `write_restart`/`read_restart` as the
reference uses them (SURVEY.md §5 "Checkpoint/resume";
/root/reference/src/pair_ani.cpp:408-455). Unlike the reference — which
serializes only the pair-style config and relies on LAMMPS for atoms — the
checkpoint here captures the *full* dynamical state pytree: positions,
velocities, box, step counter, RNG key, thermostat/barostat chains. A
resumed trajectory is bit-identical to an uninterrupted one (tested).

Format: a single .npz (portable, no pickle). Atom arrays are stored in the
caller's original order so a restart can be loaded into a freshly
constructed Simulation (which may re-derive its own internal ordering).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..md.state import BarostatState, MDState, ThermostatState


FORMAT_VERSION = 1


def save_restart(path, sim, state: MDState, extra: dict | None = None):
    """Write a restart file for (sim, state)."""
    arrays = {
        "pos": sim.positions_input_order(state),
        "vel": sim.velocities_input_order(state),
        "box_h": np.asarray(jax.device_get(state.box.h)),
        "box_origin": np.asarray(jax.device_get(state.box.origin)),
        "step": np.asarray(jax.device_get(state.step)),
        "rng": np.asarray(jax.device_get(jax.random.key_data(state.rng)))
        if jnp.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
        else np.asarray(jax.device_get(state.rng)),
        "species": sim.species_np[sim.inv_order],
        "masses": np.asarray(jax.device_get(sim.masses))[sim.inv_order],
    }
    if state.thermostat is not None:
        arrays["ts_eta"] = np.asarray(jax.device_get(state.thermostat.eta))
        arrays["ts_eta_dot"] = np.asarray(
            jax.device_get(state.thermostat.eta_dot))
    if state.barostat is not None:
        arrays["bs_omega"] = np.asarray(jax.device_get(state.barostat.omega))
        arrays["bs_eta"] = np.asarray(
            jax.device_get(state.barostat.omega_chain.eta))
        arrays["bs_eta_dot"] = np.asarray(
            jax.device_get(state.barostat.omega_chain.eta_dot))
    meta = {"version": FORMAT_VERSION, "dt": sim.dt,
            "n_atoms": sim.n_atoms, "extra": extra or {}}
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez(path, **arrays)


def load_restart(path, sim):
    """Reconstruct an MDState for `sim` from a restart file.

    `sim` must be constructed with the same potential/species; the restart
    carries the dynamical state only (weights live with the model file,
    matching the reference's restart contract — model weights are NOT in
    the checkpoint, only reloadable config, pair_ani.cpp:408-455).
    """
    from ..ops import neighbors as nbops

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta["n_atoms"] != sim.n_atoms:
            raise ValueError(
                f"restart has {meta['n_atoms']} atoms, sim {sim.n_atoms}")
        box = nbops.Box(h=jnp.asarray(z["box_h"], sim.dtype),
                        origin=jnp.asarray(z["box_origin"], sim.dtype))
        state = sim.init_state(z["pos"], box, vel=z["vel"])
        rng = jnp.asarray(z["rng"])
        if rng.dtype == jnp.uint32 and rng.ndim == 1:
            rng = jax.random.wrap_key_data(rng) \
                if hasattr(jax.random, "wrap_key_data") else rng
        ts = state.thermostat
        if "ts_eta" in z and ts is not None:
            ts = ThermostatState(eta=jnp.asarray(z["ts_eta"], sim.dtype),
                                 eta_dot=jnp.asarray(z["ts_eta_dot"],
                                                     sim.dtype))
        bs = state.barostat
        if "bs_omega" in z and bs is not None:
            bs = BarostatState(
                omega=jnp.asarray(z["bs_omega"], sim.dtype),
                omega_chain=ThermostatState(
                    eta=jnp.asarray(z["bs_eta"], sim.dtype),
                    eta_dot=jnp.asarray(z["bs_eta_dot"], sim.dtype)))
        state = state.replace(
            step=jnp.asarray(int(z["step"]), jnp.int32), rng=rng,
            thermostat=ts, barostat=bs)
    return state
