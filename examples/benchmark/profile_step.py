"""Capture and summarize a device trace of the production MD chunk.

Usage: python profile_step.py [n_rep] [cellroll:0/1]
Prints the top device ops by total time for one 10-step chunk.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import zoo
    from lammps_ani_tpu.utils import profiling

    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    cellroll = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
    steps = int(os.environ.get("PROF_STEPS", "12"))

    import dataclasses

    from lammps_ani_tpu.md import integrate

    # mirror bench.py: equilibrated tile, core repulsion, thermostat,
    # capacity margins — profile what the headline number executes
    os.environ.setdefault("LAT_ROLL_CAP_MARGIN", "4")
    os.environ.setdefault("LAT_ANG_CAP_MARGIN", "1.1")
    os.environ.setdefault("LAT_SEC_MARGIN", "1.1")
    tile = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    equil = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "equil_water30.npz")
    if os.path.exists(equil):
        z = np.load(equil)
        tile = dataclasses.replace(tile, positions=z["positions"])
    data = ldio.replicate(tile, n_rep, n_rep, n_rep)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float32, repulsion=True,
                    atom_chunk=min(2048, data.n_atoms))
    sim = lat.Simulation(
        potential=pot, species=data.species,
        masses=data.masses_by_type[data.species],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, ang_skin=2.0,
                               k_max=128,
                               ghost_capacity=max(4096, data.n_atoms // 2),
                               rebuild_every=steps,
                               use_cell_list=n_rep >= 3, cell_capacity=32),
        dt=0.5, dtype=jnp.float32, cellroll=cellroll,
        integrator=integrate.Langevin(temp=300.0, damp=100.0))
    print(f"n_atoms={data.n_atoms} roll_impl={sim._roll_impl} "
          f"cellroll={cellroll}", flush=True)
    box = lat.Box(h=jnp.asarray(data.box_h, jnp.float32),
                  origin=jnp.asarray(data.box_origin, jnp.float32))
    state = sim.init_state(data.positions, box, temp=300.0, seed=1)

    import jax.numpy as _jnp
    fn = sim._jitted_chunk(steps)
    n_take = _jnp.asarray(steps, _jnp.int32)
    out = fn(state, n_take)
    jax.block_until_ready(out[0].pos)

    log_dir = "/tmp/lat_trace"
    with profiling.trace(log_dir):
        out = fn(state, n_take)
        jax.block_until_ready(out[0].pos)
    rows = profiling.summarize_trace(log_dir, top=35)
    total = 0.0
    for dur_ms, name in rows:
        total += dur_ms
        print(f"{dur_ms:9.2f} ms  {name[:110]}", flush=True)
    print(f"(top-35 total {total:.1f} ms for {steps} steps "
          f"-> {total / steps:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
