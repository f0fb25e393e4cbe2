"""Equilibrate the 30-atom water tile under the synthetic ANI-2x PES.

The benchmark box is this tile replicated 15^3 (bench.py). Replication
preserves each atom's full neighbor environment (periodic images of the
tile become real copies with identical displacement vectors), so a tile
equilibrated at 300 K replicates into a 101k-atom box that starts AT
equilibrium: no repulsion-wall transient, no slow PES collapse, no
half-skin staleness freezes, and capacity high-water marks that hold
from the first chunk. The raw reference tile geometry is an equilibrium
of real ANI-2x (reference tests/water-0.8nm.data), not of the synthetic
stand-in weights, which is why benching from it measured the warmup
transient instead of steady state.

FIRE-relaxes, then Langevin-thermalizes at 300 K, and writes
examples/benchmark/data/equil_water30.npz (positions + velocities +
box). Deterministic; rerun only if the synthetic zoo weights change.

Usage: python tools/equilibrate_tile.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.md import integrate, minimize
    from lammps_ani_tpu.models import zoo

    data = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    # one ensemble member, f32, WITH core repulsion: the exact bench
    # potential (bench.py) — the equilibrium is potential-specific
    pot = zoo.ani2x(num_models=1, dtype=jnp.float32, repulsion=True)
    sim = lat.Simulation(
        potential=pot, species=data.species,
        masses=data.masses_by_type[data.species],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, ang_skin=2.0,
                               k_max=128, ghost_capacity=1024,
                               rebuild_every=5),
        dt=0.25, dtype=jnp.float32,
        integrator=integrate.Langevin(temp=300.0, damp=20.0))
    box = lat.Box(h=jnp.asarray(data.box_h, jnp.float32),
                  origin=jnp.asarray(data.box_origin, jnp.float32))
    st = sim.init_state(data.positions, box, temp=300.0, seed=7)
    st, info = minimize.minimize(
        sim, st, max_steps=200, ftol=1.0,
        config=minimize.FireConfig(dt_start=0.05, dt_max=0.25))
    print(f"FIRE: fmax {info['fmax']:.3f} pe {info['pe']:.2f}")
    st = sim.init_state(sim.positions_input_order(st), box, temp=300.0,
                        seed=7)
    for leg in range(8):
        st, rows = sim.run(st, 500, thermo_every=500)
        r = rows[-1]
        print(f"leg {leg}: temp {r['temp']:8.1f} pe {r['pe']:12.2f} "
              f"press {r['press']:10.1f}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "examples", "benchmark", "data",
                       "equil_water30.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out,
             positions=sim.positions_input_order(st),
             velocities=sim.velocities_input_order(st),
             box_h=np.asarray(st.box.h),
             box_origin=np.asarray(st.box.origin),
             temp=rows[-1]["temp"])
    print("wrote", os.path.normpath(out))


if __name__ == "__main__":
    main()
