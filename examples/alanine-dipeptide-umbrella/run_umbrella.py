"""Umbrella sampling over a dihedral CV (reference: submit_umbrella.py).

The reference writes per-window PLUMED inputs and fans out Slurm jobs; here
windows run sequentially (or fan out across hosts) through md/bias.py.
"""
import numpy as np
import jax.numpy as jnp

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.md import bias, integrate
from lammps_ani_tpu.models import zoo

PHI = (4, 6, 8, 14)  # dihedral atom indices (input order)
data = ldio.read_lammps_data(
    "/root/reference/examples/alanine-dipeptide/alanine-dipeptide.vacuum.data")
pot = zoo.ani2x(num_models=1)

def make_sim(extra_force):
    return lat.Simulation(
        potential=pot, species=data.species, masses=data.atom_masses,
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=160,
                               ghost_capacity=4096, rebuild_every=10),
        dt=0.5, integrator=integrate.Langevin(temp=300.0, damp=100.0),
        extra_force=extra_force)

centers = np.linspace(-np.pi, np.pi, 24, endpoint=False)
box = lat.Box.from_lammps(*data.box_bounds.ravel(), *data.tilt)
samples = bias.run_windows(
    make_sim, data.positions, box, centers, k=40.0,
    cv_factory=lambda: bias.dihedral_cv(*PHI),
    steps_per_window=2000, sample_every=20, periodic=2 * np.pi)
np.savez("umbrella_samples.npz",
         centers=centers, **{f"w{i}": s for i, s in enumerate(samples)})
print("wrote umbrella_samples.npz (WHAM/MBAR-ready)")
