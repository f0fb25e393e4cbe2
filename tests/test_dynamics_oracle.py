"""Frame-by-frame MD parity vs an independent numpy integrator.

The role of the reference's LAMMPS-vs-ASE test
(/root/reference/tests/test_lmp_with_ase.py:114-157): the engine's
velocity-Verlet / Nose-Hoover stepping, unit conversions, and kick
ordering are checked against `tests.reference_impl.ref_velocity_verlet`
— an integrator written independently in plain numpy — using the same
potential as a black-box force field. NVE-conservation tests cannot catch
a consistent force-scaling or kick-ordering bug; this can."""

import numpy as np
import jax
import jax.numpy as jnp

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.models import potential as potmod, zoo
from lammps_ani_tpu.ops import neighbors as nbops
from lammps_ani_tpu import units

from . import reference_impl as ri


def _setup():
    data = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                  origin=jnp.asarray(data.box_origin, jnp.float64))
    return data, pot, box


def _black_box_forces(pot, species, box):
    """pos -> (pe, F, virial) in kcal/mol units, fresh neighbors per call."""
    species_j = jnp.asarray(species)

    @jax.jit
    def fn(pos):
        ghosts = nbops.build_ghosts(pos, box, 7.1, 4096,
                                    nbops.image_shifts(1))
        nlist = nbops.build_neighbor_matrix_brute(pos, box, 7.1, 128,
                                                  ghosts)
        e, f, w = potmod.energy_forces_virial(pot, species_j, pos, box,
                                              nlist)
        c = units.HARTREE2KCALMOL
        return e * c, f * c, w * c

    def call(pos):
        e, f, w = fn(jnp.asarray(pos, jnp.float64))
        return float(e), np.asarray(f), np.asarray(w)

    return call


def _engine_frames(sim, state, n_steps):
    frames = []
    for _ in range(n_steps):
        state, rows = sim.run(state, 1, thermo_every=1)
        frames.append(dict(
            pos=sim.positions_input_order(state),
            vel=sim.velocities_input_order(state),
            force=sim.forces_input_order(state),
            pe=rows[-1]["pe"], temp=rows[-1]["temp"],
            press=rows[-1]["press"]))
    return frames


def _compare(frames_e, frames_r, box, data):
    L = np.diag(np.asarray(box.h))
    for k, (fe, fr) in enumerate(zip(frames_e, frames_r)):
        d = np.abs(fe["pos"] - fr["pos"])
        d = np.minimum(d, L - d)  # wrap-boundary tolerance
        assert d.max() < 1e-9, (k, d.max())
        np.testing.assert_allclose(fe["vel"], fr["vel"], atol=1e-10,
                                   err_msg=f"frame {k}")
        np.testing.assert_allclose(fe["force"], fr["force"], atol=1e-8,
                                   err_msg=f"frame {k}")
        np.testing.assert_allclose(fe["pe"], fr["pe"], rtol=1e-11)
        np.testing.assert_allclose(fe["temp"], fr["temp"], rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(fe["press"], fr["press"], rtol=1e-8,
                                   atol=1e-7)


def test_nve_matches_numpy_verlet():
    data, pot, box = _setup()
    sim = lat.Simulation(
        potential=pot, species=data.species,
        masses=data.masses_by_type[data.species],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                               ghost_capacity=4096, rebuild_every=1),
        dt=0.1, dtype=jnp.float64)
    state = sim.init_state(data.positions, box, temp=300.0, seed=3)
    vel0 = sim.velocities_input_order(state)

    frames_r = ri.ref_velocity_verlet(
        data.positions, vel0, data.masses_by_type[data.species],
        _black_box_forces(pot, data.species, box), dt=0.1, n_steps=4,
        box_h=np.asarray(box.h), origin=np.asarray(box.origin))
    frames_e = _engine_frames(sim, state, 4)
    _compare(frames_e, frames_r, box, data)


def test_nvt_matches_numpy_nose_hoover():
    from lammps_ani_tpu.md import integrate

    data, pot, box = _setup()
    sim = lat.Simulation(
        potential=pot, species=data.species,
        masses=data.masses_by_type[data.species],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                               ghost_capacity=4096, rebuild_every=1),
        dt=0.1, integrator=integrate.NoseHoover(temp=300.0, tdamp=20.0),
        dtype=jnp.float64)
    state = sim.init_state(data.positions, box, temp=300.0, seed=5)
    vel0 = sim.velocities_input_order(state)

    frames_r = ri.ref_velocity_verlet(
        data.positions, vel0, data.masses_by_type[data.species],
        _black_box_forces(pot, data.species, box), dt=0.1, n_steps=4,
        box_h=np.asarray(box.h), origin=np.asarray(box.origin),
        nh=dict(temp=300.0, tdamp=20.0, chain=3))
    frames_e = _engine_frames(sim, state, 4)
    _compare(frames_e, frames_r, box, data)
