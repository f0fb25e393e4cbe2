"""Cell-list neighbor build vs brute-force ground truth.

Mirrors the role of LAMMPS's binned-neighbor correctness guarantees that
the reference inherits (SURVEY.md L5); here the brute O(n^2) builder is the
oracle and the O(n) cell list must match it exactly (same neighbor sets,
same energies/forces)."""

import numpy as np
import jax
import jax.numpy as jnp

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.models import potential as potmod, zoo
from lammps_ani_tpu.ops import cell_list as clmod
from lammps_ani_tpu.ops import neighbors as nbops

from . import fixtures


def _neighbor_sets(pos, nlist):
    """Per-atom sets of (extended-index) neighbors."""
    idx = np.asarray(nlist.idx)
    mask = np.asarray(nlist.mask)
    return [set(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


def _build_both(data, rlist=7.1, k_max=160):
    dtype = jnp.float64
    pos = jnp.asarray(data.positions, dtype)
    box = lat.Box(h=jnp.asarray(data.box_h, dtype),
                  origin=jnp.asarray(data.box_origin, dtype))
    pos = nbops.wrap_positions(pos, box)
    ghosts = nbops.build_ghosts(pos, box, rlist, 8192, nbops.image_shifts(1))
    brute = nbops.build_neighbor_matrix_brute(pos, box, rlist, k_max, ghosts)
    grid = clmod.CellGrid.for_box(np.asarray(box.h), rlist, cell_capacity=64)
    assert grid is not None, "box should be large enough for a cell grid"
    cells = clmod.build_neighbor_matrix_cells(
        pos, box, rlist, k_max, ghosts, grid=grid, atom_chunk=128)
    return pos, box, brute, cells


def test_cell_list_matches_brute():
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    pos, box, brute, cells = _build_both(data)
    assert not bool(brute.overflowed) and not bool(cells.overflowed)
    assert int(brute.max_count) == int(cells.max_count)
    sets_b = _neighbor_sets(pos, brute)
    sets_c = _neighbor_sets(pos, cells)
    for i, (a, b) in enumerate(zip(sets_b, sets_c)):
        assert a == b, f"atom {i}: brute-only {a - b}, cells-only {b - a}"


def test_cell_list_energy_force_parity():
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    pos, box, brute, cells = _build_both(data)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    species = jnp.asarray(data.species)
    e_b, f_b = potmod.energy_forces(pot, species, pos, box, brute)
    e_c, f_c = potmod.energy_forces(pot, species, pos, box, cells)
    np.testing.assert_allclose(float(e_b), float(e_c), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_c), atol=1e-12)


def test_cell_table_overflow_detected():
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    dtype = jnp.float64
    pos = jnp.asarray(data.positions, dtype)
    box = lat.Box(h=jnp.asarray(data.box_h, dtype),
                  origin=jnp.asarray(data.box_origin, dtype))
    pos = nbops.wrap_positions(pos, box)
    ghosts = nbops.build_ghosts(pos, box, 7.1, 8192, nbops.image_shifts(1))
    grid = clmod.CellGrid.for_box(np.asarray(box.h), 7.1, cell_capacity=2)
    nlist = clmod.build_neighbor_matrix_cells(
        pos, box, 7.1, 160, ghosts, grid=grid)
    assert bool(nlist.overflowed)


def test_simulation_with_cell_list_matches_brute():
    """4 MD steps with use_cell_list=True must reproduce the brute run."""
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(use_cells):
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=160,
                                   ghost_capacity=8192, rebuild_every=2,
                                   use_cell_list=use_cells,
                                   cell_capacity=64),
            dt=0.2, dtype=jnp.float64)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        st, _ = sim.run(st, 4)
        return sim.positions_input_order(st)

    np.testing.assert_allclose(run(True), run(False), atol=1e-11)
