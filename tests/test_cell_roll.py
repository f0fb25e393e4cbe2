"""Cell-roll (gather-free) radial channel vs the generic oracle path.

The round-2 flagship layout (docs/DESIGN.md): radial AEV and its force
backward with zero index gathers. Must match the compacted-list path to
summation-order noise in f64, including forces and the box cotangent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.models import aev as aevmod, zoo
from lammps_ani_tpu.ops import cell_roll as crmod
from lammps_ani_tpu.ops import neighbors as nbops


def _system(rep=(3, 3, 3), dtype=jnp.float64):
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"), *rep)
    pos = jnp.asarray(data.positions, dtype)
    box = lat.Box(h=jnp.asarray(data.box_h, dtype),
                  origin=jnp.asarray(data.box_origin, dtype))
    pos = nbops.wrap_positions(pos, box)
    return jnp.asarray(data.species), pos, box, data


def _radial_reference(spec, species, pos, box):
    """Radial AEV block via the generic neighbor-matrix path."""
    ghosts = nbops.build_ghosts(pos, box, spec.radial_cutoff, 16384,
                                nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(
        pos, box, spec.radial_cutoff, 160, ghosts)
    assert not bool(nlist.overflowed)
    species_ext = nbops.extended_species(species, nlist.ghosts)
    diff, dist = nbops.neighbor_displacements(pos, box, nlist)
    species_j = species_ext[nlist.idx]
    mask = nlist.mask & (species_j >= 0)
    aev = aevmod.compute_aev(spec, species, diff, dist, species_j, mask)
    return aev[:, : spec.radial_length]


def test_cellroll_radial_matches_generic():
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    ref = np.asarray(_radial_reference(spec, species, pos, box))

    grid = crmod.RollGrid.for_box(np.asarray(box.h), spec.radial_cutoff, 24)
    assert grid is not None
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) <= grid.cap
    got = np.asarray(crmod.radial_aev_cellroll(spec, grid, bins, pos, box))
    np.testing.assert_allclose(got, ref, atol=1e-10, rtol=1e-8)


def test_cellroll_radial_forces_match():
    """grad through the cell-roll channel (rolled transpose, no scatters in
    the pos path beyond the single n-scatter) == grad through the oracle."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    grid = crmod.RollGrid.for_box(np.asarray(box.h), spec.radial_cutoff, 24)
    bins = crmod.build_bins(grid, pos, species, box)

    # a fixed random contraction makes a scalar objective over the AEV
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (spec.radial_length,), jnp.float64)

    def e_roll(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(crmod.radial_aev_cellroll(spec, grid, bins, p, b) @ w)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(_radial_reference(spec, species, p, b) @ w)

    g_roll, gh_roll = jax.grad(e_roll, argnums=(0, 1))(pos, box.h)
    g_ref, gh_ref = jax.grad(e_ref, argnums=(0, 1))(pos, box.h)
    np.testing.assert_allclose(np.asarray(g_roll), np.asarray(g_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gh_roll), np.asarray(gh_ref),
                               atol=1e-8)


def test_cellroll_bins_overflow_detected():
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    grid = crmod.RollGrid.for_box(np.asarray(box.h), spec.radial_cutoff, 2)
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) > 2


def test_simulation_with_cellroll_matches_default():
    """4 MD steps with the experimental cell-roll radial channel must
    reproduce the default engine trajectory (f64)."""
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        2, 2, 2)  # 16 A box: smallest that fits a 3x3x3 roll grid
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(cellroll):
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64, cellroll=cellroll)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        st, _ = sim.run(st, 4)
        return sim.positions_input_order(st), float(st.pe)

    p_roll, e_roll = run(True)
    p_ref, e_ref = run(False)
    np.testing.assert_allclose(e_roll, e_ref, rtol=1e-11)
    np.testing.assert_allclose(p_roll, p_ref, atol=1e-10)
