"""Pallas radial AEV kernel vs the XLA cell-roll channel and the oracle.

The cuaev-vs-pyaev parity pattern (/root/reference/models/test_models.py:
32-35): the Pallas kernel (ops/aev_pallas.py) is the production TPU path;
the XLA cell-roll channel and the generic neighbor-matrix path are its
oracles. On CPU the kernel runs in interpret mode, where f64 is available
and parity is summation-order-tight."""

import numpy as np
import jax
import jax.numpy as jnp

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.models import aev as aevmod
from lammps_ani_tpu.ops import aev_pallas as apmod
from lammps_ani_tpu.ops import cell_roll as crmod
from lammps_ani_tpu.ops import neighbors as nbops

from .test_cell_roll import _radial_reference, _system


def _grid_bins(spec, species, pos, box, cap=24):
    grid = crmod.RollGrid.for_box(np.asarray(box.h), spec.radial_cutoff, cap)
    assert grid is not None
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) <= grid.cap
    return grid, bins


def test_pallas_radial_matches_oracle_f64():
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    ref = np.asarray(_radial_reference(spec, species, pos, box))
    grid, bins = _grid_bins(spec, species, pos, box)
    got = np.asarray(apmod.radial_aev_pallas(
        spec, grid, bins, pos, box, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-10, rtol=1e-8)


def test_pallas_radial_f32_no_underflow():
    """f32 parity vs the f32 oracle — guards the production dtype.

    Regression: the uniform-grid radial recurrence (t0 * B^k) UNDERFLOWS
    in f32 for pairs beyond ~2.9 A (t0 = exp(-19.7 x^2) = 0) and can
    never recover, silently zeroing every outer radial shell while all
    f64 tests pass. The kernels use direct per-shift exponentials."""
    spec = aevmod.ani2x_aev_spec()
    species, pos64, box64, data = _system()
    pos = pos64.astype(jnp.float32)
    box = nbops.Box(h=box64.h.astype(jnp.float32),
                    origin=box64.origin.astype(jnp.float32))
    grid, bins = _grid_bins(spec, species, pos, box)
    ref = np.asarray(_radial_reference(spec, species, pos, box))
    got = np.asarray(apmod.radial_aev_pallas(
        spec, grid, bins, pos, box, interpret=True))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, atol=5e-6, rtol=1e-5)

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (spec.radial_length,), jnp.float32)
    g_pal = jax.grad(lambda p: jnp.sum(apmod.radial_aev_pallas(
        spec, grid, bins, p, box, interpret=True) @ w))(pos)
    g_ref = jax.grad(lambda p: jnp.sum(
        _radial_reference(spec, species, p, box) @ w))(pos)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=2e-4)


def test_pallas_angular_f32_no_underflow():
    """f32 angular parity (same underflow class in the e_j recurrence)."""
    spec, species, pos64, box64, grid, bins, caps = _angular_setup()
    pos = pos64.astype(jnp.float32)
    box = nbops.Box(h=box64.h.astype(jnp.float32),
                    origin=box64.origin.astype(jnp.float32))
    bins32 = crmod.build_bins(grid, pos, species, box)
    ref = np.asarray(_angular_reference(spec, species, pos, box))
    got, deficit = apmod.angular_aev_pallas(
        spec, grid, bins32, pos, box, caps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


def test_pallas_radial_species_pruning():
    """species_counts prunes absent species' channels to exact zeros while
    matching the full evaluation on present ones."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    grid, bins = _grid_bins(spec, species, pos, box)
    counts = [int((np.asarray(species) == s).sum())
              for s in range(spec.num_species)]
    full = np.asarray(apmod.radial_aev_pallas(
        spec, grid, bins, pos, box, interpret=True))
    pruned = np.asarray(apmod.radial_aev_pallas(
        spec, grid, bins, pos, box, species_counts=counts, interpret=True))
    np.testing.assert_array_equal(full, pruned)


def test_pallas_radial_forces_and_box_cotangent():
    """Custom-VJP force + dh vs plain autodiff of the oracle path (f64)."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    grid, bins = _grid_bins(spec, species, pos, box)

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (spec.radial_length,), jnp.float64)

    def e_pallas(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(apmod.radial_aev_pallas(
            spec, grid, bins, p, b, interpret=True) @ w)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(_radial_reference(spec, species, p, b) @ w)

    g_pal, gh_pal = jax.grad(e_pallas, argnums=(0, 1))(pos, box.h)
    g_ref, gh_ref = jax.grad(e_ref, argnums=(0, 1))(pos, box.h)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gh_pal), np.asarray(gh_ref),
                               atol=1e-8)


def _angular_reference(spec, species, pos, box):
    """Full AEV via the generic path; returns the angular block."""
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
    return aev[:, spec.radial_length:]


def _angular_setup(rep=(3, 3, 3), cap=8):
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system(rep=rep)
    # fine grid: bin side >= Rca (per-step in-kernel re-compaction needs no
    # skin at the compaction level)
    grid = crmod.RollGrid.for_box(np.asarray(box.h), spec.angular_cutoff,
                                  cap)
    assert grid is not None
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) <= grid.cap
    caps = []
    sp = np.asarray(species)
    for s in range(spec.num_species):
        if (sp == s).sum() == 0:
            caps.append(0)
            continue
        caps.append(12 if s == 0 else 8)
    return spec, species, pos, box, grid, bins, tuple(caps)


def test_pallas_angular_matches_oracle_f64():
    spec, species, pos, box, grid, bins, caps = _angular_setup()
    ref = np.asarray(_angular_reference(spec, species, pos, box))
    got, deficit = apmod.angular_aev_pallas(
        spec, grid, bins, pos, box, caps, interpret=True)
    assert float(deficit) <= 0, float(deficit)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10, rtol=1e-8)


def test_pallas_angular_deficit_detects_truncation():
    spec, species, pos, box, grid, bins, caps = _angular_setup()
    tight = tuple(1 if c else 0 for c in caps)
    _, deficit = apmod.angular_aev_pallas(
        spec, grid, bins, pos, box, tight, interpret=True)
    assert float(deficit) > 0


def test_pallas_angular_forces_and_box_cotangent():
    spec, species, pos, box, grid, bins, caps = _angular_setup()
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (spec.angular_length,), jnp.float64)

    def e_pallas(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        out, _ = apmod.angular_aev_pallas(spec, grid, bins, p, b, caps,
                                          interpret=True)
        return jnp.sum(out @ w)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(_angular_reference(spec, species, p, b) @ w)

    g_pal, gh_pal = jax.grad(e_pallas, argnums=(0, 1))(pos, box.h)
    g_ref, gh_ref = jax.grad(e_ref, argnums=(0, 1))(pos, box.h)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gh_pal), np.asarray(gh_ref),
                               atol=1e-8)


def test_pallas_radial_shell2_fine_grid():
    """shell=2 on a bin side of ~cutoff/2 must match the oracle — the
    shared-fine-grid configuration of the production engine."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system(rep=(3, 3, 3))
    grid = crmod.RollGrid.for_box(np.asarray(box.h), spec.angular_cutoff,
                                  10)
    assert grid is not None
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) <= grid.cap
    ref = np.asarray(_radial_reference(spec, species, pos, box))
    got = np.asarray(apmod.radial_aev_pallas(
        spec, grid, bins, pos, box, interpret=True, shell=2))
    np.testing.assert_allclose(got, ref, atol=1e-10, rtol=1e-8)

    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (spec.radial_length,), jnp.float64)

    def e_pallas(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(apmod.radial_aev_pallas(
            spec, grid, bins, p, b, interpret=True, shell=2) @ w)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(_radial_reference(spec, species, p, b) @ w)

    g_pal, gh_pal = jax.grad(e_pallas, argnums=(0, 1))(pos, box.h)
    g_ref, gh_ref = jax.grad(e_ref, argnums=(0, 1))(pos, box.h)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gh_pal), np.asarray(gh_ref),
                               atol=1e-8)


def test_simulation_full_pallas_matches_mirror(monkeypatch):
    """4 MD steps on the full Pallas path (both AEV channels from the
    kernels, no neighbor matrix) must reproduce the mirror-path engine
    trajectory (f64, interpret mode on CPU)."""
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        2, 2, 2)  # 16 A box -> 3x3x3 fine grid at side 4.5
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(impl):
        monkeypatch.setenv("LAT_ROLL_IMPL", impl)
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64,
            cellroll=impl.startswith("pallas"))
        if impl == "pallas_full":
            assert sim._roll_impl == "pallas_full"
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        if impl == "pallas_full":
            assert sim._pallas_roll, "pallas roll path not active"
        st, rows = sim.run(st, 4, thermo_every=2)
        return (sim.positions_input_order(st), float(st.pe),
                np.asarray(st.virial))

    p_pal, e_pal, w_pal = run("pallas_full")
    p_ref, e_ref, w_ref = run("mirror-off")
    np.testing.assert_allclose(e_pal, e_ref, rtol=1e-11)
    np.testing.assert_allclose(p_pal, p_ref, atol=1e-10)
    np.testing.assert_allclose(w_pal, w_ref, atol=1e-8)


def test_simulation_full_pallas_unsorted_species(monkeypatch):
    """sort_species=False on the full Pallas path (regression: the masked
    MLP branch of atomic_energies_roll referenced an undefined name and
    crashed at trace time)."""
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        2, 2, 2)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    # explicit velocities in CALLER order: init_state's thermal draw happens
    # after the internal reorder, so sorted/unsorted runs would otherwise
    # start from physically different states
    rng = np.random.default_rng(3)
    vel0 = 0.002 * rng.standard_normal((data.n_atoms, 3))

    def run(sort):
        monkeypatch.setenv("LAT_ROLL_IMPL", "pallas_full")
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64, sort_species=sort, cellroll=True)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, vel=vel0)
        assert sim._pallas_roll, "pallas roll path not active"
        st, _ = sim.run(st, 2)
        return sim.positions_input_order(st), float(st.pe)

    p_u, e_u = run(False)
    p_s, e_s = run(True)
    np.testing.assert_allclose(e_u, e_s, rtol=1e-11)
    np.testing.assert_allclose(p_u, p_s, atol=1e-10)


def test_pallas_radial_small_ncells_wrap():
    """ncells == 3 exercises every wrap branch (each cell touches both
    periodic faces along each axis)."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system(rep=(3, 3, 3))
    grid = crmod.RollGrid.for_box(np.asarray(box.h), 7.9, 32)
    assert grid is not None and grid.ncells == (3, 3, 3)
    bins = crmod.build_bins(grid, pos, species, box)
    ref = np.asarray(_radial_reference(spec, species, pos, box))
    got = np.asarray(apmod.radial_aev_pallas(
        spec, grid, bins, pos, box, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-10, rtol=1e-8)
