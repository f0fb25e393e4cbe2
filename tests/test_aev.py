"""AEV parity vs the independent numpy reference (the torchani-analog oracle,
cf. reference test strategy SURVEY.md §4 level 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_ani_tpu.models import aev as aevmod
from lammps_ani_tpu.ops import neighbors as nbops

from . import fixtures, reference_impl


def _build(species, pos, box_h, origin, cutoff, periodic, dtype,
           k_max=64, ghost_cap=512, n_shell=1):
    pos = jnp.asarray(pos, dtype)
    species = jnp.asarray(species)
    if periodic:
        box = nbops.Box(h=jnp.asarray(box_h, dtype), origin=jnp.asarray(origin, dtype))
        shifts = nbops.image_shifts(n_shell)
    else:
        ext = float(np.abs(pos).max()) * 4 + 4 * cutoff
        box = nbops.Box.orthorhombic([ext] * 3, [-ext / 2] * 3, dtype)
        shifts = nbops.image_shifts(0)
        ghost_cap = 8
    ghosts = nbops.build_ghosts(pos, box, cutoff, ghost_cap, shifts)
    nlist = nbops.build_neighbor_matrix_brute(pos, box, cutoff, k_max, ghosts)
    assert not bool(nlist.overflowed)
    return species, pos, box, nlist


def _aev_from_nlist(spec, species, pos, box, nlist, **kw):
    species_ext = nbops.extended_species(species, nlist.ghosts)
    diff, dist = nbops.neighbor_displacements(pos, box, nlist)
    species_j = species_ext[nlist.idx]
    mask = nlist.mask & (species_j >= 0)
    return aevmod.compute_aev(spec, species, diff, dist, species_j, mask, **kw)


def test_aev_lengths():
    spec = aevmod.ani2x_aev_spec()
    assert spec.radial_length == 112
    assert spec.angular_length == 896
    assert spec.aev_length == 1008
    spec1x = aevmod.ani1x_aev_spec()
    assert spec1x.aev_length == 384


@pytest.mark.parametrize("seed", [0, 1])
def test_aev_cluster_vs_reference(seed):
    spec = aevmod.ani2x_aev_spec()
    species, pos = fixtures.random_cluster(n_atoms=14, num_species=7, seed=seed)
    ref = reference_impl.ref_aev(spec, species, pos, box_h=None)
    sp, p, box, nlist = _build(species, pos, None, None, spec.radial_cutoff,
                               periodic=False, dtype=jnp.float64)
    got = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist))
    np.testing.assert_allclose(got, ref, atol=1e-10, rtol=1e-9)


def test_aev_periodic_water_vs_reference():
    spec = aevmod.ani2x_aev_spec()
    ref = reference_impl.ref_aev(
        spec, fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        box_h=fixtures.WATER30_BOX, n_shell=1,
    )
    sp, p, box, nlist = _build(
        fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        fixtures.WATER30_BOX, fixtures.WATER30_ORIGIN,
        spec.radial_cutoff, periodic=True, dtype=jnp.float64,
    )
    got = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist))
    np.testing.assert_allclose(got, ref, atol=1e-10, rtol=1e-9)


def test_aev_fp32_close_to_fp64():
    spec = aevmod.ani2x_aev_spec()
    sp, p, box, nlist = _build(
        fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        fixtures.WATER30_BOX, fixtures.WATER30_ORIGIN,
        spec.radial_cutoff, periodic=True, dtype=jnp.float32,
    )
    got32 = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist))
    ref = reference_impl.ref_aev(
        spec, fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        box_h=fixtures.WATER30_BOX, n_shell=1,
    )
    np.testing.assert_allclose(got32, ref, atol=2e-4, rtol=1e-3)


def test_aev_atom_chunking_identical():
    spec = aevmod.ani2x_aev_spec()
    sp, p, box, nlist = _build(
        fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        fixtures.WATER30_BOX, fixtures.WATER30_ORIGIN,
        spec.radial_cutoff, periodic=True, dtype=jnp.float64,
    )
    a = _aev_from_nlist(spec, sp, p, box, nlist)
    b = _aev_from_nlist(spec, sp, p, box, nlist, atom_chunk=10)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_padding_rows_zero_aev():
    spec = aevmod.ani2x_aev_spec()
    species = np.concatenate([fixtures.WATER30_SPECIES, [-1, -1]]).astype(np.int32)
    pos = np.concatenate([fixtures.WATER30_POS, np.zeros((2, 3))])
    valid = jnp.asarray(species >= 0)
    p = jnp.asarray(pos, jnp.float64)
    box = nbops.Box(h=jnp.asarray(fixtures.WATER30_BOX, jnp.float64),
                    origin=jnp.asarray(fixtures.WATER30_ORIGIN, jnp.float64))
    ghosts = nbops.build_ghosts(p, box, spec.radial_cutoff, 512,
                                nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(
        p, box, spec.radial_cutoff, 64, ghosts, valid=valid)
    species_ext = nbops.extended_species(jnp.asarray(species), nlist.ghosts)
    diff, dist = nbops.neighbor_displacements(p, box, nlist)
    species_j = species_ext[nlist.idx]
    mask = nlist.mask & (species_j >= 0)
    got = np.asarray(aevmod.compute_aev(
        spec, jnp.asarray(species), diff, dist, species_j, mask))
    assert np.all(got[30:] == 0.0)
    # padded rows must not perturb real rows
    ref = reference_impl.ref_aev(
        spec, fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        box_h=fixtures.WATER30_BOX, n_shell=1)
    np.testing.assert_allclose(got[:30], ref, atol=1e-10, rtol=1e-9)


def test_aev_blocked_species_path_matches_generic():
    """The species-blocked fast path (static per-species caps) must equal
    the generic one-hot path exactly."""
    spec = aevmod.ani2x_aev_spec()
    sp, p, box, nlist = _build(
        fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        fixtures.WATER30_BOX, fixtures.WATER30_ORIGIN,
        spec.radial_cutoff, periodic=True, dtype=jnp.float64,
    )
    generic = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist))
    caps = (24, 0, 0, 12, 0, 0, 0)  # H and O only
    blocked = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist,
                                         angular_caps=caps))
    np.testing.assert_allclose(blocked, generic, atol=1e-12)
    # chunked + blocked
    blocked_c = np.asarray(_aev_from_nlist(
        spec, sp, p, box, nlist, angular_caps=caps, atom_chunk=8))
    np.testing.assert_allclose(blocked_c, generic, atol=1e-12)


def test_aev_blocked_multispecies_cluster():
    spec = aevmod.ani2x_aev_spec()
    species, pos = fixtures.random_cluster(n_atoms=20, num_species=7, seed=3)
    sp, p, box, nlist = _build(species, pos, None, None, spec.radial_cutoff,
                               periodic=False, dtype=jnp.float64)
    generic = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist))
    caps = tuple([20] * 7)
    blocked = np.asarray(_aev_from_nlist(spec, sp, p, box, nlist,
                                         angular_caps=caps))
    np.testing.assert_allclose(blocked, generic, atol=1e-12)


def test_angular_cap_deficit():
    spec = aevmod.ani2x_aev_spec()
    sp, p, box, nlist = _build(
        fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        fixtures.WATER30_BOX, fixtures.WATER30_ORIGIN,
        spec.radial_cutoff, periodic=True, dtype=jnp.float64,
    )
    species_ext = nbops.extended_species(sp, nlist.ghosts)
    diff, dist = nbops.neighbor_displacements(p, box, nlist)
    species_j = species_ext[nlist.idx]
    mask = nlist.mask & (species_j >= 0)
    ok_caps = (24, 0, 0, 12, 0, 0, 0)
    assert int(aevmod.angular_cap_deficit(spec, dist, species_j, mask,
                                          ok_caps)) <= 0
    tight = (2, 0, 0, 1, 0, 0, 0)
    assert int(aevmod.angular_cap_deficit(spec, dist, species_j, mask,
                                          tight)) > 0
