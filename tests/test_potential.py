"""Potential-level tests: NN parity vs numpy oracle, force correctness via
finite differences, virial consistency, ensemble semantics (reference test
strategy SURVEY.md §4 levels 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_ani_tpu.models import aev as aevmod
from lammps_ani_tpu.models import networks as netmod
from lammps_ani_tpu.models import potential as potmod
from lammps_ani_tpu.models import repulsion as repmod
from lammps_ani_tpu.ops import neighbors as nbops

from . import fixtures, reference_impl


def make_potential(num_models=2, dtype=jnp.float64, repulsion=False,
                   atom_chunk=None):
    aev_spec = aevmod.ani2x_aev_spec()
    net_spec = netmod.NetworkSpec(aev_length=aev_spec.aev_length,
                                  hidden=netmod.ANI2X_HIDDEN)
    params = netmod.init_network_params(
        net_spec, num_models, jax.random.PRNGKey(7), dtype)
    spec = potmod.ANISpec(
        aev=aev_spec,
        net=net_spec,
        shifter=netmod.EnergyShifter(netmod.ANI2X_SELF_ENERGIES),
        repulsion=repmod.RepulsionSpec.for_symbols(
            "H C N O S F Cl".split(), cutoff=5.1) if repulsion else None,
        atom_chunk=atom_chunk,
    )
    return potmod.ANIPotential(spec=spec, params=params)


def water_system(dtype=jnp.float64, cutoff=5.1):
    species = jnp.asarray(fixtures.WATER30_SPECIES)
    pos = jnp.asarray(fixtures.WATER30_POS, dtype)
    box = nbops.Box(h=jnp.asarray(fixtures.WATER30_BOX, dtype),
                    origin=jnp.asarray(fixtures.WATER30_ORIGIN, dtype))
    ghosts = nbops.build_ghosts(pos, box, cutoff, 512, nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, cutoff, 64, ghosts)
    return species, pos, box, nlist


def test_energy_matches_numpy_oracle():
    pot = make_potential()
    species, pos, box, nlist = water_system()
    e = potmod.potential_energy(pot, species, pos, box, nlist)

    spec = pot.spec
    ref_aev = reference_impl.ref_aev(
        spec.aev, fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        box_h=fixtures.WATER30_BOX, n_shell=1)
    np_params = jax.tree.map(np.asarray, pot.params)
    ref_nn = reference_impl.ref_atomic_energies(
        np_params, spec.net, fixtures.WATER30_SPECIES, ref_aev)
    sae = np.asarray(netmod.ANI2X_SELF_ENERGIES)[fixtures.WATER30_SPECIES]
    ref_e = ref_nn.sum() + sae.sum()
    np.testing.assert_allclose(float(e), ref_e, rtol=1e-10)


def test_atomic_energies_sum_to_total():
    pot = make_potential()
    species, pos, box, nlist = water_system()
    ae = potmod.atomic_energies(pot, species, pos, box, nlist)
    e = potmod.potential_energy(pot, species, pos, box, nlist)
    np.testing.assert_allclose(float(jnp.sum(ae)), float(e), rtol=1e-12)


@pytest.mark.parametrize("repulsion", [False, True])
def test_forces_match_finite_difference(repulsion):
    pot = make_potential(repulsion=repulsion)
    species, pos, box, nlist = water_system()
    e, f = potmod.energy_forces(pot, species, pos, box, nlist)
    f = np.asarray(f)

    # fd noise floor: E ~ -763 Ha at ~1e-16 relative -> ~8e-14 absolute;
    # divided by 2*eps this bounds achievable fd accuracy, so eps and atol
    # are sized for the damped synthetic force scale (~1e-2 Ha/A)
    eps = 1e-5
    pos_np = np.asarray(pos)
    for (i, d) in [(0, 0), (1, 2), (7, 1), (29, 0), (15, 2)]:
        pp, pm = pos_np.copy(), pos_np.copy()
        pp[i, d] += eps
        pm[i, d] -= eps
        ep = potmod.potential_energy(pot, species, jnp.asarray(pp), box, nlist)
        em = potmod.potential_energy(pot, species, jnp.asarray(pm), box, nlist)
        fd = -(float(ep) - float(em)) / (2 * eps)
        np.testing.assert_allclose(f[i, d], fd, rtol=1e-4, atol=5e-8)


def test_virial_matches_strain_finite_difference():
    pot = make_potential()
    species, pos, box, nlist = water_system()
    e, f, w = potmod.energy_forces_virial(pot, species, pos, box, nlist)
    w = np.asarray(w)
    assert np.allclose(w, w.T)

    eps = 1e-5
    pos_np, h_np = np.asarray(pos), np.asarray(box.h)
    for (a, b) in [(0, 0), (1, 1), (2, 2), (0, 1)]:
        strain = np.zeros((3, 3))
        strain[a, b] = strain[b, a] = eps
        def e_at(s):
            d = np.eye(3) + s
            return float(potmod.potential_energy(
                pot, species, jnp.asarray(pos_np @ d),
                nbops.Box(h=jnp.asarray(h_np @ d), origin=box.origin), nlist))
        fd = -(e_at(strain) - e_at(-strain)) / (2 * eps)
        # symmetric perturbation hits both (a,b) and (b,a) off-diagonal
        expected = w[a, b] if a == b else 2 * w[a, b]
        np.testing.assert_allclose(expected, fd, rtol=1e-3, atol=5e-8)


def test_select_models_and_ensemble_mean():
    pot = make_potential(num_models=4)
    species, pos, box, nlist = water_system()
    e4 = potmod.potential_energy(pot, species, pos, box, nlist)

    pot1 = pot.select_models(1)
    assert pot1.num_models == 1
    e1 = potmod.potential_energy(pot1, species, pos, box, nlist)
    # mean over ensemble: 4-model energy is the average of the singles
    singles = []
    for i in range(4):
        p_i = potmod.ANIPotential(
            spec=pot.spec,
            params=jax.tree.map(lambda x, i=i: x[i:i + 1], pot.params))
        singles.append(float(potmod.potential_energy(
            p_i, species, pos, box, nlist)))
    np.testing.assert_allclose(float(e4), np.mean(singles), rtol=1e-12)
    np.testing.assert_allclose(float(e1), singles[0], rtol=1e-12)


def test_sorted_species_path_matches_masked():
    pot = make_potential()
    species, pos, box, nlist = water_system()
    e_masked = potmod.potential_energy(pot, species, pos, box, nlist)

    order = np.argsort(np.asarray(species), kind="stable")
    sp_sorted = jnp.asarray(np.asarray(species)[order])
    pos_sorted = jnp.asarray(np.asarray(pos)[order])
    counts = [int((np.asarray(species) == s).sum()) for s in range(7)]
    ghosts = nbops.build_ghosts(pos_sorted, box, 5.1, 512, nbops.image_shifts(1))
    nlist_s = nbops.build_neighbor_matrix_brute(pos_sorted, box, 5.1, 64, ghosts)
    e_sorted = potmod.potential_energy(
        pot, sp_sorted, pos_sorted, box, nlist_s, species_counts=counts)
    np.testing.assert_allclose(float(e_sorted), float(e_masked), rtol=1e-12)


def test_ghost_semantics_energy_invariant_under_box_shift():
    """Translating all atoms (mod PBC wrap) must not change the energy."""
    pot = make_potential()
    species, pos, box, nlist = water_system()
    e0 = potmod.potential_energy(pot, species, pos, box, nlist)

    shift = jnp.asarray([1.3, -2.1, 0.7])
    pos2 = nbops.wrap_positions(pos + shift, box)
    ghosts = nbops.build_ghosts(pos2, box, 5.1, 512, nbops.image_shifts(1))
    nlist2 = nbops.build_neighbor_matrix_brute(pos2, box, 5.1, 64, ghosts)
    e1 = potmod.potential_energy(pot, species, pos2, box, nlist2)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-9)


def test_mirror_path_matches_ext_path():
    """The scatter-free mirror force path must reproduce the reference
    (gather/scatter autodiff) path bit-for-bit in f64: energies, forces,
    and virial."""
    import jax
    from lammps_ani_tpu.ops import nbr_grad

    from lammps_ani_tpu.models import zoo
    pot = zoo.ani1xnr(num_models=2, dtype=jnp.float64)  # incl. repulsion
    species = jnp.asarray(np.where(fixtures.WATER30_SPECIES == 3, 3,
                                   fixtures.WATER30_SPECIES))
    pos = jnp.asarray(fixtures.WATER30_POS, jnp.float64)
    box = nbops.Box(h=jnp.asarray(fixtures.WATER30_BOX, jnp.float64),
                    origin=jnp.asarray(fixtures.WATER30_ORIGIN, jnp.float64))
    pos = nbops.wrap_positions(pos, box)
    ghosts = nbops.build_ghosts(pos, box, 7.2, 1024, nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, 7.2, 128, ghosts)
    assert not bool(nlist.overflowed)

    e1, f1, w1 = potmod.energy_forces_virial(pot, species, pos, box, nlist)

    nbrs = nbr_grad.mirror_neighbors(nlist, pos.shape[0])
    assert bool(nbrs.ok)
    e2, f2, w2 = potmod.energy_forces_virial_mirror(
        pot, species, pos, box, nbrs)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-9)
