"""Real-ANI-2x golden regression — one checkpoint download away.

The reference's level-1 test bakes real-model constants into
/root/reference/src/ani_csrc/test_model.cpp:84-137 (30-atom 10-water
cluster, expected energy -763.9931790697472 Ha, 90 force components,
bars 3e-4 kcal/mol single / 1e-8 double, :164). This module parses those
constants straight out of the reference source and runs them against a
REAL ANI-2x checkpoint when one is provided via

    LAT_ANI2X_WEIGHTS=/path/to/ani2x_state_dict.pt pytest tests/test_real_weights.py

(the torchani naming convention handled by models/loaders.py:39-45; see
`loaders.load_torch_state_dict` for the accepted formats). No trained
weights ship in this environment, so by default only the fixture parsing
and the synthetic-weight pipeline plumbing run."""

import os
import re

import numpy as np
import jax.numpy as jnp
import pytest

import lammps_ani_tpu as lat
from lammps_ani_tpu.models import potential as potmod, zoo
from lammps_ani_tpu.ops import neighbors as nbops
from lammps_ani_tpu import units

_CPP = "/root/reference/src/ani_csrc/test_model.cpp"


def _parse_vector(src, name):
    m = re.search(name + r"\s*=\s*\{(.*?)\};", src, re.S)
    assert m, f"fixture vector {name} not found in {_CPP}"
    return np.array([float(x) for x in m.group(1).replace("\n", " ")
                     .split(",") if x.strip()])


def load_fixture():
    src = open(_CPP).read()
    coords = _parse_vector(src, r"coords").reshape(-1, 3)
    species = _parse_vector(src, r"species").astype(np.int32)
    force = _parse_vector(src, r"expected_force").reshape(-1, 3)
    m = re.search(r"expected_energy\s*=\s*(-?\d+\.\d+)", src)
    energy_ha = float(m.group(1))
    return coords, species, force, energy_ha


def _compute(pot, coords, species):
    """(energy [Ha], forces [kcal/mol/A]) for the vacuum cluster."""
    dtype = jnp.float64
    pos = jnp.asarray(coords, dtype)
    # big box, no periodic images (the reference fixture is a vacuum
    # cluster with a plain half neighbor list)
    box = lat.Box.orthorhombic([1e3, 1e3, 1e3], origin=(-500.0,) * 3,
                               dtype=dtype)
    ghosts = nbops.build_ghosts(pos, box, 5.1, 8,
                                nbops.image_shifts(0))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, 5.1, 64, ghosts)
    e, f = potmod.energy_forces(pot, jnp.asarray(species), pos, box, nlist)
    return float(e), np.asarray(f) * units.HARTREE2KCALMOL


def test_fixture_parses():
    coords, species, force, energy_ha = load_fixture()
    assert coords.shape == (30, 3)
    assert species.shape == (30,) and set(species) == {0, 3}
    assert force.shape == (30, 3)
    np.testing.assert_allclose(energy_ha, -763.9931790697472)


def test_pipeline_runs_on_fixture_geometry():
    """The exact golden geometry runs through the potential (synthetic
    weights): guards the on-ramp plumbing while no checkpoint exists."""
    coords, species, _, _ = load_fixture()
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    e, f = _compute(pot, coords, species)
    assert np.isfinite(e) and np.isfinite(f).all()
    assert f.shape == (30, 3)


@pytest.mark.skipif("LAT_ANI2X_WEIGHTS" not in os.environ,
                    reason="no real ANI-2x checkpoint in this environment "
                    "(set LAT_ANI2X_WEIGHTS to a torchani state dict)")
def test_real_ani2x_matches_reference_golden():
    from lammps_ani_tpu.models import loaders

    coords, species, force_ref, energy_ha = load_fixture()
    pot = loaders.load_torch_state_dict(os.environ["LAT_ANI2X_WEIGHTS"],
                                        arch="ani2x")
    pot = potmod.ANIPotential(
        spec=pot.spec,
        params=[[{k: jnp.asarray(v, jnp.float64) for k, v in l.items()}
                 for l in layers] for layers in pot.params])
    e, f = _compute(pot, coords, species)
    # reference bars: test_model.cpp:164 (double path)
    np.testing.assert_allclose(e, energy_ha, atol=1e-8)
    np.testing.assert_allclose(f, force_ref, atol=1e-8)
