"""Golden energy/force/virial regression (reference test level 1,
src/ani_csrc/test_model.cpp: fixed 30-atom system + hardcoded expected
values). The fixture was generated from the deterministic synthetic zoo
models at f64 with the generic oracle paths; every optimization to the
fast paths must keep reproducing it bit-for-bit (f64) — this is what
catches silent numeric drift across rounds."""

import numpy as np
import jax.numpy as jnp
import pytest

import lammps_ani_tpu as lat
from lammps_ani_tpu.models import potential as potmod, zoo
from lammps_ani_tpu.ops import neighbors as nbops, nbr_grad

from . import fixtures

GOLDEN = np.load("tests/golden/water30_golden.npz")


def _system(dtype=jnp.float64):
    pos = jnp.asarray(fixtures.WATER30_POS, dtype)
    box = nbops.Box(h=jnp.asarray(fixtures.WATER30_BOX, dtype),
                    origin=jnp.asarray(fixtures.WATER30_ORIGIN, dtype))
    pos = nbops.wrap_positions(pos, box)
    sp = jnp.asarray(fixtures.WATER30_SPECIES)
    ghosts = nbops.build_ghosts(pos, box, 7.1, 1024, nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, 7.1, 128, ghosts)
    return sp, pos, box, nlist


@pytest.mark.parametrize("model,tag", [("ani2x", "ani2x"),
                                       ("ani1xnr", "ani1xnr")])
def test_golden_generic_path(model, tag):
    pot = getattr(zoo, model)(num_models=2, dtype=jnp.float64)
    sp, pos, box, nlist = _system()
    e, f, w = potmod.energy_forces_virial(pot, sp, pos, box, nlist)
    np.testing.assert_allclose(float(e), float(GOLDEN[f"{tag}_e"]),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(f), GOLDEN[f"{tag}_f"], atol=1e-11)
    np.testing.assert_allclose(np.asarray(w), GOLDEN[f"{tag}_w"], atol=1e-9)


@pytest.mark.parametrize("model,tag", [("ani2x", "ani2x"),
                                       ("ani1xnr", "ani1xnr")])
def test_golden_mirror_fast_path(model, tag):
    """The production path (mirror channels, split angular sub-list,
    blocked species AEV) must reproduce the same golden numbers."""
    import dataclasses

    pot = getattr(zoo, model)(num_models=2, dtype=jnp.float64)
    caps = ((24, 0, 0, 12, 0, 0, 0) if model == "ani2x"
            else (24, 0, 0, 12))
    pot = potmod.ANIPotential(
        spec=dataclasses.replace(pot.spec, angular_caps=caps),
        params=pot.params)
    sp, pos, box, nlist = _system()
    nbrs = nbr_grad.mirror_neighbors(
        nlist, 30, pos=pos, box=box,
        ang_cutoff=pot.spec.aev.angular_cutoff + 1.0, ang_cap=32,
        species=sp)
    assert bool(nbrs.ok)
    e, f, w = potmod.energy_forces_virial_mirror(pot, sp, pos, box, nbrs)
    np.testing.assert_allclose(float(e), float(GOLDEN[f"{tag}_e"]),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(f), GOLDEN[f"{tag}_f"], atol=1e-11)
    np.testing.assert_allclose(np.asarray(w), GOLDEN[f"{tag}_w"], atol=1e-9)


def test_golden_fp32_within_reference_bar():
    """fp32 vs f64 golden with identical weights: must sit within the
    reference's single-precision parity bar (1.2e-4 relative,
    models/test_models.py:213-214; observed here ~5e-8 energy / 2.4e-6
    force relative). Also guards against an accidental bf16 matmul
    default sneaking into the force path."""
    pot = zoo.ani2x(num_models=2, dtype=jnp.float32)
    sp, pos, box, nlist = _system(jnp.float32)
    e, f, w = potmod.energy_forces_virial(pot, sp, pos, box, nlist)
    e_ref = float(GOLDEN["ani2x_e"])
    assert abs(float(e) - e_ref) / abs(e_ref) < 1e-6
    f_ref = GOLDEN["ani2x_f"]
    f_err = np.abs(np.asarray(f) - f_ref).max()
    assert f_err / np.abs(f_ref).max() < 1e-4, f_err
