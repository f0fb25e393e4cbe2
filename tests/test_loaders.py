"""Weight-import round trips: torch state_dict and NeuroChem formats.

The reference's model zoo loads torchani builtins and NeuroChem trees
(/root/reference/models/ani_models.py); here synthetic weights exported to
those formats must import back bit-exactly and produce identical energies.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_ani_tpu.models import loaders, potential as potmod, zoo
from lammps_ani_tpu.ops import neighbors as nbops

from . import fixtures


def _energy(pot):
    dtype = jnp.float32
    pos = jnp.asarray(fixtures.WATER30_POS, dtype)
    box = nbops.Box(h=jnp.asarray(fixtures.WATER30_BOX, dtype),
                    origin=jnp.asarray(fixtures.WATER30_ORIGIN, dtype))
    pos = nbops.wrap_positions(pos, box)
    species = jnp.asarray(fixtures.WATER30_SPECIES)
    ghosts = nbops.build_ghosts(pos, box, 5.1, 1024, nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, 5.1, 128, ghosts)
    return float(potmod.potential_energy(pot, species, pos, box, nlist))


def test_torch_state_dict_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    pot = zoo.ani2x(num_models=3)
    path = tmp_path / "ani2x_sd.pt"
    loaders.export_torch_state_dict(pot, path)
    pot2 = loaders.load_torch_state_dict(path, arch="ani2x")
    for a, b in zip(
        [l for sp in pot.params for l in sp],
        [l for sp in pot2.params for l in sp],
    ):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))
    assert _energy(pot) == _energy(pot2)


def test_state_dict_key_variants():
    pot = zoo.ani2x(num_models=2)
    w0 = np.asarray(pot.params[0][0]["w"])
    sd = {}
    for s, layers in enumerate(pot.params):
        sym = zoo.ANI2X_SYMBOLS[s]
        for li, layer in enumerate(layers):
            w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
            for m in range(2):
                # "model.neural_networks.{m}.{S}.layers.{i}" variant
                k = f"model.neural_networks.{m}.{sym}.layers.{2 * li}"
                sd[k + ".weight"] = w[m].T
                sd[k + ".bias"] = b[m]
    pot2 = loaders.load_torch_state_dict(sd, arch="ani2x")
    np.testing.assert_array_equal(np.asarray(pot2.params[0][0]["w"]), w0)


def test_neurochem_roundtrip(tmp_path):
    pot = zoo.ani1xnr(num_models=2)
    symbols = zoo.ANI1X_SYMBOLS
    # write a synthetic NeuroChem tree from our params
    for m in range(2):
        for s, sym in enumerate(symbols):
            d = tmp_path / f"train{m}" / "networks" / f"ANN-{sym}"
            d.mkdir(parents=True)
            layers = pot.params[s]
            for li, layer in enumerate(layers):
                w = np.asarray(layer["w"][m]).T.astype("<f4")  # [out, in]
                b = np.asarray(layer["b"][m]).astype("<f4")
                w.tofile(d / f"l{li}.wparam")
                b.tofile(d / f"l{li}.bparam")
    pot2 = loaders.load_neurochem(tmp_path, symbols, arch="ani1x")
    for a, b in zip(
        [l for sp in pot.params for l in sp],
        [l for sp in pot2.params for l in sp],
    ):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                   atol=0)


def test_shape_mismatch_rejected():
    pot = zoo.ani2x(num_models=1)
    sd = {"neural_networks.0.H.0.weight": np.zeros((7, 1008), np.float32),
          "neural_networks.0.H.0.bias": np.zeros(7, np.float32)}
    with pytest.raises(ValueError):
        loaders.load_torch_state_dict(sd, arch="ani2x")
