"""System-prep tools, fragment analysis, CLI runner (workflow layer,
SURVEY.md §2.2 L6)."""

import json

import numpy as np
import pytest

from lammps_ani_tpu.analysis import fragments as fragmod
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.tools import hmr as hmrmod
from lammps_ani_tpu.tools import pdb as pdbmod

from . import fixtures

WATER_PDB = """CRYST1    8.000    8.000    8.000  90.00  90.00  90.00 P 1
ATOM      1  O   HOH A   1       2.011  -3.116   0.463  1.00  0.00           O
ATOM      2  H1  HOH A   1       2.860  -3.525   0.294  1.00  0.00           H
ATOM      3  H2  HOH A   1       2.165  -2.181   0.331  1.00  0.00           H
END
"""


def test_pdb_roundtrip(tmp_path):
    p = tmp_path / "w.pdb"
    p.write_text(WATER_PDB)
    species, pos, box_h = pdbmod.read_pdb(p)
    assert list(species) == [3, 0, 0]
    np.testing.assert_allclose(np.diag(box_h), [8.0, 8.0, 8.0])
    out = tmp_path / "w.data"
    data = pdbmod.pdb_to_lammps_data(p, out, with_bonds=True)
    back = ldio.read_lammps_data(out)
    assert back.n_atoms == 3
    np.testing.assert_allclose(back.positions, pos)
    assert data.bonds is not None and len(data.bonds) == 2  # O-H x2


def test_bond_detection_water30():
    bonds = pdbmod.detect_bonds(fixtures.WATER30_SPECIES,
                                fixtures.WATER30_POS,
                                fixtures.WATER30_BOX)
    # 10 waters -> 20 O-H bonds
    assert len(bonds) == 20


def test_hmr_conserves_mass():
    species = fixtures.WATER30_SPECIES
    masses = fixtures.MASSES[species]
    bonds = pdbmod.detect_bonds(species, fixtures.WATER30_POS,
                                fixtures.WATER30_BOX)
    new = hmrmod.repartition(species, masses, bonds, factor=3.0)
    np.testing.assert_allclose(new.sum(), masses.sum(), rtol=1e-12)
    assert np.all(new[species == 0] == pytest.approx(3.0 * 1.008))
    assert np.all(new > 0)


def test_fragments_water30():
    labels, formulas = fragmod.fragments(
        fixtures.WATER30_SPECIES, fixtures.WATER30_POS,
        fixtures.WATER30_BOX)
    assert formulas == {"H2O1": 10}
    assert len(np.unique(labels)) == 10


def test_cli_runner_end_to_end(tmp_path, capsys):
    from lammps_ani_tpu import run as runner

    cfg = {
        "data": "/root/reference/tests/water-0.8nm.data",
        "model": "ani2x", "num_models": 1, "steps": 4, "dt": 0.1,
        "ensemble": "nvt", "temp": 300.0, "tdamp": 20.0,
        "rebuild_every": 2, "thermo_every": 2,
        "dump": str(tmp_path / "t.lammpstrj"), "dump_every": 4,
        "restart": str(tmp_path / "ck.npz"),
        "log": str(tmp_path / "thermo.yaml"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    state = runner.main([str(cfg_path)])
    assert int(state.step) == 4
    out = capsys.readouterr().out
    assert "Performance:" in out and "ns/day" in out
    assert (tmp_path / "t.lammpstrj").exists()
    assert (tmp_path / "ck.npz").exists()
    from lammps_ani_tpu.io.dump import read_thermo_yaml
    cols = read_thermo_yaml(tmp_path / "thermo.yaml")
    assert cols["step"][-1] == 4.0
