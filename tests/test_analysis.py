"""Analysis tooling: WHAM recovery + combustion system generator."""

import sys

import numpy as np

from lammps_ani_tpu.analysis.wham import wham, BOLTZ


def test_wham_recovers_quadratic_pmf():
    """Windows sampled from the exact biased distributions of a quadratic
    PMF must reproduce it: with U = a/2 x^2 and bias k/2 (x-c)^2 the
    biased density is a gaussian with var kT/(a+k), mean kc/(a+k)."""
    rng = np.random.default_rng(3)
    a, k, temp = 8.0, 40.0, 300.0
    kt = BOLTZ * temp
    centers = np.linspace(-1.2, 1.2, 13)
    samples = []
    for c in centers:
        var = kt / (a + k)
        mean = k * c / (a + k)
        samples.append(rng.normal(mean, np.sqrt(var), 4000))
    x, pmf, f = wham(samples, centers, k=k, temp=temp, n_bins=60)
    ref = 0.5 * a * x ** 2
    ref -= ref[np.nanargmin(pmf)]
    sel = np.abs(x) < 0.8  # well-sampled region
    assert np.nanmax(np.abs(pmf[sel] - ref[sel])) < 0.15  # kcal/mol


def test_combustion_prepare_system(tmp_path):
    sys.path.insert(0, "examples/combustion")
    import prepare_system as ps

    data = ps.build(n_ch4=16, seed=1)
    assert data.n_atoms == 16 * 5 + 32 * 2
    # composition: C H O only
    assert set(data.species.tolist()) == {0, 1, 3}
    # no blown-up overlaps from the jittered-lattice placement
    from scipy.spatial.distance import pdist  # noqa: F401
    d = np.linalg.norm(
        data.positions[:, None] - data.positions[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    intra_min = 0.95  # C-H bond ~1.09, O=O 1.28
    assert d.min() > intra_min

    from lammps_ani_tpu.io.lammps_data import (read_lammps_data,
                                               write_lammps_data)
    p = tmp_path / "mix.data"
    write_lammps_data(p, data)
    back = read_lammps_data(p)
    np.testing.assert_allclose(back.positions, data.positions, atol=1e-9)


def test_dcd_roundtrip(tmp_path):
    from lammps_ani_tpu.io.dump import DCDWriter, read_dcd

    rng = np.random.default_rng(0)
    pos = rng.normal(0, 5, (3, 17, 3)).astype(np.float32)
    w = DCDWriter(tmp_path / "t.dcd", n_atoms=17, dt_fs=0.5, every=2)
    for k in range(3):
        w.write_frame(2 * k, pos[k], box_h=np.diag([20.0, 20.0, 20.0]))
    w.close()
    back = read_dcd(tmp_path / "t.dcd")
    assert back.shape == (3, 17, 3)
    np.testing.assert_allclose(back, pos, atol=0)
