"""Generate the combustion starting system (CH4 + 2 O2 mixture).

Packmol-free equivalent of the reference's system prep
(/root/reference/examples/combustion/prepare_system/generate_pdb.py):
random rigid-molecule placement with a minimum-distance rejection rule on
a jittered lattice, written as a LAMMPS data file.

Usage: python prepare_system.py [n_ch4] [out.data]
Defaults: 160 CH4 + 320 O2 (1760 atoms) at ~0.25 g/cm^3.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from lammps_ani_tpu.io.lammps_data import LammpsData, write_lammps_data

CH4 = {
    "species": np.array([1, 0, 0, 0, 0], np.int32),  # C H H H H
    "pos": np.array([
        [0.000, 0.000, 0.000],
        [1.092, 0.000, 0.000],
        [-0.364, 1.017, -0.165],
        [-0.364, -0.366, 0.963],
        [-0.364, -0.651, -0.798],
    ]),
}
O2 = {
    "species": np.array([3, 3], np.int32),
    "pos": np.array([[0.0, 0.0, 0.0], [1.281, 0.0, 0.0]]),
}
MASSES = np.array([1.008, 12.0107, 14.0067, 15.999, 32.06,
                   18.998403163, 35.453])


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def build(n_ch4=160, density_g_cm3=0.25, seed=7):
    n_o2 = 2 * n_ch4
    mols = [CH4] * n_ch4 + [O2] * n_o2
    mass_total = n_ch4 * (12.0107 + 4 * 1.008) + n_o2 * 2 * 15.999  # g/mol
    # box edge from target density
    vol_cm3 = mass_total / 6.02214076e23 / density_g_cm3
    edge = (vol_cm3 * 1e24) ** (1.0 / 3.0)

    rng = np.random.default_rng(seed)
    # jittered-lattice placement: one molecule per lattice cell keeps every
    # intermolecular distance > ~2 A without packmol
    n_mol = len(mols)
    per_axis = int(np.ceil(n_mol ** (1.0 / 3.0)))
    cells = [(i, j, k) for i in range(per_axis) for j in range(per_axis)
             for k in range(per_axis)]
    rng.shuffle(cells)
    cell = edge / per_axis
    species, pos = [], []
    for m, (i, j, k) in zip(mols, cells):
        center = (np.array([i, j, k]) + 0.5) * cell
        jitter = rng.uniform(-0.18, 0.18, 3) * cell
        r = _random_rotation(rng)
        pos.append(m["pos"] @ r.T + center + jitter)
        species.append(m["species"])
    species = np.concatenate(species)
    pos = np.concatenate(pos)
    return LammpsData(
        species=species.astype(np.int32), positions=pos,
        masses_by_type=MASSES,
        box_bounds=np.array([[0.0, edge], [0.0, edge], [0.0, edge]]),
        tilt=np.zeros(3))


if __name__ == "__main__":
    n_ch4 = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    out = sys.argv[2] if len(sys.argv) > 2 else "methane_oxygen.data"
    data = build(n_ch4)
    write_lammps_data(out, data)
    print(f"wrote {out}: {data.n_atoms} atoms "
          f"({n_ch4} CH4 + {2 * n_ch4} O2), box "
          f"{data.box_bounds[0, 1]:.2f} A")
