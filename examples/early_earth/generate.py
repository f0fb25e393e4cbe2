"""Generate an early-earth (Miller-Urey) mixture box.

Reference analog: the 22.8M-atom early-earth system of
/root/reference/examples/early_earth (water + CH4/NH3/CO/H2 reactants for
abiotic glycine synthesis, run with ANI-1xnr). Same prep approach as
examples/combustion/prepare_system.py: packmol-free jittered-lattice
placement of rigid molecules with random orientation.

Usage: python generate.py [n_water] [out.data]
Default 480 H2O + reactants (~1.9k atoms) — the 8-shard virtual-mesh
smoke scale; the composition ratio matches at any size (scale n_water).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from lammps_ani_tpu.io.lammps_data import LammpsData, write_lammps_data

# ANI species indices: H=0, C=1, N=2, O=3
MASSES = np.array([1.008, 12.0107, 14.0067, 15.999])

H2O = dict(species=np.array([3, 0, 0], np.int32),
           pos=np.array([[0.0, 0.0, 0.0], [0.9572, 0.0, 0.0],
                         [-0.24, 0.9266, 0.0]]))
CH4 = dict(species=np.array([1, 0, 0, 0, 0], np.int32),
           pos=np.array([[0.0, 0.0, 0.0], [0.629, 0.629, 0.629],
                         [-0.629, -0.629, 0.629], [-0.629, 0.629, -0.629],
                         [0.629, -0.629, -0.629]]))
NH3 = dict(species=np.array([2, 0, 0, 0], np.int32),
           pos=np.array([[0.0, 0.0, 0.0], [0.9377, 0.0, 0.0],
                         [-0.3816, 0.8565, 0.0],
                         [-0.3816, -0.3792, 0.768]]))
CO = dict(species=np.array([1, 3], np.int32),
          pos=np.array([[0.0, 0.0, 0.0], [1.128, 0.0, 0.0]]))
H2 = dict(species=np.array([0, 0], np.int32),
          pos=np.array([[0.0, 0.0, 0.0], [0.741, 0.0, 0.0]]))


def _random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def build(n_water=480, density_g_cm3=0.9, seed=11):
    # reactant ratios ~ the Miller-Urey reducing atmosphere dissolved in
    # water: per 12 waters, 1 CH4, 1 NH3, 1 CO, 1 H2
    n_r = max(1, n_water // 12)
    mols = ([H2O] * n_water + [CH4] * n_r + [NH3] * n_r + [CO] * n_r
            + [H2] * n_r)
    mass = (n_water * 18.015 + n_r * (16.04 + 17.03 + 28.01 + 2.016))
    vol_cm3 = mass / 6.02214076e23 / density_g_cm3
    edge = (vol_cm3 * 1e24) ** (1.0 / 3.0)

    rng = np.random.default_rng(seed)
    n_mol = len(mols)
    per_axis = int(np.ceil(n_mol ** (1.0 / 3.0)))
    cells = [(i, j, k) for i in range(per_axis) for j in range(per_axis)
             for k in range(per_axis)]
    rng.shuffle(cells)
    cell = edge / per_axis
    species, pos = [], []
    for m, (i, j, k) in zip(mols, cells):
        center = (np.array([i, j, k]) + 0.5) * cell
        jitter = rng.uniform(-0.15, 0.15, 3) * cell
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
    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    out = sys.argv[2] if len(sys.argv) > 2 else "early_earth.data"
    data = build(n_water)
    write_lammps_data(out, data)
    print(f"wrote {out}: {data.n_atoms} atoms, box "
          f"{data.box_bounds[0, 1]:.2f} A")
