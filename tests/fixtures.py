"""Shared test systems.

The 10-water / 30-atom box mirrors the reference's canonical test fixture
(/root/reference/tests/water-0.8nm.data: 8 A cube centered at origin), used
by its golden tests (src/ani_csrc/test_model.cpp) and MD parity tests.
Coordinates are test *data*, reproduced here numerically.
"""

import numpy as np

# species indices: H=0, C=1, N=2, O=3, S=4, F=5, Cl=6 (pdb2lmp.py:46-47 order)
WATER30_SPECIES = np.array(
    [3, 0, 0] * 10, dtype=np.int32
)

WATER30_POS = np.array([
    [2.011, -3.116, 0.463], [2.86, -3.525, 0.294], [2.165, -2.181, 0.331],
    [2.386, -0.118, 2.278], [2.828, 0.165, 3.078], [2.781, 0.412, 1.585],
    [1.38, 1.855, 0.54], [1.942, 2.597, 0.317], [1.131, 2.008, 1.452],
    [-0.822, -3.413, 0.574], [0.133, -3.346, 0.568], [-1.118, -2.588, 0.958],
    [-0.555, 2.185, -2.095], [0.007, 2.852, -2.49], [-0.02, 1.803, -1.399],
    [2.07, -0.491, -0.665], [1.717, 0.373, -0.451], [1.38, -0.91, -1.18],
    [-2.282, 0.752, 0.227], [-2.603, 0.335, -0.573], [-2.91, 0.493, 0.901],
    [-0.21, -0.857, 1.541], [0.744, -0.78, 1.574], [-0.493, -0.112, 1.011],
    [-0.2, -1.356, -2.464], [-0.837, -0.898, -3.013], [-0.727, -1.942, -1.922],
    [-3.127, 2.221, -3.095], [-2.798, 2.675, -3.871], [-2.383, 2.202, -2.494],
])

WATER30_BOX = np.diag([8.0, 8.0, 8.0])
WATER30_ORIGIN = np.array([-4.0, -4.0, -4.0])

# Masses (g/mol) for H,C,N,O,S,F,Cl (reference tests/water-0.8nm.data Masses)
MASSES = np.array([1.008, 12.0107, 14.0067, 15.999, 32.06, 18.998403163, 35.45])


def random_cluster(n_atoms=12, num_species=4, seed=0, spread=4.0, min_dist=0.85):
    """A random non-periodic cluster with no overlapping atoms."""
    rng = np.random.default_rng(seed)
    pos = []
    while len(pos) < n_atoms:
        cand = rng.uniform(-spread / 2, spread / 2, 3)
        if all(np.linalg.norm(cand - p) > min_dist for p in pos):
            pos.append(cand)
    species = rng.integers(0, num_species, n_atoms).astype(np.int32)
    return species, np.array(pos)
