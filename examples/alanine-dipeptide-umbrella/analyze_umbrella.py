"""PMF from umbrella windows via WHAM (reference analog: per-window MBAR).

Usage: python analyze_umbrella.py [umbrella_samples.npz]
Prints the phi PMF as (angle, kcal/mol) rows.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from lammps_ani_tpu.analysis.wham import wham

path = sys.argv[1] if len(sys.argv) > 1 else "umbrella_samples.npz"
z = np.load(path)
centers = z["centers"]
samples = [z[f"w{i}"] for i in range(len(centers))]
x, pmf, f = wham(samples, centers, k=40.0, temp=300.0,
                 periodic=2 * np.pi)
print("# phi_rad  pmf_kcal_mol")
for xi, pi in zip(x, pmf):
    print(f"{xi:8.4f}  {pi:10.4f}")
