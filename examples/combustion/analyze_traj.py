"""Fragment time series from a combustion trajectory.

Reference analog: /root/reference/examples/combustion/analyze.py
(torchani neighborlist -> bond table -> cuGraph connected components);
here analysis/fragments.py does the same with numpy/scipy-free union-find.

Usage: python analyze_traj.py traj.dcd system.data [stride]
"""

import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from lammps_ani_tpu.analysis.fragments import fragments
from lammps_ani_tpu.io.dump import read_dcd
from lammps_ani_tpu.io.lammps_data import read_lammps_data


def main():
    traj_path = sys.argv[1] if len(sys.argv) > 1 else "combustion.dcd"
    data_path = sys.argv[2] if len(sys.argv) > 2 else "methane_oxygen.data"
    stride = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    data = read_lammps_data(data_path)
    box_h = np.diag(data.box_bounds[:, 1] - data.box_bounds[:, 0])
    frames = read_dcd(traj_path)
    print("# frame  formulas")
    for fi, pos in enumerate(frames[::stride]):
        _, formulas = fragments(data.species, pos, box_h)
        top = Counter(formulas).most_common(8)
        print(fi * stride, " ".join(f"{f}:{c}" for f, c in top), flush=True)


if __name__ == "__main__":
    main()
