"""LAMMPS data-file reader/writer (`read_data` / `write_data` equivalent).

Supports the subset the reference workloads use (SURVEY.md §7.3): header
with counts and (possibly triclinic) box bounds, `Masses`, `Atoms`
(atom_style atomic: id type x y z [with optional image flags]), and
`Velocities` sections, plus per-atom `Hmrmass` sections written by the
reference's hydrogen-mass-repartitioning tool
(/root/reference/examples/apply_hmr.py:5-31).

The fixed 7-type species mapping H,C,N,O,S,F,Cl follows
/root/reference/examples/pdb2lmp.py:46-47.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

SPECIES_SYMBOLS = ("H", "C", "N", "O", "S", "F", "Cl")
SPECIES_MASSES = (1.008, 12.0107, 14.0067, 15.999, 32.06, 18.998403163, 35.45)
SYMBOL_TO_TYPE = {s: i + 1 for i, s in enumerate(SPECIES_SYMBOLS)}


@dataclasses.dataclass
class LammpsData:
    """Parsed data file. `species` is 0-indexed (type - 1)."""

    species: np.ndarray  # [n] int32
    positions: np.ndarray  # [n, 3] float64
    masses_by_type: np.ndarray  # [ntypes] float64
    box_bounds: np.ndarray  # [3, 2] (lo, hi)
    tilt: np.ndarray  # [3] (xy, xz, yz)
    velocities: np.ndarray | None = None  # [n, 3]
    per_atom_mass: np.ndarray | None = None  # [n] (HMR override)
    bonds: np.ndarray | None = None  # [nbonds, 3] (type, i, j) 0-indexed

    @property
    def n_atoms(self) -> int:
        return len(self.species)

    @property
    def atom_masses(self) -> np.ndarray:
        if self.per_atom_mass is not None:
            return self.per_atom_mass
        return self.masses_by_type[self.species]

    @property
    def box_h(self) -> np.ndarray:
        (xlo, xhi), (ylo, yhi), (zlo, zhi) = self.box_bounds
        xy, xz, yz = self.tilt
        return np.array(
            [[xhi - xlo, 0, 0], [xy, yhi - ylo, 0], [xz, yz, zhi - zlo]],
            np.float64,
        )

    @property
    def box_origin(self) -> np.ndarray:
        return self.box_bounds[:, 0].astype(np.float64)


_SECTION_NAMES = {
    "Masses", "Atoms", "Velocities", "Bonds", "Angles", "Dihedrals",
    "Impropers", "Hmrmass", "Pair Coeffs", "Bond Coeffs", "Angle Coeffs",
}


def _strip_comment(line: str) -> str:
    return line.split("#", 1)[0].strip()


def read_lammps_data(path, fast: bool | None = None) -> LammpsData:
    """Parse a data file. `fast=None` auto-selects the native C++ parser
    (io/fastio.py) for large files; `fast=False` forces the Python path
    (the behavior oracle)."""
    if fast is None:
        fast = Path(path).stat().st_size > 1 << 20  # >1 MB
    if fast:
        from . import fastio

        parsed = fastio.read_lammps_data_native(path)
        if parsed is not None:
            return parsed
    lines = Path(path).read_text().splitlines()
    n_atoms = n_types = 0
    n_bonds = 0
    bounds = np.zeros((3, 2))
    tilt = np.zeros(3)

    # header: everything until the first recognized section keyword
    i = 1  # first line is a comment/title
    while i < len(lines):
        raw = lines[i].strip()
        bare = _strip_comment(lines[i])
        first_words = raw.split("#", 1)[0].strip()
        if any(first_words.startswith(s) for s in _SECTION_NAMES):
            break
        if bare:
            toks = bare.split()
            if bare.endswith("atoms"):
                n_atoms = int(toks[0])
            elif bare.endswith("atom types"):
                n_types = int(toks[0])
            elif bare.endswith("bonds"):
                n_bonds = int(toks[0])
            elif bare.endswith("xlo xhi"):
                bounds[0] = [float(toks[0]), float(toks[1])]
            elif bare.endswith("ylo yhi"):
                bounds[1] = [float(toks[0]), float(toks[1])]
            elif bare.endswith("zlo zhi"):
                bounds[2] = [float(toks[0]), float(toks[1])]
            elif bare.endswith("xy xz yz"):
                tilt[:] = [float(toks[0]), float(toks[1]), float(toks[2])]
        i += 1

    masses = np.zeros(max(n_types, 1))
    species = np.zeros(n_atoms, np.int32)
    pos = np.zeros((n_atoms, 3))
    vel = None
    hmr = None
    bonds = None

    def read_section(start: int, n_rows: int):
        rows = []
        j = start
        while j < len(lines) and len(rows) < n_rows:
            bare = _strip_comment(lines[j])
            if bare:
                rows.append(bare.split())
            j += 1
        return rows, j

    while i < len(lines):
        head = lines[i].split("#", 1)[0].strip()
        if not head:
            i += 1
            continue
        if head.startswith("Masses"):
            rows, i = read_section(i + 1, n_types)
            for r in rows:
                masses[int(r[0]) - 1] = float(r[1])
        elif head.startswith("Atoms"):
            rows, i = read_section(i + 1, n_atoms)
            for r in rows:
                aid = int(r[0]) - 1
                species[aid] = int(r[1]) - 1
                pos[aid] = [float(r[2]), float(r[3]), float(r[4])]
        elif head.startswith("Velocities"):
            vel = np.zeros((n_atoms, 3))
            rows, i = read_section(i + 1, n_atoms)
            for r in rows:
                vel[int(r[0]) - 1] = [float(r[1]), float(r[2]), float(r[3])]
        elif head.startswith("Hmrmass"):
            hmr = np.zeros(n_atoms)
            rows, i = read_section(i + 1, n_atoms)
            for r in rows:
                hmr[int(r[0]) - 1] = float(r[1])
        elif head.startswith("Bonds"):
            bonds = np.zeros((n_bonds, 3), np.int64)
            rows, i = read_section(i + 1, n_bonds)
            for k, r in enumerate(rows):
                bonds[k] = [int(r[1]), int(r[2]) - 1, int(r[3]) - 1]
        else:
            i += 1

    return LammpsData(
        species=species,
        positions=pos,
        masses_by_type=masses,
        box_bounds=bounds,
        tilt=tilt,
        velocities=vel,
        per_atom_mass=hmr,
        bonds=bonds,
    )


def write_lammps_data(path, data: LammpsData, comment="generated by lammps_ani_tpu"):
    n = data.n_atoms
    ntypes = len(data.masses_by_type)
    out = [f"# {comment}", f"{n} atoms", f"{ntypes} atom types"]
    for dim, (lo, hi) in zip("xyz", data.box_bounds):
        out.append(f"{lo:.10g} {hi:.10g}  {dim}lo {dim}hi")
    if np.any(data.tilt != 0):
        out.append(f"{data.tilt[0]:.10g} {data.tilt[1]:.10g} "
                   f"{data.tilt[2]:.10g} xy xz yz")
    out += ["", "Masses", ""]
    for t in range(ntypes):
        out.append(f"{t + 1} {data.masses_by_type[t]:.9g}")
    out += ["", "Atoms", ""]
    for a in range(n):
        x, y, z = data.positions[a]
        out.append(f"{a + 1}\t{data.species[a] + 1}\t{x:.10g}\t{y:.10g}\t{z:.10g}")
    if data.velocities is not None:
        out += ["", "Velocities", ""]
        for a in range(n):
            vx, vy, vz = data.velocities[a]
            out.append(f"{a + 1}\t{vx:.10g}\t{vy:.10g}\t{vz:.10g}")
    if data.per_atom_mass is not None:
        out += ["", "Hmrmass", ""]
        for a in range(n):
            out.append(f"{a + 1}\t{data.per_atom_mass[a]:.10g}")
    Path(path).write_text("\n".join(out) + "\n")


def replicate(data: LammpsData, nx: int, ny: int, nz: int) -> LammpsData:
    """LAMMPS `replicate nx ny nz` (used for weak scaling,
    /root/reference/examples/benchmark/submit_scaling.py:30-33)."""
    h = data.box_h
    reps = []
    vels = []
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                shift = ix * h[0] + iy * h[1] + iz * h[2]
                reps.append(data.positions + shift)
                if data.velocities is not None:
                    vels.append(data.velocities)
    factor = nx * ny * nz
    bounds = data.box_bounds.copy()
    for d, f in enumerate((nx, ny, nz)):
        lo = bounds[d, 0]
        bounds[d, 1] = lo + (bounds[d, 1] - lo) * f
    return LammpsData(
        species=np.tile(data.species, factor),
        positions=np.concatenate(reps),
        masses_by_type=data.masses_by_type,
        box_bounds=bounds,
        tilt=data.tilt * np.array([ny, nz, nz]),
        velocities=np.concatenate(vels) if vels else None,
        per_atom_mass=np.tile(data.per_atom_mass, factor)
        if data.per_atom_mass is not None else None,
    )
