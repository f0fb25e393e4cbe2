"""ctypes bindings for the native data-file parser (csrc/fastio.cpp).

Compiled on demand with the system toolchain and cached next to the
package; `read_lammps_data(..., fast=True)` in io/lammps_data.py routes
through this when available and falls back to the Python parser otherwise
(behavior parity is tested).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "fastio.cpp"
_SO = Path(__file__).resolve().parent / "_libfastio.so"
_lib = None
_unavailable = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
    except Exception:
        _unavailable = True
        return None
    lib.lmp_parse.restype = ctypes.c_void_p
    lib.lmp_parse.argtypes = [ctypes.c_char_p]
    lib.lmp_error.restype = ctypes.c_char_p
    lib.lmp_error.argtypes = [ctypes.c_void_p]
    for fn in ("lmp_n_atoms", "lmp_n_bonds"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("lmp_n_types", "lmp_has_vel", "lmp_has_hmr"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.lmp_copy.restype = None
    lib.lmp_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 8
    lib.lmp_free.restype = None
    lib.lmp_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def read_lammps_data_native(path):
    """Parse with the C++ parser; returns a LammpsData or None."""
    from .lammps_data import LammpsData

    lib = get_lib()
    if lib is None:
        return None
    h = lib.lmp_parse(str(path).encode())
    try:
        err = lib.lmp_error(h)
        if err:
            raise ValueError(f"fastio: {err.decode()} ({path})")
        n = lib.lmp_n_atoms(h)
        nb = lib.lmp_n_bonds(h)
        nt = lib.lmp_n_types(h)
        species = np.empty(n, np.int32)
        pos = np.empty((n, 3), np.float64)
        vel = np.empty((n, 3), np.float64) if lib.lmp_has_vel(h) else None
        hmr = np.empty(n, np.float64) if lib.lmp_has_hmr(h) else None
        masses = np.empty(max(nt, 1), np.float64)
        bounds = np.empty(6, np.float64)
        tilt = np.empty(3, np.float64)
        bonds = np.empty((nb, 3), np.int64) if nb else None
        ptr = lambda a: (a.ctypes.data_as(ctypes.c_void_p)
                         if a is not None else None)
        lib.lmp_copy(h, ptr(species), ptr(pos), ptr(vel), ptr(hmr),
                     ptr(masses), ptr(bounds), ptr(tilt), ptr(bonds))
        return LammpsData(
            species=species, positions=pos, masses_by_type=masses,
            box_bounds=bounds.reshape(3, 2), tilt=tilt, velocities=vel,
            per_atom_mass=hmr, bonds=bonds)
    finally:
        lib.lmp_free(h)
