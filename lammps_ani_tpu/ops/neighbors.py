"""Periodic boundary conditions, ghost images, and neighbor matrices.

TPU-native replacement for the reference's neighbor machinery (LAMMPS binned
neighbor lists + MPI ghost-atom exchange, cf. SURVEY.md L5 and
/root/reference/src/pair_ani.cpp:104-151). Key design differences from the
CUDA/MPI original:

  * Fixed shapes everywhere. Neighbors live in a padded dense
    `[n_atoms, k_max]` matrix — the layout the reference's Kokkos path
    consumes (/root/reference/src/pair_ani_kokkos.cpp:150-169) — with a
    boolean mask instead of per-row lengths. Capacities (`k_max`,
    `ghost_capacity`) are static; overflow is *counted* on device and
    surfaced to the host, which rebuilds with larger capacity.

  * Ghost atoms are *derived*, not communicated state. A ghost is
    (source_index, integer_image_shift); its position is recomputed from the
    owner every step inside the differentiated energy function, so
    `jax.grad` automatically accumulates ghost forces back onto owners —
    the reverse-communication step of the reference
    (/root/reference/src/pair_ani.cpp:461-484) vanishes. The same trick
    makes the multi-chip halo exchange (parallel/domain.py) a pure
    `ppermute` of owner positions.

  * Between neighbor rebuilds the (index, shift) structure is frozen while
    positions move — valid while no atom moves more than skin/2, the same
    contract as LAMMPS `neighbor 2.0 bin` + `neigh_modify` policies.

Box convention: LAMMPS triclinic. `box` is the 3x3 row-vector cell matrix
[[lx,0,0],[xy,ly,0],[xz,yz,lz]]; cartesian = origin + frac @ box.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Box:
    """Triclinic simulation cell. `h`: [3,3] row-vector cell matrix."""

    h: jax.Array  # [[lx,0,0],[xy,ly,0],[xz,yz,lz]]
    origin: jax.Array  # [3] = (xlo, ylo, zlo)

    @staticmethod
    def orthorhombic(lengths, origin=(0.0, 0.0, 0.0), dtype=jnp.float32) -> "Box":
        return Box(
            h=jnp.diag(jnp.asarray(lengths, dtype)),
            origin=jnp.asarray(origin, dtype),
        )

    @staticmethod
    def from_lammps(
        xlo, xhi, ylo, yhi, zlo, zhi, xy=0.0, xz=0.0, yz=0.0, dtype=jnp.float32
    ) -> "Box":
        h = jnp.asarray(
            [
                [xhi - xlo, 0.0, 0.0],
                [xy, yhi - ylo, 0.0],
                [xz, yz, zhi - zlo],
            ],
            dtype,
        )
        return Box(h=h, origin=jnp.asarray([xlo, ylo, zlo], dtype))

    @property
    def volume(self) -> jax.Array:
        return self.h[0, 0] * self.h[1, 1] * self.h[2, 2]

    def perp_lengths(self) -> jax.Array:
        """[3] distances between opposite cell faces (controls image counts)."""
        a, b, c = self.h[0], self.h[1], self.h[2]
        v = jnp.abs(jnp.dot(a, jnp.cross(b, c)))
        return jnp.stack(
            [
                v / jnp.linalg.norm(jnp.cross(b, c)),
                v / jnp.linalg.norm(jnp.cross(c, a)),
                v / jnp.linalg.norm(jnp.cross(a, b)),
            ]
        )

    def to_fractional(self, pos: jax.Array) -> jax.Array:
        """Cartesian [n,3] -> fractional [n,3]. h is triangular: solve cheaply."""
        # pos - origin = frac @ h, h lower-triangular in row-vector form
        # (h[0]=(lx,0,0), h[1]=(xy,ly,0), h[2]=(xz,yz,lz)) => back-substitute.
        r = pos - self.origin
        f2 = r[..., 2] / self.h[2, 2]
        f1 = (r[..., 1] - f2 * self.h[2, 1]) / self.h[1, 1]
        f0 = (r[..., 0] - f1 * self.h[1, 0] - f2 * self.h[2, 0]) / self.h[0, 0]
        return jnp.stack([f0, f1, f2], axis=-1)

    def from_fractional(self, frac: jax.Array) -> jax.Array:
        # highest precision: a bf16-lowered dot rounds coordinates by
        # ~0.25 A at 100 A boxes (geometry must not depend on the global
        # matmul-precision knob)
        return self.origin + jnp.matmul(frac, self.h,
                                        precision=jax.lax.Precision.HIGHEST)


def wrap_positions(pos: jax.Array, box: Box) -> jax.Array:
    """Remap atoms into the primary cell (LAMMPS PBC remap at reneighbor)."""
    frac = box.to_fractional(pos)
    return box.from_fractional(frac - jnp.floor(frac))


def image_shifts(n_shell: int | Sequence[int], periodic=(True, True, True)) -> np.ndarray:
    """Static integer image shifts (excluding (0,0,0)), shape [n_shifts, 3]."""
    if isinstance(n_shell, int):
        n_shell = (n_shell, n_shell, n_shell)
    ranges = [
        range(-n, n + 1) if p else range(0, 1)
        for n, p in zip(n_shell, periodic)
    ]
    shifts = [
        (i, j, k)
        for i in ranges[0]
        for j in ranges[1]
        for k in ranges[2]
        if (i, j, k) != (0, 0, 0)
    ]
    return np.asarray(shifts, np.int32) if shifts else np.zeros((0, 3), np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ghosts:
    """Derived periodic-image atoms (fixed capacity)."""

    src: jax.Array  # [g] int32 owner index (0 for padding slots)
    shift: jax.Array  # [g, 3] int32 integer image shift
    mask: jax.Array  # [g] bool
    count: jax.Array  # [] int32 — true number of ghosts (overflow if > g)


def build_ghosts(
    pos: jax.Array,  # [n, 3] wrapped positions
    box: Box,
    cutoff: float,
    capacity: int,
    shifts: np.ndarray,  # static [n_shifts, 3]
) -> Ghosts:
    """Enumerate periodic images within `cutoff` of the primary cell."""
    n = pos.shape[0]
    if shifts.shape[0] == 0:
        z = jnp.zeros((capacity,), jnp.int32)
        return Ghosts(
            src=z,
            shift=jnp.zeros((capacity, 3), jnp.int32),
            mask=jnp.zeros((capacity,), bool),
            count=jnp.zeros((), jnp.int32),
        )
    frac = box.to_fractional(pos)  # [n, 3]
    margin = cutoff / box.perp_lengths()  # [3]
    s = jnp.asarray(shifts, frac.dtype)  # [m, 3]
    cand = frac[:, None, :] + s[None, :, :]  # [n, m, 3]
    keep = jnp.all((cand > -margin) & (cand < 1.0 + margin), axis=-1)  # [n, m]
    flat = keep.reshape(-1)
    count = jnp.sum(flat, dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=capacity, fill_value=n * shifts.shape[0])
    valid = idx < n * shifts.shape[0]
    src = jnp.where(valid, (idx // shifts.shape[0]).astype(jnp.int32), 0)
    shift = jnp.where(
        valid[:, None],
        jnp.asarray(shifts, jnp.int32)[idx % shifts.shape[0]],
        0,
    )
    return Ghosts(src=src, shift=shift, mask=valid, count=count)


def ghost_positions(pos: jax.Array, box: Box, ghosts: Ghosts) -> jax.Array:
    """[g, 3] ghost cartesian positions, differentiable w.r.t. `pos`."""
    base = pos[ghosts.src]
    disp = jnp.matmul(ghosts.shift.astype(pos.dtype), box.h,
                      precision=jax.lax.Precision.HIGHEST)
    g = base + disp
    # Park padding ghosts far away so they can never enter any cutoff.
    far = box.origin + jnp.asarray(1e6, pos.dtype)
    return jnp.where(ghosts.mask[:, None], g, far)


def extended_positions(pos: jax.Array, box: Box, ghosts: Ghosts) -> jax.Array:
    """[n + g, 3]: local atoms followed by ghost images (differentiable)."""
    return jnp.concatenate([pos, ghost_positions(pos, box, ghosts)], axis=0)


def extended_species(species: jax.Array, ghosts: Ghosts) -> jax.Array:
    """[n + g] species; padding ghost slots = -1 (reference ghost semantics)."""
    gs = jnp.where(ghosts.mask, species[ghosts.src], -1)
    return jnp.concatenate([species, gs], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborList:
    """Padded full neighbor matrix over local+ghost atoms (fixed capacity).

    idx[i, k] indexes into the extended array `[pos; ghost_positions]`;
    invalid slots are masked. `max_count` reports the true max row degree so
    the host can detect capacity overflow and rebuild bigger.
    """

    idx: jax.Array  # [n, k_max] int32
    mask: jax.Array  # [n, k_max] bool
    ghosts: Ghosts
    max_count: jax.Array  # [] int32

    @property
    def overflowed(self):
        k_max = self.idx.shape[1]
        cap = self.ghosts.src.shape[0]
        return (self.max_count > k_max) | (self.ghosts.count > cap)


def build_neighbor_matrix_brute(
    pos: jax.Array,  # [n, 3] local (wrapped)
    box: Box,
    cutoff: float,  # interaction cutoff + skin
    k_max: int,
    ghosts: Ghosts,
    valid: jax.Array | None = None,  # [n] bool for padded local atoms
) -> NeighborList:
    """O(n * (n+g)) dense build — simple and exact; for small/medium systems.

    Large systems use the cell-list build (ops/cell_list.py).
    """
    n = pos.shape[0]
    pos_ext = extended_positions(pos, box, ghosts)
    m = pos_ext.shape[0]
    d = pos[:, None, :] - pos_ext[None, :, :]
    dist2 = jnp.sum(d * d, axis=-1)  # [n, m]
    within = dist2 < jnp.asarray(cutoff, pos.dtype) ** 2
    not_self = jnp.arange(n)[:, None] != jnp.arange(m)[None, :]
    ext_valid = jnp.concatenate(
        [
            jnp.ones((n,), bool) if valid is None else valid,
            ghosts.mask,
        ]
    )
    mask = within & not_self & ext_valid[None, :]
    if valid is not None:
        mask = mask & valid[:, None]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    # Closest-first top-k selection; masked-out entries pushed to +inf.
    key = jnp.where(mask, dist2, jnp.inf)
    k_eff = min(k_max, m)
    neg_key, idx = jax.lax.top_k(-key, k_eff)
    if k_eff < k_max:
        neg_key = jnp.pad(neg_key, ((0, 0), (0, k_max - k_eff)),
                          constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k_max - k_eff)))
    nbr_mask = jnp.isfinite(neg_key)
    idx = jnp.where(nbr_mask, idx, 0).astype(jnp.int32)
    return NeighborList(
        idx=idx, mask=nbr_mask, ghosts=ghosts, max_count=jnp.max(counts)
    )


def neighbor_displacements(
    pos: jax.Array, box: Box, nlist: NeighborList
) -> tuple[jax.Array, jax.Array]:
    """(diff [n,k,3], dist [n,k]) recomputed from current positions.

    diff[i,k] = r_i - r_j (torchani diff_vector orientation). Differentiable
    w.r.t. `pos` including through ghost images. Masked slots get a huge
    distance so every downstream cutoff function vanishes there.
    """
    pos_ext = extended_positions(pos, box, nlist.ghosts)
    pj = pos_ext[nlist.idx]  # [n, k, 3]
    diff = pos[:, None, :] - pj
    dist = jnp.linalg.norm(
        jnp.where(nlist.mask[..., None], diff, 1.0), axis=-1
    )
    dist = jnp.where(nlist.mask, dist, 1e6)
    return diff, dist


def estimate_k_max(density_per_a3: float, cutoff: float, safety: float = 1.35) -> int:
    """Host-side capacity heuristic: atoms within a cutoff sphere * safety."""
    vol = 4.0 / 3.0 * np.pi * cutoff**3
    return int(np.ceil(density_per_a3 * vol * safety / 8.0) * 8)
