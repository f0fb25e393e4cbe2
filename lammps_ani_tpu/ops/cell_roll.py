"""Gather-free radial channel: the cell-roll layout.

The per-step cost profile of the compacted-list engine is dominated by
index gathers (docs/DESIGN.md) — XLA lowers them at ~7.5 ns/element and
neither locality nor Pallas helps. This module eliminates them for the
radial AEV channel:

  * atoms are binned once per rebuild into a dense [ncx, ncy, ncz, cap]
    grid with bin side >= cutoff + skin (so pairs stay within adjacent
    bins for a whole rebuild interval);
  * per step, positions enter the grid by one [n]-element scatter (tiny),
    and each of the 27 neighbor-bin offsets supplies its candidates as a
    `jnp.roll` of the grid — a pure layout transform, no indexing;
  * periodic wrap enters as a per-(offset, bin) lattice shift;
  * the force backward accumulates the neighbor-role contribution per
    offset and returns it with the *inverse roll* — no scatters, no
    mirror tables.

27x cap^2 pair slots do ~10x more pair arithmetic than the compacted
list, but pair arithmetic runs on VPU/MXU at >100x the effective
throughput of gather traffic. Radial-basis exponentials use the
uniform-grid recurrence exp(-eta (d - mu_k)^2) = A * B^k * C_k (mu_k
evenly spaced): 2 exps + 15 multiplies instead of 16 exps per pair.

Custom VJP: forward computes the radial AEV [n, S*R]; backward recomputes
per-offset terms (remat) and emits dpos plus the exact box cotangent for
the virial. Parity vs the generic path is bit-level in f64 up to summation
order (tests/test_cell_roll.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import neighbors as nbops


@dataclasses.dataclass(frozen=True)
class RollGrid:
    """Static bin geometry (host-derived, jit-static)."""

    ncells: tuple[int, int, int]
    cap: int

    @property
    def total(self) -> int:
        nx, ny, nz = self.ncells
        return nx * ny * nz

    @staticmethod
    def for_box(box_h: np.ndarray, side_min: float, cap: int):
        """Bins at least `side_min` wide; None if fewer than 3 per axis
        (adjacent-offset aliasing, like ops/cell_list.CellGrid)."""
        h = np.asarray(box_h, np.float64)
        v = abs(np.dot(h[0], np.cross(h[1], h[2])))
        perp = np.array([
            v / np.linalg.norm(np.cross(h[1], h[2])),
            v / np.linalg.norm(np.cross(h[2], h[0])),
            v / np.linalg.norm(np.cross(h[0], h[1])),
        ])
        nc = np.floor(perp / side_min).astype(int)
        if (nc < 3).any():
            return None
        return RollGrid(ncells=tuple(int(x) for x in nc), cap=cap)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RollBins:
    """Rebuild-frozen atom->bin assignment.

    `inv` is the inverse map (grid slot -> atom row, n for empty slots):
    with it, BOTH layout directions are row gathers — flat->grid is
    `padded_x[inv]`, grid->flat is `g[cell, slot]` — so no per-step XLA
    scatter exists anywhere (TPU scatters serialize; a single 100k-row
    scatter costs ~40 ms, measured)."""

    cell: jax.Array  # [n] int32 flat bin id
    slot: jax.Array  # [n] int32 slot within bin
    species_grid: jax.Array  # [total, cap] int32, -1 empty
    mask_grid: jax.Array  # [total, cap] bool
    count_max: jax.Array  # [] int32 (overflow if > cap)
    inv: jax.Array | None = None  # [total, cap] int32 atom row (n = empty)


_OFFSETS = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1)]


def build_bins(grid: RollGrid, pos, species, box) -> RollBins:
    """Assign atoms to bins (runs at rebuild; one small sort-free pass)."""
    n = pos.shape[0]
    frac = box.to_fractional(pos)
    frac = frac - jnp.floor(frac)
    nc = jnp.asarray(grid.ncells, jnp.int32)
    cc = jnp.minimum((frac * nc).astype(jnp.int32), nc - 1)
    cell = (cc[:, 0] * grid.ncells[1] + cc[:, 1]) * grid.ncells[2] + cc[:, 2]
    # slot = rank within bin, via one-hot matmul over bins? n x total too
    # big — use the sort-free cumsum trick on a [n] scatter-count basis:
    # stable rank of atom i among atoms with the same cell id.
    order = jnp.argsort(cell)  # [n] single 1-D sort (cheap at rebuild)
    sorted_cells = cell[order]
    first = jnp.searchsorted(sorted_cells, sorted_cells, side="left")
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    counts = rank_sorted  # max rank + 1 = max occupancy
    species_grid = jnp.full((grid.total, grid.cap), -1, jnp.int32)
    ok = slot < grid.cap
    species_grid = species_grid.at[
        jnp.where(ok, cell, grid.total), jnp.where(ok, slot, 0)
    ].set(species, mode="drop")
    mask_grid = species_grid >= 0
    flat = jnp.where(ok, cell * grid.cap + jnp.minimum(slot, grid.cap - 1),
                     grid.total * grid.cap)
    inv = jnp.full((grid.total * grid.cap,), n, jnp.int32)
    inv = inv.at[flat].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return RollBins(cell=cell, slot=jnp.minimum(slot, grid.cap - 1),
                    species_grid=species_grid, mask_grid=mask_grid,
                    count_max=jnp.max(counts) + 1,
                    inv=inv.reshape(grid.total, grid.cap))


def scatter_to_grid(grid: RollGrid, bins: RollBins, x, fill=0.0):
    """[n, ...] -> [total, cap, ...] (one n-element scatter)."""
    out = jnp.full((grid.total, grid.cap) + x.shape[1:], fill, x.dtype)
    return out.at[bins.cell, bins.slot].set(x)


def gather_from_grid(bins: RollBins, g):
    """[total, cap, ...] -> [n, ...] (one n-element gather)."""
    return g[bins.cell, bins.slot]


def _wrap_shift(grid: RollGrid, off) -> np.ndarray:
    """[total, 3] static lattice wrap for neighbor bin c+off (in units of
    box rows): +1 where the roll crossed the upper boundary, etc."""
    nx, ny, nz = grid.ncells
    cx, cy, cz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    out = np.zeros((nx, ny, nz, 3), np.float32)
    for d, (c, ncd) in enumerate(zip((cx, cy, cz), (nx, ny, nz))):
        t = c + off[d]
        out[..., d] = (t >= ncd).astype(np.float32) - (t < 0).astype(
            np.float32)
    return out.reshape(-1, 3)


def _roll_cells(grid: RollGrid, g, off):
    """Neighbor-bin view: value at bin c comes from bin c+off (mod nc)."""
    nx, ny, nz = grid.ncells
    g4 = g.reshape(nx, ny, nz, *g.shape[1:])
    g4 = jnp.roll(g4, shift=(-off[0], -off[1], -off[2]), axis=(0, 1, 2))
    return g4.reshape(g.shape)


def _radial_basis(aev_spec, d, fc):
    """[..., R] radial terms via the uniform-shift recurrence (2 exps)."""
    eta = aev_spec.eta_r[0]
    shf = np.asarray(aev_spec.shf_r)
    mu0 = float(shf[0])
    if len(shf) > 1:
        delta = float(shf[1] - shf[0])
        # exact uniform grid expected (torchani linspace); fall back to
        # direct exponentials if not
        uniform = np.allclose(np.diff(shf), delta, rtol=1e-6)
    else:
        uniform = False
    if uniform and len(aev_spec.eta_r) == 1 and d.dtype == jnp.float64:
        # running product t_k = exp(-eta (x - k delta)^2): every
        # intermediate IS a basis value in (0, 1], so nothing overflows
        # (naive A * B^k * C_k blows past f64 range before cancelling).
        # f64 ONLY: in f32 the first term exp(-eta x^2) UNDERFLOWS for
        # x > ~2.1 A and the recurrence can never recover — silently
        # zeroing every outer radial shell. f32 uses direct exps below.
        x = d - mu0
        t = jnp.exp(-eta * x * x)  # exp #1
        b = jnp.exp(2.0 * eta * delta * x)  # exp #2
        step = [float(np.exp(-eta * delta * delta * (2 * k - 1)))
                for k in range(len(shf))]
        terms = [t]
        for k in range(1, len(shf)):
            t = t * b * step[k]
            terms.append(t)
        out = jnp.stack(terms, axis=-1)
    else:
        eta_r = jnp.asarray(aev_spec.eta_r, d.dtype).reshape(-1, 1)
        shf_r = jnp.asarray(aev_spec.shf_r, d.dtype).reshape(1, -1)
        out = jnp.exp(-eta_r * (d[..., None, None] - shf_r) ** 2)
        out = out.reshape(*d.shape, -1)
    return 0.25 * out * fc[..., None]


def radial_aev_cellroll(aev_spec, grid: RollGrid, bins: RollBins, pos, box,
                        cell_chunk: int = 4096):
    """[n, S*R] radial AEV, gather-free. Differentiable w.r.t. pos and
    box.h (plain autodiff — every op here has a cheap TPU transpose:
    rolls transpose to rolls, the n-scatter to an n-gather)."""
    spec = aev_spec
    dtype = pos.dtype
    s_count = spec.num_species
    r_len = spec.radial_sublength
    cutoff = spec.radial_cutoff

    pos_grid = scatter_to_grid(grid, bins, pos, fill=1e6)
    onehot_nbr_all = jax.nn.one_hot(bins.species_grid, s_count, dtype=dtype)
    onehot_nbr_all = onehot_nbr_all * bins.mask_grid[..., None]

    total, cap = grid.total, grid.cap
    eye = jnp.arange(cap)[:, None] == jnp.arange(cap)[None, :]
    pad = (-total) % cell_chunk
    n_chunks = (total + pad) // cell_chunk

    def padded(x):
        return jnp.pad(
            x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    @jax.checkpoint
    def pair_chunk(args):
        """One z-chunk of one offset: [c, cap, S*R] contribution.

        Chunked + rematerialized: the [*, cap, cap, R] pair intermediates
        never exceed ~cell_chunk * cap^2 * R floats in HBM.
        """
        my_pos, nbr_pos, nbr_oh, self_excl = args
        d = my_pos[:, :, None, :] - nbr_pos[:, None, :, :]
        dist2 = jnp.sum(d * d, axis=-1)  # [c, a, b]
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        in_cut = (dist <= cutoff) & ~(self_excl & eye[None, :, :])
        fc = jnp.where(
            in_cut, 0.5 * jnp.cos(dist * (math.pi / cutoff)) + 0.5, 0.0)
        # clamp before the basis: the exp recurrence overflows at the 1e6
        # empty-slot park distance (inf * fc=0 would be NaN)
        d_eff = jnp.minimum(dist, cutoff + 1.0)
        rt = _radial_basis(spec, d_eff, fc)  # [c, a, b, R]
        out = jnp.einsum("zabr,zbs->zasr", rt, nbr_oh,
                         preferred_element_type=dtype)
        return out.reshape(-1, cap, s_count * r_len)

    def offset_contrib(off):
        shift = jnp.asarray(_wrap_shift(grid, off), dtype)  # [total, 3]
        nbr_pos = _roll_cells(grid, pos_grid, off)  # [total, cap, 3]
        nbr_oh = _roll_cells(grid, onehot_nbr_all, off)
        nbr_pos = nbr_pos + jnp.matmul(
            shift, box.h,
            precision=jax.lax.Precision.HIGHEST)[:, None, :]
        self_excl = jnp.full((total, 1, 1), off == (0, 0, 0))
        args = jax.tree.map(
            lambda x: padded(x).reshape(n_chunks, cell_chunk, *x.shape[1:]),
            (pos_grid, nbr_pos, nbr_oh, self_excl))
        out = jax.lax.map(pair_chunk, args)
        return out.reshape(total + pad, cap, s_count * r_len)[:total]

    acc = jnp.zeros((total, cap, s_count * r_len), dtype)
    for off in _OFFSETS:  # static 27-way unroll: rolls are layout-only
        acc = acc + offset_contrib(off)
    return gather_from_grid(bins, acc)
