"""Multi-chip spatial domain decomposition over a TPU device mesh.

TPU-native replacement for the reference's scale-out machinery: LAMMPS 3-D
brick decomposition + MPI ghost exchange (SURVEY.md §2.3;
/root/reference/src/pair_ani.cpp:255-283,461-484). Design:

  * The global box is cut into a (px, py, pz) grid of equal fractional
    bricks, one per device of a `jax.sharding.Mesh` with axes
    ("dx", "dy", "dz"). Every per-atom array is `[n_shards * n_cap, ...]`
    sharded on dim 0; each shard holds `n_cap` fixed slots (invalid slots
    carry species -1), so every shape is static.

  * Halo exchange is the LAMMPS 6-way staged protocol re-expressed as
    `lax.ppermute` over mesh axes: stage x sends boundary-margin atoms to
    the left/right x-neighbor, stage y operates on local+x-ghosts, stage z
    on all of it — corner ghosts fall out automatically. An axis of size 1
    degenerates to a self-send, which *is* periodic-image construction, so
    the same code path covers both sharded and unsharded directions.

  * There is no reverse force communication. Per-step ghost positions are
    recomputed from owner positions *inside* the differentiated energy
    function (`halo_positions`), so `jax.grad` transposes the gathers into
    scatters and each `ppermute` into its inverse permutation — ghost
    forces arrive back on their owners' shards by construction. This
    replaces `PairANI::pack/unpack_reverse_comm` + newton bookkeeping
    (/root/reference/src/pair_ani.cpp:374-390,461-484) with autodiff.

  * Atom migration between bricks happens at neighbor rebuilds, staged
    per sharded axis like LAMMPS `Comm::exchange` (diagonal moves resolve
    over successive axis passes). Capacities are static; true counts are
    reduced with `lax.pmax` and surfaced to the host for rebuild-bigger.

Geometry contract: every brick extent must be >= rlist (cutoff + skin)
so halos come only from adjacent bricks — the same constraint LAMMPS
imposes for single-hop communication. Checked host-side in
`DomainSimulation`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops import neighbors as nbops

AXIS_NAMES = ("dx", "dy", "dz")
_FAR = 1.0e6  # parking position for invalid slots


@dataclasses.dataclass(frozen=True)
class DomainSpec:
    """Static decomposition geometry and capacities (jit-static)."""

    mesh_shape: tuple[int, int, int]
    n_cap: int  # owned-atom slots per shard
    halo_cap: tuple[int, int, int]  # ghost slots per direction, per axis stage
    mig_cap: int = 256  # migration slots per direction per axis
    k_max: int = 160  # neighbor slots per atom

    @property
    def n_shards(self) -> int:
        px, py, pz = self.mesh_shape
        return px * py * pz

    @property
    def n_ext(self) -> int:
        return self.n_cap + 2 * sum(self.halo_cap)


def _pack(mask: jax.Array, cap: int):
    """Fixed-capacity compaction: indices of True entries (+validity/count)."""
    n = mask.shape[0]
    idx, = jnp.nonzero(mask, size=cap, fill_value=n)
    valid = idx < n
    return jnp.minimum(idx, n - 1).astype(jnp.int32), valid, jnp.sum(
        mask, dtype=jnp.int32
    )


def _ppshift(x, axis: int, mesh_shape, direction: int):
    """ppermute along mesh axis `axis`: direction +1 sends to the right
    neighbor (so each shard receives from its left). Identity when the
    axis has a single shard — which turns the exchange into periodic
    self-images."""
    p = mesh_shape[axis]
    if p == 1:
        return x
    perm = [(i, (i + direction) % p) for i in range(p)]
    return lax.ppermute(x, AXIS_NAMES[axis], perm)


def _axis_index(axis: int, mesh_shape) -> jax.Array:
    if mesh_shape[axis] == 1:
        return jnp.zeros((), jnp.int32)
    return lax.axis_index(AXIS_NAMES[axis])


def _frac_axis(pos: jax.Array, box: nbops.Box, axis: int) -> jax.Array:
    return box.to_fractional(pos)[:, axis]


# ---------------------------------------------------------------------------
# Halo plan: built at rebuild, frozen between rebuilds.
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloStage:
    """One (axis, direction) exchange: what this shard sends, and the
    metadata of what it receives (species/validity are rebuild-constant)."""

    send_idx: jax.Array  # [cap] into the ext-so-far array
    send_valid: jax.Array  # [cap]
    send_shift: jax.Array  # [] float: +-1/0, lattice shift along the axis
    recv_valid: jax.Array  # [cap]
    recv_species: jax.Array  # [cap]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    stages: list  # 6 HaloStage: (x->right, x->left, y->right, ...)
    overflow: jax.Array  # [] bool

    def ext_species(self, species_local: jax.Array) -> jax.Array:
        parts = [species_local]
        for st in self.stages:
            parts.append(jnp.where(st.recv_valid, st.recv_species, -1))
        return jnp.concatenate(parts)

    def ext_valid(self, valid_local: jax.Array) -> jax.Array:
        parts = [valid_local]
        for st in self.stages:
            parts.append(st.recv_valid)
        return jnp.concatenate(parts)


def build_halo_plan(
    spec: DomainSpec,
    pos: jax.Array,  # [n_cap, 3] wrapped owned positions
    species: jax.Array,  # [n_cap] (-1 invalid)
    valid: jax.Array,  # [n_cap]
    box: nbops.Box,
    rlist: float,
) -> HaloPlan:
    """Runs under shard_map. Builds the 6-stage exchange plan.

    Both directions of an axis source from the set accumulated over the
    *previous* axes (locals + earlier-axis ghosts); ghosts received along
    an axis are never re-sent along that same axis. This is the LAMMPS
    staging invariant that makes corner ghosts appear exactly once."""
    perp = box.perp_lengths()
    stages = []
    ext_pos = pos
    ext_species = species
    ext_valid = valid
    overflow = jnp.zeros((), bool)

    for axis in range(3):
        p = spec.mesh_shape[axis]
        cap = spec.halo_cap[axis]
        me = _axis_index(axis, spec.mesh_shape)
        margin = jnp.asarray(rlist, pos.dtype) / perp[axis]
        lo = me.astype(pos.dtype) / p
        hi = (me.astype(pos.dtype) + 1.0) / p

        # frozen source set for this axis (both directions)
        src_pos, src_species, src_valid = ext_pos, ext_species, ext_valid
        frac = _frac_axis(src_pos, box, axis)
        for direction in (+1, -1):
            if direction == +1:  # send top margin to right neighbor
                send_mask = src_valid & (frac >= hi - margin)
                shift = jnp.where(me == p - 1, -1.0, 0.0).astype(pos.dtype)
            else:  # send bottom margin to left neighbor
                send_mask = src_valid & (frac < lo + margin)
                shift = jnp.where(me == 0, 1.0, 0.0).astype(pos.dtype)
            send_idx, send_valid, count = _pack(send_mask, cap)
            overflow = overflow | (count > cap)
            recv_valid = _ppshift(send_valid, axis, spec.mesh_shape, direction)
            recv_species = _ppshift(
                jnp.where(send_valid, src_species[send_idx], -1),
                axis, spec.mesh_shape, direction,
            )
            st = HaloStage(
                send_idx=send_idx, send_valid=send_valid, send_shift=shift,
                recv_valid=recv_valid, recv_species=recv_species,
            )
            stages.append(st)
            # materialize received ghosts; they join the source set of the
            # NEXT axis (src_* for this axis stays frozen)
            g = halo_stage_positions(src_pos, box, st, axis, spec.mesh_shape,
                                     direction)
            ext_pos = jnp.concatenate([ext_pos, g])
            ext_species = jnp.concatenate(
                [ext_species, jnp.where(st.recv_valid, st.recv_species, -1)])
            ext_valid = jnp.concatenate([ext_valid, st.recv_valid])

    return HaloPlan(stages=stages, overflow=overflow)


def halo_stage_positions(src_pos, box, stage: HaloStage, axis, mesh_shape,
                         direction):
    """[cap, 3] ghost positions received in one stage (differentiable)."""
    p = jnp.where(stage.send_valid[:, None],
                  src_pos[stage.send_idx], _FAR)
    p = p + stage.send_shift * box.h[axis]
    p = _ppshift(p, axis, mesh_shape, direction)
    return jnp.where(stage.recv_valid[:, None], p, _FAR)


def halo_positions(spec: DomainSpec, pos: jax.Array, box: nbops.Box,
                   plan: HaloPlan) -> jax.Array:
    """[n_ext, 3] extended positions from current owned positions.

    Re-run every step inside the differentiated energy (the forward
    position comm); its transpose under jax.grad is the reverse force
    comm. Stage order must match build_halo_plan exactly."""
    ext = pos
    si = 0
    for axis in range(3):
        cur = ext  # both directions of an axis source from the same set
        for direction in (+1, -1):
            g = halo_stage_positions(cur, box, plan.stages[si], axis,
                                     spec.mesh_shape, direction)
            ext = jnp.concatenate([ext, g])
            si += 1
    return ext


# ---------------------------------------------------------------------------
# Atom migration (rebuild-time, staged per sharded axis)
# ---------------------------------------------------------------------------

def migrate(spec: DomainSpec, payload: dict, valid: jax.Array,
            box: nbops.Box):
    """Move atoms whose wrapped position left this brick to the owning
    neighbor shard. payload: dict of [n_cap, ...] arrays incl. "pos".
    Returns (payload, valid, overflow)."""
    overflow = jnp.zeros((), bool)
    for axis in range(3):
        p = spec.mesh_shape[axis]
        if p == 1:
            continue
        me = _axis_index(axis, spec.mesh_shape)
        frac = _frac_axis(payload["pos"], box, axis)
        target = jnp.clip(jnp.floor(frac * p).astype(jnp.int32), 0, p - 1)
        go_right = valid & (target == (me + 1) % p)
        go_left = valid & (target == (me - 1) % p)
        if p == 2:  # right and left neighbor coincide; send one way only
            go_left = go_left & ~go_right
        stray = valid & (target != me) & ~go_right & ~go_left
        overflow = overflow | jnp.any(stray)  # >1-brick hop unsupported
        stay = valid & ~go_right & ~go_left

        parts = {k: [jnp.where(_bshape(stay, v), v, 0)]
                 for k, v in payload.items()}
        valid_parts = [stay]
        for direction, mask in ((+1, go_right), (-1, go_left)):
            idx, pk_valid, count = _pack(mask, spec.mig_cap)
            overflow = overflow | (count > spec.mig_cap)
            rv = _ppshift(pk_valid, axis, spec.mesh_shape, direction)
            for k, v in payload.items():
                sent = jnp.where(_bshape(pk_valid, v[idx]), v[idx], 0)
                parts[k].append(
                    _ppshift(sent, axis, spec.mesh_shape, direction))
            valid_parts.append(rv)

        comb_valid = jnp.concatenate(valid_parts)
        overflow = overflow | (
            jnp.sum(comb_valid, dtype=jnp.int32) > spec.n_cap)
        order = jnp.argsort(~comb_valid, stable=True)[: spec.n_cap]
        valid = comb_valid[order]
        payload = {
            k: jnp.concatenate(parts[k])[order] for k in payload
        }
    # normalize invalid slots (fill values from packing are 0, which would
    # otherwise alias species/gid 0)
    payload = dict(payload)
    payload["species"] = jnp.where(valid, payload["species"], -1)
    if "gid" in payload:
        payload["gid"] = jnp.where(valid, payload["gid"], -1)
    if "mass" in payload:
        payload["mass"] = jnp.where(valid, payload["mass"], 1.0)
    payload["pos"] = jnp.where(valid[:, None], payload["pos"],
                               box.origin + 0.5 * jnp.sum(box.h, axis=0))
    return payload, valid, overflow


def _bshape(mask, arr):
    """Broadcast a [n] mask against [n, ...] array."""
    return mask.reshape(mask.shape + (1,) * (arr.ndim - 1))


# ---------------------------------------------------------------------------
# Per-shard neighbor matrix over extended arrays
# ---------------------------------------------------------------------------

def build_neighbor_matrix_ext(
    pos_local: jax.Array,  # [n_cap, 3]
    valid_local: jax.Array,  # [n_cap]
    pos_ext: jax.Array,  # [n_ext, 3]
    valid_ext: jax.Array,  # [n_ext]
    rlist: float,
    k_max: int,
):
    """Brute per-shard neighbor build (cells variant in ops/cell_list.py
    covers the single-device path; a per-brick cell build lands with the
    large-system sharded bench). Returns (idx, mask, max_count)."""
    n = pos_local.shape[0]
    m = pos_ext.shape[0]
    d = pos_local[:, None, :] - pos_ext[None, :, :]
    dist2 = jnp.sum(d * d, axis=-1)
    within = dist2 < jnp.asarray(rlist, pos_local.dtype) ** 2
    not_self = jnp.arange(n)[:, None] != jnp.arange(m)[None, :]
    mask = within & not_self & valid_ext[None, :] & valid_local[:, None]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    key = jnp.where(mask, dist2, jnp.inf)
    k_eff = min(k_max, m)
    neg_key, idx = lax.top_k(-key, k_eff)
    if k_eff < k_max:
        neg_key = jnp.pad(neg_key, ((0, 0), (0, k_max - k_eff)),
                          constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k_max - k_eff)))
    nbr_mask = jnp.isfinite(neg_key)
    idx = jnp.where(nbr_mask, idx, 0).astype(jnp.int32)
    return idx, nbr_mask, jnp.max(counts)


@dataclasses.dataclass(frozen=True)
class BrickGrid:
    """Static per-brick cell-grid geometry for the sharded neighbor build.

    One brick = this shard's fractional sub-volume of the box expanded by
    the halo margin. All bricks share the same static shape; the brick's
    fractional origin is the only shard-dependent (traced) quantity."""

    ncells: tuple[int, int, int]  # cells per brick axis (incl. margin)
    margin_frac: tuple[float, float, float]  # halo margin, box fractions
    cell_capacity: int

    @property
    def total_cells(self) -> int:
        nx, ny, nz = self.ncells
        return nx * ny * nz

    @staticmethod
    def for_box(box_h, mesh_shape, rlist: float, cell_capacity: int,
                slack: float = 1.0):
        """None if a brick doesn't fit a 2-cell grid along every axis
        (callers fall back to the brute build then)."""
        h = np.asarray(box_h, np.float64)
        v = abs(np.dot(h[0], np.cross(h[1], h[2])))
        perp = np.array([
            v / np.linalg.norm(np.cross(h[1], h[2])),
            v / np.linalg.norm(np.cross(h[2], h[0])),
            v / np.linalg.norm(np.cross(h[0], h[1])),
        ])
        side = rlist * slack
        ncells, margins = [], []
        for a in range(3):
            brick = perp[a] / mesh_shape[a]
            margin = rlist / perp[a]  # box-fraction halo margin
            extent = brick + 2.0 * rlist
            n = int(np.floor(extent / side))
            if n < 2:
                return None
            ncells.append(n)
            margins.append(float(margin))
        return BrickGrid(ncells=tuple(ncells),
                         margin_frac=tuple(margins),
                         cell_capacity=cell_capacity)


def build_neighbor_matrix_brick(
    spec: DomainSpec,
    grid: BrickGrid,
    pos_local: jax.Array,  # [n_cap, 3]
    valid_local: jax.Array,
    pos_ext: jax.Array,  # [n_ext, 3] local + halo (halo pre-shifted)
    valid_ext: jax.Array,
    box,  # ops.neighbors.Box (replicated)
    rlist: float,
    k_max: int,
):
    """O(n) per-brick cell-list neighbor build (runs under shard_map).

    The sharded analog of ops/cell_list.build_neighbor_matrix_cells and of
    LAMMPS's per-domain binning: halo positions are already physically
    shifted, so box-fractional coordinates are CONTINUOUS around the brick
    and a brick-anchored uniform grid needs no wrap handling. Same output
    contract as build_neighbor_matrix_ext."""
    n = pos_local.shape[0]
    m = pos_ext.shape[0]
    dtype = pos_local.dtype
    mesh = spec.mesh_shape

    # brick-anchored fractional coords: u = (frac - brick_lo + margin)
    #                                      / (brick_extent + 2 margin)
    frac = box.to_fractional(pos_ext)  # [m, 3], continuous around brick
    lo = jnp.stack([_axis_index(a, mesh).astype(dtype) / mesh[a]
                    for a in range(3)])
    extent = jnp.asarray([1.0 / mesh[a] for a in range(3)], dtype)
    marg = jnp.asarray(grid.margin_frac, dtype)
    u = (frac - lo[None, :] + marg[None, :]) / (extent + 2.0 * marg)[None, :]

    ncells = jnp.asarray(grid.ncells, jnp.int32)
    cc = jnp.clip((u * ncells).astype(jnp.int32), 0, ncells - 1)
    in_grid = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    cell_ids = (cc[:, 0] * grid.ncells[1] + cc[:, 1]) * grid.ncells[2] \
        + cc[:, 2]

    # dense [total_cells, cap] table: sort + rank + scatter (no atomics)
    sentinel = grid.total_cells
    ids = jnp.where(valid_ext & in_grid, cell_ids, sentinel)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    first = jnp.searchsorted(ids_sorted, ids_sorted, side="left")
    rank = jnp.arange(m, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (rank < grid.cell_capacity) & (ids_sorted < sentinel)
    table = jnp.full((grid.total_cells + 1, grid.cell_capacity), m,
                     jnp.int32)
    table = table.at[
        jnp.where(ok, ids_sorted, sentinel),
        jnp.clip(rank, 0, grid.cell_capacity - 1),
    ].set(order.astype(jnp.int32), mode="drop")
    table = table[:-1]
    table_overflow = jnp.max(jnp.where(ids_sorted < sentinel, rank, -1)) \
        + 1 > grid.cell_capacity

    offsets = jnp.asarray(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)], jnp.int32)
    cutoff2 = jnp.asarray(rlist, dtype) ** 2
    n_cand = 27 * grid.cell_capacity

    cc_local = cc[:n]
    nbr_cells = cc_local[:, None, :] + offsets[None, :, :]  # [n, 27, 3]
    cell_ok = jnp.all((nbr_cells >= 0) & (nbr_cells < ncells), axis=-1)
    nbr_flat = ((jnp.clip(nbr_cells, 0, ncells - 1)[..., 0]
                 * grid.ncells[1]
                 + jnp.clip(nbr_cells, 0, ncells - 1)[..., 1])
                * grid.ncells[2]
                + jnp.clip(nbr_cells, 0, ncells - 1)[..., 2])
    cand = jnp.where(cell_ok[..., None], table[nbr_flat], m)
    cand = cand.reshape(n, n_cand)
    cand_safe = jnp.minimum(cand, m - 1)
    cpos = pos_ext[cand_safe]
    d = pos_local[:, None, :] - cpos
    dist2 = jnp.sum(d * d, axis=-1)
    row = jnp.arange(n, dtype=jnp.int32)
    mask = ((cand < m) & (dist2 < cutoff2) & (cand != row[:, None])
            & valid_local[:, None])
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    key = jnp.where(mask, dist2, jnp.inf)
    k_eff = min(k_max, n_cand)
    neg_key, sel = lax.top_k(-key, k_eff)
    if k_eff < k_max:
        neg_key = jnp.pad(neg_key, ((0, 0), (0, k_max - k_eff)),
                          constant_values=-jnp.inf)
        sel = jnp.pad(sel, ((0, 0), (0, k_max - k_eff)))
    nbr_mask = jnp.isfinite(neg_key)
    idx = jnp.where(nbr_mask,
                    jnp.take_along_axis(cand_safe, sel, axis=1),
                    0).astype(jnp.int32)
    max_deg = jnp.where(table_overflow, k_max + 1, jnp.max(counts))
    return idx, nbr_mask, max_deg


def auto_domain_spec(n_atoms: int, box_h, mesh_shape, rlist: float,
                     k_max: int = 160, slack: float = 1.3,
                     n_slack: float = 1.15) -> DomainSpec:
    """Geometry-derived capacities: per-shard atom slots from the mean
    brick occupancy, per-stage halo slots from the rlist slab volumes
    (each axis stage sources locals + earlier-stage ghosts, the LAMMPS
    staging rule). Every capacity is a starting point — run()'s
    structured overflow regrow owns correctness, this just avoids the
    first few regrow recompiles."""
    h = np.asarray(box_h, np.float64)
    v = abs(np.dot(h[0], np.cross(h[1], h[2])))
    perp = np.array([
        v / np.linalg.norm(np.cross(h[1], h[2])),
        v / np.linalg.norm(np.cross(h[2], h[0])),
        v / np.linalg.norm(np.cross(h[0], h[1])),
    ])
    ns = int(np.prod(mesh_shape))
    if ns == 1:
        n_slack = 1.0  # no migration imbalance on a single shard
    n_cap = int(-(-int(n_atoms / ns * n_slack + 64) // 8) * 8)
    n_src = n_cap
    halo = []
    for a in range(3):
        send_frac = min(rlist * mesh_shape[a] / perp[a], 1.0)
        cap = int(-(-int(n_src * send_frac * slack + 128) // 8) * 8)
        halo.append(cap)
        n_src += 2 * cap
    return DomainSpec(mesh_shape=tuple(mesh_shape), n_cap=n_cap,
                      halo_cap=tuple(halo),
                      mig_cap=max(256, n_cap // 16), k_max=k_max)


# ---------------------------------------------------------------------------
# Brick-local roll grid (sharded assignment-compacted AEV path)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BrickRollGrid:
    """Per-brick bin geometry for the sharded `pallas_asn` engine.

    The single-device Mosaic kernels (ops/aev_asn.py) assume a PERIODIC
    grid: candidate windows come from periodic halo pads and the wing
    fold-back uses wrapping rolls. A brick is not periodic — so the brick
    grid carries one EMPTY pad-cell layer on each side: every occupied
    cell (owned atoms in the brick, halo ghosts in the rlist margin) is
    interior, its 27-window never wraps, and the wrapping that does occur
    touches only empty cells. The kernels then run UNCHANGED per shard;
    all wrap-shift tables contract zero gamma, and the box cotangent
    flows through the halo stages' periodic shifts instead
    (halo_stage_positions). This is how the reference keeps ONE kernel
    path for single- and multi-GPU (pair_ani_kokkos.cpp:143-191: the
    same cuaev kernels under domain decomposition).

    Static across shards (bricks are congruent); the brick's fractional
    origin — the only shard-dependent input — is traced from the mesh
    axis index at bin time."""

    ncells: tuple[int, int, int]  # per axis, INCLUDING the 2 pad layers
    cap: int  # slots per cell
    margin_frac: tuple[float, float, float]  # halo margin, box fractions
    cell_frac: tuple[float, float, float]  # cell size, box fractions

    @property
    def roll(self):
        """The RollGrid the aev_asn kernels see."""
        from ..ops import cell_roll as crmod
        return crmod.RollGrid(ncells=self.ncells, cap=self.cap)

    @staticmethod
    def for_box(box_h, mesh_shape, rlist: float, side_min: float,
                cap: int):
        """Cells of perpendicular side >= side_min covering one brick
        plus its rlist halo margin, plus the empty pad layer."""
        h = np.asarray(box_h, np.float64)
        v = abs(np.dot(h[0], np.cross(h[1], h[2])))
        perp = np.array([
            v / np.linalg.norm(np.cross(h[1], h[2])),
            v / np.linalg.norm(np.cross(h[2], h[0])),
            v / np.linalg.norm(np.cross(h[0], h[1])),
        ])
        ncells, margins, cells = [], [], []
        for a in range(3):
            margin = rlist / perp[a]
            occ_frac = 1.0 / mesh_shape[a] + 2.0 * margin
            n_occ = int(np.floor(occ_frac * perp[a] / side_min))
            if n_occ < 1:
                return None
            ncells.append(n_occ + 2)
            margins.append(float(margin))
            cells.append(float(occ_frac / n_occ))
        return BrickRollGrid(ncells=tuple(ncells), cap=cap,
                             margin_frac=tuple(margins),
                             cell_frac=tuple(cells))


def build_bins_brick(bgrid: BrickRollGrid, mesh_shape, pos_ext, species_ext,
                     valid_ext, box):
    """RollBins over a brick's extended atoms (runs under shard_map).

    Halo positions are already physically shifted, so box-fractional
    coordinates are continuous around the brick; atoms land in the
    occupied cell layers [1, ncells-2] by construction (clipped for edge
    rounding). Invalid slots are dropped from the grid and point their
    cell/slot at (0, 0) — an empty pad cell whose AEV row is finite and
    masked downstream; their position cotangent is zeroed by the caller
    (jnp.where on valid_ext)."""
    from ..ops import cell_roll as crmod

    m = pos_ext.shape[0]
    dtype = pos_ext.dtype
    frac = box.to_fractional(pos_ext)
    lo = jnp.stack([_axis_index(a, mesh_shape).astype(dtype) / mesh_shape[a]
                    for a in range(3)])
    marg = jnp.asarray(bgrid.margin_frac, dtype)
    cf = jnp.asarray(bgrid.cell_frac, dtype)
    nc = jnp.asarray(bgrid.ncells, jnp.int32)
    # grid origin = brick_lo - margin - one pad cell; extent = cf * ncells
    u = (frac - (lo - marg - cf)[None, :]) / (cf * nc.astype(dtype))[None, :]
    cc = jnp.clip((u * nc.astype(dtype)).astype(jnp.int32), 1, nc - 2)
    cell = (cc[:, 0] * bgrid.ncells[1] + cc[:, 1]) * bgrid.ncells[2] \
        + cc[:, 2]

    total, cap = bgrid.roll.total, bgrid.cap
    sentinel = total
    ids = jnp.where(valid_ext, cell, sentinel)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    first = jnp.searchsorted(ids_sorted, ids_sorted, side="left")
    rank_sorted = jnp.arange(m, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)
    count_max = jnp.max(
        jnp.where(ids_sorted < sentinel, rank_sorted, -1)) + 1
    ok = valid_ext & (slot < cap)
    species_grid = jnp.full((total, cap), -1, jnp.int32)
    species_grid = species_grid.at[
        jnp.where(ok, cell, total), jnp.where(ok, slot, 0)
    ].set(jnp.where(valid_ext, species_ext, -1), mode="drop")
    flat = jnp.where(ok, cell * cap + jnp.minimum(slot, cap - 1),
                     total * cap)
    inv = jnp.full((total * cap,), m, jnp.int32)
    inv = inv.at[flat].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
    return crmod.RollBins(
        cell=jnp.where(valid_ext, cell, 0),
        slot=jnp.where(valid_ext, jnp.minimum(slot, cap - 1), 0),
        species_grid=species_grid, mask_grid=species_grid >= 0,
        count_max=count_max, inv=inv.reshape(total, cap))


# ---------------------------------------------------------------------------
# Ext-rowed neighbor build (mirror-force support, ops/nbr_grad.py)
# ---------------------------------------------------------------------------

def build_ext_rows(
    pos_local: jax.Array,  # [n_cap, 3]
    valid_local: jax.Array,  # [n_cap]
    pos_ext: jax.Array,  # [n_ext, 3]
    valid_ext: jax.Array,  # [n_ext]
    rlist: float,
    k_ext: int,
):
    """[m, k_ext] neighbor rows for EVERY extended atom over LOCAL
    candidates only — the transposed structure `build_mirror_ext` needs
    to turn the force scatter into a gather. Brute O(m*n) variant; the
    brick variant below is the production build. Returns
    (ext_idx, ext_mask, max_deg_ext)."""
    n = pos_local.shape[0]
    m = pos_ext.shape[0]
    d = pos_ext[:, None, :] - pos_local[None, :, :]
    dist2 = jnp.sum(d * d, axis=-1)
    within = dist2 < jnp.asarray(rlist, pos_local.dtype) ** 2
    not_self = jnp.arange(m)[:, None] != jnp.arange(n)[None, :]
    mask = within & not_self & valid_local[None, :] & valid_ext[:, None]
    return _rows_topk(mask, dist2, k_ext)


def build_ext_rows_brick(
    spec: DomainSpec,
    grid: BrickGrid,
    pos_local: jax.Array,
    valid_local: jax.Array,
    pos_ext: jax.Array,
    valid_ext: jax.Array,
    box,
    rlist: float,
    k_ext: int,
):
    """O(m) brick-cell variant of `build_ext_rows` (runs under shard_map).

    Bins only the LOCAL atoms (the candidate set of every ext row), then
    window-gathers per ext atom. Any ghost outside the brick-plus-margin
    grid is > rlist from every local atom (margin = rlist), so clipping
    its cell coordinate is safe."""
    n = pos_local.shape[0]
    m = pos_ext.shape[0]
    dtype = pos_local.dtype
    mesh = spec.mesh_shape

    frac = box.to_fractional(pos_ext)
    lo = jnp.stack([_axis_index(a, mesh).astype(dtype) / mesh[a]
                    for a in range(3)])
    extent = jnp.asarray([1.0 / mesh[a] for a in range(3)], dtype)
    marg = jnp.asarray(grid.margin_frac, dtype)
    u = (frac - lo[None, :] + marg[None, :]) / (extent + 2.0 * marg)[None, :]
    ncells = jnp.asarray(grid.ncells, jnp.int32)
    cc = jnp.clip((u * ncells).astype(jnp.int32), 0, ncells - 1)
    cell_ids = (cc[:, 0] * grid.ncells[1] + cc[:, 1]) * grid.ncells[2] \
        + cc[:, 2]

    # bin locals only (values are local ids; fill = n)
    in_grid_l = jnp.all((u[:n] >= 0.0) & (u[:n] < 1.0), axis=-1)
    sentinel = grid.total_cells
    ids = jnp.where(valid_local & in_grid_l, cell_ids[:n], sentinel)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    first = jnp.searchsorted(ids_sorted, ids_sorted, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    ok = (rank < grid.cell_capacity) & (ids_sorted < sentinel)
    table = jnp.full((grid.total_cells + 1, grid.cell_capacity), n,
                     jnp.int32)
    table = table.at[
        jnp.where(ok, ids_sorted, sentinel),
        jnp.clip(rank, 0, grid.cell_capacity - 1),
    ].set(order.astype(jnp.int32), mode="drop")
    table = table[:-1]
    table_overflow = jnp.max(jnp.where(ids_sorted < sentinel, rank, -1)) \
        + 1 > grid.cell_capacity

    offsets = jnp.asarray(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)], jnp.int32)
    nbr_cells = cc[:, None, :] + offsets[None, :, :]  # [m, 27, 3]
    cell_ok = jnp.all((nbr_cells >= 0) & (nbr_cells < ncells), axis=-1)
    ncl = jnp.clip(nbr_cells, 0, ncells - 1)
    nbr_flat = ((ncl[..., 0] * grid.ncells[1] + ncl[..., 1])
                * grid.ncells[2] + ncl[..., 2])
    cand = jnp.where(cell_ok[..., None], table[nbr_flat], n)
    cand = cand.reshape(m, 27 * grid.cell_capacity)
    cand_safe = jnp.minimum(cand, n - 1)
    d = pos_ext[:, None, :] - pos_local[cand_safe]
    dist2 = jnp.sum(d * d, axis=-1)
    row = jnp.arange(m, dtype=jnp.int32)
    mask = ((cand < n) & (dist2 < jnp.asarray(rlist, dtype) ** 2)
            & (cand != row[:, None]) & valid_ext[:, None])
    ext_idx, ext_mask, max_deg = _rows_topk(mask, dist2, k_ext,
                                            gather_from=cand_safe)
    max_deg = jnp.where(table_overflow, k_ext + 1, max_deg)
    return ext_idx, ext_mask, max_deg


def _rows_topk(mask, dist2, k, gather_from=None):
    """Shared top-k slot selection: (idx, mask, max_count)."""
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    key = jnp.where(mask, dist2, jnp.inf)
    k_eff = min(k, key.shape[1])
    neg_key, sel = lax.top_k(-key, k_eff)
    if k_eff < k:
        neg_key = jnp.pad(neg_key, ((0, 0), (0, k - k_eff)),
                          constant_values=-jnp.inf)
        sel = jnp.pad(sel, ((0, 0), (0, k - k_eff)))
    out_mask = jnp.isfinite(neg_key)
    if gather_from is not None:
        sel = jnp.take_along_axis(
            gather_from, jnp.minimum(sel, gather_from.shape[1] - 1), axis=1)
    idx = jnp.where(out_mask, sel, 0).astype(jnp.int32)
    return idx, out_mask, jnp.max(counts)
