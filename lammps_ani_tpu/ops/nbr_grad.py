"""Scatter-free neighbor displacements with a mirror-gather backward.

The force backward of a gathered displacement `pos[i] - pos[src[i,k]]` is,
under plain autodiff, a scatter-add of [n, k, 3] cotangents — XLA lowers
TPU scatters to a serialized form that dominates the whole MD step (375 ms
of a 450 ms step at 100k atoms). This module replaces it with the
full-neighbor-list symmetry the reference's plain path encodes as
"newton off + complete neighbor info per domain"
(/root/reference/src/pair_ani.cpp:76-79,374-382):

    every directed slot (i -> owner j, image shift S) has exactly one
    mirror slot (j -> owner i, shift -S),

so the neighbor-role force on atom i is a *gather* over i's own mirror
slots instead of a scatter from everyone else's rows:

    dE/dpos[i] = sum_k g[i, k]            (center role, row reduce)
               - sum_k g.flat[mirror[i, k]]  (neighbor role, gather)

where g = dE/d diff. The mirror table is built once per neighbor-list
rebuild (build_mirror). The box cotangent (virial path) is the exact
shift-weighted sum  dE/dh = -sum shift^T g.

Symmetry prerequisite: the neighbor matrix must be untruncated (the
engine's overflow check guarantees it) — distance symmetry in fp holds
bit-exactly because negation is exact.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_NO_SHIFT_CODE = 13  # (0,0,0) in the 3x3x3 shift enumeration


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MirrorNeighbors:
    """Owner-resolved neighbor structure with mirror-slot tables.

    Two channels, frozen between rebuilds:
      * the full radial list [n, k] — consumed as *distances only*
        (radial AEV + repulsion), so its force backward moves one scalar
        per slot (`neighbor_dist`);
      * an angular sub-list [n, ka] of slots within
        angular_cutoff + skin — the only channel needing displacement
        *vectors*, ~7x narrower, with its own mirror table.
    """

    src: jax.Array  # [n, k] int32 owner rows
    shift: jax.Array  # [n, k, 3] int32 image shifts
    mirror: jax.Array  # [n, k] int32 flat mirror slot indices
    mask: jax.Array  # [n, k] bool
    ok: jax.Array  # [] bool — every valid slot found its mirror
    species_j: jax.Array | None = None  # [n, k] — hoisted: species are
    # rebuild-constant; gathering them per step costs ~100 ms at 100k atoms
    ang_src: jax.Array | None = None  # [n, ka]
    ang_shift: jax.Array | None = None  # [n, ka, 3]
    ang_mirror: jax.Array | None = None  # [n, ka]
    ang_mask: jax.Array | None = None  # [n, ka]
    ang_species: jax.Array | None = None  # [n, ka]
    ang_count_max: jax.Array | None = None  # [] — overflow detection


def _subset_nlist(nlist, pos, box, n_local, cutoff, cap):
    """Compact slots with current dist < cutoff into [n, cap] (one-hot
    matmul compaction, no sorts). Returns (sub NeighborList, max count)."""
    from . import neighbors as nbops

    pos_ext = nbops.extended_positions(pos, box, nlist.ghosts)
    pj = pos_ext[nlist.idx]
    d = pos[:, None, :] - pj
    dist2 = jnp.sum(d * d, axis=-1)
    keep = nlist.mask & (dist2 < cutoff * cutoff)
    count = jnp.sum(keep, axis=1, dtype=jnp.int32)
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    slot = jax.nn.one_hot(jnp.where(keep, rank, cap), cap,
                          dtype=jnp.float32)
    idx_a = jnp.round(jnp.einsum(
        "nkc,nk->nc", slot, nlist.idx.astype(jnp.float32))).astype(jnp.int32)
    mask_a = jnp.einsum("nkc,nk->nc", slot,
                        keep.astype(jnp.float32)) > 0.5
    sub = nbops.NeighborList(idx=jnp.where(mask_a, idx_a, 0), mask=mask_a,
                             ghosts=nlist.ghosts, max_count=jnp.max(count))
    return sub, jnp.max(count)


def mirror_neighbors(nlist, n_local: int, chunk: int = 2048,
                     pos=None, box=None, ang_cutoff: float | None = None,
                     ang_cap: int | None = None,
                     species=None, main_mirror: bool = True
                     ) -> MirrorNeighbors:
    """Resolve a NeighborList into the owner/shift/mirror form.

    With (pos, box, ang_cutoff, ang_cap) given, also builds the angular
    sub-channel (slots within ang_cutoff at build time; size the cutoff
    with the skin so the frozen subset stays complete between rebuilds).
    With `species` given, hoists the per-slot neighbor species here.
    """
    src, shift = resolve_owners(nlist, n_local)
    if main_mirror:
        mirror, ok = build_mirror(nlist, n_local, chunk=chunk)
    else:  # radial channel served by the cell-roll path: no mirror needed
        mirror = jnp.zeros_like(nlist.idx)
        ok = jnp.ones((), bool)
    ang = {}
    if species is not None:
        ang["species_j"] = jnp.where(nlist.mask, species[src], -1)
    if ang_cutoff is not None:
        sub, cnt = _subset_nlist(nlist, pos, box, n_local, ang_cutoff,
                                 ang_cap)
        a_src, a_shift = resolve_owners(sub, n_local)
        a_mirror, a_ok = build_mirror(sub, n_local, chunk=chunk)
        ok = ok & a_ok & (cnt <= ang_cap)
        ang.update(ang_src=a_src, ang_shift=a_shift, ang_mirror=a_mirror,
                   ang_mask=sub.mask, ang_count_max=cnt)
        if species is not None:
            ang["ang_species"] = jnp.where(sub.mask, species[a_src], -1)
    return MirrorNeighbors(src=src, shift=shift, mirror=mirror,
                           mask=nlist.mask, ok=ok, **ang)


def shift_code(shift: jax.Array) -> jax.Array:
    """[..., 3] int shift in {-1,0,1} -> [..., ] code in [0, 27)."""
    s = shift + 1
    return (s[..., 0] * 3 + s[..., 1]) * 3 + s[..., 2]


def resolve_owners(nlist, n_local: int):
    """Map a NeighborList over [local; ghosts] to (owner index, image shift).

    Returns (src [n,k] int32 owner rows, shift [n,k,3] int32).
    """
    ghosts = nlist.ghosts
    ext_src = jnp.concatenate(
        [jnp.arange(n_local, dtype=jnp.int32), ghosts.src])
    ext_shift = jnp.concatenate(
        [jnp.zeros((n_local, 3), jnp.int32), ghosts.shift])
    return ext_src[nlist.idx], ext_shift[nlist.idx]


def build_mirror(nlist, n_local: int, chunk: int = 2048):
    """[n, k] int32 flat index of each slot's mirror slot (+ ok flag).

    mirror[i, k] = j * k_max + k' where idx[j, k'] is the ghost/local copy
    of i with the opposite image shift. Built per rebuild; O(n k^2 / chunk)
    dense compares, no sorts.
    """
    idx, mask = nlist.idx, nlist.mask
    n, k_max = idx.shape
    ghosts = nlist.ghosts
    g_cap = ghosts.src.shape[0]

    # ext id of (owner, shift-code): local atoms at code 13, ghosts scattered
    lookup = jnp.full((n_local, 27), -1, jnp.int32)
    lookup = lookup.at[:, _NO_SHIFT_CODE].set(jnp.arange(n_local,
                                                         dtype=jnp.int32))
    gcode = shift_code(ghosts.shift)
    # masked ghost slots are routed out of bounds and dropped
    lookup = lookup.at[
        jnp.where(ghosts.mask, ghosts.src, n_local),
        jnp.where(ghosts.mask, gcode, 0),
    ].set(n_local + jnp.arange(g_cap, dtype=jnp.int32), mode="drop")

    src, shift = resolve_owners(nlist, n_local)  # [n,k], [n,k,3]
    inv_code = shift_code(-shift)

    def chunk_fn(args):
        idx_c, src_c, inv_c, mask_c, rows_c = args
        # target ext id: the copy of *me* (row atom) with the opposite shift
        tgt = lookup[rows_c[:, None], inv_c]  # [c, k]
        rows_of_j = idx[src_c]  # [c, k, k_max]
        hit = rows_of_j == tgt[..., None]
        kprime = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        found = jnp.any(hit, axis=-1) & (tgt >= 0)
        mirror = src_c * k_max + kprime
        ok = jnp.all(found | ~mask_c)
        return jnp.where(mask_c, mirror, 0), ok

    rows = jnp.arange(n, dtype=jnp.int32)
    pad = (-n) % chunk
    padded = lambda x: jnp.pad(
        x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x
    args = tuple(
        padded(x).reshape(-1, chunk, *x.shape[1:])
        for x in (idx, src, inv_code, mask, rows)
    )
    mirror, oks = jax.lax.map(chunk_fn, args)
    return mirror.reshape(-1, k_max)[:n], jnp.all(oks)


@jax.custom_vjp
def neighbor_diff(pos, h, src, shift_f, mirror, mask):
    """[n, k, 3] diff = pos_i - (pos[src] + shift @ h), scatter-free grad."""
    return _diff_fwd_impl(pos, h, src, shift_f, mask)


def _diff_fwd_impl(pos, h, src, shift_f, mask):
    pj = pos[src] + jnp.matmul(shift_f, h, precision=jax.lax.Precision.HIGHEST)
    diff = pos[:, None, :] - pj
    return jnp.where(mask[..., None], diff, 1.0)


def _diff_fwd(pos, h, src, shift_f, mirror, mask):
    return _diff_fwd_impl(pos, h, src, shift_f, mask), (shift_f, mirror, mask)


def _diff_bwd(res, g):
    shift_f, mirror, mask = res
    n, k_max, _ = g.shape
    g = jnp.where(mask[..., None], g, 0.0)
    # center role: row reduce; neighbor role: mirror gather (no scatter).
    # invalid slots carry mirror index 0 -> mask the gathered values too.
    mirrored = g.reshape(n * k_max, 3)[mirror] * mask[..., None]
    dpos = jnp.sum(g, axis=1) - jnp.sum(mirrored, axis=1)
    dh = -jnp.einsum("nka,nkb->ab", shift_f, g,
                     preferred_element_type=g.dtype)
    return dpos, dh, None, None, None, None


neighbor_diff.defvjp(_diff_fwd, _diff_bwd)


@jax.custom_vjp
def neighbor_dist(pos, h, src, shift_f, mirror, mask):
    """[n, k] distances with a scalar-cotangent mirror backward.

    For distance-only consumers (radial AEV, repulsion) the force backward
    needs one scalar per slot, not a 3-vector: by the mirror symmetry
    unit_{j,k'} = -unit_{i,k}, the neighbor-role contribution collapses to

        dpos[i] = sum_k (g[i,k] + g.flat[mirror[i,k]]) * unit[i,k]

    so the cross-row traffic is an [n*k] f32 gather — 3x less than the
    vector channel, and the dominant-gather table drops below cacheable
    size. dh = -sum shift^T (g unit) uses own-row terms only (each slot's
    h-dependence is counted on its own row exactly once globally).
    """
    return _dist_fwd_impl(pos, h, src, shift_f, mask)


def _dist_fwd_impl(pos, h, src, shift_f, mask):
    pj = pos[src] + jnp.matmul(shift_f, h, precision=jax.lax.Precision.HIGHEST)
    diff = pos[:, None, :] - pj
    d = jnp.linalg.norm(jnp.where(mask[..., None], diff, 1.0), axis=-1)
    return jnp.where(mask, d, 1e6)


def _dist_fwd(pos, h, src, shift_f, mirror, mask):
    return (_dist_fwd_impl(pos, h, src, shift_f, mask),
            (pos, h, src, shift_f, mirror, mask))


def _dist_bwd(res, g):
    pos, h, src, shift_f, mirror, mask = res
    n, k_max = g.shape
    g = jnp.where(mask, g, 0.0)
    # recompute units (cheap relative to storing [n,k,3] residuals)
    pj = pos[src] + jnp.matmul(shift_f, h, precision=jax.lax.Precision.HIGHEST)
    diff = pos[:, None, :] - pj
    d = jnp.linalg.norm(jnp.where(mask[..., None], diff, 1.0), axis=-1)
    unit = jnp.where(mask[..., None], diff / d[..., None], 0.0)
    gm = g.reshape(n * k_max)[mirror] * mask
    dpos = jnp.sum((g + gm)[..., None] * unit, axis=1)
    dh = -jnp.einsum("nka,nk,nkb->ab", shift_f, g, unit,
                     preferred_element_type=g.dtype)
    return dpos, dh, None, None, None, None


neighbor_dist.defvjp(_dist_fwd, _dist_bwd)


# ---------------------------------------------------------------------------
# Extended-array (sharded) variant: ghosts are halo imports, not images
# ---------------------------------------------------------------------------


def build_mirror_ext(idx, mask, ext_idx, ext_mask, chunk: int = 2048):
    """Mirror table for the extended-array neighbor form (sharded path).

    In the sharded engine ghosts are halo-imported copies of remote atoms
    (parallel/domain.py), not periodic images of locals, so the
    owner/shift mirror of `build_mirror` doesn't apply. The symmetry that
    does: every directed slot (i local -> a ext) has a transposed entry in
    a's own row over local candidates (`ext_idx`), because dist2 is
    computed from the same subtraction up to exact negation. So

        mirror[a, q] = i * k_max + k'   with  i = ext_idx[a, q],
                                              idx[i, k'] = a,

    and the neighbor-role force on ext slot a becomes a gather over a's
    own row — the sharded analog of the reference's device-resident
    full-list accumulation (/root/reference/src/pair_ani_kokkos.cpp:150-169)
    — with the ghost part delivered to owners by the halo transpose.

    Returns (mirror [m, k2] int32 flat into n*k, mvalid [m, k2], ok).
    `ok` is False if some valid ext slot found no transposed entry (an
    untruncated `idx` guarantees it never is).
    """
    n, k_max = idx.shape
    m, k2 = ext_idx.shape

    def chunk_fn(args):
        eidx_c, emask_c, rows_c = args
        rows_of_i = idx[eidx_c]  # [c, k2, k_max]
        hit = rows_of_i == rows_c[:, None, None]
        kprime = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        found = jnp.any(hit, axis=-1)
        mirror = eidx_c * k_max + kprime
        mvalid = emask_c & found
        ok = jnp.all(found | ~emask_c)
        return jnp.where(mvalid, mirror, 0), mvalid, ok

    rows = jnp.arange(m, dtype=jnp.int32)
    pad = (-m) % chunk
    padded = lambda x: jnp.pad(
        x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x
    args = tuple(
        padded(x).reshape(-1, chunk, *x.shape[1:])
        for x in (ext_idx, ext_mask, rows)
    )
    mirror, mvalid, oks = jax.lax.map(chunk_fn, args)
    return (mirror.reshape(-1, k2)[:m], mvalid.reshape(-1, k2)[:m],
            jnp.all(oks))


@jax.custom_vjp
def neighbor_diff_ext(pos, pos_ext, idx, mask, mirror, mvalid):
    """[n, k, 3] diff = pos_i - pos_ext[idx] with a mirror-gather backward.

    The cotangent w.r.t. `pos_ext` is, under plain autodiff, a serialized
    XLA scatter-add of [n, k, 3] rows (the 375 ms/step pattern measured in
    docs/DESIGN.md); with the `build_mirror_ext` table it is a gather over
    each ext row's own slots. The caller's `pos_ext` construction
    (halo_positions) owns delivering ghost cotangents to remote shards via
    the ppermute transpose.
    """
    return _diff_ext_impl(pos, pos_ext, idx, mask)


def _diff_ext_impl(pos, pos_ext, idx, mask):
    diff = pos[:, None, :] - pos_ext[idx]
    return jnp.where(mask[..., None], diff, 1.0)


def _diff_ext_fwd(pos, pos_ext, idx, mask, mirror, mvalid):
    return (_diff_ext_impl(pos, pos_ext, idx, mask),
            (pos.shape[0], pos_ext.shape[0], mask, mirror, mvalid))


def _diff_ext_bwd(res, g):
    n, m, mask, mirror, mvalid = res
    k_max = mask.shape[1]
    g = jnp.where(mask[..., None], g, 0.0)
    dpos = jnp.sum(g, axis=1)  # center role: row reduce
    mirrored = g.reshape(n * k_max, 3)[mirror] * mvalid[..., None]
    dpos_ext = -jnp.sum(mirrored, axis=1)  # neighbor role: gather
    return dpos, dpos_ext, None, None, None, None


neighbor_diff_ext.defvjp(_diff_ext_fwd, _diff_ext_bwd)


def neighbor_displacements_mirror(pos, box, src, shift, mirror, mask):
    """(diff [n,k,3], dist [n,k]) with scatter-free backward.

    Drop-in equivalent of ops.neighbors.neighbor_displacements for the
    single-device engine (same diff orientation and masking semantics).
    """
    shift_f = shift.astype(pos.dtype)
    diff = neighbor_diff(pos, box.h, src, shift_f, mirror, mask)
    dist = jnp.linalg.norm(diff, axis=-1)
    return jnp.where(mask[..., None], diff, 1.0), jnp.where(mask, dist, 1e6)
