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
    """Owner-resolved neighbor structure with mirror-slot table."""

    src: jax.Array  # [n, k] int32 owner rows
    shift: jax.Array  # [n, k, 3] int32 image shifts
    mirror: jax.Array  # [n, k] int32 flat mirror slot indices
    mask: jax.Array  # [n, k] bool
    ok: jax.Array  # [] bool — every valid slot found its mirror


def mirror_neighbors(nlist, n_local: int, chunk: int = 2048) -> MirrorNeighbors:
    """Resolve a NeighborList into the owner/shift/mirror form."""
    src, shift = resolve_owners(nlist, n_local)
    mirror, ok = build_mirror(nlist, n_local, chunk=chunk)
    return MirrorNeighbors(src=src, shift=shift, mirror=mirror,
                           mask=nlist.mask, ok=ok)


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
    pj = pos[src] + shift_f @ h
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


def neighbor_displacements_mirror(pos, box, src, shift, mirror, mask):
    """(diff [n,k,3], dist [n,k]) with scatter-free backward.

    Drop-in equivalent of ops.neighbors.neighbor_displacements for the
    single-device engine (same diff orientation and masking semantics).
    """
    shift_f = shift.astype(pos.dtype)
    diff = neighbor_diff(pos, box.h, src, shift_f, mirror, mask)
    dist = jnp.linalg.norm(diff, axis=-1)
    return jnp.where(mask[..., None], diff, 1.0), jnp.where(mask, dist, 1e6)
