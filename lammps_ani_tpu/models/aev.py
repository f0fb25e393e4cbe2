"""Atomic Environment Vector (AEV) symmetry functions — pure-XLA implementation.

This is the TPU-native equivalent of the reference's "pyaev" path
(torchani `AEVComputer._pyaev_compute_from_neighbors`, dispatched from
/root/reference/models/lammps_ani.py:286-296) and the numerical contract the
Pallas "cuaev-equivalent" kernels (ops/aev_pallas.py) must match.

Definitions follow the published ANI functional form (Smith et al., ANI-1,
Chem. Sci. 2017; torchani):

  cutoff  : fc(r)  = 0.5 cos(pi r / Rc) + 0.5            (r <= Rc, else 0)
  radial  : G_R    = 0.25 exp(-eta_r (r - shf_r)^2) fc(r; Rcr)
            accumulated per neighbor-species channel.
  angular : for each unordered pair (j, k) of neighbors of i within Rca,
            theta   = acos(0.95 cos(r_ij, r_ik))
            G_A     = 2 * ((1 + cos(theta - shf_z)) / 2)^zeta
                        * exp(-eta_a ((r_ij + r_ik)/2 - shf_a)^2)
                        * fc(r_ij; Rca) fc(r_ik; Rca)
            accumulated per unordered species-pair channel.

AEV layout (torchani-compatible, so weights trained against torchani AEVs
load unchanged): radial block [n_species, n_eta_r * n_shf_r] (C-order
(eta_r, shf_r)) followed by angular block [n_pairs, n_eta_a * n_zeta *
n_shf_a * n_shf_z] (C-order (eta_a, zeta, shf_a, shf_z)), where pairs are
enumerated (0,0),(0,1),...,(0,S-1),(1,1),...,(S-1,S-1).

Shape discipline: everything fixed-shape over a padded neighbor matrix
`[n_atoms, max_neighbors]` — the layout the reference's Kokkos path already
uses (/root/reference/src/pair_ani_kokkos.cpp:150-169) and the natural XLA
form. Invalid slots are masked, never branched on.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AEVSpec:
    """Static AEV hyperparameters (hashable; used as a jit-static argument)."""

    radial_cutoff: float  # Rcr
    angular_cutoff: float  # Rca
    eta_r: tuple[float, ...]
    shf_r: tuple[float, ...]
    eta_a: tuple[float, ...]
    zeta: tuple[float, ...]
    shf_a: tuple[float, ...]
    shf_z: tuple[float, ...]
    num_species: int

    @property
    def num_pairs(self) -> int:
        s = self.num_species
        return s * (s + 1) // 2

    @property
    def radial_sublength(self) -> int:
        return len(self.eta_r) * len(self.shf_r)

    @property
    def angular_sublength(self) -> int:
        return len(self.eta_a) * len(self.zeta) * len(self.shf_a) * len(self.shf_z)

    @property
    def radial_length(self) -> int:
        return self.num_species * self.radial_sublength

    @property
    def angular_length(self) -> int:
        return self.num_pairs * self.angular_sublength

    @property
    def aev_length(self) -> int:
        return self.radial_length + self.angular_length

    def triu_index(self) -> np.ndarray:
        """[S, S] -> unordered-pair channel index, torchani enumeration order."""
        s = self.num_species
        table = np.zeros((s, s), dtype=np.int32)
        idx = 0
        for a in range(s):
            for b in range(a, s):
                table[a, b] = idx
                table[b, a] = idx
                idx += 1
        return table


def _linspace_shifts(start: float, stop: float, n: int) -> tuple[float, ...]:
    """n shifts evenly spaced in [start, stop), torchani convention."""
    step = (stop - start) / n
    return tuple(start + i * step for i in range(n))


def ani2x_aev_spec() -> AEVSpec:
    """Published ANI-2x AEV hyperparameters (7 species H,C,N,O,S,F,Cl).

    AEV length = 7*16 + 28*32 = 1008.
    """
    return AEVSpec(
        radial_cutoff=5.1,
        angular_cutoff=3.5,
        eta_r=(19.7,),
        shf_r=_linspace_shifts(0.8, 5.1, 16),
        eta_a=(12.5,),
        zeta=(14.1,),
        shf_a=_linspace_shifts(0.8, 3.5, 4),
        shf_z=tuple((2 * i + 1) * math.pi / 16 for i in range(8)),
        num_species=7,
    )


def ani1x_aev_spec() -> AEVSpec:
    """Published ANI-1x AEV hyperparameters (4 species H,C,N,O).

    AEV length = 4*16 + 10*32 = 384. Also used by ANI-1xnr (same
    architecture retrained on condensed-phase reactive data).
    """
    return AEVSpec(
        radial_cutoff=5.2,
        angular_cutoff=3.5,
        eta_r=(16.0,),
        shf_r=_linspace_shifts(0.9, 5.2, 16),
        eta_a=(8.0,),
        zeta=(32.0,),
        shf_a=_linspace_shifts(0.9, 3.5, 4),
        shf_z=tuple((2 * i + 1) * math.pi / 16 for i in range(8)),
        num_species=4,
    )


def cutoff_cosine(distances: jax.Array, cutoff: float) -> jax.Array:
    """Smooth cosine cutoff; 0 beyond `cutoff`."""
    return jnp.where(
        distances <= cutoff,
        0.5 * jnp.cos(distances * (math.pi / cutoff)) + 0.5,
        0.0,
    )


def radial_terms(spec: AEVSpec, distances: jax.Array) -> jax.Array:
    """[..., n_radial_sub] radial basis values for distances [...]."""
    eta_r = jnp.asarray(spec.eta_r, distances.dtype).reshape(-1, 1)
    shf_r = jnp.asarray(spec.shf_r, distances.dtype).reshape(1, -1)
    d = distances[..., None, None]
    fc = cutoff_cosine(distances, spec.radial_cutoff)[..., None, None]
    out = 0.25 * jnp.exp(-eta_r * (d - shf_r) ** 2) * fc
    return out.reshape(*distances.shape, spec.radial_sublength)


def angular_terms(
    spec: AEVSpec,
    r12: jax.Array,  # [..., ] distance i-j
    r13: jax.Array,  # [..., ] distance i-k
    cos_theta: jax.Array,  # [..., ] cos of angle j-i-k
) -> jax.Array:
    """[..., n_angular_sub] angular basis values."""
    dtype = r12.dtype
    eta_a = jnp.asarray(spec.eta_a, dtype).reshape(-1, 1, 1, 1)
    zeta = jnp.asarray(spec.zeta, dtype).reshape(1, -1, 1, 1)
    shf_a = jnp.asarray(spec.shf_a, dtype).reshape(1, 1, -1, 1)
    shf_z = jnp.asarray(spec.shf_z, dtype).reshape(1, 1, 1, -1)

    theta = jnp.arccos(0.95 * cos_theta)[..., None, None, None, None]
    rmean = (0.5 * (r12 + r13))[..., None, None, None, None]
    fc = (
        cutoff_cosine(r12, spec.angular_cutoff)
        * cutoff_cosine(r13, spec.angular_cutoff)
    )[..., None, None, None, None]

    factor1 = ((1.0 + jnp.cos(theta - shf_z)) * 0.5) ** zeta
    factor2 = jnp.exp(-eta_a * (rmean - shf_a) ** 2)
    out = 2.0 * factor1 * factor2 * fc
    return out.reshape(*r12.shape, spec.angular_sublength)


def _compact_angular_neighbors(
    diff: jax.Array,  # [n, k, 3]
    dist: jax.Array,  # [n, k]
    species_j: jax.Array,  # [n, k]
    valid: jax.Array,  # [n, k] bool
    cutoff: float,
    capacity: int,
):
    """Select (up to `capacity`) neighbors within the angular cutoff.

    Fixed-shape compaction: stable-sorts each row so in-cutoff entries come
    first, then truncates. Extra in-cutoff neighbors beyond `capacity` are
    silently dropped (callers size `capacity` with margin; see
    NeighborList overflow accounting in ops/neighbors.py).
    """
    mask = valid & (dist < cutoff)
    # Sort key: invalid/out-of-cutoff entries pushed to the end.
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
    order = order[:, :capacity]
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    mask_a = take(mask)
    diff_a = jnp.take_along_axis(diff, order[..., None], axis=1)
    dist_a = take(dist)
    species_a = take(species_j)
    return diff_a, dist_a, species_a, mask_a


def compute_aev(
    spec: AEVSpec,
    species_center: jax.Array,  # [n] int32 (may include -1 padding rows)
    diff: jax.Array,  # [n, k, 3] r_i - r_j for each neighbor slot
    dist: jax.Array,  # [n, k]
    species_j: jax.Array,  # [n, k] neighbor species (garbage where invalid)
    nbr_mask: jax.Array,  # [n, k] bool
    *,
    angular_capacity: int = 32,
    atom_chunk: int | None = None,
) -> jax.Array:
    """AEV over a padded full neighbor matrix. Returns [n, aev_length].

    `diff` convention: diff[i, k] = pos_i - pos_j (torchani's diff_vector
    orientation, /root/reference/models/lammps_ani.py:164-166). AEV depends
    only on |diff| and angles, so either sign convention yields identical
    AEVs; forces flow through whatever was passed.

    For memory efficiency the angular contraction is chunked over atoms with
    lax.map when `atom_chunk` is set (peak intermediate is
    chunk * capacity^2 * angular_sublength floats).
    """
    n, k = dist.shape
    dtype = dist.dtype

    # Neutralize invalid slots: huge distance -> fc = 0 everywhere.
    big = jnp.asarray(2.0 * spec.radial_cutoff + 10.0, dtype)
    dist = jnp.where(nbr_mask, dist, big)
    species_j = jnp.where(nbr_mask, species_j, 0)

    # ---- radial block ----
    rterms = radial_terms(spec, dist)  # [n, k, R]
    rterms = jnp.where(nbr_mask[..., None], rterms, 0.0)
    onehot_j = jax.nn.one_hot(species_j, spec.num_species, dtype=dtype)
    onehot_j = onehot_j * nbr_mask[..., None]
    radial_aev = jnp.einsum(
        "nks,nkr->nsr", onehot_j, rterms, preferred_element_type=dtype
    ).reshape(n, spec.radial_length)

    # ---- angular block ----
    diff_a, dist_a, species_a, mask_a = _compact_angular_neighbors(
        diff, dist, species_j, nbr_mask, spec.angular_cutoff, angular_capacity
    )
    triu = jnp.asarray(spec.triu_index())  # [S, S]

    def angular_block(args):
        diff_c, dist_c, spec_c, mask_c = args  # [c, ka, ...]
        c, ka = dist_c.shape
        safe_dist = jnp.where(mask_c, dist_c, 1.0)
        unit = diff_c / safe_dist[..., None]
        cosjk = jnp.einsum("nkd,nld->nkl", unit, unit, preferred_element_type=dtype)
        cosjk = jnp.clip(cosjk, -1.0, 1.0)
        pair_mask = (
            mask_c[:, :, None]
            & mask_c[:, None, :]
            & (jnp.arange(ka)[:, None] < jnp.arange(ka)[None, :])
        )
        aterms = angular_terms(
            spec,
            jnp.broadcast_to(dist_c[:, :, None], (c, ka, ka)),
            jnp.broadcast_to(dist_c[:, None, :], (c, ka, ka)),
            cosjk,
        )  # [c, ka, ka, A]
        aterms = aterms * pair_mask[..., None]
        pair_idx = triu[spec_c[:, :, None], spec_c[:, None, :]]  # [c, ka, ka]
        onehot_p = jax.nn.one_hot(pair_idx, spec.num_pairs, dtype=dtype)
        onehot_p = onehot_p * pair_mask[..., None]
        q = ka * ka
        out = jnp.einsum(
            "nqp,nqa->npa",
            onehot_p.reshape(c, q, spec.num_pairs),
            aterms.reshape(c, q, spec.angular_sublength),
            preferred_element_type=dtype,
        )
        return out.reshape(c, spec.angular_length)

    args = (diff_a, dist_a, species_a, mask_a)
    if atom_chunk is not None and n > atom_chunk and n % atom_chunk == 0:
        args = jax.tree.map(
            lambda x: x.reshape(n // atom_chunk, atom_chunk, *x.shape[1:]), args
        )
        angular_aev = jax.lax.map(angular_block, args).reshape(
            n, spec.angular_length
        )
    else:
        angular_aev = angular_block(args)

    aev = jnp.concatenate([radial_aev, angular_aev], axis=1)
    # Padding center rows (species -1) get zero AEV.
    return jnp.where((species_center >= 0)[:, None], aev, 0.0)
