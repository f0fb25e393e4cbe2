"""XTB-style pairwise repulsion potential.

Equivalent of torchani `RepulsionXTB` as used by the reference for ANI-1xnr
(`RepulsionXTB(cutoff=5.1, symbols=HCNO, cutoff_fn="smooth")`,
/root/reference/models/ani_models.py:53 via SURVEY.md §2.2) and dispatched
per-pair with ghost masking in /root/reference/models/lammps_ani.py:300-330.

Functional form (GFN1-xTB repulsion, Grimme et al. JCTC 2017):

    E_rep = sum_{A<B} (Zeff_A Zeff_B / R_AB) exp(-sqrt(alpha_A alpha_B)
                                                  R_AB^{k_f})   [atomic units]

with a smooth cutoff envelope so energy/forces vanish continuously at the
neighbor cutoff. Distances enter in bohr; energies are Hartree.

Evaluated over the same padded full neighbor matrix as the AEV; each
unordered pair is counted once via a 0.5 double-count factor, and pairs with
*both* atoms ghost are excluded (each domain owns the pairs touching its
local atoms; ghost-local pairs are halved so the global sum over domains is
exact — matching the reference's ghost_flags masking semantics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

ANGSTROM2BOHR = 1.8897261258369282

# GFN1-xTB repulsion parameters (alpha, Z_eff) for the ANI element set.
_GFN1_ALPHA = {
    "H": 2.209700, "C": 1.189666, "N": 1.371674, "O": 1.620185,
    "S": 1.026602, "F": 2.035341, "Cl": 1.173032,
}
_GFN1_ZEFF = {
    "H": 1.116244, "C": 4.428763, "N": 5.498808, "O": 5.171786,
    "S": 15.100323, "F": 6.931741, "Cl": 17.000000,
}


@dataclasses.dataclass(frozen=True)
class RepulsionSpec:
    """Static repulsion parameters for a species set (index-aligned)."""

    alpha: tuple[float, ...]
    zeff: tuple[float, ...]
    cutoff: float  # Angstrom
    k_f: float = 1.5
    cutoff_fn: str = "smooth"  # "smooth" | "cosine" | "none"

    @staticmethod
    def for_symbols(symbols, cutoff: float = 5.1, cutoff_fn: str = "smooth"):
        return RepulsionSpec(
            alpha=tuple(_GFN1_ALPHA[s] for s in symbols),
            zeff=tuple(_GFN1_ZEFF[s] for s in symbols),
            cutoff=cutoff,
            cutoff_fn=cutoff_fn,
        )


def _cutoff_envelope(spec: RepulsionSpec, r: jax.Array) -> jax.Array:
    x = r / spec.cutoff
    if spec.cutoff_fn == "none":
        return (x < 1.0).astype(r.dtype)
    if spec.cutoff_fn == "cosine":
        return jnp.where(x < 1.0, 0.5 * jnp.cos(jnp.pi * x) + 0.5, 0.0)
    # "smooth": exponential bump, C-infinity at the cutoff.
    x2 = jnp.clip(x * x, 0.0, 1.0 - 1e-6)
    return jnp.where(x < 1.0, jnp.exp(1.0 - 1.0 / (1.0 - x2)), 0.0)


def repulsion_energies(
    spec: RepulsionSpec,
    species_center: jax.Array,  # [n] int32, -1 padding
    species_j: jax.Array,  # [n, k]
    dist: jax.Array,  # [n, k] Angstrom (masked slots huge)
    nbr_mask: jax.Array,  # [n, k]
    ghost_center: jax.Array,  # [n] bool — center atom is ghost/padding
    ghost_j: jax.Array,  # [n, k] bool — neighbor is ghost
) -> jax.Array:
    """[n] per-atom repulsion energies in Hartree.

    Per-atom attribution: atom i gets half of every pair it participates in;
    pairs where the center is a ghost contribute nothing (the owning domain
    counts them), so summing local atoms over all domains counts each
    physical pair exactly once.
    """
    dtype = dist.dtype
    alpha = jnp.asarray(spec.alpha, dtype)
    zeff = jnp.asarray(spec.zeff, dtype)
    si = jnp.clip(species_center, 0, len(spec.alpha) - 1)
    sj = jnp.clip(species_j, 0, len(spec.alpha) - 1)

    valid = nbr_mask & (species_center >= 0)[:, None] & ~ghost_center[:, None]
    valid = valid & (dist < spec.cutoff)

    r_bohr = dist * ANGSTROM2BOHR
    a_ij = jnp.sqrt(alpha[si][:, None] * alpha[sj])
    z_ij = zeff[si][:, None] * zeff[sj]
    safe_r = jnp.where(valid, r_bohr, 1.0)
    e_pair = z_ij / safe_r * jnp.exp(-a_ij * safe_r**spec.k_f)
    e_pair = e_pair * _cutoff_envelope(spec, dist)
    e_pair = jnp.where(valid, e_pair, 0.0)
    # Half per ordered pair; ghost-neighbor pairs counted once here because
    # the ghost's owning copy exists in another domain (or is this domain's
    # own atom whose mirrored pair appears on the other side of the matrix).
    return 0.5 * jnp.sum(e_pair, axis=1)
