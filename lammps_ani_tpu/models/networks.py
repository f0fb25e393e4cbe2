"""Per-species MLP ensembles and the energy shifter.

TPU-native equivalent of torchani's `ANINetworks` / `Ensemble` /
`BmmEnsemble` and `EnergyShifter` as used by the reference export wrapper
(/root/reference/models/lammps_ani.py:103-113,218-233).

Design notes (idiomatic JAX, not a torch translation):

  * Ensemble parallelism = a leading stacked-parameter axis consumed by
    `vmap`-style batched matmuls (einsum with an `m` axis). The reference
    needs a dedicated `BmmEnsemble` module + `set_active_members` runtime
    state for this; here "select the first k models" is a static parameter
    slice (`select_models`), cf. reference models/lammps_ani.py:332-343.

  * Species parallelism: each element has its own MLP (different widths).
    Two execution strategies:
      - `masked`: run every species net over all atoms and combine with a
        species mask. Simple, fully shape-polymorphic; ~S x FLOPs waste.
        Used for tiny systems and as the correctness oracle.
      - `sorted`: atoms are pre-sorted by species with *static* per-species
        counts (species composition never changes during MD), so each net
        runs exactly on its own contiguous slice. Zero waste, exact static
        shapes — the production path.

  * Ghost/padding atoms carry species -1 and contribute exactly zero energy
    (reference semantics: ghosts masked via `species_ghost_as_padding`,
    /root/reference/src/ani_csrc/ani.cpp:137-139).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# Published ANI-2x per-element hidden-layer widths (torchani architecture).
ANI2X_HIDDEN = (
    (256, 192, 160),  # H
    (224, 192, 160),  # C
    (192, 160, 128),  # N
    (192, 160, 128),  # O
    (160, 128, 96),   # S
    (160, 128, 96),   # F
    (160, 128, 96),   # Cl
)

# Published ANI-1x per-element hidden-layer widths (also ANI-1xnr).
ANI1X_HIDDEN = (
    (160, 128, 96),   # H
    (144, 112, 96),   # C
    (128, 112, 96),   # N
    (128, 112, 96),   # O
)


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    """Static network hyperparameters."""

    aev_length: int
    hidden: tuple[tuple[int, ...], ...]  # per-species hidden widths
    celu_alpha: float = 0.1

    @property
    def num_species(self) -> int:
        return len(self.hidden)

    def layer_dims(self, species: int) -> list[tuple[int, int]]:
        dims = (self.aev_length, *self.hidden[species], 1)
        return list(zip(dims[:-1], dims[1:]))


def init_network_params(
    spec: NetworkSpec, num_models: int, key: jax.Array, dtype=jnp.float32
):
    """Deterministic synthetic ensemble weights.

    Returns params: list over species of list over layers of dicts
    {"w": [m, d_in, d_out], "b": [m, d_out]}. Kaiming-style scaling keeps
    activations O(1) so synthetic models produce well-conditioned
    energies/forces for engine testing.
    """
    params = []
    for s in range(spec.num_species):
        layers = []
        n_layers = len(spec.layer_dims(s))
        for li, (d_in, d_out) in enumerate(spec.layer_dims(s)):
            key, kw, kb = jax.random.split(key, 3)
            # damped Kaiming: random deep stacks at full Kaiming scale
            # amplify fp32 rounding ~1e3x through the force backward; the
            # damping keeps synthetic per-atom NN energies at the realistic
            # O(0.01-0.1 Ha) scale of trained ANI nets so fp32/f64 parity
            # behaves like production weights.
            damp = 0.05 if li == n_layers - 1 else 0.5
            scale = jnp.float32(np.sqrt(2.0 / d_in) * damp)
            # draw in f32 regardless of target dtype: the PRNG stream is
            # dtype-dependent, and the f32/f64 potentials must hold the
            # SAME weights for cross-precision parity to mean anything
            w = (jax.random.normal(kw, (num_models, d_in, d_out),
                                   jnp.float32) * scale).astype(dtype)
            b = jnp.zeros((num_models, d_out), dtype)
            layers.append({"w": w, "b": b})
        params.append(layers)
    return params


def select_models(params, num_models: int | None):
    """Static slice of the stacked ensemble: keep the first `num_models`.

    Equivalent of the reference's `select_models`/`set_active_members`
    (/root/reference/models/lammps_ani.py:332-343) — but a pure function of
    the params pytree rather than module state.
    """
    if num_models is None:
        return params
    return jax.tree.map(lambda x: x[:num_models], params)


def _nn_precision():
    """MXU precision for the NN matmuls only (geometry stays pinned).

    LAT_NN_PRECISION=high runs the MLP dots as bf16_3x passes — ~f32
    accuracy at a fraction of the HIGHEST (f32) pass count — without
    touching the package-wide `highest` default that protects
    coordinate-scale products (`frac @ h`). Unset = inherit the global
    default (LAT_MATMUL_PRECISION, `highest` unless overridden)."""
    import os as _os

    return _os.environ.get("LAT_NN_PRECISION") or None


def _mlp_stack(layers, x, celu_alpha: float, col_idx=None):
    """x: [m, n, aev] -> [m, n] atomic energies (one species net, m models).

    `col_idx` (static tuple): compact-AEV mode — x carries only these
    columns of the full torchani AEV layout, so the first layer's weight
    rows are gathered to match (the gather is a tiny [aev, d0] slice,
    hoisted/CSE'd by XLA; the win is that absent species-pair zero
    blocks never exist as [n, aev] data — at 101k water that deletes
    ~800 MB/step of dead AEV + cotangent traffic and 8/10 of the first
    matmul's FLOPs)."""
    dtype = x.dtype
    prec = _nn_precision()
    h = x
    n_layers = len(layers)
    for li, layer in enumerate(layers):
        w = layer["w"].astype(dtype)
        if li == 0 and col_idx is not None:
            w = w[:, jnp.asarray(col_idx, jnp.int32), :]
        b = layer["b"].astype(dtype)
        h = (
            jnp.einsum("mni,mio->mno", h, w, preferred_element_type=dtype,
                       precision=prec)
            + b[:, None, :]
        )
        if li < n_layers - 1:
            h = jax.nn.celu(h, alpha=celu_alpha)
    return h[..., 0]


def atomic_energies_masked(
    spec: NetworkSpec,
    params,
    species: jax.Array,  # [n] int32, -1 = ghost/padding
    aev: jax.Array,  # [n, aev_length] (or [n, len(col_idx)] compact)
    present: tuple | None = None,  # static species subset (composition)
    col_idx: tuple | None = None,  # static compact-AEV column map
) -> jax.Array:
    """[m, n] per-atom energies; every net runs on all atoms, masked combine.

    `present` (static) prunes the species loop to the system's global
    composition — the sharded path's per-shard species sets are dynamic,
    but the global composition is not, so absent elements' nets need
    never run (water: 2 of 7 ANI-2x nets)."""
    num_models = params[0][0]["w"].shape[0]
    n = aev.shape[0]
    x = jnp.broadcast_to(aev[None], (num_models, n, aev.shape[1]))
    out = jnp.zeros((num_models, n), aev.dtype)
    for s in (range(spec.num_species) if present is None else present):
        e_s = _mlp_stack(params[s], x, spec.celu_alpha, col_idx=col_idx)
        out = jnp.where((species == s)[None, :], e_s, out)
    return jnp.where((species >= 0)[None, :], out, 0.0)


def atomic_energies_sorted(
    spec: NetworkSpec,
    params,
    species_counts: Sequence[int],  # static per-species atom counts
    aev_sorted: jax.Array,  # [n, aev_length], rows grouped by species
    col_idx: tuple | None = None,  # static compact-AEV column map
) -> jax.Array:
    """[m, n] per-atom energies for species-sorted atoms with static counts.

    Rows must be ordered species 0 block, species 1 block, ..., then any
    padding rows (which get zero energy).
    """
    num_models = params[0][0]["w"].shape[0]
    n = aev_sorted.shape[0]
    pieces = []
    offset = 0
    for s, count in enumerate(species_counts):
        if count == 0:
            continue
        x = aev_sorted[offset : offset + count]
        x = jnp.broadcast_to(x[None], (num_models, count, x.shape[1]))
        pieces.append(_mlp_stack(params[s], x, spec.celu_alpha,
                                 col_idx=col_idx))
        offset += count
    out = jnp.concatenate(pieces, axis=1) if pieces else jnp.zeros((num_models, 0))
    if offset < n:  # padding tail
        out = jnp.pad(out, ((0, 0), (0, n - offset)))
    return out


def ensemble_energies(atomic: jax.Array) -> jax.Array:
    """Mean over the model axis: [m, n] -> [n]."""
    return jnp.mean(atomic, axis=0)


@dataclasses.dataclass(frozen=True)
class EnergyShifter:
    """Per-species self-energy offsets (torchani `EnergyShifter` equivalent).

    `self_energies` is a plain tuple so the shifter is a static/hashable
    config object; values in Hartree.
    """

    self_energies: tuple[float, ...]

    def __call__(self, species: jax.Array, dtype=jnp.float32) -> jax.Array:
        """[n] per-atom shift; 0 for ghost/padding (species -1)."""
        sae = jnp.asarray(self.self_energies, dtype)
        safe = jnp.clip(species, 0, len(self.self_energies) - 1)
        return jnp.where(species >= 0, sae[safe], 0.0)


# Published ANI-2x self atomic energies (Hartree, wB97X/6-31G*; torchani
# sae_linfit). Used when loading real ANI-2x weights.
ANI2X_SELF_ENERGIES = (
    -0.5978583943827134,   # H
    -38.08933878049795,    # C
    -54.711968298621066,   # N
    -75.19106774742086,    # O
    -398.1577125334925,    # S
    -99.80348506781634,    # F
    -460.1681939421027,    # Cl
)

# ANI-1x self atomic energies (Hartree; HCNO).
ANI1X_SELF_ENERGIES = (
    -0.600952980000,  # H
    -38.08316124000,  # C
    -54.58049914300,  # N
    -75.01173938500,  # O
)
