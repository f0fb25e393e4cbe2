"""The ANI potential: AEV + per-species MLP ensemble + shifter (+ repulsion).

This module is the TPU-native collapse of the reference's four-layer stack
(TorchScript wrapper /root/reference/models/lammps_ani.py, C++ bridge
/root/reference/src/ani_csrc/ani.cpp, cuaev kernels, and torchani modules):
a pure function from (positions, box, neighbor structure) to energy, with
forces from `jax.grad` and virial from a strain derivative.

Contract parity with `LammpsANI.forward`
(/root/reference/models/lammps_ani.py:130-216):
  * ghost atoms (species -1) contribute environment but no energy;
  * `atomic=True` returns per-atom energies for local atoms;
  * virial = -dE/d(strain), symmetric 3x3 — equivalent to the reference's
    partial-fdotr `-dEdR^T @ diff_vector` (lammps_ani.py:195-201) but
    computed the JAX way (differentiate through an affine deformation of
    positions *and* box, which also captures the ghost-image terms);
  * energies in Hartree internally; unit conversion happens at the engine
    boundary (units.HARTREE2KCALMOL, cf. ani.cpp:161-162).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import neighbors as nbops
from . import aev as aevmod
from . import networks as netmod
from . import repulsion as repmod


@dataclasses.dataclass(frozen=True)
class ANISpec:
    """Static potential configuration (hashable; jit-static)."""

    aev: aevmod.AEVSpec
    net: netmod.NetworkSpec
    shifter: netmod.EnergyShifter
    repulsion: Optional[repmod.RepulsionSpec] = None
    symbols: tuple[str, ...] = ("H", "C", "N", "O", "S", "F", "Cl")
    angular_capacity: int = 32
    # Static per-species angular-neighbor capacities: enables the
    # species-blocked fast AEV path (models/aev._angular_blocked). None ->
    # generic species-pair one-hot path.
    angular_caps: Optional[tuple[int, ...]] = None
    atom_chunk: Optional[int] = None  # chunk AEV angular block over atoms

    @property
    def cutoff(self) -> float:
        return self.aev.radial_cutoff


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ANIPotential:
    """Potential = static spec + dynamic ensemble params.

    Registered as a pytree with `spec` static, so it can be passed straight
    through `jax.jit` boundaries.
    """

    spec: ANISpec = dataclasses.field(metadata=dict(static=True))
    params: list  # stacked ensemble params (networks.init_network_params)

    @property
    def num_models(self) -> int:
        return self.params[0][0]["w"].shape[0]

    def select_models(self, num_models: Optional[int]) -> "ANIPotential":
        """Reference `select_models` (lammps_ani.py:332-343): static slice."""
        return ANIPotential(
            spec=self.spec, params=netmod.select_models(self.params, num_models)
        )


def atomic_energies_ext(
    pot: ANIPotential,
    species: jax.Array,  # [n] local species, -1 padding
    pos: jax.Array,  # [n, 3] local positions
    pos_ext: jax.Array,  # [m, 3] extended (local + ghost) positions
    species_ext: jax.Array,  # [m] extended species, -1 for invalid/ghost-pad
    idx: jax.Array,  # [n, k] neighbor indices into the extended arrays
    mask: jax.Array,  # [n, k] neighbor validity
    species_counts: Optional[Sequence[int]] = None,
    local_mask: jax.Array | None = None,
    present_species: Optional[tuple] = None,  # static composition subset
    mirror_ext: Optional[tuple] = None,  # (mirror [m,k2], mvalid [m,k2])
) -> jax.Array:
    """[n] per-atom energies from explicit extended arrays.

    The lowest-level potential entry point: both the single-device path
    (ghosts derived from periodic images, `atomic_energies`) and the
    multi-chip path (ghosts received via ICI halo exchange,
    parallel/domain.py) feed it. Differentiable w.r.t. `pos` and `pos_ext`;
    the caller's construction of `pos_ext` determines where ghost forces
    flow (owner atoms or remote shards via ppermute transpose).

    `mirror_ext` (from ops/nbr_grad.build_mirror_ext over ext-rowed
    neighbor lists) replaces the force backward's serialized scatter into
    `pos_ext` with a mirror gather — required for device-quality sharded
    throughput, identical values (up to f32 summation order).
    """
    if local_mask is None:
        local_mask = species >= 0

    if mirror_ext is not None:
        from ..ops import nbr_grad

        diff = nbr_grad.neighbor_diff_ext(
            pos, pos_ext, idx, mask, mirror_ext[0], mirror_ext[1])
    else:
        diff = pos[:, None, :] - pos_ext[idx]
        diff = jnp.where(mask[..., None], diff, 1.0)
    dist = jnp.linalg.norm(jnp.where(mask[..., None], diff, 1.0), axis=-1)
    dist = jnp.where(mask, dist, 1e6)
    species_j = species_ext[idx]
    nbr_mask = mask & (species_j >= 0)
    ghost_j = idx >= pos.shape[0]
    return _energies_from_neighbors(
        pot, species, diff, dist, species_j, nbr_mask, ghost_j,
        species_counts, local_mask, present_species=present_species)


def atomic_energies_mirror(
    pot: ANIPotential,
    species: jax.Array,  # [n]
    pos: jax.Array,  # [n, 3]
    box: nbops.Box,
    nbrs,  # MirrorNeighbors (ops/nbr_grad semantics)
    species_counts: Optional[Sequence[int]] = None,
    local_mask: jax.Array | None = None,
    cellroll=None,  # (RollGrid, RollBins): gather-free radial channel
) -> jax.Array:
    """[n] per-atom energies via the scatter-free mirror neighbor path
    (ops/nbr_grad.py) — the single-device production path. With `cellroll`
    the radial block comes from the gather-free cell-roll channel
    (ops/cell_roll.py) and the distance channel is skipped entirely
    (requires spec.repulsion is None)."""
    from ..ops import nbr_grad

    if local_mask is None:
        local_mask = species >= 0
    radial_override = None
    dist = None
    species_j = nbrs.species_j
    nbr_mask = nbrs.mask
    ghost_j = jnp.any(nbrs.shift != 0, axis=-1)
    if cellroll is not None:
        assert pot.spec.repulsion is None, (
            "cell-roll channel has no pair distances for repulsion")
        grid, bins = cellroll[0], cellroll[1]
        impl = cellroll[2] if len(cellroll) > 2 else "xla"
        if impl == "pallas":
            from ..ops import aev_pallas as apmod

            radial_override = apmod.radial_aev_pallas(
                pot.spec.aev, grid, bins, pos, box,
                species_counts=species_counts)
        else:
            from ..ops import cell_roll as crmod

            radial_override = crmod.radial_aev_cellroll(
                pot.spec.aev, grid, bins, pos, box)
        radial_override = jnp.where(local_mask[:, None], radial_override,
                                    0.0)
    else:
        # radial + repulsion: distances only (scalar-cotangent backward)
        shift_f = nbrs.shift.astype(pos.dtype)
        dist = nbr_grad.neighbor_dist(
            pos, box.h, nbrs.src, shift_f, nbrs.mirror, nbrs.mask)
        species_j = (nbrs.species_j if nbrs.species_j is not None
                     else jnp.where(nbrs.mask, species[nbrs.src], -1))
        nbr_mask = nbrs.mask & (species_j >= 0)

    angular_inputs = None
    diff = None
    if nbrs.ang_src is not None:
        # angular: displacement vectors over the narrow frozen sub-list
        a_diff, a_dist = nbr_grad.neighbor_displacements_mirror(
            pos, box, nbrs.ang_src, nbrs.ang_shift, nbrs.ang_mirror,
            nbrs.ang_mask)
        a_species = (nbrs.ang_species if nbrs.ang_species is not None
                     else jnp.where(nbrs.ang_mask, species[nbrs.ang_src],
                                    -1))
        angular_inputs = (a_diff, a_dist, a_species,
                          nbrs.ang_mask & (a_species >= 0))
    else:
        diff, dist_v = nbr_grad.neighbor_displacements_mirror(
            pos, box, nbrs.src, nbrs.shift, nbrs.mirror, nbrs.mask)
        dist = dist_v
    return _energies_from_neighbors(
        pot, species, diff, dist, species_j, nbr_mask, ghost_j,
        species_counts, local_mask, angular_inputs=angular_inputs,
        radial_override=radial_override)


def _energies_from_neighbors(
    pot, species, diff, dist, species_j, nbr_mask, ghost_j,
    species_counts, local_mask, angular_inputs=None, radial_override=None,
    present_species=None,
):
    """Common tail: (diff, dist, species_j) -> per-atom energies [Hartree].

    `angular_inputs`: optional pre-compacted (diff_a, dist_a, species_a,
    mask_a) for the angular block (mirror path); `diff` may be None then.
    """
    spec = pot.spec
    # checkpoint: recompute the AEV in the force backward pass instead of
    # holding its radial/angular residuals ([n, k, n_basis] scale) in HBM.
    # (named_scope = the reference's NVTX "AEV forward" label,
    # models/lammps_ani.py:173)
    aev = jax.checkpoint(
        lambda d, dst, ang, rad: aevmod.compute_aev(
            spec.aev,
            species,
            d,
            dst,
            species_j,
            nbr_mask,
            angular_capacity=spec.angular_capacity,
            angular_caps=spec.angular_caps,
            atom_chunk=spec.atom_chunk,
            angular_inputs=ang,
            radial_override=rad,
        )
    )(diff, dist, angular_inputs, radial_override)

    with jax.named_scope("nn_forward"):
        if species_counts is not None:
            atomic = netmod.atomic_energies_sorted(
                spec.net, pot.params, species_counts, aev
            )
        else:
            atomic = netmod.atomic_energies_masked(
                spec.net, pot.params, species, aev,
                present=present_species)
        e = netmod.ensemble_energies(atomic)  # [n]
    e = e + spec.shifter(species, dtype=e.dtype)
    if spec.repulsion is not None:
        e = e + repmod.repulsion_energies(
            spec.repulsion,
            species,
            species_j,
            dist,
            nbr_mask,
            ghost_center=~local_mask,
            ghost_j=ghost_j,
        )
    return jnp.where(local_mask, e, 0.0)


def atomic_energies(
    pot: ANIPotential,
    species: jax.Array,  # [n] local species, -1 padding
    pos: jax.Array,  # [n, 3] local positions
    box: nbops.Box,
    nlist: nbops.NeighborList,
    species_counts: Optional[Sequence[int]] = None,  # static; atoms species-sorted
    local_mask: jax.Array | None = None,  # [n] bool; False = padding row
) -> jax.Array:
    """[n] per-atom energies in Hartree (NN + SAE + repulsion attribution).

    Single-device entry: ghosts are periodic images derived from `nlist`.
    Differentiable w.r.t. `pos` (through ghost images) and `box.h`.
    """
    pos_ext = nbops.extended_positions(pos, box, nlist.ghosts)
    species_ext = nbops.extended_species(species, nlist.ghosts)
    return atomic_energies_ext(
        pot, species, pos, pos_ext, species_ext, nlist.idx, nlist.mask,
        species_counts, local_mask,
    )


def potential_energy(pot, species, pos, box, nlist, species_counts=None,
                     local_mask=None) -> jax.Array:
    """Scalar total energy in Hartree."""
    return jnp.sum(
        atomic_energies(pot, species, pos, box, nlist, species_counts, local_mask)
    )


def energy_forces(
    pot, species, pos, box, nlist, species_counts=None, local_mask=None
):
    """(E [Hartree], F [n,3] Hartree/Angstrom). F includes ghost-image terms
    reduced onto owners automatically by autograd (the reference needs an
    explicit reverse MPI communication for this, pair_ani.cpp:461-484)."""
    e, grad = jax.value_and_grad(potential_energy, argnums=2)(
        pot, species, pos, box, nlist, species_counts, local_mask
    )
    return e, -grad


def energy_forces_virial(
    pot, species, pos, box, nlist, species_counts=None, local_mask=None
):
    """(E, F, W): virial W = -dE/d(strain) [3,3 symmetric, Hartree].

    Implemented by differentiating through r -> r @ (I + eps),
    h -> h @ (I + eps) at eps = 0. Equals the reference's partial-fdotr
    virial (lammps_ani.py:195-201) including periodic-image contributions.
    """

    def deformed_energy(eps, pos_):
        # additive form: pos + pos @ eps is EXACTLY pos at eps = 0 under
        # any matmul precision (pos @ (I + eps) routes coordinates through
        # a dot that XLA may lower in bf16 at scale — 0.5 A rounding at
        # 100 A boxes collapses near pairs and NaNs the force path)
        pos_d = pos_ + pos_ @ eps
        box_d = nbops.Box(h=box.h + box.h @ eps, origin=box.origin)
        return potential_energy(
            pot, species, pos_d, box_d, nlist, species_counts, local_mask
        )

    eps0 = jnp.zeros((3, 3), pos.dtype)
    e, (deps, dpos) = jax.value_and_grad(deformed_energy, argnums=(0, 1))(eps0, pos)
    virial = -0.5 * (deps + deps.T)
    return e, -dpos, virial


def atomic_energies_roll(
    pot: ANIPotential,
    species: jax.Array,
    pos: jax.Array,
    box: nbops.Box,
    grid,  # ops.cell_roll.RollGrid (the shared fine grid)
    bins,  # ops.cell_roll.RollBins (frozen per rebuild)
    radial_shell: int = 2,
    species_counts: Optional[Sequence[int]] = None,
):
    """([n] energies, angular-cap deficit) via the full Pallas AEV path.

    The production single-device TPU path: both AEV channels come from the
    gather-free Pallas kernels (ops/aev_pallas.py) over one fine bin grid;
    no neighbor matrix, no mirror tables, no frozen angular sub-list.
    Requires spec.angular_caps (composition-derived) and no repulsion
    term. `deficit` > 0 means an angular cap truncated real neighbors
    this evaluation — treat like any capacity overflow."""
    from ..ops import aev_pallas as apmod

    spec = pot.spec
    assert spec.repulsion is None, (
        "pallas roll path has no pair-distance channel for repulsion")
    assert spec.angular_caps is not None, (
        "pallas roll path needs composition-derived angular_caps")
    radial = apmod.radial_aev_pallas(
        spec.aev, grid, bins, pos, box, species_counts=species_counts,
        shell=radial_shell)
    angular, deficit = apmod.angular_aev_pallas(
        spec.aev, grid, bins, pos, box, spec.angular_caps,
        species_counts=species_counts)
    local_mask = species >= 0
    aev = jnp.concatenate([radial, angular], axis=1)
    aev = jnp.where(local_mask[:, None], aev, 0.0)

    with jax.named_scope("nn_forward"):
        if species_counts is not None:
            atomic = netmod.atomic_energies_sorted(
                spec.net, pot.params, species_counts, aev)
        else:
            # no species sort / composition: masked combine over all nets
            # (angular caps say which species occur as neighbors, not which
            # occur as centers — cannot prune the net loop from them)
            atomic = netmod.atomic_energies_masked(
                spec.net, pot.params, species, aev)
        e = netmod.ensemble_energies(atomic)
    e = e + spec.shifter(species, dtype=e.dtype)
    return jnp.where(local_mask, e, 0.0), deficit


def energy_forces_virial_roll(
    pot, species, pos, box, grid, bins, radial_shell=2, species_counts=None,
):
    """(E, F, W, deficit) via the full Pallas AEV path. Virial from the
    strain-deformation trick; the kernels' custom VJPs supply exact dpos
    and box cotangents (same contract as the mirror path)."""

    def deformed_energy(eps, pos_):
        # additive form: pos + pos @ eps is EXACTLY pos at eps = 0 under
        # any matmul precision (pos @ (I + eps) routes coordinates through
        # a dot that XLA may lower in bf16 at scale — 0.5 A rounding at
        # 100 A boxes collapses near pairs and NaNs the force path)
        pos_d = pos_ + pos_ @ eps
        box_d = nbops.Box(h=box.h + box.h @ eps, origin=box.origin)
        e, deficit = atomic_energies_roll(
            pot, species, pos_d, box_d, grid, bins, radial_shell,
            species_counts)
        return jnp.sum(e), deficit

    eps0 = jnp.zeros((3, 3), pos.dtype)
    (e, deficit), (deps, dpos) = jax.value_and_grad(
        deformed_energy, argnums=(0, 1), has_aux=True)(eps0, pos)
    virial = -0.5 * (deps + deps.T)
    return e, -dpos, virial, deficit


def atomic_energies_asn(
    pot: ANIPotential,
    species: jax.Array,  # [n_out] species of the ENERGY atoms
    pos: jax.Array,  # [n, 3] ALL binned atoms (n >= n_out; locals first)
    box: nbops.Box,
    asn_state,  # (grid, bins, asn, sections) — shared by both channels
    species_counts: Optional[Sequence[int]] = None,
    local_mask: jax.Array | None = None,  # [n_out]; False = no energy
    present_species: Optional[tuple] = None,  # static composition subset
    n_out: Optional[int] = None,  # energy rows (sharded: owned atoms)
):
    """([n_out] energies, angular-cap deficit) via the assignment-compacted
    Pallas path (ops/aev_asn.py) — the round-3 production TPU path.

    ONE coarse grid (side >= Rcr + skin) serves both channels: its keep
    radius covers the angular cutoff, so the angular kernel re-compacts
    within-Rca lanes from the radial assignment every step. Versus a
    dedicated fine angular grid this cuts the dominant pair-block row
    count by the grids' cap-padding ratio (~1.7x at the bench box) and
    deletes the second bins + assignment build from every rebuild.
    Repulsion (ANI-1xnr) is evaluated from the radial kernel's compact
    geometry, so reactive models run on the fast path
    (cf. /root/reference/models/ani_models.py:40-53).

    Sharded use (parallel/sim.py): `pos` holds owned + halo atoms, bins
    cover all of them, and `n_out` restricts AEV/NN/energy rows to the
    owned prefix — ghosts contribute environment and receive forces
    through the kernels' dpos, the LAMMPS-Kokkos device-resident contract
    (/root/reference/src/pair_ani_kokkos.cpp:143-191)."""
    from ..ops import aev_asn as apasn

    spec = pot.spec
    assert spec.angular_caps is not None, (
        "assignment path needs composition-derived angular_caps")
    grid, bins, asn, sect = asn_state[:4]
    tiers = asn_state[4] if len(asn_state) > 4 else None
    # Fused both-channels op: one window-geometry pass forward, one
    # summed wing/fold/dh backward (ops/aev_asn.aev_asn_fused) — the two
    # channels share the frozen assignment, so per-channel kernels
    # computed identical geometry twice and ran duplicate decompacts.
    # Compact AEV columns: absent species' radial sections and absent
    # species-pair angular blocks never exist as data — the NN gathers
    # the matching first-layer weight rows instead (networks._mlp_stack).
    # At water composition this shrinks [n, 1008] AEV + cotangent buffers
    # to [n, 128] (2 radial sections + 3 pair blocks), deleting ~800 MB
    # of dead traffic per step at the 101k bench box.
    radial, e_rep, angular, deficit = apasn.aev_asn_fused(
        spec.aev, grid, bins, asn, pos, box, sect, spec.angular_caps,
        tiers=tiers, repulsion=spec.repulsion, n_out=n_out)
    if local_mask is None:
        local_mask = species >= 0
    else:
        local_mask = local_mask & (species >= 0)
    aev = jnp.concatenate([radial, angular], axis=1)
    aev = jnp.where(local_mask[:, None], aev, 0.0)

    n_shf = len(spec.aev.shf_r) * len(spec.aev.eta_r)
    srl_full_off = spec.aev.num_species * n_shf
    asub = spec.aev.angular_sublength
    chans = apasn.present_channels(spec.aev, spec.angular_caps, sect)
    col_idx = tuple(
        [s * n_shf + j for s, _ in sect for j in range(n_shf)]
        + [srl_full_off + ch0 + j for ch0 in chans for j in range(asub)])

    def nn(aev):
        with jax.named_scope("nn_forward"):
            if species_counts is not None:
                atomic = netmod.atomic_energies_sorted(
                    spec.net, pot.params, species_counts, aev,
                    col_idx=col_idx)
            else:
                atomic = netmod.atomic_energies_masked(
                    spec.net, pot.params, species, aev,
                    present=present_species, col_idx=col_idx)
            return netmod.ensemble_energies(atomic)

    # Large boxes: rematerialize the MLP activations in the backward
    # (jax.checkpoint) — the per-layer hidden activations are
    # ~n * 384 floats * models * species, a top-3 HBM resident at 240k
    # atoms on a 16 GB v5e, while the recompute is one extra stacked
    # matmul pass (~4 ms at 101k). Below the threshold speed wins.
    import os as _os
    remat_env = _os.environ.get("LAT_NN_REMAT")
    remat = (aev.shape[0] >= 150_000 if remat_env is None
             else remat_env == "1")
    e = (jax.checkpoint(nn) if remat else nn)(aev)
    e = e + spec.shifter(species, dtype=e.dtype)
    if spec.repulsion is not None:
        e = e + e_rep
    return jnp.where(local_mask, e, 0.0), deficit


def energy_forces_virial_asn(
    pot, species, pos, box, asn_state, species_counts=None,
):
    """(E, F, W, deficit) via the assignment-compacted Pallas path."""

    def deformed_energy(eps, pos_):
        # additive form: exact at eps = 0 under any matmul precision (see
        # energy_forces_virial)
        pos_d = pos_ + pos_ @ eps
        box_d = nbops.Box(h=box.h + box.h @ eps, origin=box.origin)
        e, deficit = atomic_energies_asn(
            pot, species, pos_d, box_d, asn_state, species_counts)
        return jnp.sum(e), deficit

    eps0 = jnp.zeros((3, 3), pos.dtype)
    (e, deficit), (deps, dpos) = jax.value_and_grad(
        deformed_energy, argnums=(0, 1), has_aux=True)(eps0, pos)
    virial = -0.5 * (deps + deps.T)
    return e, -dpos, virial, deficit


def energy_forces_virial_mirror(
    pot, species, pos, box, nbrs, species_counts=None, local_mask=None,
    cellroll=None,
):
    """(E, F, W) via the scatter-free mirror path. Virial flows through the
    custom op's exact box cotangent (dE/dh = -sum shift^T g)."""

    def deformed_energy(eps, pos_):
        # additive form: pos + pos @ eps is EXACTLY pos at eps = 0 under
        # any matmul precision (pos @ (I + eps) routes coordinates through
        # a dot that XLA may lower in bf16 at scale — 0.5 A rounding at
        # 100 A boxes collapses near pairs and NaNs the force path)
        pos_d = pos_ + pos_ @ eps
        box_d = nbops.Box(h=box.h + box.h @ eps, origin=box.origin)
        return jnp.sum(atomic_energies_mirror(
            pot, species, pos_d, box_d, nbrs, species_counts, local_mask,
            cellroll=cellroll))

    eps0 = jnp.zeros((3, 3), pos.dtype)
    e, (deps, dpos) = jax.value_and_grad(
        deformed_energy, argnums=(0, 1))(eps0, pos)
    virial = -0.5 * (deps + deps.T)
    return e, -dpos, virial
