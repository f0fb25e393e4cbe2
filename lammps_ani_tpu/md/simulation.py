"""The MD engine driver: one jitted chunk = neighbor rebuild + N fused steps.

This replaces the reference's LAMMPS Verlet::run loop (SURVEY.md §3.2) with
a TPU-idiomatic structure: the hot loop is a `lax.scan` inside `jit`, so an
entire rebuild interval executes as a single XLA program with zero per-step
host round-trips — eliminating the reference's per-step H2D coordinate copy
and `.item()` sync bottlenecks (pair_ani.cpp:98-102, ani.cpp:246-251) by
construction.

Step structure (velocity Verlet, matching LAMMPS fix nve + optional
fix langevin / Nose-Hoover thermostat):

  [thermostat half]  v *= NH scale
  v += dt/2 * ftm2v * f/m
  x += dt * v
  f  = forces(x)   (+ Langevin friction/noise using post-drift v)
  v += dt/2 * ftm2v * f/m
  [thermostat half]

Neighbor contract: the (index, shift) structure is frozen for
`rebuild_every` steps; ghost positions are recomputed from owners each step
(ops/neighbors.py). Capacity overflow is detected on device and surfaced
after each chunk.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..models import potential as potmod
from ..ops import neighbors as nbops
from ..ops import nbr_grad
from . import integrate
from .state import MDState


def _roll_cap_margin() -> int:
    """Extra roll-bin slots above the measured occupancy (+2 base).

    Every slot adds 27 window lanes to each per-step asn kernel, so the
    margin stays small — but not zero: the t=0 occupancy measure sits
    one thermal fluctuation below the run's high-water mark, and each
    capacity regrow recompiles the whole chunk program (~minutes over
    the axon tunnel), which costs far more amortized than 4 slots of
    lanes. Default 4 = the 101k-bench ratchet's observed settling
    offset (examples/benchmark/README.md round-3 section); production
    users should not need to set LAT_ROLL_CAP_MARGIN (VERDICT r3 #6)."""
    import os as _os
    return int(_os.environ.get("LAT_ROLL_CAP_MARGIN", "4"))


@dataclasses.dataclass(frozen=True)
class NeighborConfig:
    cutoff: float  # interaction cutoff (Angstrom)
    skin: float = 2.0
    # Separate (smaller) skin for the frozen angular sub-list: its sphere is
    # (Rca + ang_skin)^3 so a tight value keeps the per-step vector channel
    # narrow; the engine enforces disp < min(skin, ang_skin)/2 per interval.
    ang_skin: float = 1.0
    k_max: int = 64
    ghost_capacity: int = 4096
    n_shell: int = 1
    rebuild_every: int = 10
    use_cell_list: bool = False
    cell_capacity: int = 16

    @property
    def rlist(self) -> float:
        return self.cutoff + self.skin


Integrator = Union[None, integrate.Langevin, integrate.NoseHoover,
                   integrate.NoseHooverNPT]


class Simulation:
    """Host-side orchestration; all per-step compute lives in one jit.

    Equivalent surface to `pair_style ani` + LAMMPS run setup
    (/root/reference/src/pair_ani.cpp:285-341 + tests/in.lammps): potential,
    cutoff/neighbor policy, timestep, integrator/thermostat, precision.
    """

    def __init__(
        self,
        potential: potmod.ANIPotential,
        species: np.ndarray,  # [n] int32
        masses: np.ndarray,  # [n] g/mol (per-atom: HMR supported natively)
        nbr: NeighborConfig,
        dt: float = 0.5,  # fs
        integrator: Integrator = None,  # None = NVE
        dtype=jnp.float32,
        sort_species: bool = True,
        auto_angular_caps: bool = True,  # specialize AEV to the composition
        barostat=None,  # integrate.BerendsenBarostat, composable with any
                        # thermostat (LAMMPS fix press/berendsen style)
        constraints=None,  # md.constraints.Rattle (LAMMPS fix shake); bond
                           # indices in the CALLER's atom order
        cellroll: bool = False,  # cell-roll AEV channels (Pallas on TPU
                                 # f32, XLA oracle elsewhere; see
                                 # LAT_ROLL_IMPL modes below). The bench
                                 # default; requires no repulsion term.
        extra_force: Optional[Callable] = None,  # (pos, box, step) -> [n,3]
    ):
        n = len(species)
        self.nbr = nbr
        self.dt = float(dt)
        self.integrator = integrator
        self.barostat = barostat
        if barostat is not None and isinstance(
                integrator, integrate.NoseHooverNPT):
            raise ValueError("NoseHooverNPT already includes a barostat")
        self.dtype = dtype
        self.extra_force = extra_force

        # Species-sort for exact static per-species matmul shapes
        # (networks.atomic_energies_sorted). `self.order` maps sorted->input.
        if sort_species:
            self.order = np.argsort(species, kind="stable")
        else:
            self.order = np.arange(n)
        self.inv_order = np.argsort(self.order)
        self._species_in = np.asarray(species)  # original caller order
        self._masses_in = np.asarray(masses)
        self._sort_species = sort_species
        self.species_np = np.asarray(species)[self.order]
        self.species = jnp.asarray(self.species_np)
        self.masses = jnp.asarray(np.asarray(masses)[self.order], dtype)
        num_species = potential.spec.net.num_species
        self.species_counts = tuple(
            int((self.species_np == s).sum()) for s in range(num_species)
        ) if sort_species else None
        self.potential = potential
        self.constraints = constraints
        self._rattle = None  # caller-order -> internal-order, set at init
        self.dof = 3 * n - 3 - (constraints.n_constraints
                                if constraints is not None else 0)
        self.n_atoms = n
        self._shifts = nbops.image_shifts(nbr.n_shell)
        self._grid = None  # CellGrid, host-computed in init_state
        self._k_max = nbr.k_max  # auto-tightened by _derive_angular_caps
        self._ang_cap = None  # angular sub-list capacity (auto-derived)
        self._roll_grid = None  # ops/cell_roll.RollGrid when active
        self._rad_sections = None  # pallas_asn static compact layout
        # (one grid + one assignment serve both asn channels)
        self._ang_tiers = None  # pallas_asn occupancy tiers
        # ((caps_t, rows_t), ...): rows whose per-species angular degrees
        # fit narrower caps run quadratically cheaper pair blocks
        # Cell-roll implementation modes:
        #   "xla"         — XLA roll radial channel + mirror angular
        #   "pallas"      — Pallas radial kernel (coarse grid, shell-1)
        #                   + mirror angular: the round-2 hybrid
        #   "pallas_full" — both channels from Pallas kernels over one fine
        #                   grid; no neighbor matrix / mirror tables at all
        #   "pallas_asn"  — assignment-compacted kernels over one shared
        #                   grid (ops/aev_asn.py): the round-3 production
        #                   path;
        #                   also the only fast path supporting repulsion
        # LAT_ROLL_IMPL overrides (tests force pallas modes on CPU, where
        # the kernels run in interpret mode).
        import os as _os
        env = _os.environ.get("LAT_ROLL_IMPL")
        if env:
            self._roll_impl = env
        elif dtype == jnp.float32 and jax.default_backend() == "tpu":
            self._roll_impl = "pallas_asn"
        else:
            self._roll_impl = "xla"
        self._roll_shell = 2  # radial window shells (set by _setup_grids)
        if self._roll_impl in ("pallas_full", "pallas_asn") and not (
                auto_angular_caps or potential.spec.angular_caps):
            # the pallas angular kernels need composition-derived caps
            self._roll_impl = "pallas"
        self._want_cellroll = cellroll and (
            potential.spec.repulsion is None
            or self._roll_impl == "pallas_asn")
        # query cutoff for the candidate structure: with the cell-roll
        # radial channel only angular candidates are needed
        self._rlist_query = nbr.rlist
        self._auto_angular_caps = (
            auto_angular_caps and potential.spec.angular_caps is None)
        self._chunk_cache = {}
        # cumulative count of capacity regrows run() has performed; lets
        # callers (bench.py) warm up until capacities stop ratcheting so
        # a regrow's whole-program recompile never lands in a timed region
        self.regrow_events = 0

    # ---------- setup ----------

    def init_state(
        self,
        pos: np.ndarray,
        box: nbops.Box,
        vel: np.ndarray | None = None,
        temp: float | None = None,
        seed: int = 12345,
        compute_virial: bool = True,
    ) -> MDState:
        self._spatial_sort(np.asarray(pos), box)
        pos = jnp.asarray(np.asarray(pos)[self.order], self.dtype)
        box = nbops.Box(h=jnp.asarray(box.h, self.dtype),
                        origin=jnp.asarray(box.origin, self.dtype))
        self._setup_grids(pos, box)
        key = jax.random.PRNGKey(seed)
        if vel is not None:
            vel = jnp.asarray(np.asarray(vel)[self.order], self.dtype)
        elif temp is not None:
            key, sub = jax.random.split(key)
            vel = integrate.create_velocities(
                sub, self.masses, temp, self.dof, dtype=self.dtype)
        else:
            vel = jnp.zeros_like(pos)

        if self.constraints is not None:
            import dataclasses as _dc
            inv = self.inv_order
            self._rattle = _dc.replace(
                self.constraints,
                pairs=tuple((int(inv[i]), int(inv[j]))
                            for i, j in self.constraints.pairs))

        if self._auto_angular_caps:
            self._derive_angular_caps(pos, box)

        @jax.jit
        def _init_compute(pos, box):
            pos_w = nbops.wrap_positions(pos, box)
            bins = self._bins(pos_w, box)
            if self._pallas_roll or self._pallas_asn:
                nlist, nbrs = None, None
            else:
                nlist = self._build_nlist(pos_w, box)
                nbrs = self._mirror(nlist, pos_w, box)
            pe, force, virial, _ = self._forces(pos_w, box, nbrs, bins,
                                                jnp.zeros((), jnp.int32))
            return pos_w, nlist, nbrs, bins, pe, force, virial

        pos_w, nlist, nbrs, bins, pe, force, virial = _init_compute(pos, box)
        self._log_engine()
        if self._pallas_asn:
            # keep the initial state's pytree structure identical to the
            # chunk output's (which drops the stale GB-scale assignment
            # tables) so _jitted_chunk compiles once, not per-structure
            bins = None
        ts, bs = None, None
        if isinstance(self.integrator, integrate.NoseHooverNPT):
            ts = self.integrator.thermostat.init(self.dtype)
            bs = self.integrator.init(self.dtype)
        elif isinstance(self.integrator, integrate.NoseHoover):
            ts = self.integrator.init(self.dtype)
        return MDState(
            pos=pos_w, vel=vel, force=force, box=box,
            step=jnp.zeros((), jnp.int32), rng=key,
            pe=pe, virial=virial, nlist=nlist, pos_at_rebuild=pos_w,
            thermostat=ts, barostat=bs, nbrs=nbrs, bins=bins,
        )

    def _spatial_sort(self, pos: np.ndarray, box: nbops.Box):
        """Reorder atoms species-major / cell-minor.

        The per-species blocks keep the exact static MLP shapes
        (networks.atomic_energies_sorted); the cell-minor order inside each
        block makes neighbor indices spatially local, which roughly halves
        the cost of the per-step neighbor gathers (TPU gathers reward
        index locality heavily)."""
        h = np.asarray(box.h, np.float64)
        origin = np.asarray(box.origin, np.float64)
        # fractional coords (triclinic back-substitution, matches Box)
        r = pos - origin
        f2 = r[:, 2] / h[2, 2]
        f1 = (r[:, 1] - f2 * h[2, 1]) / h[1, 1]
        f0 = (r[:, 0] - f1 * h[1, 0] - f2 * h[2, 0]) / h[0, 0]
        frac = np.stack([f0, f1, f2], 1) % 1.0
        side = max(self.nbr.rlist, 1e-6)
        perp = np.abs(np.diag(h))
        ncell = np.maximum((perp / side).astype(np.int64), 1)
        cc = np.minimum((frac * ncell).astype(np.int64), ncell - 1)
        cell_id = (cc[:, 0] * ncell[1] + cc[:, 1]) * ncell[2] + cc[:, 2]
        if self._sort_species:
            self.order = np.lexsort((cell_id, self._species_in))
        else:
            self.order = np.argsort(cell_id, kind="stable")
        self.inv_order = np.argsort(self.order)
        self.species_np = self._species_in[self.order]
        self.species = jnp.asarray(self.species_np)
        self.masses = jnp.asarray(self._masses_in[self.order], self.dtype)

    # ---------- grid lifecycle ----------

    def _barostat_active(self) -> bool:
        return self.barostat is not None or isinstance(
            self.integrator, integrate.NoseHooverNPT)

    @property
    def _skin_eff(self) -> float:
        """Displacement bound between rebuilds is skin_eff/2.

        pallas_full re-compacts angular neighbors from the candidate
        window EVERY step, so only the bin-coverage skin constrains the
        interval; pallas_asn freezes both channel assignments at
        (cutoff + skin), bounded by skin alone; the mirror paths also
        freeze the angular sub-list, bounded by ang_skin."""
        if self._roll_impl in ("pallas_full", "pallas_asn"):
            return self.nbr.skin
        return min(self.nbr.skin, self.nbr.ang_skin)

    @property
    def _roll_side(self) -> float:
        """Bin side the (radial) roll grid must keep (box validity).

        pallas_full uses ONE fine grid for both channels: the angular
        kernel reads a shell-1 window (side >= Rca + skin), the radial a
        shell-2 window (2*side >= Rcr + skin). pallas_asn and the
        radial-only pallas hybrid and the XLA cell-roll channel need
        shell-1 radial coverage (side >= Rcr + skin)."""
        spec = self.potential.spec
        if self._roll_impl == "pallas_full":
            return max(spec.aev.angular_cutoff + self._skin_eff,
                       (spec.cutoff + self._skin_eff) / 2.0)
        if self._roll_impl in ("pallas", "pallas_asn"):
            return spec.cutoff + self._skin_eff
        return spec.cutoff + self.nbr.ang_skin

    def _setup_grids(self, pos, box):
        """(Re-)derive the cell/roll grids from the CURRENT box.

        Called at init and, under a barostat, whenever `_grids_valid` says
        the box drifted past the frozen grids' slack (the grids are static
        geometry; NPT/Berendsen rescale box.h every step, so a grid frozen
        at t=0 would eventually clip ghosts into wrong cells or let pairs
        escape adjacent bins — silently wrong forces). With a barostat the
        grids are derived with a few % slack so re-derives stay rare."""
        box_h = np.asarray(box.h, np.float64)
        slack = 1.06 if self._barostat_active() else 1.0
        if self._want_cellroll and self._roll_impl == "pallas_asn":
            from ..ops import cell_roll as crmod

            def probe_grid(side):
                probe = crmod.RollGrid.for_box(box_h, side * slack, 64)
                if probe is None:
                    return None
                cnt = int(jax.device_get(jax.jit(
                    lambda p, b: crmod.build_bins(
                        probe, nbops.wrap_positions(p, b),
                        self.species, b).count_max)(pos, box)))
                cap = int(-(-int(cnt + 2 + _roll_cap_margin()) // 4) * 4)
                return crmod.RollGrid(ncells=probe.ncells, cap=cap)

            # ONE coarse grid (side >= Rcr + skin) serves both channels:
            # its shell-1 window and keep radius cover the angular cutoff
            self._roll_grid = probe_grid(self._roll_side)
            self._rlist_query = self.nbr.rlist
            self._chunk_cache = {}
            if self.nbr.use_cell_list:
                from ..ops import cell_list as clmod
                self._grid = clmod.CellGrid.for_box(
                    box_h, self._rlist_query * slack,
                    self.nbr.cell_capacity)
                self._probe_cell_capacity(pos, box)
            return
        if self._want_cellroll:
            from ..ops import cell_roll as crmod
            probe = crmod.RollGrid.for_box(box_h, self._roll_side * slack,
                                           64)
            if probe is None:
                self._roll_grid = None
                self._rlist_query = self.nbr.rlist
            else:
                cnt = int(jax.device_get(jax.jit(
                    lambda p, b: crmod.build_bins(
                        probe, nbops.wrap_positions(p, b),
                        self.species, b).count_max)(pos, box)))
                # tight cap: radial kernel work scales with cap^2; the
                # structured overflow recovery regrows on demand
                cap = int(-(-int(cnt + 2 + _roll_cap_margin()) // 4) * 4)
                self._roll_grid = crmod.RollGrid(ncells=probe.ncells,
                                                 cap=cap)
                self._rlist_query = (
                    self.potential.spec.aev.angular_cutoff
                    + self.nbr.ang_skin)
                if self._roll_impl == "pallas":
                    self._roll_shell = 1  # coarse grid reaches the cutoff
                elif self._roll_impl == "pallas_full":
                    # radial window: shell 1 if a single bin reaches the
                    # radial cutoff + skin, else shell 2 (the fine grid)
                    perp = self._perp_lengths(box_h)
                    side_now = float(
                        (perp / np.asarray(self._roll_grid.ncells)).min())
                    spec = self.potential.spec
                    self._roll_shell = (
                        1 if side_now >= spec.cutoff + self._skin_eff
                        else 2)
                    self._rlist_query = (spec.aev.angular_cutoff
                                         + self._skin_eff)
        if self.nbr.use_cell_list:
            from ..ops import cell_list as clmod
            self._grid = clmod.CellGrid.for_box(
                box_h, self._rlist_query * slack, self.nbr.cell_capacity)
            # None => box too small for a 3x3x3 grid; brute build instead.
            self._probe_cell_capacity(pos, box)
        self._chunk_cache = {}

    def _probe_cell_capacity(self, pos, box) -> bool:
        """Grow self._grid's per-cell capacity to the MEASURED occupancy.

        The config's cell_capacity is only a floor: a clipped cell table
        silently drops neighbor candidates, which the builder folds into
        the k_max overflow sentinel (cell_list.py:220-222) — growing k_max
        can never clear it, so the degree measure in _derive_angular_caps
        would size sections from a truncated list and loop on section
        overflow forever. Probing the true max cell count (one sort) at
        grid (re-)derivation and on k_max overflow keeps the table exact
        the way the roll-grid cap probe does."""
        if self._grid is None or not self.nbr.use_cell_list:
            return False
        from ..ops import cell_list as clmod
        grid = self._grid

        def occ(p, b):
            pw = nbops.wrap_positions(p, b)
            ghosts = nbops.build_ghosts(pw, b, self._rlist_query,
                                        self.nbr.ghost_capacity,
                                        self._shifts)
            pos_ext = nbops.extended_positions(pw, b, ghosts)
            ext_valid = jnp.concatenate(
                [jnp.ones((p.shape[0],), bool), ghosts.mask])
            coords = clmod._cell_coords(grid, b.to_fractional(pos_ext))
            cell_ids = clmod._flat_cell(grid, coords)
            _, max_cell = clmod.build_cell_table(grid, cell_ids, ext_valid)
            return max_cell

        cnt = int(jax.device_get(jax.jit(occ)(pos, box)))
        cap = int(-(-int(cnt * 1.15 + 2) // 4) * 4)
        if cap > grid.cell_capacity:
            import dataclasses as _dc
            self._grid = _dc.replace(grid, cell_capacity=cap)
            self._chunk_cache = {}
            return True
        return False

    @staticmethod
    def _perp_lengths(box_h) -> np.ndarray:
        h = np.asarray(box_h, np.float64)
        v = abs(np.dot(h[0], np.cross(h[1], h[2])))
        return np.array([
            v / np.linalg.norm(np.cross(h[1], h[2])),
            v / np.linalg.norm(np.cross(h[2], h[0])),
            v / np.linalg.norm(np.cross(h[0], h[1])),
        ])

    def _grids_valid(self, box_h) -> bool:
        """Whether the frozen grid geometry still covers the query cutoffs
        for the given (possibly barostat-rescaled) box."""
        h = np.asarray(box_h, np.float64)
        perp = self._perp_lengths(h)
        if self._want_cellroll and self._roll_impl == "pallas_asn":
            from ..ops import cell_roll as crmod
            if self._roll_grid is None:
                return crmod.RollGrid.for_box(h, self._roll_side, 4) is None
            return not np.any(
                perp / np.asarray(self._roll_grid.ncells)
                < self._roll_side)
        if self._want_cellroll:
            if self._roll_grid is None:
                # roll disabled because the box was too small — revisit if
                # the box grew enough for a grid
                from ..ops import cell_roll as crmod
                if crmod.RollGrid.for_box(h, self._roll_side, 4) is not None:
                    return False
            else:
                side_now = perp / np.asarray(self._roll_grid.ncells)
                if np.any(side_now < self._roll_side):
                    return False
                if (self._roll_impl == "pallas_full"
                        and self._roll_shell == 1
                        and np.any(side_now < self.potential.spec.cutoff
                                   + self._skin_eff)):
                    return False  # shell-1 radial window no longer reaches
        if self.nbr.use_cell_list:
            rq = self._rlist_query
            if self._grid is None:
                from ..ops import cell_list as clmod
                if clmod.CellGrid.for_box(h, rq, 4) is not None:
                    return False
            else:
                m = np.asarray(self._grid.margin_frac)
                if np.any(rq / perp > m * (1 + 1e-12)):
                    return False  # frozen ghost margin no longer covers rq
                side = perp * (1.0 + 2.0 * m) / np.asarray(self._grid.ncells)
                if np.any(side < rq):
                    return False  # cells shrank below the query cutoff
        return True

    # ---------- internals (traced) ----------

    def _derive_angular_caps(self, pos, box, regrow=False,
                             regrow_mirror=False):
        """Specialize the potential's AEV to this system's composition:
        measure per-species angular-neighbor degrees once, set static caps
        with 50% + skin headroom (species absent from the system get cap 0,
        removing their species-pair blocks from the compiled program
        entirely). Rebuild-time growth is caught by angular_cap_deficit in
        the chunk's overflow channel."""
        import dataclasses as _dc
        from ..models import aev as aevmod

        spec = self.potential.spec

        asn_mode = self._roll_impl == "pallas_asn"

        def measure(pos, box):
            pos_w = nbops.wrap_positions(pos, box)
            nlist = self._build_nlist(pos_w, box)
            species_ext = nbops.extended_species(self.species, nlist.ghosts)
            _, dist = nbops.neighbor_displacements(pos_w, box, nlist)
            species_j = species_ext[nlist.idx]
            mask = nlist.mask & (species_j >= 0)
            in_ang = mask & (dist < spec.aev.angular_cutoff)
            in_ang_skin = mask & (
                dist < spec.aev.angular_cutoff + self.nbr.ang_skin)
            per_species = lambda m: jnp.stack([
                jnp.max(jnp.sum(m & (species_j == s), axis=1))
                for s in range(spec.aev.num_species)])
            sec = {}
            if asn_mode:
                # assignment section degrees (keep radius cutoff + skin;
                # the measure nlist covers rlist in this mode)
                sec["rad"] = per_species(
                    mask & (dist < spec.cutoff + self._skin_eff))
                # full per-row degree matrix for the occupancy-tier search
                sec["cnt"] = jnp.stack(
                    [jnp.sum(in_ang & (species_j == s), axis=1)
                     for s in range(spec.aev.num_species)], axis=1)
            return (per_species(in_ang), nlist.max_count,
                    jnp.max(jnp.sum(in_ang_skin, axis=1)), sec)

        degrees, max_deg, ang_deg, sec = jax.device_get(
            jax.jit(measure)(pos, box))
        for _ in range(16):
            if int(max_deg) <= self._k_max:
                break
            # The measuring matrix truncated: per-species degree sums are
            # underestimates — regrow and re-measure (a truncated measure
            # would undersize sections/caps and loop on overflow). Two
            # distinct causes fold into this signal: k_max rows too small
            # (max_count is then the TRUE degree) and a clipped cell
            # table (max_count is then the k_max+1 sentinel,
            # cell_list.py:220-222) — handle both, since growing k_max
            # alone can never clear the sentinel.
            self._probe_cell_capacity(pos, box)
            self._k_max = int(-(-int(max_deg * 1.1 + 4) // 8) * 8)
            # fresh jit each pass: _build_nlist reads _k_max at trace time
            degrees, max_deg, ang_deg, sec = jax.device_get(
                jax.jit(measure)(pos, box))
        else:
            raise RuntimeError(
                f"degree measure kept truncating (max_count {int(max_deg)}"
                f" > k_max {self._k_max} after 16 regrows)")
        degrees = np.asarray(degrees)
        if asn_mode:
            from ..ops import aev_asn as apasn
            # ~10% headroom: density fluctuations between re-measures grow
            # sections without a recompile only via overflow recovery;
            # lane-boundary trim rationale in sections_from_degrees
            import os as _os
            self._rad_sections = apasn.sections_from_degrees(
                sec["rad"], float(_os.environ.get("LAT_SEC_MARGIN", "1.1")))
        old_ang_cap, old_k_max = self._ang_cap, self._k_max
        self._ang_cap = int(-(-int(ang_deg * 1.1 + 2) // 4) * 4)
        # tight neighbor capacity too (radial/displacement work is linear in
        # k_max); growth handled by the same overflow-recovery path
        self._k_max = int(-(-int(max_deg * 1.1 + 4) // 8) * 8)
        if regrow or regrow_mirror:
            # a regrow re-derive must never SHRINK a capacity: the chunk
            # that overflowed rebuilds mid-chunk (check-yes) at later
            # geometry than the state measured here
            if old_ang_cap is not None:
                self._ang_cap = max(self._ang_cap, old_ang_cap)
            self._k_max = max(self._k_max, old_k_max)
        if regrow_mirror:
            # the mirror ok-flag tripped (angular sub-list cnt > cap or
            # an asymmetric truncation): measured-at-input margins can
            # be exactly what just failed on a mid-chunk rebuild, so
            # growth must be monotonic in the retry loop — without this
            # the same caps re-derive every retry and run() dies at the
            # attempt limit (observed at 101k, skin 1.5)
            if old_ang_cap is not None:
                self._ang_cap = max(self._ang_cap, old_ang_cap + 4)
            self._k_max = max(self._k_max,
                              -(-(old_k_max + 8) // 8) * 8)
        # Angular caps carry measured margin: the t=0 degree measure sits
        # one thermal fluctuation below the per-step max over
        # n_atoms x steps, and every cap overflow costs a chunk recompile
        # (~minutes on the tunnel). The pair-block cost scales with
        # cap x cap, so blanket multiplicative margin is expensive
        # (measured +29% angular kernel time for (20,12) vs (16,12) at
        # the bench box); instead small-degree species — whose RELATIVE
        # fluctuations are largest, and which caused round-2's regrow
        # storm (O at cap 8) — get +4 absolute headroom. Runtime growth
        # is targeted: the kernels report per-species deficits and run()
        # bumps exactly the overflowing caps (monotonic, no re-measure).
        # default 1.1 (not 1.0): the t=0 measure is one thermal
        # fluctuation below the trajectory max; 1.1 is where the 101k
        # bench ratchet settles (1.4 overshot H to cap 28 vs the real
        # 20 — quadratic pair-block waste, profiled 1.5x)
        import os as _os
        margin = float(_os.environ.get("LAT_ANG_CAP_MARGIN", "1.1"))
        old = spec.angular_caps
        caps = tuple(
            0 if d == 0 else int(
                -(-int(d * margin + 2 + (4 if d * margin <= 10 else 0))
                  // 4) * 4)
            for d in degrees
        )
        if regrow and old is not None:
            caps = tuple(
                0 if c == 0 else max(c, o + 4)
                for c, o in zip(caps, old))
        self.potential = potmod.ANIPotential(
            spec=_dc.replace(spec, angular_caps=caps),
            params=self.potential.params)
        if asn_mode:
            self._ang_tiers = self._derive_tiers(
                np.asarray(sec["cnt"]), caps)
        self._chunk_cache = {}

    def _derive_tiers(self, cnt, caps):
        """Occupancy tiers for the asn angular pair blocks: rows whose
        per-species degrees fit tier-0 caps (the bulk — caps sit well
        above the MEAN degree) run quadratically narrower pair blocks;
        the rest run the full caps. Tier-0 cap choice minimizes the
        padded-lane work model over the measured degree matrix
        (ops/aev_asn.search_tiers); row capacities carry margin because
        only the LAST tier's capacity is a correctness bound (spill
        cascades tier-to-tier and is reported in the deficit channel)."""
        import os as _os
        from ..ops import aev_asn as apasn

        t_env = int(_os.environ.get("LAT_ANG_TIERS", "3"))
        min_n = int(_os.environ.get("LAT_ANG_TIER_MIN_N", "4096"))
        if t_env < 2 or self.n_atoms < min_n:
            return None
        m0 = float(_os.environ.get("LAT_TIER0_MARGIN", "1.06"))
        m1 = float(_os.environ.get("LAT_TIER_ROWS_MARGIN", "1.3"))
        n = self.n_atoms
        if apasn._packed_on() and t_env > 2:
            # packed layout: exact pair counts make fine chunk-budget
            # ladders pay (the per-block kernels' 128-lane floor per
            # block made sub-tier caps worthless below 3 x 128)
            ladder = apasn.search_tier_ladder(cnt, caps,
                                              max_pre=t_env - 1)
            if ladder is not None:
                used = 0
                tiers = []
                for caps_t, n_t in ladder:
                    tiers.append((tuple(caps_t),
                                  min(int(n_t * m0) + 64, n)))
                    used += n_t
                # the LAST tier's row capacity is the only correctness
                # bound (pre-tier spill cascades into it): give it a
                # generous floor — its full-caps rows are cheap next to
                # the regrow recompile a tight bound causes every time
                # thermal drift moves a few hundred rows across tiers
                tiers.append((tuple(caps),
                              min(int((n - used) * m1) + 4096, n)))
                return tuple(tiers)
        res = apasn.search_tiers(cnt, caps)
        if res is None:
            return None
        caps0, n0 = res
        rows0 = min(int(n0 * m0) + 64, n)
        rows1 = min(int((n - n0) * m1) + 256, n)
        return ((tuple(caps0), rows0), (tuple(caps), rows1))

    def _angular_overflow(self, pos, box, nlist):
        """[] bool: any per-species angular degree exceeds the static caps."""
        from ..models import aev as aevmod

        caps = self.potential.spec.angular_caps
        if caps is None:
            return jnp.zeros((), bool)
        species_ext = nbops.extended_species(self.species, nlist.ghosts)
        _, dist = nbops.neighbor_displacements(pos, box, nlist)
        species_j = species_ext[nlist.idx]
        mask = nlist.mask & (species_j >= 0)
        return aevmod.angular_cap_deficit(
            self.potential.spec.aev, dist, species_j, mask, caps) > 0

    def _mirror(self, nlist, pos, box):
        """MirrorNeighbors incl. the angular sub-channel when sized.

        The main mirror table may be skipped only when BOTH the radial
        channel is served by cell-roll AND the angular sub-channel exists:
        without the sub-channel the angular block falls back to the main
        channel's displacement vectors, whose backward needs the mirror
        table (a zeroed table would silently gather forces from slot 0)."""
        main = self._roll_grid is None or self._ang_cap is None
        if self._ang_cap is not None:
            return nbr_grad.mirror_neighbors(
                nlist, self.n_atoms, pos=pos, box=box,
                ang_cutoff=self.potential.spec.aev.angular_cutoff
                + self.nbr.ang_skin,
                ang_cap=self._ang_cap, species=self.species,
                main_mirror=main)
        return nbr_grad.mirror_neighbors(nlist, self.n_atoms,
                                         species=self.species,
                                         main_mirror=main)

    def _build_nlist(self, pos, box):
        rq = self._rlist_query
        ghosts = nbops.build_ghosts(
            pos, box, rq, self.nbr.ghost_capacity, self._shifts)
        if self.nbr.use_cell_list and self._grid is not None:
            from ..ops import cell_list as clmod
            return clmod.build_neighbor_matrix_cells(
                pos, box, rq, self._k_max, ghosts, grid=self._grid)
        return nbops.build_neighbor_matrix_brute(
            pos, box, rq, self._k_max, ghosts)

    def _bins(self, pos, box):
        if self._roll_grid is None:
            return None
        from ..ops import cell_roll as crmod
        if self._pallas_asn:
            from ..ops import aev_asn as apasn
            spec = self.potential.spec
            rbins = crmod.build_bins(self._roll_grid, pos, self.species,
                                     box)
            kpad_r = apasn._round_lane(
                sum(k for _, k in self._rad_sections) + 1)
            # one assignment serves both channels: keep radius
            # Rcr + skin covers Rca + skin, and the angular kernel
            # re-compacts within-cutoff lanes per step anyway
            rasn = apasn.build_assignment(
                self._roll_grid, rbins, pos, box, self._rad_sections,
                kpad_r, spec.cutoff + self._skin_eff)
            return (rbins, rasn)
        return crmod.build_bins(self._roll_grid, pos, self.species, box)

    @property
    def _pallas_roll(self) -> bool:
        return (self._roll_grid is not None
                and self._roll_impl == "pallas_full")

    @property
    def _pallas_asn(self) -> bool:
        return (self._roll_grid is not None
                and self._roll_impl == "pallas_asn")

    def _forces(self, pos, box, nbrs, bins, step):
        """(pe, force, virial, angular-deficit) at `pos` [kcal/mol units].

        Three execution paths: full-Pallas roll (both AEV channels from
        ops/aev_pallas kernels — no neighbor matrix at all), XLA cell-roll
        (radial from ops/cell_roll, angular from the mirror sub-list), and
        the mirror path (the oracle)."""
        if self._pallas_asn and bins is not None:
            rbins, rasn = bins
            asn_state = (self._roll_grid, rbins, rasn, self._rad_sections,
                         self._ang_tiers)
            pe_h, f_h, w_h, deficit = potmod.energy_forces_virial_asn(
                self.potential, self.species, pos, box, asn_state,
                species_counts=self.species_counts)
        elif self._pallas_roll and bins is not None:
            pe_h, f_h, w_h, deficit = potmod.energy_forces_virial_roll(
                self.potential, self.species, pos, box, self._roll_grid,
                bins, radial_shell=self._roll_shell,
                species_counts=self.species_counts)
        else:
            cellroll = (None if bins is None
                        else (self._roll_grid, bins, self._roll_impl))
            pe_h, f_h, w_h = potmod.energy_forces_virial_mirror(
                self.potential, self.species, pos, box, nbrs,
                species_counts=self.species_counts, cellroll=cellroll)
            deficit = jnp.zeros((), pos.dtype)
        c = jnp.asarray(units.HARTREE2KCALMOL, pos.dtype)
        pe, f, w = pe_h * c, f_h * c, w_h * c
        if self.extra_force is not None:
            # extra_force sees positions in the CALLER's atom order (CV
            # definitions use original indices, md/bias.py); remap both ways
            inv = jnp.asarray(self.inv_order)
            f_in = self.extra_force(pos[inv], box, step)
            f = f + f_in[jnp.asarray(self.order)]
        return pe, f, w, deficit

    def _step(self, state: MDState) -> MDState:
        dt = jnp.asarray(self.dt, self.dtype)
        vel, force, pos, box = state.vel, state.force, state.pos, state.box
        ts, bs = state.thermostat, state.barostat
        key = state.rng
        npt = (self.integrator
               if isinstance(self.integrator, integrate.NoseHooverNPT)
               else None)
        n = self.n_atoms

        if npt is not None:
            ke = integrate.kinetic_energy(vel, self.masses)
            p_now = jnp.trace(integrate.pressure_tensor(
                vel, self.masses, state.virial, box.volume)) / 3.0
            bs = npt.piston_half(bs, p_now, box.volume, ke, n, dt, self.dof)
            ts, vel = npt.thermostat.half_step(
                ts, vel, self.masses, self.dof, dt)
            vel = vel * npt.vel_scale(bs.omega, self.dof, n, dt)
        elif isinstance(self.integrator, integrate.NoseHoover):
            ts, vel = self.integrator.half_step(
                ts, vel, self.masses, self.dof, dt)

        vel = integrate.nve_halfkick(vel, force, self.masses, dt)

        if npt is not None:
            s = npt.box_scale(bs.omega, dt)
            box = integrate.rescale_box(box, s)
            pos = box.origin + (pos - box.origin) * s
        pos_old = pos
        pos = integrate.nve_drift(pos, vel, dt)
        if self._rattle is not None:
            pos, vel = self._rattle.project_positions(
                pos, pos_old, vel, self.masses, box, dt)

        pe, force, virial, deficit = self._forces(
            pos, box, state.nbrs, state.bins, state.step)
        if isinstance(self.integrator, integrate.Langevin):
            key, sub = jax.random.split(key)
            force = force + self.integrator.force(sub, vel, self.masses, dt)

        vel = integrate.nve_halfkick(vel, force, self.masses, dt)
        if self._rattle is not None:
            vel = self._rattle.project_velocities(pos, vel, self.masses, box)

        if npt is not None:
            vel = vel * npt.vel_scale(bs.omega, self.dof, n, dt)
            ts, vel = npt.thermostat.half_step(
                ts, vel, self.masses, self.dof, dt)
            ke = integrate.kinetic_energy(vel, self.masses)
            p_now = jnp.trace(integrate.pressure_tensor(
                vel, self.masses, virial, box.volume)) / 3.0
            bs = npt.piston_half(bs, p_now, box.volume, ke, n, dt, self.dof)
        elif isinstance(self.integrator, integrate.NoseHoover):
            ts, vel = self.integrator.half_step(
                ts, vel, self.masses, self.dof, dt)

        if self.barostat is not None:
            p_now = jnp.trace(integrate.pressure_tensor(
                vel, self.masses, virial, box.volume)) / 3.0
            s = self.barostat.scale_factor(p_now, dt)
            box = integrate.rescale_box(box, s)
            pos = box.origin + (pos - box.origin) * s

        return state.replace(
            pos=pos, vel=vel, force=force, pe=pe, virial=virial, box=box,
            step=state.step + 1, rng=key, thermostat=ts, barostat=bs,
        ), deficit

    def _chunk(self, state: MDState, n_take, n_steps: int):
        """One rebuild + up to n_steps fused MD steps.

        n_take (traced int32 scalar) caps how many of the n_steps are
        actually integrated; the rest execute frozen (alive=False). This
        lets run() serve ANY tail length with the single compiled
        rebuild_every-sized program — a distinct static chunk size per
        tail would recompile the whole program (minutes over the
        tunnel) to save at most one chunk's worth of frozen-step
        compute."""
        pos_w = nbops.wrap_positions(state.pos, state.box)
        bins = self._bins(pos_w, state.box)
        if self._pallas_roll or self._pallas_asn:
            # full Pallas paths: the bin grid IS the neighbor structure —
            # no neighbor matrix, no mirror tables, no angular sub-list.
            nlist, nbrs = None, None
        else:
            nlist = self._build_nlist(pos_w, state.box)
            nbrs = self._mirror(nlist, pos_w, state.box)
        # NOTE: no force recompute here — wrapping/rebuilding changes the
        # neighbor bookkeeping, not the physics; the carried state.force is
        # still the force at these positions.
        state = state.replace(pos=pos_w, nlist=nlist, nbrs=nbrs, bins=bins,
                              pos_at_rebuild=pos_w)

        half_skin = jnp.asarray(self._skin_eff / 2.0, self.dtype)

        def body(carry, i):
            st, alive, n_done = carry
            # LAMMPS `neigh_modify check yes`: if any atom has moved more
            # than skin/2 since the rebuild, the frozen list may be stale —
            # freeze the rest of the chunk BEFORE stepping on it; the host
            # resumes from a fresh rebuild at this exact state.
            disp_now = jnp.max(jnp.linalg.norm(
                st.pos - st.pos_at_rebuild, axis=-1))
            alive = alive & (disp_now <= half_skin) & (i < n_take)
            new_st, deficit = self._step(st)
            # select only the fields _step changes (the frozen neighbor
            # structures are large and identical in both branches)
            changed = ("pos", "vel", "force", "pe", "virial", "box",
                       "step", "rng", "thermostat", "barostat")
            st = st.replace(**{
                f: jax.tree.map(lambda o, n: jnp.where(alive, n, o),
                                getattr(st, f), getattr(new_st, f))
                for f in changed})
            deficit = jnp.where(alive, deficit, 0.0)
            n_done = n_done + alive.astype(jnp.int32)
            ke = integrate.kinetic_energy(st.vel, self.masses)
            scalars = {
                "pe": st.pe,
                "ke": ke,
                "temp": 2.0 * ke / (self.dof * units.BOLTZ),
                "press": jnp.trace(integrate.pressure_tensor(
                    st.vel, self.masses, st.virial, st.box.volume)) / 3.0,
                "vol": st.box.volume,
                "density": jnp.sum(self.masses) / units.AVOGADRO_VOL
                / st.box.volume,
            }
            return (st, alive, n_done), (scalars, deficit)

        carry0 = (state, jnp.ones((), bool), jnp.zeros((), jnp.int32))
        (state, _, n_done), (traj, deficits) = jax.lax.scan(
            body, carry0, jnp.arange(n_steps, dtype=jnp.int32))
        if self._pallas_asn:
            # the frozen assignment tables are ~GB-scale at bench sizes
            # and stale after the chunk; dropping them from the returned
            # state halves their peak HBM residency across the rebuild
            state = state.replace(bins=None)
        # max displacement since rebuild (diagnostics; staleness is now
        # prevented by the in-scan check, not by a post-hoc error)
        disp = jnp.max(jnp.linalg.norm(state.pos - state.pos_at_rebuild,
                                       axis=-1))
        # Structured overflow codes for THIS chunk's rebuild (the input
        # state's flags are stale — they describe the previous rebuild), so
        # run() can grow the matching capacity instead of guessing.
        false = jnp.zeros((), bool)
        zero = jnp.zeros((), jnp.int32)
        if self._pallas_asn:
            rbins, rasn = bins
            roll_ovf = rbins.count_max > self._roll_grid.cap
            roll_count = rbins.count_max
            roll_ang_ovf = false
            sec_ovf = rasn.ovf > 0
            overflow_sec = rasn.ovf_sec
        else:
            roll_ovf = (false if bins is None
                        else bins.count_max > self._roll_grid.cap)
            roll_count = zero if bins is None else bins.count_max
            roll_ang_ovf = false
            sec_ovf = false
        overflow = {
            "ghost": false if nlist is None
            else nlist.ghosts.count > nlist.ghosts.src.shape[0],
            "k_max": false if nlist is None
            else nlist.max_count > nlist.idx.shape[1],
            "mirror": false if nbrs is None else ~nbrs.ok,
            # pallas paths: per-step in-kernel deficit (stronger than the
            # rebuild-time check of the mirror path)
            "angular": jnp.max(deficits) > 0
            if (self._pallas_roll or self._pallas_asn)
            else self._angular_overflow(pos_w, state.box, nlist),
            "roll": roll_ovf,
            "roll_ang": roll_ang_ovf,
            # pallas_asn: a frozen section overflowed at rebuild time
            "sections": sec_ovf,
        }
        if self._pallas_asn:
            # per-species worst deficit across the chunk's steps: run()
            # grows exactly the overflowing caps, no degree re-measure
            overflow["angular_deficit"] = jnp.max(deficits, axis=0)
            overflow["sec_deficit"] = overflow_sec
        # measured bin occupancy: run() regrows the roll cap to exactly
        # this (rounded) instead of 1.5x — window width (27*cap lanes)
        # sets every asn kernel's per-step gather cost
        overflow["roll_count"] = roll_count
        return state, traj, disp, overflow, n_done

    def _jitted_chunk(self, n_steps: int):
        if n_steps not in self._chunk_cache:
            self._chunk_cache[n_steps] = jax.jit(
                functools.partial(self._chunk, n_steps=n_steps))
        return self._chunk_cache[n_steps]

    def _log_engine(self):
        """One unconditional line naming the selected execution engine and
        its effective capacities (VERDICT r3 weak #8: a user on f64 or
        non-TPU silently got a ~2.5x slower engine with no message)."""
        import sys as _sys
        if self._pallas_asn:
            engine = "pallas_asn"
            caps = (f"roll_cap={self._roll_grid.cap} "
                    f"sections={self._rad_sections} "
                    f"ang_caps={self.potential.spec.angular_caps} "
                    f"tiers={self._ang_tiers}")
        elif self._pallas_roll:
            engine = "pallas_full"
            caps = (f"roll_cap={self._roll_grid.cap} "
                    f"ang_caps={self.potential.spec.angular_caps}")
        elif self._roll_grid is not None:
            engine = self._roll_impl  # xla / pallas hybrid cell-roll
            caps = (f"roll_cap={self._roll_grid.cap} k_max={self._k_max} "
                    f"ang_cap={self._ang_cap}")
        else:
            engine = "mirror"
            caps = f"k_max={self._k_max} ang_cap={self._ang_cap}"
        fast = engine == "pallas_asn"
        note = "" if fast else " (fast path = pallas_asn on TPU + f32)"
        print(f"[lammps_ani_tpu] engine={engine} n={self.n_atoms} "
              f"dtype={jnp.dtype(self.dtype).name} "
              f"backend={jax.default_backend()} {caps}{note}",
              file=_sys.stderr, flush=True)

    @staticmethod
    def _verbose(msg: str):
        import os as _os
        if _os.environ.get("LAT_VERBOSE"):
            import sys as _sys
            import time as _time
            print(f"[lat {_time.strftime('%H:%M:%S')}] {msg}",
                  file=_sys.stderr, flush=True)

    # ---------- host API ----------

    def run(self, state: MDState, n_steps: int,
            thermo_every: int | None = None,
            thermo_callback: Optional[Callable] = None):
        """Advance n_steps. Returns (state, thermo_rows).

        Thermo rows mirror the reference's `thermo_style custom step pe ke
        etotal temp press vol density` (tests/in.lammps:55-57).
        """
        rows = []
        chunk = self.nbr.rebuild_every
        done = 0
        recap_attempts = 0
        while done < n_steps:
            if self._barostat_active() and not self._grids_valid(
                    jax.device_get(state.box.h)):
                # box rescaled past the grids' slack: re-derive (recompiles)
                self._setup_grids(state.pos, state.box)
                self.regrow_events += 1
            # one compiled chunk size serves every tail: n_take (traced)
            # freezes the surplus steps instead of compiling a new program
            size = chunk if n_steps >= chunk else n_steps
            take = min(size, n_steps - done)
            fn = self._jitted_chunk(size)
            new_state, traj, disp, overflow, n_done = fn(
                state, jnp.asarray(take, jnp.int32))
            ang_deficit = overflow.pop("angular_deficit", None)
            roll_count = overflow.pop("roll_count", None)
            sec_deficit = overflow.pop("sec_deficit", None)
            ovf = {k: bool(v) for k, v in jax.device_get(overflow).items()}
            if any(ovf.values()):
                # Grow exactly the capacities that overflowed and re-run the
                # chunk from the same (discarded-chunk-input) state — the
                # reference's 1.5x buffer regrow, pair_ani.cpp:119-127.
                recap_attempts += 1
                self.regrow_events += 1
                self._verbose(
                    f"regrow at step {done}: "
                    f"{[k for k, v in ovf.items() if v]} "
                    f"(roll cap {self._roll_grid.cap if self._roll_grid else None}, "
                    f"angular caps {self.potential.spec.angular_caps})")
                if recap_attempts > 8:
                    raise RuntimeError(
                        f"capacities keep overflowing after 8 regrows: {ovf}")
                if ovf["ghost"]:
                    self.nbr = dataclasses.replace(
                        self.nbr,
                        ghost_capacity=int(self.nbr.ghost_capacity * 1.5))
                    self._chunk_cache = {}
                if ovf["roll"]:
                    from ..ops import cell_roll as crmod
                    # targeted: regrow to the measured occupancy (+2
                    # slack, round to 4) rather than 1.5x — every extra
                    # cap slot adds 27 window lanes to every per-step
                    # asn kernel, so overshoot is pure step-time loss
                    old_cap = self._roll_grid.cap
                    want = (int(jax.device_get(roll_count)) + 2
                            if roll_count is not None
                            else old_cap * 3 // 2)
                    new_cap = max(-(-want // 4) * 4, old_cap + 4)
                    self._roll_grid = crmod.RollGrid(
                        ncells=self._roll_grid.ncells, cap=new_cap)
                    self._chunk_cache = {}
                if ovf.get("sections"):
                    # a frozen compact section overflowed at rebuild:
                    # grow exactly the overflowing sections by their
                    # reported deficits (monotonic by construction — a
                    # re-measure at the chunk-input state can re-derive
                    # the sections that just overflowed mid-chunk and
                    # loop, each loop paying a whole-program recompile)
                    if sec_deficit is not None:
                        dv = np.asarray(jax.device_get(sec_deficit))
                        secs = dict(self._rad_sections)
                        for s in list(secs):
                            if s < len(dv) and dv[s] > 0:
                                secs[s] += max(4, -(-int(dv[s]) // 4) * 4)
                        self._rad_sections = tuple(sorted(secs.items()))
                        self._chunk_cache = {}
                    else:
                        self._derive_angular_caps(state.pos, state.box)
                if (ovf["angular"] and ang_deficit is not None
                        and not (ovf["k_max"] or ovf["mirror"])
                        and self.potential.spec.angular_caps is not None):
                    # targeted growth from the kernels' per-species
                    # deficits: bump exactly the overflowing caps by
                    # (deficit rounded up, >= 4) — one chunk recompile,
                    # no degree re-measure, monotonic by construction
                    import dataclasses as _dc
                    dv = np.asarray(jax.device_get(ang_deficit))
                    spec = self.potential.spec
                    ns = spec.aev.num_species
                    caps = tuple(
                        c if (c == 0 or d <= 0)
                        else c + max(4, -(-int(d) // 4) * 4)
                        for c, d in zip(spec.angular_caps, dv[:ns]))
                    if caps != spec.angular_caps:
                        self.potential = potmod.ANIPotential(
                            spec=_dc.replace(spec, angular_caps=caps),
                            params=self.potential.params)
                    if self._ang_tiers is not None:
                        # trailing deficit entry = rows the LAST tier's
                        # capacity could not hold; grow that capacity
                        # (tier-0 spill just cascades, never truncates)
                        last_caps, last_rows = self._ang_tiers[-1]
                        if len(dv) > ns and dv[ns] > 0:
                            last_rows += max(256, int(dv[ns] * 1.5))
                        self._ang_tiers = self._ang_tiers[:-1] + (
                            (caps, last_rows),)
                    self._chunk_cache = {}
                elif ovf["k_max"] or ovf["angular"] or ovf["mirror"]:
                    if ovf["k_max"]:
                        # the k_max sentinel also covers a clipped cell
                        # table (cell_list.py:220-222) — regrow that too
                        self._probe_cell_capacity(state.pos, state.box)
                    if self._auto_angular_caps:
                        # re-measure degrees at current geometry; grows both
                        # k_max and the per-species angular caps (with a
                        # monotonic bump when the caps themselves tripped,
                        # so a transient spike can't re-derive the same
                        # too-tight caps and loop)
                        self._derive_angular_caps(
                            state.pos, state.box, regrow=ovf["angular"],
                            regrow_mirror=ovf["mirror"])
                    elif ovf["k_max"]:
                        self._k_max = -(-int(self._k_max * 3 // 2) // 8) * 8
                        self._chunk_cache = {}
                    else:
                        raise RuntimeError(
                            "angular_caps overflow: raise "
                            "ANISpec.angular_caps or enable "
                            "auto_angular_caps")
                continue
            # the attempt limit bounds CONSECUTIVE regrow failures (a
            # stuck capacity re-overflowing with no progress), not the
            # total over a long run: every regrow is monotonic, so any
            # successful chunk in between means progress was real
            recap_attempts = 0
            n_done = int(jax.device_get(n_done))
            if n_done == 0:
                # the very first step after a rebuild already violated the
                # half-skin bound: a single step moves atoms further than
                # the skin covers — no rebuild cadence can fix that
                raise RuntimeError(
                    f"atoms moved {float(disp):.3f} A > skin/2 "
                    f"({self._skin_eff / 2:.2f}) in ONE step: raise "
                    "skin/ang_skin or lower dt")
            # n_done < take: a mid-chunk half-skin violation froze the
            # remaining steps (LAMMPS `neigh_modify check yes` semantics);
            # loop around — the next chunk starts with a fresh rebuild at
            # exactly the accepted state.
            if n_done < take:
                self._verbose(
                    f"stale freeze at step {done + n_done}: accepted "
                    f"{n_done}/{take}, max disp {float(disp):.3f} A "
                    f"> skin/2 {self._skin_eff / 2:.2f}")
            state = new_state
            if thermo_every:
                traj_np = jax.tree.map(np.asarray, traj)
                for k in range(n_done):
                    step = done + k + 1
                    if step % thermo_every == 0 or step == n_steps:
                        row = {f: float(traj_np[f][k]) for f in traj_np}
                        row["step"] = step
                        row["etotal"] = row["pe"] + row["ke"]
                        rows.append(row)
                        if thermo_callback:
                            thermo_callback(row)
            done += n_done
        return state, rows

    def positions_input_order(self, state: MDState) -> np.ndarray:
        """Positions permuted back to the caller's original atom order."""
        return np.asarray(state.pos)[self.inv_order]

    def forces_input_order(self, state: MDState) -> np.ndarray:
        return np.asarray(state.force)[self.inv_order]

    def velocities_input_order(self, state: MDState) -> np.ndarray:
        return np.asarray(state.vel)[self.inv_order]
