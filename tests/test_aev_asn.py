"""Assignment-compacted Pallas kernels (ops/aev_asn.py) vs the oracle.

Same parity pattern as tests/test_aev_pallas.py: interpret-mode kernels in
f64 against the generic neighbor-matrix path, plus f32 production-dtype
checks and force/box-cotangent parity through the custom VJPs."""

import numpy as np
import jax
import jax.numpy as jnp

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.models import aev as aevmod
from lammps_ani_tpu.models import repulsion as repmod
from lammps_ani_tpu.ops import aev_asn as apasn
from lammps_ani_tpu.ops import cell_roll as crmod
from lammps_ani_tpu.ops import neighbors as nbops

from .test_aev_pallas import _angular_reference
from .test_cell_roll import _radial_reference, _system

SKIN = 1.0


def _measure_sections(species, pos, box, keep_r, num_species, pad=4):
    """Per-species degrees within keep_r -> static sections."""
    ghosts = nbops.build_ghosts(pos, box, keep_r, 16384,
                                nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, keep_r, 220, ghosts)
    assert not bool(nlist.overflowed)
    species_ext = nbops.extended_species(species, nlist.ghosts)
    _, dist = nbops.neighbor_displacements(pos, box, nlist)
    species_j = species_ext[nlist.idx]
    mask = nlist.mask & (species_j >= 0) & (dist <= keep_r)
    sections = []
    for s in range(num_species):
        deg = int(jnp.max(jnp.sum(mask & (species_j == s), axis=1)))
        if deg:
            sections.append((s, -(-(deg + 2) // pad) * pad))
    return tuple(sections)


def _grid_bins_asn(spec, species, pos, box, side, keep_r, cap=40):
    grid = crmod.RollGrid.for_box(np.asarray(box.h), side, cap)
    assert grid is not None
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) <= grid.cap
    sections = _measure_sections(species, pos, box, keep_r,
                                 spec.num_species)
    kpad = -(-(sum(k for _, k in sections) + 1) // 128) * 128
    asn = apasn.build_assignment(grid, bins, pos, box, sections, kpad,
                                 keep_r, interpret=True)
    assert float(asn.ovf) <= 0, float(asn.ovf)
    return grid, bins, sections, asn


def test_asn_radial_matches_oracle_f64():
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    ref = np.asarray(_radial_reference(spec, species, pos, box))
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, spec.radial_cutoff + SKIN,
        spec.radial_cutoff + SKIN)
    got, erep = apasn.radial_aev_asn(spec, grid, bins, asn, pos, box,
                                     sections, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10, rtol=1e-8)
    np.testing.assert_array_equal(np.asarray(erep), 0.0)


def test_asn_radial_f32():
    spec = aevmod.ani2x_aev_spec()
    species, pos64, box64, data = _system()
    pos = pos64.astype(jnp.float32)
    box = nbops.Box(h=box64.h.astype(jnp.float32),
                    origin=box64.origin.astype(jnp.float32))
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, spec.radial_cutoff + SKIN,
        spec.radial_cutoff + SKIN)
    ref = np.asarray(_radial_reference(spec, species, pos, box))
    got, _ = apasn.radial_aev_asn(spec, grid, bins, asn, pos, box,
                                  sections, interpret=True)
    assert np.asarray(got).dtype == np.float32
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-6, rtol=1e-5)


def test_asn_radial_forces_and_box_cotangent():
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, spec.radial_cutoff + SKIN,
        spec.radial_cutoff + SKIN)
    w = jax.random.normal(jax.random.PRNGKey(0), (spec.radial_length,),
                          jnp.float64)

    def e_asn(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        out, _ = apasn.radial_aev_asn(spec, grid, bins, asn, p, b,
                                      sections, interpret=True)
        return jnp.sum(out @ w)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(_radial_reference(spec, species, p, b) @ w)

    g_a, gh_a = jax.grad(e_asn, argnums=(0, 1))(pos, box.h)
    g_r, gh_r = jax.grad(e_ref, argnums=(0, 1))(pos, box.h)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gh_a), np.asarray(gh_r),
                               atol=1e-8)


def test_asn_radial_staleness_tolerates_skin_motion():
    """Assignment built at rebuild positions stays exact after atoms move
    (< skin/2): every in-cutoff pair is still assigned, and the basis is
    evaluated at CURRENT positions."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, spec.radial_cutoff + SKIN,
        spec.radial_cutoff + SKIN)
    key = jax.random.PRNGKey(7)
    pos2 = pos + (SKIN / 2 - 0.05) * jax.random.ball(
        key, 3, shape=(pos.shape[0],), dtype=pos.dtype)
    ref = np.asarray(_radial_reference(spec, species, pos2, box))
    got, _ = apasn.radial_aev_asn(spec, grid, bins, asn, pos2, box,
                                  sections, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10, rtol=1e-8)


def _repulsion_reference(rspec, species, pos, box):
    ghosts = nbops.build_ghosts(pos, box, rspec.cutoff, 16384,
                                nbops.image_shifts(1))
    nlist = nbops.build_neighbor_matrix_brute(pos, box, rspec.cutoff, 220,
                                              ghosts)
    species_ext = nbops.extended_species(species, nlist.ghosts)
    _, dist = nbops.neighbor_displacements(pos, box, nlist)
    species_j = jnp.where(nlist.mask, species_ext[nlist.idx], -1)
    mask = nlist.mask & (species_j >= 0)
    n = pos.shape[0]
    return repmod.repulsion_energies(
        rspec, species, species_j, jnp.where(mask, dist, 1e6), mask,
        ghost_center=jnp.zeros((n,), bool),
        ghost_j=nlist.idx >= n)


def test_asn_radial_repulsion_parity():
    """In-kernel XTB repulsion matches models/repulsion.py (values and
    forces) — the ANI-1xnr fast-path enabler."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    rspec = repmod.RepulsionSpec.for_symbols(
        ("H", "C", "N", "O", "S", "F", "Cl"), cutoff=spec.radial_cutoff)
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, spec.radial_cutoff + SKIN,
        spec.radial_cutoff + SKIN)

    def e_asn(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        _, erep = apasn.radial_aev_asn(spec, grid, bins, asn, p, b,
                                       sections, repulsion=rspec,
                                       interpret=True)
        return jnp.sum(erep), erep

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        er = _repulsion_reference(rspec, species, p, b)
        return jnp.sum(er), er

    (ea, erep_a), (ga, gha) = jax.value_and_grad(
        e_asn, argnums=(0, 1), has_aux=True)(pos, box.h)
    (er, erep_r), (gr, ghr) = jax.value_and_grad(
        e_ref, argnums=(0, 1), has_aux=True)(pos, box.h)
    np.testing.assert_allclose(np.asarray(erep_a), np.asarray(erep_r),
                               atol=1e-12, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gha), np.asarray(ghr),
                               atol=1e-9)


def _angular_setup_asn(rep=(3, 3, 3)):
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system(rep=rep)
    side = spec.angular_cutoff + SKIN
    grid = crmod.RollGrid.for_box(np.asarray(box.h), side, 24)
    assert grid is not None
    bins = crmod.build_bins(grid, pos, species, box)
    assert int(bins.count_max) <= grid.cap
    sections = _measure_sections(species, pos, box, side,
                                 spec.num_species)
    kpad = -(-(sum(k for _, k in sections) + 1) // 128) * 128
    asn = apasn.build_assignment(grid, bins, pos, box, sections, kpad,
                                 side, interpret=True)
    assert float(asn.ovf) <= 0
    sp = np.asarray(species)
    caps = tuple((12 if s == 0 else 8) if (sp == s).sum() else 0
                 for s in range(spec.num_species))
    return spec, species, pos, box, grid, bins, sections, asn, caps


def test_asn_angular_matches_oracle_f64():
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    ref = np.asarray(_angular_reference(spec, species, pos, box))
    got, deficit = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos, box, sections, caps, interpret=True)
    assert float(jnp.max(deficit)) <= 0, np.asarray(deficit)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10, rtol=1e-8)


def test_asn_angular_deficit_detects_truncation():
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    tight = tuple(1 if c else 0 for c in caps)
    _, deficit = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos, box, sections, tight, interpret=True)
    # per-species: exactly the truncated species report a deficit
    assert float(jnp.max(deficit)) > 0


def test_asn_angular_forces_and_box_cotangent():
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    w = jax.random.normal(jax.random.PRNGKey(1), (spec.angular_length,),
                          jnp.float64)

    def e_asn(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        out, _ = apasn.angular_aev_asn(spec, grid, bins, asn, p, b,
                                       sections, caps, interpret=True)
        return jnp.sum(out @ w)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(_angular_reference(spec, species, p, b) @ w)

    g_a, gh_a = jax.grad(e_asn, argnums=(0, 1))(pos, box.h)
    g_r, gh_r = jax.grad(e_ref, argnums=(0, 1))(pos, box.h)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gh_a), np.asarray(gh_r),
                               atol=1e-8)


def test_simulation_asn_matches_mirror(monkeypatch):
    """4 MD steps on the assignment path (ONE coarse grid + one frozen
    assignment serving both channels, no neighbor matrix) must reproduce
    the mirror-path engine trajectory (f64, interpret mode on CPU)."""
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)  # 24.8 A box: the coarse radial grid needs >= 3 bins/axis
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(impl):
        monkeypatch.setenv("LAT_ROLL_IMPL", impl)
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64,
            cellroll=impl.startswith("pallas"))
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        if impl == "pallas_asn":
            assert sim._pallas_asn, "assignment path not active"
        st, rows = sim.run(st, 4, thermo_every=2)
        return (sim.positions_input_order(st), float(st.pe),
                np.asarray(st.virial))

    p_asn, e_asn, w_asn = run("pallas_asn")
    p_ref, e_ref, w_ref = run("mirror-off")
    np.testing.assert_allclose(e_asn, e_ref, rtol=1e-11)
    np.testing.assert_allclose(p_asn, p_ref, atol=1e-10)
    np.testing.assert_allclose(w_asn, w_ref, atol=1e-8)


def test_simulation_asn_repulsion_matches_mirror(monkeypatch):
    """ANI-1xnr (XTB repulsion) on the assignment fast path vs the mirror
    path — the reference's reactive-model configuration
    (/root/reference/models/ani_models.py:40-53) previously confined to
    the slow path."""
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    pot = zoo.ani1xnr(num_models=1, dtype=jnp.float64)

    def run(impl, cellroll):
        monkeypatch.setenv("LAT_ROLL_IMPL", impl)
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64, cellroll=cellroll)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        if cellroll:
            assert sim._pallas_asn, "assignment path not active"
        st, rows = sim.run(st, 4, thermo_every=2)
        return (sim.positions_input_order(st), float(st.pe),
                np.asarray(st.virial))

    p_asn, e_asn, w_asn = run("pallas_asn", True)
    p_ref, e_ref, w_ref = run("mirror-off", False)
    np.testing.assert_allclose(e_asn, e_ref, rtol=1e-11)
    np.testing.assert_allclose(p_asn, p_ref, atol=1e-10)
    np.testing.assert_allclose(w_asn, w_ref, atol=1e-8)


def test_asn_angular_on_shared_radial_assignment():
    """Production layout: the angular kernel reads the RADIAL assignment
    (keep radius Rcr + skin on the coarse grid) and must still match the
    oracle — stage-2 re-compacts within-Rca lanes per step, so a wider
    keep set only adds masked-out lanes."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    side = spec.radial_cutoff + SKIN
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, side, side)
    sp = np.asarray(species)
    caps = tuple((12 if s == 0 else 8) if (sp == s).sum() else 0
                 for s in range(spec.num_species))
    ref = np.asarray(_angular_reference(spec, species, pos, box))
    got, deficit = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos, box, sections, caps, interpret=True)
    assert float(jnp.max(deficit)) <= 0, np.asarray(deficit)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10, rtol=1e-8)


def test_asn_angular_staleness_tolerates_skin_motion():
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    # roomier caps: motion can push a within-cutoff degree past the tight
    # test defaults (production catches that via the deficit channel)
    caps = tuple(c + 8 if c else 0 for c in caps)
    key = jax.random.PRNGKey(9)
    pos2 = pos + (SKIN / 2 - 0.05) * jax.random.ball(
        key, 3, shape=(pos.shape[0],), dtype=pos.dtype)
    ref = np.asarray(_angular_reference(spec, species, pos2, box))
    got, deficit = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos2, box, sections, caps, interpret=True)
    assert float(jnp.max(deficit)) <= 0
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10, rtol=1e-8)


def test_simulation_asn_regrows_undersized_capacities(monkeypatch):
    """run() must survive under-sized frozen sections AND under-sized
    angular caps — the sharded-robustness contract (VERDICT r3 #4) on the
    single-device asn engine: section overflow re-derives at current
    geometry, per-step cap deficits grow exactly the overflowing caps —
    and the recovered trajectory must match an adequately-sized run.
    Reference never-die analog: pair_ani.cpp:104-151."""
    import dataclasses as dc

    from lammps_ani_tpu.models import potential as potmod
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    monkeypatch.setenv("LAT_ROLL_IMPL", "pallas_asn")

    def make():
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64, cellroll=True)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        assert sim._pallas_asn
        return sim, st

    sim_ref, st_ref = make()
    st_ref, _ = sim_ref.run(st_ref, 4)
    p_ref = sim_ref.positions_input_order(st_ref)

    # scenario 1: angular caps alone too tight -> per-step deficit ->
    # targeted per-species bump (no re-measure)
    sim, st = make()
    good_caps = sim.potential.spec.angular_caps
    tiny = tuple(4 if c else 0 for c in good_caps)
    sim.potential = potmod.ANIPotential(
        spec=dc.replace(sim.potential.spec, angular_caps=tiny),
        params=sim.potential.params)
    sim._chunk_cache = {}
    st, _ = sim.run(st, 4)
    grown = sim.potential.spec.angular_caps
    assert all(g > t for g, t in zip(grown, tiny) if t)
    np.testing.assert_allclose(sim.positions_input_order(st), p_ref,
                               atol=1e-10)

    # scenario 2: frozen radial sections under-sized -> rebuild-time
    # section overflow -> re-derive sections+caps at current geometry
    sim, st = make()
    sim._rad_sections = tuple((s, 8) for s, _ in sim._rad_sections)
    sim._chunk_cache = {}
    st, _ = sim.run(st, 4)
    assert all(k > 8 for _, k in sim._rad_sections)
    np.testing.assert_allclose(sim.positions_input_order(st), p_ref,
                               atol=1e-10)


def test_asn_angular_tiered_matches_untiered():
    """Occupancy-tiered pair blocks are an exact re-dispatch, not an
    approximation: rows whose per-species degrees fit the tier-0 caps
    lose only dead lanes (stage-2 packs each section from its start), so
    tiered output and gradients must match the untiered path."""
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    n = pos.shape[0]
    caps0 = tuple(max(4, c - 4) if c else 0 for c in caps)
    tiers = ((caps0, n // 2), (caps, n))

    got_u, d_u = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos, box, sections, caps, interpret=True)
    got_t, d_t = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos, box, sections, caps, tiers=tiers,
        interpret=True)
    assert d_t.shape[0] == d_u.shape[0] + 1
    assert float(d_t[-1]) <= 0, "last tier spilled in a sized test"
    np.testing.assert_allclose(np.asarray(d_t[:-1]), np.asarray(d_u))
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(got_u),
                               atol=1e-12, rtol=0)

    w = jax.random.normal(jax.random.PRNGKey(3), (spec.angular_length,),
                          jnp.float64)

    def e(p, h, tr):
        b = nbops.Box(h=h, origin=box.origin)
        out, _ = apasn.angular_aev_asn(spec, grid, bins, asn, p, b,
                                       sections, caps, tiers=tr,
                                       interpret=True)
        return jnp.sum(out @ w)

    g_u, gh_u = jax.grad(e, argnums=(0, 1))(pos, box.h, None)
    g_t, gh_t = jax.grad(e, argnums=(0, 1))(pos, box.h, tiers)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_u),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(gh_t), np.asarray(gh_u),
                               atol=1e-12)


def test_asn_angular_tri_matches_full(monkeypatch):
    """Triangle-packed same-species pair blocks (LAT_ANG_TRI=1, default)
    vs the full-matrix form (LAT_ANG_TRI=0): each unordered pair once at
    scale 2 is exact (2x == x + x; the pair terms are bitwise symmetric
    in the two arms), so values and gradients must agree to summation
    order. Pins BOTH kernels — the full-matrix form is the fallback for
    a1 >= 128 and the documented revert path, and nothing else exercises
    it with the default toggle on (ADVICE r3)."""
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    n = pos.shape[0]
    w = jax.random.normal(jax.random.PRNGKey(5), (spec.angular_length,),
                          jnp.float64)
    caps0 = tuple(max(4, c - 4) if c else 0 for c in caps)
    tiers = ((caps0, n // 2), (caps, n))

    def run(tri, tr):
        monkeypatch.setenv("LAT_ANG_TRI", "1" if tri else "0")
        out, deficit = apasn.angular_aev_asn(
            spec, grid, bins, asn, pos, box, sections, caps, tiers=tr,
            interpret=True)

        def e(p, h):
            b = nbops.Box(h=h, origin=box.origin)
            o, _ = apasn.angular_aev_asn(spec, grid, bins, asn, p, b,
                                         sections, caps, tiers=tr,
                                         interpret=True)
            return jnp.sum(o @ w)

        g, gh = jax.grad(e, argnums=(0, 1))(pos, box.h)
        return np.asarray(out), np.asarray(deficit), np.asarray(g), \
            np.asarray(gh)

    for tr in (None, tiers):
        o_t, d_t, g_t, gh_t = run(True, tr)
        o_f, d_f, g_f, gh_f = run(False, tr)
        np.testing.assert_allclose(o_t, o_f, atol=1e-12, rtol=0)
        np.testing.assert_array_equal(d_t, d_f)
        np.testing.assert_allclose(g_t, g_f, atol=1e-12)
        np.testing.assert_allclose(gh_t, gh_f, atol=1e-12)


def test_asn_fused_matches_per_channel():
    """The fused both-channels op (aev_asn_fused: one geometry pass fwd,
    one summed wing/fold/dh bwd) must match the per-channel kernels —
    values, forces, and box cotangents — including the compact column
    layout and repulsion side channel."""
    spec = aevmod.ani2x_aev_spec()
    species, pos, box, data = _system()
    rspec = repmod.RepulsionSpec.for_symbols(
        ("H", "C", "N", "O", "S", "F", "Cl"), cutoff=spec.radial_cutoff)
    side = spec.radial_cutoff + SKIN
    grid, bins, sections, asn = _grid_bins_asn(
        spec, species, pos, box, side, side)
    sp = np.asarray(species)
    caps = tuple((12 if s == 0 else 8) if (sp == s).sum() else 0
                 for s in range(spec.num_species))
    wr = jax.random.normal(jax.random.PRNGKey(7), (512,), jnp.float64)

    def e_fused(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        rad, erep, ang, dfc = apasn.aev_asn_fused(
            spec, grid, bins, asn, p, b, sections, caps,
            repulsion=rspec, interpret=True)
        k = rad.shape[1] + ang.shape[1]
        return (jnp.sum(rad * wr[:rad.shape[1]][None])
                + jnp.sum(ang * wr[rad.shape[1]:k][None])
                + jnp.sum(erep) * wr[-1]), (rad, erep, ang, dfc)

    def e_ref(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        rad, erep = apasn.radial_aev_asn(
            spec, grid, bins, asn, p, b, sections, repulsion=rspec,
            interpret=True, compact_cols=True)
        ang, dfc = apasn.angular_aev_asn(
            spec, grid, bins, asn, p, b, sections, caps, interpret=True,
            compact_cols=True)
        k = rad.shape[1] + ang.shape[1]
        return (jnp.sum(rad * wr[:rad.shape[1]][None])
                + jnp.sum(ang * wr[rad.shape[1]:k][None])
                + jnp.sum(erep) * wr[-1]), (rad, erep, ang, dfc)

    (_, (rad_f, erep_f, ang_f, dfc_f)), (g_f, gh_f) = jax.value_and_grad(
        e_fused, argnums=(0, 1), has_aux=True)(pos, box.h)
    (_, (rad_r, erep_r, ang_r, dfc_r)), (g_r, gh_r) = jax.value_and_grad(
        e_ref, argnums=(0, 1), has_aux=True)(pos, box.h)
    np.testing.assert_allclose(np.asarray(rad_f), np.asarray(rad_r),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(erep_f), np.asarray(erep_r),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ang_f), np.asarray(ang_r),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(dfc_f), np.asarray(dfc_r))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_r),
                               atol=1e-10)


def test_asn_angular_tier_spill_reports_deficit():
    """Rows beyond the LAST tier's row capacity cannot cascade anywhere:
    the trailing deficit entry must report them (run() grows the
    capacity and retries, same contract as the per-species entries)."""
    (spec, species, pos, box, grid, bins, sections, asn,
     caps) = _angular_setup_asn()
    caps0 = tuple(4 if c else 0 for c in caps)
    tiers = ((caps0, 8), (caps, 8))  # both rounded up to the row block
    _, deficit = apasn.angular_aev_asn(
        spec, grid, bins, asn, pos, box, sections, caps, tiers=tiers,
        interpret=True)
    assert float(deficit[-1]) > 0
    # the per-species caps themselves did not truncate
    assert float(jnp.max(deficit[:-1])) <= 0


def test_simulation_asn_tiered_regrows_and_matches_mirror(monkeypatch):
    """Tiered dispatch through the production driver: an undersized
    last-tier row capacity must regrow (not die), and the recovered
    trajectory must match the mirror-path engine."""
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        3, 3, 3)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(impl, tiered):
        monkeypatch.setenv("LAT_ROLL_IMPL", impl)
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                                   k_max=160, ghost_capacity=8192,
                                   rebuild_every=2),
            dt=0.2, dtype=jnp.float64,
            cellroll=impl.startswith("pallas"))
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=11)
        if tiered:
            caps = sim.potential.spec.angular_caps
            caps0 = tuple(max(4, c - 4) if c else 0 for c in caps)
            # tier-0 capped at 256 rows (of 810): real spill into the
            # last tier, whose 64-row capacity is deliberately too small
            sim._ang_tiers = ((caps0, 256), (caps, 64))
            sim._chunk_cache = {}
        st, rows = sim.run(st, 4, thermo_every=2)
        if tiered:
            assert sim.regrow_events >= 1, "undersized tier never regrew"
            assert sim._ang_tiers[-1][1] > 64
        return (sim.positions_input_order(st), float(st.pe),
                np.asarray(st.virial))

    p_t, e_t, w_t = run("pallas_asn", True)
    p_ref, e_ref, w_ref = run("mirror-off", False)
    np.testing.assert_allclose(e_t, e_ref, rtol=1e-11)
    np.testing.assert_allclose(p_t, p_ref, atol=1e-10)
    np.testing.assert_allclose(w_t, w_ref, atol=1e-8)
