"""MD engine tests: NVE conservation, thermostats, neighbor-rebuild
invariance, data I/O (reference test strategy SURVEY.md §4 levels 3-4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lammps_ani_tpu as lat
from lammps_ani_tpu import units
from lammps_ani_tpu.md import integrate
from lammps_ani_tpu.models import zoo
from lammps_ani_tpu.io import lammps_data as ldio

from . import fixtures


def make_sim(dt=0.1, integrator=None, rebuild_every=2, num_models=1,
             dtype=jnp.float32):
    pot = zoo.ani2x(num_models=num_models, dtype=dtype)
    sim = lat.Simulation(
        potential=pot,
        species=fixtures.WATER30_SPECIES,
        masses=fixtures.MASSES[fixtures.WATER30_SPECIES],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                               ghost_capacity=1024,
                               rebuild_every=rebuild_every),
        dt=dt, integrator=integrator, dtype=dtype)
    box = lat.Box(h=jnp.asarray(fixtures.WATER30_BOX, dtype),
                  origin=jnp.asarray(fixtures.WATER30_ORIGIN, dtype))
    return sim, box


def test_nve_energy_conservation():
    sim, box = make_sim(dt=0.1)
    state = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=3)
    state, rows = sim.run(state, 30, thermo_every=1)
    etot = np.array([r["etotal"] for r in rows])
    assert np.all(np.isfinite(etot))
    drift = abs(etot[-1] - etot[0]) / abs(etot[0])
    assert drift < 5e-6, f"NVE drift {drift}"


def test_nve_f64_drift_scales_with_dt2():
    """Verlet discretization: halving dt must cut the energy error ~4x
    (only checkable in f64 where roundoff doesn't mask it)."""
    def drift(dt, steps):
        sim, box = make_sim(dt=dt, dtype=jnp.float64)
        state = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=3)
        state, rows = sim.run(state, steps, thermo_every=steps)
        return rows[-1]["etotal"]

    # same physical time 2 fs, different resolution
    e_coarse = drift(0.1, 20)
    e_fine = drift(0.025, 80)
    sim, box = make_sim(dt=0.0125, dtype=jnp.float64)
    state = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=3)
    _, rows_ref = sim.run(state, 160, thermo_every=160)
    e_ref = rows_ref[-1]["etotal"]
    err_coarse = abs(e_coarse - e_ref)
    err_fine = abs(e_fine - e_ref)
    assert err_fine < err_coarse / 4, (err_coarse, err_fine)


def test_rebuild_interval_does_not_change_trajectory():
    """Neighbor list with skin must give identical dynamics whether rebuilt
    every step or every 3 steps (as long as skin/2 isn't violated)."""
    sim1, box = make_sim(dt=0.1, rebuild_every=1, dtype=jnp.float64)
    sim3, _ = make_sim(dt=0.1, rebuild_every=3, dtype=jnp.float64)
    s1 = sim1.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=7)
    s3 = sim3.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=7)
    s1, _ = sim1.run(s1, 6)
    s3, _ = sim3.run(s3, 6)
    np.testing.assert_allclose(
        sim1.positions_input_order(s1), sim3.positions_input_order(s3),
        atol=1e-10)


def test_langevin_thermalizes_ideal_gas():
    """Langevin on (nearly) free particles must equilibrate to target T
    (validates the fluctuation-dissipation constants in real units)."""
    n = 500
    masses = jnp.full((n,), 15.999)
    key = jax.random.PRNGKey(0)
    vel = jnp.zeros((n, 3))
    dt, damp, t_target = 1.0, 20.0, 300.0
    lang = integrate.Langevin(temp=t_target, damp=damp)

    def body(carry, _):
        vel, key = carry
        key, sub = jax.random.split(key)
        f = lang.force(sub, vel, masses, dt)
        vel = vel + dt * units.FTM2V * f / masses[:, None]
        return (vel, key), integrate.temperature(vel, masses, 3 * n)

    (vel, _), temps = jax.lax.scan(body, (vel, key), length=4000)
    t_avg = float(jnp.mean(temps[2000:]))
    assert abs(t_avg - t_target) / t_target < 0.05, t_avg


def test_nose_hoover_controls_temperature():
    n = 200
    masses = jnp.full((n,), 12.0)
    nh = integrate.NoseHoover(temp=300.0, tdamp=50.0)
    ts = nh.init(jnp.float64)
    key = jax.random.PRNGKey(1)
    vel = integrate.create_velocities(key, masses, 600.0, 3 * n,
                                      dtype=jnp.float64)

    temps = []
    dt = 0.5
    for _ in range(400):
        ts, vel = nh.half_step(ts, vel, masses, 3 * n, dt)
        ts, vel = nh.half_step(ts, vel, masses, 3 * n, dt)
        temps.append(float(integrate.temperature(vel, masses, 3 * n)))
    # free particles + NH chain: T must relax from 600 toward 300
    assert abs(np.mean(temps[-50:]) - 300.0) < 30.0


def test_create_velocities_exact_temperature():
    n = 100
    masses = jnp.asarray(np.random.default_rng(0).uniform(1, 30, n))
    vel = integrate.create_velocities(jax.random.PRNGKey(5), masses, 250.0,
                                      dof=3 * n - 3, dtype=jnp.float64)
    t = float(integrate.temperature(vel, masses, 3 * n - 3))
    np.testing.assert_allclose(t, 250.0, rtol=1e-10)
    p = np.asarray(jnp.sum(masses[:, None] * vel, axis=0))
    np.testing.assert_allclose(p, 0.0, atol=1e-10)


def test_lammps_data_roundtrip(tmp_path):
    data = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    assert data.n_atoms == 30
    assert np.all(data.species == fixtures.WATER30_SPECIES)
    np.testing.assert_allclose(data.positions, fixtures.WATER30_POS)
    np.testing.assert_allclose(data.masses_by_type, fixtures.MASSES)
    np.testing.assert_allclose(data.box_h, fixtures.WATER30_BOX)

    out = tmp_path / "out.data"
    ldio.write_lammps_data(out, data)
    data2 = ldio.read_lammps_data(out)
    np.testing.assert_allclose(data2.positions, data.positions)
    assert np.all(data2.species == data.species)


def test_replicate():
    data = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    rep = ldio.replicate(data, 2, 2, 1)
    assert rep.n_atoms == 120
    np.testing.assert_allclose(rep.box_h, np.diag([16.0, 16.0, 8.0]))
    # energy per atom must be identical to the unreplicated system
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    from lammps_ani_tpu.ops import neighbors as nbops
    from lammps_ani_tpu.models import potential as potmod

    def e_per_atom(d):
        pos = jnp.asarray(d.positions, jnp.float64)
        box = lat.Box(h=jnp.asarray(d.box_h, jnp.float64),
                      origin=jnp.asarray(d.box_origin, jnp.float64))
        pos = nbops.wrap_positions(pos, box)
        ghosts = nbops.build_ghosts(pos, box, 5.1, 4096,
                                    nbops.image_shifts(1))
        nlist = nbops.build_neighbor_matrix_brute(pos, box, 5.1, 64, ghosts)
        assert not bool(nlist.overflowed)
        return float(potmod.potential_energy(
            pot, jnp.asarray(d.species), pos, box, nlist)) / d.n_atoms

    np.testing.assert_allclose(e_per_atom(rep), e_per_atom(data), rtol=1e-10)


def test_model_save_load_roundtrip(tmp_path):
    pot = zoo.ani1xnr(num_models=2, dtype=jnp.float64)
    path = tmp_path / "ani1xnr.npz"
    zoo.save_potential(path, pot)
    pot2 = zoo.load_potential(path, dtype=jnp.float64)
    assert pot2.spec == pot.spec
    for a, b in zip(jax.tree.leaves(pot.params), jax.tree.leaves(pot2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adaptive_rebuild_recovers_from_skin_violation():
    """LAMMPS `neigh_modify check yes` semantics (VERDICT r1 #4): with an
    under-sized skin the chunk must stop at the half-skin violation BEFORE
    stepping on the stale list, rebuild, and continue — and the resulting
    trajectory must match the rebuild-every-step run (same physics, only
    f64 summation-order noise)."""
    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import zoo

    data = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(rebuild_every, skin):
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=skin, ang_skin=skin,
                                   k_max=128, ghost_capacity=4096,
                                   rebuild_every=rebuild_every),
            dt=0.5, dtype=jnp.float64)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=600.0, seed=21)
        st, rows = sim.run(st, 12, thermo_every=12)
        return sim.positions_input_order(st), rows

    # skin 0.16 -> half-skin 0.08 A: at 600 K and dt 0.5 fs this is
    # violated after a handful of steps, forcing mid-chunk rebuilds
    p_adaptive, rows_a = run(rebuild_every=12, skin=0.16)
    p_fresh, rows_f = run(rebuild_every=1, skin=0.16)
    np.testing.assert_allclose(p_adaptive, p_fresh, atol=1e-9)
    np.testing.assert_allclose(rows_a[-1]["pe"], rows_f[-1]["pe"],
                               rtol=1e-10)
    assert rows_a[-1]["step"] == 12


def test_cell_capacity_autogrows_from_occupancy():
    """A clipped cell table silently drops neighbor candidates and its
    overflow folds into the k_max sentinel (cell_list.py:220-222), which
    k_max growth can never clear — the degree measure then sizes angular
    caps/sections from a truncated list and regrows forever. The engine
    must probe ACTUAL cell occupancy and regrow cell_capacity instead:
    an absurdly small configured capacity must still produce the exact
    brute-builder trajectory."""
    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import zoo

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        2, 2, 2)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def run(use_cell_list, cell_capacity=4):
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, k_max=64,
                                   ghost_capacity=8192,
                                   rebuild_every=2,
                                   use_cell_list=use_cell_list,
                                   cell_capacity=cell_capacity),
            dt=0.2, dtype=jnp.float64)
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                      origin=jnp.asarray(data.box_origin, jnp.float64))
        st = sim.init_state(data.positions, box, temp=300.0, seed=5)
        if use_cell_list:
            assert sim._grid is not None
            assert sim._grid.cell_capacity > cell_capacity
        st, rows = sim.run(st, 4, thermo_every=2)
        return sim.positions_input_order(st), float(st.pe)

    p_cl, e_cl = run(True)
    p_br, e_br = run(False)
    np.testing.assert_allclose(e_cl, e_br, rtol=1e-12)
    np.testing.assert_allclose(p_cl, p_br, atol=1e-12)


def test_mirror_regrow_is_monotonic(monkeypatch):
    """A mirror ok-flag overflow (angular sub-list cnt > _ang_cap, or an
    asymmetric truncation) re-derives capacities at the chunk INPUT
    geometry — which can be exactly the sizing that just failed on a
    mid-chunk check-yes rebuild at LATER geometry. The retry loop
    converges only because regrow_mirror growth is monotonic; without it
    the same caps re-derive every retry and run() dies at the attempt
    limit (observed at 101k atoms / skin 1.5 on TPU). Reference
    never-die analog: pair_ani.cpp:104-151."""
    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import zoo

    monkeypatch.setenv("LAT_ROLL_IMPL", "xla")
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        2, 2, 2)
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    sim = lat.Simulation(
        potential=pot, species=data.species,
        masses=data.masses_by_type[data.species],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                               k_max=96, ghost_capacity=8192,
                               rebuild_every=2),
        dt=0.2, dtype=jnp.float64, cellroll=True)
    box = lat.Box(h=jnp.asarray(data.box_h, jnp.float64),
                  origin=jnp.asarray(data.box_origin, jnp.float64))
    st = sim.init_state(data.positions, box, temp=300.0, seed=9)
    assert sim._ang_cap is not None

    # the bump mechanism: strict monotone growth per mirror retry, even
    # though the measured geometry (and thus the raw derivation) repeats
    c0, k0 = sim._ang_cap, sim._k_max
    sim._derive_angular_caps(st.pos, st.box, regrow_mirror=True)
    c1, k1 = sim._ang_cap, sim._k_max
    assert c1 >= c0 + 4 and k1 >= k0 + 8
    sim._derive_angular_caps(st.pos, st.box, regrow_mirror=True)
    assert sim._ang_cap >= c1 + 4 and sim._k_max >= k1 + 8

    # driver-level recovery: an undersized sub-list capacity must regrow
    # through run() and produce the reference trajectory, not die
    ref = lat.Simulation(
        potential=pot, species=data.species,
        masses=data.masses_by_type[data.species],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=1.0, ang_skin=1.0,
                               k_max=96, ghost_capacity=8192,
                               rebuild_every=2),
        dt=0.2, dtype=jnp.float64, cellroll=True)
    st_ref = ref.init_state(data.positions, box, temp=300.0, seed=9)
    st_ref, _ = ref.run(st_ref, 4)

    sim._ang_cap = 4
    sim._chunk_cache = {}
    st, _ = sim.run(st, 4)
    assert sim.regrow_events >= 1 and sim._ang_cap > 4
    np.testing.assert_allclose(sim.positions_input_order(st),
                               ref.positions_input_order(st_ref),
                               atol=1e-12)
