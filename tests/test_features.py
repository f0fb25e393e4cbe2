"""NPT barostats, FIRE minimization, restart round-trip, dumps, thermo.

Coverage model: the reference's feature surface (SURVEY.md §5/§7.5 — fix
npt iso, minimize, write_restart/read_restart round-trip, dump formats,
yaml thermo)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lammps_ani_tpu as lat
from lammps_ani_tpu import units
from lammps_ani_tpu.io import dump as dumpio
from lammps_ani_tpu.io import restart as restio
from lammps_ani_tpu.md import integrate, minimize
from lammps_ani_tpu.models import zoo

from . import fixtures


def make_sim(integrator=None, barostat=None, dt=0.1, dtype=jnp.float64,
             seed=0):
    pot = zoo.ani2x(num_models=1, dtype=dtype)
    sim = lat.Simulation(
        potential=pot, species=fixtures.WATER30_SPECIES,
        masses=fixtures.MASSES[fixtures.WATER30_SPECIES],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                               ghost_capacity=1024, rebuild_every=2),
        dt=dt, integrator=integrator, barostat=barostat, dtype=dtype)
    box = lat.Box(h=jnp.asarray(fixtures.WATER30_BOX, dtype),
                  origin=jnp.asarray(fixtures.WATER30_ORIGIN, dtype))
    return sim, box


def test_berendsen_scale_direction():
    b = integrate.BerendsenBarostat(press=1.0, pdamp=100.0)
    grow = float(b.scale_factor(jnp.asarray(1000.0), 1.0))
    shrink = float(b.scale_factor(jnp.asarray(-1000.0), 1.0))
    assert grow > 1.0 and shrink < 1.0


def test_npt_piston_ideal_gas_volume():
    """Free particles + NH piston: V must relax toward N kB T / P."""
    n = 400
    t_target, p_target = 300.0, 500.0  # atm
    npt = integrate.NoseHooverNPT(temp=t_target, tdamp=100.0,
                                  press=p_target, pdamp=500.0)
    masses = jnp.full((n,), 20.0)
    key = jax.random.PRNGKey(0)
    vel = integrate.create_velocities(key, masses, t_target, 3 * n,
                                      dtype=jnp.float64)
    v_eq = n * units.BOLTZ * t_target / (p_target * units.ATM2ENGVOL)
    vol0 = 0.4 * v_eq
    bs = npt.init(jnp.float64)
    dt = 2.0

    def body(carry, _):
        vol, vel, bs = carry
        ke = integrate.kinetic_energy(vel, masses)
        p_now = 2.0 * ke / (3.0 * vol) * units.NKTV2P
        bs = npt.piston_half(bs, p_now, vol, ke, n, dt)
        vel = vel * npt.vel_scale(bs.omega, 3 * n, n, dt) ** 2
        vol = vol * npt.box_scale(bs.omega, dt) ** 3
        ke = integrate.kinetic_energy(vel, masses)
        p_now = 2.0 * ke / (3.0 * vol) * units.NKTV2P
        bs = npt.piston_half(bs, p_now, vol, ke, n, dt)
        return (vol, vel, bs), (vol, p_now,
                                integrate.temperature(vel, masses, 3 * n))

    (_, _, _), (vols, ps, ts) = jax.lax.scan(
        body, (jnp.asarray(vol0, jnp.float64), vel, bs), length=6000)
    # without a particle thermostat the gas cools adiabatically as it
    # expands; the piston must still settle the PRESSURE at the target and
    # the volume at N kB T_actual / P (ideal-gas consistency)
    p_avg = float(jnp.mean(ps[3000:]))
    t_avg = float(jnp.mean(ts[3000:]))
    v_avg = float(jnp.mean(vols[3000:]))
    assert abs(p_avg - p_target) / p_target < 0.05, p_avg
    v_consistent = n * units.BOLTZ * t_avg / (p_target * units.ATM2ENGVOL)
    assert abs(v_avg - v_consistent) / v_consistent < 0.05, (
        v_avg, v_consistent)
    assert v_avg > 1.3 * vol0  # it really expanded toward equilibrium


def test_npt_water_smoke():
    npt = integrate.NoseHooverNPT(temp=300.0, tdamp=20.0, press=1.0,
                                  pdamp=100.0)
    sim, box = make_sim(integrator=npt, dt=0.1)
    st = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=2)
    v0 = float(st.box.volume)
    st, rows = sim.run(st, 8, thermo_every=4)
    assert np.isfinite(rows[-1]["etotal"])
    assert np.isfinite(rows[-1]["vol"]) and rows[-1]["vol"] != v0


def test_berendsen_water_smoke():
    sim, box = make_sim(integrator=integrate.Langevin(temp=300.0, damp=50.0),
                        barostat=integrate.BerendsenBarostat(press=1.0,
                                                             pdamp=1000.0),
                        dt=0.1)
    st = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=2)
    st, rows = sim.run(st, 6, thermo_every=3)
    assert np.isfinite(rows[-1]["etotal"])


def test_fire_minimization_reduces_forces():
    # ani1xnr: its XTB repulsion prevents the unphysical atom collapse a
    # purely-synthetic attractive PES allows under aggressive relaxation
    pot = zoo.ani1xnr(num_models=1, dtype=jnp.float64)
    sim = lat.Simulation(
        potential=pot, species=fixtures.WATER30_SPECIES,
        masses=fixtures.MASSES[fixtures.WATER30_SPECIES],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                               ghost_capacity=1024, rebuild_every=2),
        dt=0.1, dtype=jnp.float64)
    box = lat.Box(h=jnp.asarray(fixtures.WATER30_BOX, jnp.float64),
                  origin=jnp.asarray(fixtures.WATER30_ORIGIN, jnp.float64))
    rng = np.random.default_rng(0)
    pos = fixtures.WATER30_POS + rng.normal(0, 0.05, (30, 3))
    st = sim.init_state(pos, box)
    f0 = float(jnp.max(jnp.abs(st.force)))
    pe0 = float(st.pe)
    st, info = minimize.minimize(
        sim, st, max_steps=200, ftol=f0 * 0.2,
        config=minimize.FireConfig(dt_start=0.1, dt_max=0.5))
    assert info["fmax"] < f0
    assert info["pe"] < pe0


def test_restart_roundtrip_bit_exact(tmp_path):
    """Interrupted+resumed trajectory == uninterrupted one (incl. RNG and
    thermostat state) — stronger than the reference's restart contract."""
    nh = integrate.NoseHoover(temp=300.0, tdamp=20.0)
    sim, box = make_sim(integrator=nh, dt=0.1)
    st = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=5)
    st, _ = sim.run(st, 4)
    restio.save_restart(tmp_path / "ck.npz", sim, st)
    st_cont, _ = sim.run(st, 4)

    sim2, _ = make_sim(integrator=nh, dt=0.1)
    st2 = restio.load_restart(tmp_path / "ck.npz", sim2)
    assert int(st2.step) == int(st.step)
    st2, _ = sim2.run(st2, 4)
    np.testing.assert_allclose(sim2.positions_input_order(st2),
                               sim.positions_input_order(st_cont),
                               atol=1e-12)
    np.testing.assert_allclose(sim2.velocities_input_order(st2),
                               sim.velocities_input_order(st_cont),
                               atol=1e-12)


def test_dump_writers(tmp_path):
    sim, box = make_sim(dt=0.1)
    st = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=1)
    pos = sim.positions_input_order(st)
    species = fixtures.WATER30_SPECIES
    syms = ["H", "C", "N", "O", "S", "F", "Cl"]

    trj = dumpio.LammpsTrjWriter(tmp_path / "t.lammpstrj", syms)
    trj.write_frame(0, pos, species, fixtures.WATER30_BOX,
                    fixtures.WATER30_ORIGIN)
    trj.write_frame(1, pos, species, fixtures.WATER30_BOX,
                    fixtures.WATER30_ORIGIN)
    trj.close()
    text = (tmp_path / "t.lammpstrj").read_text()
    assert text.count("ITEM: TIMESTEP") == 2
    assert "O" in text

    xyz = dumpio.XYZWriter(tmp_path / "t.xyz", syms)
    xyz.write_frame(0, pos, species)
    xyz.close()
    lines = (tmp_path / "t.xyz").read_text().splitlines()
    assert lines[0] == "30" and lines[2].startswith("O ")

    dcd = dumpio.DCDWriter(tmp_path / "t.dcd", 30)
    dcd.write_frame(0, pos, box_h=fixtures.WATER30_BOX)
    dcd.write_frame(1, pos, box_h=fixtures.WATER30_BOX)
    dcd.close()
    raw = (tmp_path / "t.dcd").read_bytes()
    assert raw[4:8] == b"CORD"
    import struct
    assert struct.unpack("<i", raw[8:12])[0] == 2  # frame count patched


def test_thermo_log_roundtrip(tmp_path):
    log = dumpio.ThermoLog(tmp_path / "thermo.yaml")
    log({"step": 1, "pe": -1.5, "ke": 0.5, "etotal": -1.0, "temp": 300.0,
         "press": 1.0, "vol": 10.0, "density": 1.0})
    log({"step": 2, "pe": -1.6, "ke": 0.6, "etotal": -1.0, "temp": 310.0,
         "press": 2.0, "vol": 10.0, "density": 1.0})
    log.close()
    cols = dumpio.read_thermo_yaml(tmp_path / "thermo.yaml")
    assert cols["step"] == [1.0, 2.0]
    assert cols["temp"] == [300.0, 310.0]


def test_umbrella_bias_restrains_cv():
    """A stiff harmonic bias on an O-H distance must hold the CV near the
    window center while plain dynamics lets it fluctuate more — and CV
    indices refer to the caller's original atom order."""
    from lammps_ani_tpu.md import bias

    center = 1.10  # restrain first O-H bond slightly stretched
    cv = bias.distance_cv(0, 1)  # atoms 0 (O) and 1 (H) in input order
    b = bias.HarmonicBias(cv=cv, k=2000.0, center=center)

    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)

    def make(extra):
        return lat.Simulation(
            potential=pot, species=fixtures.WATER30_SPECIES,
            masses=fixtures.MASSES[fixtures.WATER30_SPECIES],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                                   ghost_capacity=1024, rebuild_every=2),
            dt=0.1, integrator=integrate.Langevin(temp=300.0, damp=20.0),
            dtype=jnp.float64, extra_force=extra)

    box = lat.Box(h=jnp.asarray(fixtures.WATER30_BOX, jnp.float64),
                  origin=jnp.asarray(fixtures.WATER30_ORIGIN, jnp.float64))
    sim = make(b.force)
    st = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=3)
    st, _ = sim.run(st, 30)
    pos = sim.positions_input_order(st)
    d = np.linalg.norm(pos[0] - pos[1])
    assert abs(d - center) < 0.15, d


def test_dihedral_cv_value():
    from lammps_ani_tpu.md import bias
    # planar cis arrangement -> dihedral 0; trans -> pi
    pos = jnp.asarray([[0., 1., 0.], [0., 0., 0.], [1., 0., 0.],
                       [1., 1., 0.]])
    cv = bias.dihedral_cv(0, 1, 2, 3)
    assert abs(float(cv(pos, None))) < 1e-6
    pos_trans = pos.at[3].set(jnp.asarray([1., -1., 0.]))
    assert abs(abs(float(cv(pos_trans, None))) - np.pi) < 1e-6


def test_rattle_constrains_bonds():
    """fix shake equivalent: O-H bonds stay at r0 through dynamics and the
    constrained system conserves energy."""
    from lammps_ani_tpu.md import constraints as cons
    from lammps_ani_tpu.tools import pdb as pdbmod

    bonds = pdbmod.detect_bonds(fixtures.WATER30_SPECIES,
                                fixtures.WATER30_POS, fixtures.WATER30_BOX)
    rat = cons.Rattle.from_bonds(bonds, fixtures.WATER30_POS,
                                 fixtures.WATER30_BOX)
    assert rat.n_constraints == 20
    pot = zoo.ani2x(num_models=1, dtype=jnp.float64)
    sim = lat.Simulation(
        potential=pot, species=fixtures.WATER30_SPECIES,
        masses=fixtures.MASSES[fixtures.WATER30_SPECIES],
        nbr=lat.NeighborConfig(cutoff=5.1, skin=2.0, k_max=128,
                               ghost_capacity=1024, rebuild_every=2),
        dt=0.2, dtype=jnp.float64, constraints=rat)
    assert sim.dof == 3 * 30 - 3 - 20
    box = lat.Box(h=jnp.asarray(fixtures.WATER30_BOX, jnp.float64),
                  origin=jnp.asarray(fixtures.WATER30_ORIGIN, jnp.float64))
    st = sim.init_state(fixtures.WATER30_POS, box, temp=300.0, seed=4)
    st, rows = sim.run(st, 10, thermo_every=5)
    # bond lengths preserved
    pos = jnp.asarray(sim.positions_input_order(st))
    viol = float(rat.max_violation(pos, st.box))
    assert viol < 1e-6, viol
    assert np.isfinite(rows[-1]["etotal"])
