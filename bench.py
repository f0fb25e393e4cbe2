"""Headline benchmark on real TPU hardware.

Measures MD throughput of the flagship config — ANI-2x (1 model, fp32,
cutoff 5.1 A) water box — mirroring the reference's benchmark campaign
(/root/reference/examples/benchmark: 100k-atom water, 0.5 fs, kokkos,
A100 baseline 1.495 ns/day = 34.6 steps/s, BASELINE.md strong-scaling
table). Prints ONE JSON line.

The timed region is the jitted MD chunk (neighbor rebuild + fused steps),
called back-to-back like a production run; host-side overflow checks are
outside the timed loop, matching how Simulation.run amortizes them.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_NS_PER_DAY = 1.495  # A100, 100k water, 0.5 fs, 1 model (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import zoo

    n_rep = int(os.environ.get("BENCH_REP", "15"))  # 15^3 * 30 = 101,250
    dt = 0.5
    # 12-step chunks: the max thermal displacement across 101k atoms
    # covers ~0.9 A in 24 steps at 300 K — right at the half-skin bound,
    # so 24-step chunks froze (and wasted) their back halves nearly every
    # time. The reference rebuilds at the same ~10-15 step cadence
    # (neigh_modify every 10 check yes); the asn rebuild is ~36 ms, so
    # the amortized cost at 12 is ~3 ms/step against ~45% freeze waste.
    steps_per_chunk = int(os.environ.get("BENCH_REBUILD", "12"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "6"))

    import dataclasses

    tile = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    # Start from the tile equilibrated under the SYNTHETIC potential
    # (tools/equilibrate_tile.py). Replication preserves every atom's
    # neighbor environment, so the replicated box starts at equilibrium:
    # the raw reference geometry is an equilibrium of real ANI-2x, not
    # of the synthetic stand-in weights, and benching from it measures a
    # violent warmup transient (staleness freezes + capacity ratcheting
    # with a recompile per regrow) instead of production steady state.
    equil = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "examples", "benchmark", "data",
                         "equil_water30.npz")
    if os.path.exists(equil) and os.environ.get("BENCH_EQUIL", "1") == "1":
        z = np.load(equil)
        tile = dataclasses.replace(tile, positions=z["positions"])
    data = ldio.replicate(tile, n_rep, n_rep, n_rep)
    n_atoms = data.n_atoms

    if os.environ.get("BENCH_PARITY", "0") == "1":
        # opt-in on-hardware kernel parity gate (tools/tpu_parity.py):
        # compiled Mosaic kernels vs the XLA oracle at ~800 atoms. Off by
        # default only because its extra compiles (~minutes on the
        # tunnel) would eat the driver's bench budget.
        import subprocess
        rc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "tpu_parity.py")]).returncode
        if rc != 0:
            print(json.dumps({"metric": "parity", "value": 0,
                              "unit": "bool", "vs_baseline": 0}))
            sys.exit(1)

    from lammps_ani_tpu.md import integrate

    # capacity margins are ENGINE defaults since round 4 (VERDICT r3 #6:
    # "a production user will not run the recipe"): roll cap +4, angular
    # caps x1.1, sections x1.1 — the observed 101k steady-state ratchet
    # offsets. LAT_*_MARGIN env vars remain as overrides only; the
    # warmup loop below absorbs any residual ratchet at other sizes.

    cellroll = os.environ.get("BENCH_CELLROLL", "1") == "1"
    skin = float(os.environ.get("BENCH_SKIN", "2.0"))
    ang_skin = float(os.environ.get("BENCH_ANG_SKIN", "2.0"))
    atom_chunk = int(os.environ.get("BENCH_ATOM_CHUNK", "2048"))
    # repulsion=True: the synthetic MLP weights lack the short-range
    # core wall real trained ANI-2x learns, so bare synthetic MD slowly
    # collapses (runaway speeds, unbounded capacity growth); the XTB
    # term rides the radial kernel, so its cost is part of the headline
    # BENCH_MODELS: ensemble size (VERDICT r3 missing #4 — the reference
    # publishes 8-model = 2.8x the 1-model cost,
    # /root/reference/examples/water/README.md table)
    num_models = int(os.environ.get("BENCH_MODELS", "1"))
    # BENCH_MODEL=ani1x_nr benches the repulsion-fused ANI-1xnr path
    # (reference bar: combustion 3.396 ns/day on 8 A100,
    # /root/reference/examples/combustion/README.md) — water species
    # (H, O) sit at the same indices in both zoos
    model_name = os.environ.get("BENCH_MODEL", "ani2x")
    chunk = min(atom_chunk, 30 * n_rep ** 3)
    if model_name == "ani2x":
        pot = zoo.ani2x(num_models=num_models, dtype=jnp.float32,
                        repulsion=True, atom_chunk=chunk)
    else:
        pot = zoo.all_models[model_name](num_models=num_models,
                                         dtype=jnp.float32,
                                         atom_chunk=chunk)
    box = lat.Box(h=jnp.asarray(data.box_h, jnp.float32),
                  origin=jnp.asarray(data.box_origin, jnp.float32))

    if os.environ.get("BENCH_SHARDED", "0") == "1":
        # sharded engine on a (1,1,1) mesh over the real chip: validates
        # that the scale-out path runs the SAME fast kernels (VERDICT r3
        # missing #1); ms/step should sit within ~15% of the
        # single-device engine (halo self-images + grid pad overhead)
        _bench_sharded(data, pot, box, dt, steps_per_chunk, n_chunks)
        return

    def build_and_warm():
        sim = lat.Simulation(
            potential=pot, species=data.species,
            masses=data.masses_by_type[data.species],
            nbr=lat.NeighborConfig(cutoff=5.1, skin=skin,
                                   ang_skin=ang_skin, k_max=128,
                                   ghost_capacity=max(4096, n_atoms // 2),
                                   rebuild_every=steps_per_chunk,
                                   use_cell_list=n_rep >= 3,
                                   cell_capacity=int(os.environ.get(
                                       "BENCH_CELL_CAP", "32"))),
            dt=dt, dtype=jnp.float32, cellroll=cellroll,
            # the reference benchmark thermostats: `fix langevin 300 300
            # 100` + nve (/root/reference/examples/benchmark/in.lammps:
            # 57-59). Bare NVE on the unequilibrated replicated box heats
            # until equipartition — displacement per chunk then keeps
            # violating the half-skin bound and the capacity caps ratchet
            # all run long (each regrow recompiles), which benches the
            # warmup transient instead of production steady state.
            integrator=integrate.Langevin(temp=300.0, damp=100.0))
        state = sim.init_state(data.positions, box, temp=300.0, seed=1,
                               compute_virial=True)
        # warmup / compile through the production path: run() owns
        # overflow regrow, adaptive rebuild, and grid revalidation — the
        # published number measures exactly what a production run
        # executes (VERDICT r2 weak #6). Two warmup chunks by default:
        # capacity regrows are monotonic, so absorbing any
        # early-trajectory overflow recompile here keeps it out of the
        # timed region.
        warm_chunks = int(os.environ.get("BENCH_WARM_CHUNKS", "4"))
        max_warm = int(os.environ.get("BENCH_MAX_WARM_CHUNKS", "16"))
        state, _ = sim.run(state, steps_per_chunk * warm_chunks)
        # keep warming until one full chunk completes with every capacity
        # stable: regrows are monotonic ratchets toward the trajectory's
        # high-water marks, and a regrow inside the timed region would
        # charge a whole-program recompile (~minutes over the tunnel) to
        # ms/step — production runs amortize that over 100k+ steps
        stable = 0
        for _ in range(max(0, max_warm - warm_chunks)):
            ev = sim.regrow_events
            state, _ = sim.run(state, steps_per_chunk)
            # two consecutive regrow-free chunks: capacity high-water
            # marks creep for a while after the first quiet chunk
            stable = stable + 1 if sim.regrow_events == ev else 0
            if stable >= 2:
                break
        jax.block_until_ready(state.pos)
        return sim, state

    total_steps = steps_per_chunk * n_chunks

    def warm_and_time():
        sim, state = build_and_warm()
        # re-time if a capacity regrow lands inside the timed region: a
        # regrow's whole-program recompile (~minutes over the tunnel)
        # charged to 72 steps reports garbage ms/step (observed 1443 vs
        # the profiled ~280 at 240k). Regrows are monotonic, so one
        # retry per event converges.
        for _ in range(3):
            ev = sim.regrow_events
            t0 = time.perf_counter()
            state, _ = sim.run(state, total_steps)
            jax.block_until_ready(state.pos)
            wall = time.perf_counter() - t0
            if sim.regrow_events == ev:
                break
            print(f"regrow inside timed region (events {ev} -> "
                  f"{sim.regrow_events}); re-timing", file=sys.stderr)
        return sim, wall

    try:
        sim, wall = warm_and_time()
    except Exception as exc:  # noqa: BLE001
        # engine-mode safety net: a Mosaic-only failure in the default
        # fast path must degrade the benchmark, not zero it — fall back
        # to the hybrid engine and report which mode actually ran. The
        # timed run is covered too: a mid-run capacity regrow compiles a
        # fresh program that warmup never exercised.
        if os.environ.get("LAT_ROLL_IMPL"):
            raise
        print(f"default engine failed ({type(exc).__name__}: {exc}); "
              "falling back to LAT_ROLL_IMPL=pallas", file=sys.stderr)
        os.environ["LAT_ROLL_IMPL"] = "pallas"
        sim, wall = warm_and_time()

    ms_per_step = wall * 1e3 / total_steps
    steps_per_s = 1e3 / ms_per_step
    ns_per_day = dt * 86.4 / ms_per_step
    matom_steps = n_atoms * steps_per_s / 1e6

    metric = f"water{n_atoms // 1000}k_ns_per_day"
    if model_name != "ani2x":
        metric = f"water{n_atoms // 1000}k_{model_name}_ns_per_day"
    result = {
        "metric": metric,
        "value": round(ns_per_day, 4),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_PER_DAY, 4),
        "detail": {
            "n_atoms": n_atoms,
            "model": model_name,
            "num_models": num_models,
            "total_steps": total_steps,
            "wall_s": round(wall, 2),
            "ms_per_step": round(ms_per_step, 3),
            "steps_per_s": round(steps_per_s, 3),
            "matom_steps_per_s": round(matom_steps, 4),
            "dt_fs": dt,
            "engine": sim._roll_impl,
            # ratcheted steady-state shapes: the compact-lane padding
            # (kpad = sections total rounded to 128) and the grid cap
            # drive most kernels' lane efficiency — publish them so a
            # number is reproducible at its shapes
            "sections": list(sim._rad_sections or ()),
            "cell_cap": getattr(sim._roll_grid, "cap", None),
            "ang_tiers": [[list(c), r] for c, r in (sim._ang_tiers or ())],
            "regrow_events": sim.regrow_events,
            "device": str(jax.devices()[0]),
            "baseline": "A100 100k water 1.495 ns/day (BASELINE.md)",
        },
    }
    print(json.dumps(result))


def _bench_sharded(data, pot, box, dt, steps_per_chunk, n_chunks):
    """DomainSimulation over a (1,1,1) mesh on the real chip — the
    sharded asn engine at the headline workload."""
    import jax
    import jax.numpy as jnp

    from lammps_ani_tpu.md import integrate
    from lammps_ani_tpu.parallel import domain
    from lammps_ani_tpu.parallel.sim import DomainSimulation

    n_atoms = data.n_atoms
    mesh = tuple(int(x) for x in os.environ.get(
        "BENCH_MESH", "1,1,1").split(","))
    dspec = domain.auto_domain_spec(
        n_atoms, data.box_h, mesh, 5.1 + 2.0)
    dsim = DomainSimulation(
        potential=pot, dspec=dspec, cutoff=5.1, skin=2.0,
        rebuild_every=steps_per_chunk, dt=dt,
        integrator=integrate.Langevin(temp=300.0, damp=100.0),
        dtype=jnp.float32)
    state = dsim.init_state(
        data.species, data.masses_by_type[data.species],
        np.asarray(data.positions), box, temp=300.0, seed=1)
    warm_chunks = int(os.environ.get("BENCH_WARM_CHUNKS", "4"))
    max_warm = int(os.environ.get("BENCH_MAX_WARM_CHUNKS", "16"))
    state, _ = dsim.run(state, steps_per_chunk * warm_chunks)
    # warm until the capacity ratchet settles (2 consecutive regrow-free
    # chunks) — each regrow recompiles the whole sharded program
    # (~minutes at 101k ext shapes over the tunnel), which must not
    # land in the timed region
    stable = 0
    for _ in range(max(0, max_warm - warm_chunks)):
        ev = dsim.regrow_events
        state, _ = dsim.run(state, steps_per_chunk)
        stable = stable + 1 if dsim.regrow_events == ev else 0
        if stable >= 2:
            break
    jax.block_until_ready(state.pos)
    total_steps = steps_per_chunk * n_chunks
    # same regrow-aware re-timing as the single-device headline: a
    # regrow recompile inside the timed window reports garbage ms/step
    rows = []
    for _ in range(3):
        ev = dsim.regrow_events
        t0 = time.perf_counter()
        state, rows = dsim.run(state, total_steps,
                               thermo_every=total_steps)
        jax.block_until_ready(state.pos)
        wall = time.perf_counter() - t0
        if dsim.regrow_events == ev:
            break
        print(f"sharded regrow inside timed region; re-timing",
              file=sys.stderr)
    ms_per_step = wall * 1e3 / total_steps
    ns_per_day = dt * 86.4 / ms_per_step
    result = {
        "metric": f"water{n_atoms // 1000}k_sharded_ns_per_day",
        "value": round(ns_per_day, 4),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_PER_DAY, 4),
        "detail": {
            "n_atoms": n_atoms,
            "mesh": list(mesh),
            "total_steps": total_steps,
            "wall_s": round(wall, 2),
            "ms_per_step": round(ms_per_step, 3),
            "engine": ("pallas_asn-sharded" if dsim._asn_grid is not None
                       else "mirror-ext-sharded"),
            "grid": (list(dsim._asn_grid.ncells)
                     if dsim._asn_grid is not None else None),
            "cap": getattr(dsim._asn_grid, "cap", None),
            "sections": list(dsim._rad_sections or ()),
            "ang_tiers": [[list(c), r]
                          for c, r in (dsim._ang_tiers or ())],
            "regrow_events": dsim.regrow_events,
            "temp": round(rows[-1]["temp"], 1) if rows else None,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
