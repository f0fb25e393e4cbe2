"""Weak/strong scaling sweep over a device mesh (virtual or real).

The analog of the reference's Slurm scaling campaign
(/root/reference/examples/benchmark/submit_scaling.py:7-33 fans out
`mpirun -np N` jobs with `replicate` for weak scaling;
read_perf.py:10-37 parses ns/day / Matom-step/s). Here the mesh lives in
one process: pass --virtual N to sweep an N-virtual-device CPU mesh
(sharding correctness + step-time shape), or run on real multi-chip
hardware where available.

Usage:
    python scaling.py --mode weak --meshes 1,2,4,8 --atoms-per-shard 810
    python scaling.py --mode strong --meshes 1,2,4,8 --rep 3,3,3
Prints one JSON line per point: {"n_shards", "n_atoms", "ns_per_day",
"steps_per_s", "matom_steps_per_s", "parallel_eff"}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def mesh_shape_for(n: int):
    """Factor n into a 3-d mesh, longest axis first."""
    shapes = {1: (1, 1, 1), 2: (2, 1, 1), 4: (2, 2, 1), 8: (2, 2, 2),
              16: (4, 2, 2), 32: (4, 4, 2), 64: (4, 4, 4)}
    if n not in shapes:
        raise SystemExit(f"unsupported mesh size {n}")
    return shapes[n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("weak", "strong"), default="weak")
    ap.add_argument("--meshes", default="1,2,4,8")
    ap.add_argument("--atoms-per-shard", type=int, default=810,
                    help="weak scaling: atoms per shard (rounded to "
                    "whole water-box replicas)")
    ap.add_argument("--rep", default="3,3,3",
                    help="strong scaling: fixed box replicate")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--rebuild-every", type=int, default=2)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU mesh")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.virtual}").strip()

    import jax

    if args.virtual:
        # the axon sitecustomize ignores the JAX_PLATFORMS env var; the
        # config update after import is the only reliable override
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.md import integrate
    from lammps_ani_tpu.models import zoo
    from lammps_ani_tpu.parallel.domain import DomainSpec
    from lammps_ani_tpu.parallel.sim import DomainSimulation

    base = ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data")
    pot = zoo.ani2x(num_models=1, dtype=jnp.float32)
    meshes = [int(x) for x in args.meshes.split(",")]
    dt = 0.5
    base_rate = None

    for n in meshes:
        mesh_shape = mesh_shape_for(n)
        if args.mode == "weak":
            # replicate so each brick holds ~atoms_per_shard
            per_rep = base.n_atoms
            reps_per_shard = max(1, round(args.atoms_per_shard / per_rep))
            # lay replicas out along the mesh axes (cube-ish per shard)
            side = max(1, round(reps_per_shard ** (1 / 3)))
            rep = tuple(mesh_shape[a] * side for a in range(3))
        else:
            rep = tuple(int(x) for x in args.rep.split(","))
        data = ldio.replicate(base, *rep)

        n_cap = int(data.n_atoms / n * 1.6) + 64
        dsim = DomainSimulation(
            potential=pot,
            dspec=DomainSpec(mesh_shape=mesh_shape, n_cap=n_cap,
                             halo_cap=(2 * n_cap, 3 * n_cap, 4 * n_cap),
                             mig_cap=max(64, n_cap // 4), k_max=160),
            cutoff=5.1, skin=2.0, rebuild_every=args.rebuild_every, dt=dt,
            integrator=integrate.NoseHoover(temp=300.0, tdamp=100.0),
            dtype=jnp.float32, devices=jax.devices()[:n])
        box = lat.Box(h=jnp.asarray(data.box_h, jnp.float32),
                      origin=jnp.asarray(data.box_origin, jnp.float32))
        st = dsim.init_state(data.species,
                             data.masses_by_type[data.species],
                             data.positions, box, temp=300.0, seed=3)
        # compile + warm chunk
        st, _ = dsim.run(st, args.rebuild_every)
        t0 = time.perf_counter()
        st, _ = dsim.run(st, args.steps)
        wall = time.perf_counter() - t0
        ms = wall / args.steps * 1e3
        rate = data.n_atoms / ms * 1e3 / 1e6  # Matom-step/s
        if base_rate is None:
            base_rate = rate if args.mode == "strong" else rate / n
        eff = (rate / (base_rate * (n if args.mode == "weak" else 1))
               if args.mode == "weak" else rate / (base_rate * n))
        print(json.dumps({
            "mode": args.mode, "n_shards": n, "mesh": mesh_shape,
            "n_atoms": data.n_atoms, "ms_per_step": round(ms, 3),
            "ns_per_day": round(dt * 86.4 / ms, 4),
            "steps_per_s": round(1e3 / ms, 3),
            "matom_steps_per_s": round(rate, 4),
            "parallel_eff": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
