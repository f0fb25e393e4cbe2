"""Microbenchmark: Pallas radial AEV kernel vs XLA paths at bench scale.

Usage: python examples/benchmark/micro_radial.py [n_rep]
Times forward and value_and_grad of sum(radial_aev @ w) on the current
default backend (real TPU under axon)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import aev as aevmod
    from lammps_ani_tpu.ops import aev_pallas as apmod
    from lammps_ani_tpu.ops import cell_roll as crmod
    from lammps_ani_tpu.ops import neighbors as nbops

    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    dtype = jnp.float32
    spec = aevmod.ani2x_aev_spec()

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        n_rep, n_rep, n_rep)
    print(f"n_atoms={data.n_atoms}", flush=True)
    pos = jnp.asarray(data.positions, dtype)
    box = lat.Box(h=jnp.asarray(data.box_h, dtype),
                  origin=jnp.asarray(data.box_origin, dtype))
    pos = nbops.wrap_positions(pos, box)
    species = jnp.asarray(data.species)
    counts = [int((data.species == s).sum()) for s in range(7)]

    side = spec.radial_cutoff + 1.0  # cutoff + skin
    grid = crmod.RollGrid.for_box(np.asarray(box.h), side, 64)
    bins0 = crmod.build_bins(grid, pos, species, box)
    cap = int(-(-int(bins0.count_max) // 4) * 4)
    grid = crmod.RollGrid(ncells=grid.ncells, cap=cap)
    print(f"grid={grid.ncells} cap={grid.cap}", flush=True)
    bins = jax.jit(lambda p: crmod.build_bins(grid, p, species, box))(pos)

    w = jax.random.normal(jax.random.PRNGKey(0), (spec.radial_length,),
                          dtype)

    def e_pallas(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        return jnp.sum(apmod.radial_aev_pallas(
            spec, grid, bins, p, b, species_counts=counts) @ w)

    def timeit(name, f, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        t_compile = time.perf_counter() - t0
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(f(*args))
        dt_ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt_ms:.2f} ms (compile {t_compile:.1f}s)",
              flush=True)
        return out

    fwd = jax.jit(lambda p, h: apmod.radial_aev_pallas(
        spec, grid, bins, p, nbops.Box(h=h, origin=box.origin),
        species_counts=counts))
    a1 = timeit("pallas fwd", fwd, pos, box.h)
    vg = jax.jit(jax.value_and_grad(e_pallas, argnums=(0, 1)))
    _, (g1, gh1) = timeit("pallas value_and_grad", vg, pos, box.h)

    if os.environ.get("MICRO_XLA", "0") == "1":
        def e_roll(p, h):
            b = nbops.Box(h=h, origin=box.origin)
            return jnp.sum(crmod.radial_aev_cellroll(
                spec, grid, bins, p, b) @ w)
        vg2 = jax.jit(jax.value_and_grad(e_roll, argnums=(0, 1)))
        _, (g2, gh2) = timeit("xla cellroll value_and_grad", vg2, pos, box.h)
        print("force agree:",
              float(jnp.max(jnp.abs(g1 - g2))),
              "dh agree:", float(jnp.max(jnp.abs(gh1 - gh2))), flush=True)


if __name__ == "__main__":
    main()
