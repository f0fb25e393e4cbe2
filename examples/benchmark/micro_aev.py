"""Microbenchmark: full Pallas AEV path (radial shell-2 + angular) at
bench scale on the current backend (real TPU under axon).

Usage: python examples/benchmark/micro_aev.py [n_rep]
Times the pieces of the production force path: bin build, AEV forward,
and value_and_grad of the NN-free contraction, plus the full potential
energy_forces_virial_roll."""

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
    from lammps_ani_tpu.models import potential as potmod
    from lammps_ani_tpu.models import zoo
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
    counts = tuple(int((data.species == s).sum()) for s in range(7))

    def make_grid(side):
        g = crmod.RollGrid.for_box(np.asarray(box.h), side, 64)
        b0 = crmod.build_bins(g, pos, species, box)
        g = crmod.RollGrid(ncells=g.ncells,
                           cap=int(-(-int(b0.count_max) // 4) * 4))
        b = jax.jit(lambda p: crmod.build_bins(g, p, species, box))(pos)
        print(f"side={side:.2f} grid={g.ncells} cap={g.cap}", flush=True)
        return g, b

    # coarse grid: shell-1 radial; fine grid: angular + shell-2 radial
    grid_c, bins_c = make_grid(spec.radial_cutoff + 1.0)
    grid, bins = make_grid(
        max(spec.angular_cutoff + 1.0, (spec.radial_cutoff + 1.0) / 2))

    caps = tuple((12 if s == 0 else 8) if counts[s] else 0
                 for s in range(7))

    REPS = 10

    def timeit(name, f, *args):
        """Time f amortized inside one lax.scan dispatch (the axon tunnel
        adds ~27 ms per jitted call, so per-call timing is meaningless)."""

        def scanned(p, rest):
            def body(c, _):
                out = f(c, *rest)
                leaves = jax.tree.leaves(out)
                bump = sum(jnp.sum(l).astype(p.dtype) for l in leaves
                           if jnp.issubdtype(l.dtype, jnp.floating))
                return c + 1e-30 * bump, None
            c, _ = jax.lax.scan(body, p, length=REPS)
            return c
        g = jax.jit(lambda p, *rest: scanned(p, rest))
        t0 = time.perf_counter()
        jax.block_until_ready(g(*args))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(g(*args))
        jax.block_until_ready(g(*args))
        dt_ms = (time.perf_counter() - t0) / (2 * REPS) * 1e3
        print(f"{name}: {dt_ms:.2f} ms (compile {t_compile:.1f}s)",
              flush=True)

    # bin rebuild
    timeit("build_bins",
           lambda p: crmod.build_bins(grid, p, species, box).species_grid
           .astype(jnp.float32), pos)

    # radial fwd + grad
    w_r = jax.random.normal(jax.random.PRNGKey(0), (spec.radial_length,),
                            dtype)
    timeit("radial fwd (coarse shell1)",
           lambda p: apmod.radial_aev_pallas(
               spec, grid_c, bins_c, p, box, species_counts=counts,
               shell=1), pos)
    timeit("radial vjp (coarse shell1)", jax.grad(
        lambda p: jnp.sum(apmod.radial_aev_pallas(
            spec, grid_c, bins_c, p, box, species_counts=counts,
            shell=1) @ w_r)), pos)

    # angular fwd + grad
    w_a = jax.random.normal(jax.random.PRNGKey(1), (spec.angular_length,),
                            dtype)
    timeit("angular fwd",
           lambda p: apmod.angular_aev_pallas(
               spec, grid, bins, p, box, caps,
               species_counts=counts)[0], pos)
    timeit("angular vjp", jax.grad(
        lambda p: jnp.sum(apmod.angular_aev_pallas(
            spec, grid, bins, p, box, caps,
            species_counts=counts)[0] @ w_a)), pos)

    # full potential force path (AEV kernels + sorted MLP + virial)
    pot = zoo.ani2x(num_models=1, dtype=dtype)
    import dataclasses as dc
    pot = potmod.ANIPotential(
        spec=dc.replace(pot.spec, angular_caps=caps), params=pot.params)
    order = np.lexsort((np.arange(data.n_atoms), data.species))
    sp_sorted = jnp.asarray(data.species[order])
    pos_sorted = pos[jnp.asarray(order)]
    bins_s = jax.jit(
        lambda p: crmod.build_bins(grid, p, sp_sorted, box))(pos_sorted)

    def efv(p, h):
        b = nbops.Box(h=h, origin=box.origin)
        e, f, w, dfc = potmod.energy_forces_virial_roll(
            pot, sp_sorted, p, b, grid, bins_s, radial_shell=2,
            species_counts=counts)
        return e, f, w

    timeit("energy_forces_virial_roll", efv, pos_sorted, box.h)
    e, f, w = jax.jit(efv)(pos_sorted, box.h)
    print("pe:", float(e), "fmax:", float(jnp.max(jnp.abs(f))), flush=True)


if __name__ == "__main__":
    main()
