"""Scan-amortized piece timings of the Pallas radial path at bench scale.

Separates: pos inv-gather, candidate materialization, the bare kernel
(pre-made inputs), and the [n, width] out-gather — the axon tunnel adds
~27 ms per dispatch, so everything is timed inside one lax.scan."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

import lammps_ani_tpu as lat
from lammps_ani_tpu.io import lammps_data as ldio
from lammps_ani_tpu.models import aev as aevmod
from lammps_ani_tpu.ops import aev_pallas as apmod
from lammps_ani_tpu.ops import cell_roll as crmod
from lammps_ani_tpu.ops import neighbors as nbops

REPS = 10


def timeit(name, f, x, *rest):
    def scanned(p):
        def body(c, _):
            out = f(c, *rest)
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            bump = sum(jnp.sum(l).astype(c.dtype) for l in leaves)
            return c + 1e-30 * bump, None
        c, _ = jax.lax.scan(body, p, length=REPS)
        return c
    g = jax.jit(scanned)
    jax.block_until_ready(g(x))
    t0 = time.perf_counter()
    jax.block_until_ready(g(x))
    jax.block_until_ready(g(x))
    print(f"{name}: {(time.perf_counter() - t0) / (2 * REPS) * 1e3:.2f} ms",
          flush=True)


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    dtype = jnp.float32
    spec = aevmod.ani2x_aev_spec()
    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        n_rep, n_rep, n_rep)
    pos = jnp.asarray(data.positions, dtype)
    box = lat.Box(h=jnp.asarray(data.box_h, dtype),
                  origin=jnp.asarray(data.box_origin, dtype))
    pos = nbops.wrap_positions(pos, box)
    species = jnp.asarray(data.species)
    n = data.n_atoms
    print(f"n_atoms={n}", flush=True)

    grid = crmod.RollGrid.for_box(np.asarray(box.h),
                                  spec.radial_cutoff + 1.0, 64)
    b0 = crmod.build_bins(grid, pos, species, box)
    grid = crmod.RollGrid(ncells=grid.ncells,
                          cap=int(-(-int(b0.count_max) // 4) * 4))
    bins = jax.jit(lambda p: crmod.build_bins(grid, p, species, box))(pos)
    nc, cap = grid.total, grid.cap
    print(f"grid={grid.ncells} cap={cap}", flush=True)

    # 1. pos inv-gather (flat -> grid rows, width 3)
    timeit("pos inv-gather", lambda p: apmod._to_grid_rows(bins.inv, p,
                                                           1e6), pos)

    # 2. candidate materialization (halo + 27 slices + group transpose)
    def cands(p):
        pos4g = apmod._to_grid_rows(bins.inv, p, 1e6)
        pos4 = pos4g.reshape(*grid.ncells, cap, 3)
        csp4 = bins.species_grid.reshape(*grid.ncells, cap)
        cp, cs = apmod._candidates(grid, pos4, csp4, box.h, 1)
        return cp
    timeit("pos gather + candidates", cands, pos)

    # 3. bare kernels with pre-made inputs (no layout conversions)
    counts = tuple(int((data.species == s).sum()) for s in range(7))
    present = apmod._present_species(spec, counts)
    ng = apmod._n_groups(cap, 27, 40)
    key = jax.random.PRNGKey(0)
    nc_pad = -(-nc // apmod._T_ROWS) * apmod._T_ROWS
    pos4g = apmod._to_grid_rows(bins.inv, pos, 1e6)
    px, py, pz = [jnp.pad(pos4g[..., i], ((0, nc_pad - nc), (0, 0)),
                          constant_values=1e6) for i in range(3)]
    cp, cs = apmod._candidates(
        grid, pos4g.reshape(*grid.ncells, cap, 3),
        bins.species_grid.reshape(*grid.ncells, cap), box.h, 1)
    cx, cy, cz = [apmod._grouped(apmod._pad_rows(cp[..., i], nc_pad, -1e6),
                                 ng) for i in range(3)]
    csp = apmod._grouped(apmod._pad_rows(cs, nc_pad, -1), ng)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    srl = spec.radial_length
    wg = 27 * cap // ng
    kern = functools.partial(apmod._radial_fwd_kernel, spec=spec, cap=cap,
                             present=present, n_off=27, n_groups=ng,
                             dtype=dtype)

    def bare_kernel(px_, cx_, cy_, cz_, csp_, py_, pz_):
        return pl.pallas_call(
            kern,
            grid=(nc_pad // apmod._T_ROWS, ng),
            in_specs=[apmod._center_spec(cap)] * 3
            + [apmod._group_spec(wg)] * 4,
            out_specs=apmod._out3_spec(cap, srl),
            out_shape=jax.ShapeDtypeStruct((nc_pad, cap, srl), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(px_, py_, pz_, cx_, cy_, cz_, csp_)
    timeit("bare radial kernel", bare_kernel, px, cx, cy, cz, csp, py, pz)

    # 4. out-gather alone at widths 112 and 896
    for width in (112, 896):
        g = jax.random.normal(key, (nc, cap, width), dtype)
        timeit(f"out-gather [n,{width}]",
               lambda gg: gg[bins.cell, bins.slot], g)

    # 5. full radial fwd + vjp (sanity)
    timeit("radial fwd full", lambda p: apmod.radial_aev_pallas(
        spec, grid, bins, p, box, species_counts=counts, shell=1), pos)


if __name__ == "__main__":
    main()
