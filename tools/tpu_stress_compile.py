"""Compile the asn kernels at post-regrow capacity shapes on real TPU.

A capacity regrow recompiles every asn kernel at a larger (cap, kpad,
wpad); those shapes multiply each kernel's scoped-VMEM stack, and the
16 MB limit is a compile-time failure — invisible to CPU interpret-mode
tests and to any run that never overflows. This script compiles (and
executes once, tiny box) the full asn kernel set at the capacity point
that killed the round-3 bench mid-run (roll cap 48, k_total > 127 ->
kpad 256, wpad 1408): a regrow must never be able to take down a
production run (reference contract: pair_ani.cpp grow-never-die,
/root/reference/src/pair_ani.cpp:104-151).

Usage: python tools/tpu_stress_compile.py [cap] [k_each]
Prints one JSON line {"stress_compile": "PASS", ...} or raises.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.models import aev as aevmod
    from lammps_ani_tpu.ops import aev_asn as apasn
    from lammps_ani_tpu.ops import cell_roll as crmod

    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    k_each = int(sys.argv[2]) if len(sys.argv) > 2 else 68
    t0 = time.perf_counter()
    dtype = jnp.float32
    spec = aevmod.ani2x_aev_spec()

    rng = np.random.default_rng(0)
    ncell = 4
    side = 7.2
    box_l = ncell * side
    n = 700
    pos = jnp.asarray(rng.uniform(0, box_l, (n, 3)), dtype)
    species = jnp.asarray(np.where(rng.random(n) < 0.67, 0, 3))
    box = lat.Box(h=jnp.asarray(np.eye(3) * box_l, dtype),
                  origin=jnp.zeros((3,), dtype))

    grid = crmod.RollGrid(ncells=(ncell, ncell, ncell), cap=cap)
    # two sections summing past 127 forces the kpad-256 layout
    sections = ((0, k_each + 4), (3, k_each))
    kpad = apasn._round_lane(sum(k for _, k in sections) + 1)
    caps = (16, 0, 0, 12, 0, 0, 0)
    keep = spec.radial_cutoff + 2.0

    bins = jax.jit(lambda p: crmod.build_bins(grid, p, species, box))(pos)

    @jax.jit
    def build(p):
        return apasn.build_assignment(grid, bins, p, box, sections, kpad,
                                      keep)

    asn = build(pos)
    jax.block_until_ready(asn.idx)
    t_build = time.perf_counter() - t0

    w_r = jax.random.normal(jax.random.PRNGKey(0), (spec.radial_length,),
                            dtype)
    w_a = jax.random.normal(jax.random.PRNGKey(1), (spec.angular_length,),
                            dtype)

    from lammps_ani_tpu.models import repulsion as repmod
    rep = repmod.RepulsionSpec.for_symbols(
        ("H", "C", "N", "O", "S", "F", "Cl"))

    @jax.jit
    def rad(p):
        # repulsion ON: the side channel's kernels/VJP are part of the
        # production radial program (ANI-1xnr / bench workloads) and
        # have their own shape-dependent compile surface
        def e_of(q, h):
            b = lat.Box(h=h, origin=box.origin)
            aev, er = apasn.radial_aev_asn(spec, grid, bins, asn, q, b,
                                           sections, repulsion=rep)
            return jnp.sum(aev @ w_r) + jnp.sum(er)
        # grad wrt positions AND box (the production virial path — its
        # h-cotangent kernels are a distinct compile surface)
        g_p, g_h = jax.grad(e_of, argnums=(0, 1))(p, box.h)
        return e_of(p, box.h), g_p + jnp.sum(g_h) * 0.0

    @jax.jit
    def ang(p):
        e = jnp.sum(apasn.angular_aev_asn(spec, grid, bins, asn, p, box,
                                          sections, caps)[0] @ w_a)
        return e, jax.grad(lambda q: jnp.sum(apasn.angular_aev_asn(
            spec, grid, bins, asn, q, box, sections, caps)[0] @ w_a))(p)

    er, fr = rad(pos)
    ea, fa = ang(pos)
    jax.block_until_ready((er, fr, ea, fa))
    assert np.isfinite(float(er)) and np.isfinite(float(ea))
    assert np.all(np.isfinite(np.asarray(fr)))
    assert np.all(np.isfinite(np.asarray(fa)))
    print(json.dumps({
        "stress_compile": "PASS",
        "cap": cap, "kpad": kpad,
        "wpad": apasn._round_lane(27 * cap),
        "t_cells": apasn._t_cells(cap, apasn._round_lane(27 * cap)),
        "idx_rows": apasn._idx_row_block(
            apasn._round_lane(27 * cap), kpad, len(sections)),
        "wall_s": round(time.perf_counter() - t0, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
