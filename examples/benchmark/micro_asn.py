"""Microbenchmark: assignment-compacted AEV path at bench scale on TPU.

Times (scan-amortized, forced host fetch — block_until_ready on the axon
tunnel returns early and repeated identical calls can be result-cached,
so every call carries a fresh seed argument and ends in float()):
bin builds, assignment builds, per-channel kernels fwd/vjp, and the full
force path. Usage: python examples/benchmark/micro_asn.py [n_rep] [skin]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPS = 10
_seed = [0]


def main():
    import jax
    import jax.numpy as jnp

    import lammps_ani_tpu as lat
    from lammps_ani_tpu.io import lammps_data as ldio
    from lammps_ani_tpu.models import aev as aevmod
    from lammps_ani_tpu.models import potential as potmod
    from lammps_ani_tpu.models import zoo
    from lammps_ani_tpu.ops import aev_asn as apasn
    from lammps_ani_tpu.ops import cell_roll as crmod
    from lammps_ani_tpu.ops import neighbors as nbops

    T00 = time.perf_counter()
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    skin = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    dtype = jnp.float32
    spec = aevmod.ani2x_aev_spec()

    data = ldio.replicate(
        ldio.read_lammps_data("/root/reference/tests/water-0.8nm.data"),
        n_rep, n_rep, n_rep)
    print(f"n_atoms={data.n_atoms} skin={skin}", flush=True)
    pos = jnp.asarray(data.positions, dtype)
    box = lat.Box(h=jnp.asarray(data.box_h, dtype),
                  origin=jnp.asarray(data.box_origin, dtype))
    # keep ALL setup jitted: per-op eager dispatch on the tunnel is
    # minutes-slow at this size
    pos = jax.jit(nbops.wrap_positions)(pos, box)
    species = jnp.asarray(data.species)
    counts = tuple(int((data.species == s).sum()) for s in range(7))

    def timeit(name, f, *args):
        def scanned(p, s, rest):
            def body(c, i):
                out = f(c + 1e-30 * (s + i.astype(c.dtype)), *rest)
                leaves = [l for l in jax.tree.leaves(out)
                          if jnp.issubdtype(l.dtype, jnp.floating)]
                bump = sum(jnp.sum(l).astype(c.dtype) for l in leaves)
                return c + 1e-30 * bump, None
            c, _ = jax.lax.scan(body, p, jnp.arange(REPS, dtype=jnp.int32))
            return jnp.sum(c)
        g = jax.jit(lambda p, s, *rest: scanned(p, s, rest))

        def call():
            _seed[0] += 1
            return float(g(args[0], jnp.float32(_seed[0]), *args[1:]))

        t0 = time.perf_counter()
        call()
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        call()
        call()
        dt = (time.perf_counter() - t0) / (2 * REPS) * 1e3
        print(f"{name}: {dt:.2f} ms (compile {t_c:.1f}s)", flush=True)
        return dt

    print("t=%.0fs setup done" % (time.perf_counter() - T00), flush=True)

    def make(side):
        g0 = crmod.RollGrid.for_box(np.asarray(box.h), side, 64)
        cnt = int(jax.jit(
            lambda p: crmod.build_bins(g0, p, species, box).count_max)(pos))
        g = crmod.RollGrid(ncells=g0.ncells,
                           cap=int(-(-int(cnt + 2) // 4) * 4))
        b = jax.jit(lambda p: crmod.build_bins(g, p, species, box))(pos)
        print(f"side={side:.2f} grid={g.ncells} cap={g.cap}", flush=True)
        return g, b

    grid_r, bins_r = make(spec.radial_cutoff + skin)

    # sections from a cell-list degree measure (brute is O(n^2))
    from lammps_ani_tpu.ops import cell_list as clmod

    @jax.jit
    def degrees(pos):
        rq = spec.radial_cutoff + skin
        grid_cl = clmod.CellGrid.for_box(np.asarray(box.h), rq, 32)
        ghosts = nbops.build_ghosts(pos, box, rq,
                                    max(4096, data.n_atoms // 2),
                                    nbops.image_shifts(1))
        nl = clmod.build_neighbor_matrix_cells(pos, box, rq, 192, ghosts,
                                               grid=grid_cl)
        sp_ext = nbops.extended_species(species, nl.ghosts)
        _, dist = nbops.neighbor_displacements(pos, box, nl)
        spj = sp_ext[nl.idx]
        mask = nl.mask & (spj >= 0)
        per = lambda keep: jnp.stack([
            jnp.max(jnp.sum(mask & (dist <= keep) & (spj == s), axis=1))
            for s in range(7)])
        return per(rq), per(spec.angular_cutoff + skin), nl.max_count

    deg_r, deg_a, max_cnt = jax.device_get(degrees(pos))
    assert int(max_cnt) <= 192, int(max_cnt)
    mk = lambda degs: tuple(
        (s, int(-(-(int(d) + 2) // 4) * 4)) for s, d in enumerate(degs)
        if d > 0)
    sec_r = mk(deg_r)
    kpad_r = apasn._round_lane(sum(k for _, k in sec_r) + 1)
    print(f"sections r={sec_r} kpad={kpad_r} (one grid, shared asn)",
          flush=True)

    phase = os.environ.get("ASN_PHASE", "all")
    if phase in ("all", "build"):
        timeit("bins", lambda p: crmod.build_bins(
            grid_r, p, species, box).species_grid.astype(dtype), pos)
        timeit("asn build", lambda p: apasn.build_assignment(
            grid_r, bins_r, p, box, sec_r, kpad_r,
            spec.radial_cutoff + skin).idx.astype(dtype), pos)

    asn_r = jax.jit(lambda p: apasn.build_assignment(
        grid_r, bins_r, p, box, sec_r, kpad_r,
        spec.radial_cutoff + skin))(pos)
    print(f"asn ovf r={float(asn_r.ovf)}", flush=True)

    caps_env = os.environ.get("ASN_CAPS")  # e.g. "20,12" = (H, O)
    if caps_env:
        ch, co = (int(x) for x in caps_env.split(","))
    else:
        ch, co = 16, 12
    caps = tuple((ch if s == 0 else co) if counts[s] else 0
                 for s in range(7))
    print(f"caps={caps}", flush=True)

    w_r = jax.random.normal(jax.random.PRNGKey(0), (spec.radial_length,),
                            dtype)
    w_a = jax.random.normal(jax.random.PRNGKey(1), (spec.angular_length,),
                            dtype)
    # bins/asn tables are traced args, NOT closures: the GB-scale idx/inv
    # arrays would otherwise be serialized into the remote compile request
    # (HTTP 413 on the axon tunnel)
    if phase in ("all", "radial"):
        timeit("radial fwd", lambda p, b, a: apasn.radial_aev_asn(
            spec, grid_r, b, a, p, box, sec_r)[0], pos, bins_r, asn_r)
        timeit("radial vjp", lambda p, b, a: jax.grad(
            lambda q: jnp.sum(apasn.radial_aev_asn(
                spec, grid_r, b, a, q, box, sec_r)[0] @ w_r))(p),
            pos, bins_r, asn_r)
    # occupancy tiers: ASN_TIERS="16,8:95000" adds a (H, O) = (16, 8)
    # tier-0 with 95000 rows ahead of the full-caps last tier (rows =
    # n - 95000 + margin); empty/unset = untiered
    tiers = None
    tiers_env = os.environ.get("ASN_TIERS")
    if tiers_env:
        tiers = []
        for part in tiers_env.split(";"):
            cs, rows = part.split(":")
            th, to = (int(x) for x in cs.split(","))
            caps_t = tuple((th if s == 0 else to) if counts[s] else 0
                           for s in range(7))
            tiers.append((caps_t, int(rows)))
        used = sum(r for _, r in tiers)
        tiers.append((caps, max(2048, int(
            (data.n_atoms - used) * 1.3) + 256)))
        tiers = tuple(tiers)
        print(f"tiers={tiers}", flush=True)
    if phase in ("all", "angular"):
        timeit("angular fwd", lambda p, b, a: apasn.angular_aev_asn(
            spec, grid_r, b, a, p, box, sec_r, caps, tiers=tiers)[0],
            pos, bins_r, asn_r)
        timeit("angular vjp", lambda p, b, a: jax.grad(
            lambda q: jnp.sum(apasn.angular_aev_asn(
                spec, grid_r, b, a, q, box, sec_r, caps,
                tiers=tiers)[0] @ w_a))(p),
            pos, bins_r, asn_r)
    if phase not in ("all", "full"):
        return

    # full force path with the sorted MLP
    import dataclasses as dc
    pot = zoo.ani2x(num_models=1, dtype=dtype)
    pot = potmod.ANIPotential(
        spec=dc.replace(pot.spec, angular_caps=caps), params=pot.params)
    order = np.lexsort((np.arange(data.n_atoms), data.species))
    sp_sorted = jnp.asarray(data.species[order])
    pos_sorted = pos[jnp.asarray(order)]
    bins_rs = jax.jit(
        lambda p: crmod.build_bins(grid_r, p, sp_sorted, box))(pos_sorted)
    asn_rs = jax.jit(lambda p: apasn.build_assignment(
        grid_r, bins_rs, p, box, sec_r, kpad_r,
        spec.radial_cutoff + skin))(pos_sorted)
    def efv(p, bins, asn):
        # grid_r/sec_r are static metadata (hashable, tiny) — close over
        # them; only the array state is traced
        e, f, w, dfc = potmod.energy_forces_virial_asn(
            pot, sp_sorted, p, box, (grid_r, bins, asn, sec_r),
            species_counts=counts)
        return e, f, w

    timeit("energy_forces_virial_asn", efv, pos_sorted, bins_rs, asn_rs)
    e, f, w = jax.jit(efv)(pos_sorted, bins_rs, asn_rs)
    print("pe:", float(e), "fmax:", float(jnp.max(jnp.abs(f))), flush=True)


if __name__ == "__main__":
    main()
