"""Isolated timing of the angular pair-block stage (fwd + bwd kernels
only, synthetic flat-row inputs at bench scale): packed layout
(LAT_ANG_PACKED=1) vs per-block full-matrix/triangle kernels.

Usage: python micro_pair_stage.py [rows] [capsH,capsO]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    from lammps_ani_tpu.models import aev as aevmod
    from lammps_ani_tpu.ops import aev_asn as apasn

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100352
    ch, co = ((int(x) for x in sys.argv[2].split(","))
              if len(sys.argv) > 2 else (16, 8))
    dtype = jnp.float32
    spec = aevmod.ani2x_aev_spec()
    caps = tuple((ch if s == 0 else co) if s in (0, 3) else 0
                 for s in range(7))
    sections = ((0, 68), (3, 36))
    a_offs, atot = apasn._a_offsets(sections, caps)
    asub = spec.angular_sublength
    nblk = 3
    rca = spec.angular_cutoff

    key = jax.random.PRNGKey(0)
    # synthetic arm rows: unit-ish vectors, d in (0.8, 3.4), fc in (0,1)
    n_pad = -(-rows // 256) * 256
    u = jax.random.normal(key, (3, n_pad, atot), dtype)
    un = u / jnp.linalg.norm(u, axis=0, keepdims=True)
    d = jax.random.uniform(jax.random.fold_in(key, 1), (n_pad, atot),
                           dtype, 0.9, 3.4)
    fc = jax.random.uniform(jax.random.fold_in(key, 2), (n_pad, atot),
                            dtype, 0.1, 1.0)
    cflat = [un[0], un[1], un[2], d, fc]
    ga = jax.random.normal(jax.random.fold_in(key, 3),
                           (n_pad, nblk * asub), dtype)
    ga_off = {}
    for i, b in enumerate(apasn._pair_blocks(spec, caps)):
        if b[0] in a_offs and b[1] in a_offs:
            ga_off[b[4]] = len(ga_off) * asub

    def timeit(name, f, *args):
        def scanned(p, *rest):
            def body(c, _):
                out = f(c, *rest)
                s = sum(jnp.sum(l) for l in jax.tree.leaves(out))
                return c + 1e-30 * s, None
            c, _ = jax.lax.scan(body, p, length=REPS)
            return jnp.sum(c)
        g = jax.jit(scanned)
        t0 = time.perf_counter()
        # float(): block_until_ready returns EARLY on the axon tunnel —
        # without the forced fetch the first timed call absorbs the whole
        # first execution (observed as a phantom 100-1000x "kernel cliff")
        float(g(*args))
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(g(*args))
        float(g(*args))
        dt = (time.perf_counter() - t0) / (2 * REPS) * 1e3
        print(f"{name}: {dt:.2f} ms (compile {t_c:.1f}s)", flush=True)

    r = apasn._r_flat(rows)

    def fwd(fc_in, *rest):
        cfl = [rest[0], rest[1], rest[2], rest[3], fc_in]
        pieces = apasn._run_fwd_blocks(spec, caps, a_offs, cfl, n_pad, r,
                                       False, dtype)
        return jnp.concatenate([pieces[c] for c in sorted(pieces)],
                               axis=1)

    def bwd(fc_in, *rest):
        cfl = [rest[0], rest[1], rest[2], rest[3], fc_in]
        gs = apasn._run_bwd_blocks(spec, caps, a_offs, atot, cfl,
                                   rest[4], ga_off, n_pad, r, False,
                                   dtype)
        return gs

    for packed in ("1", "0"):
        os.environ["LAT_ANG_PACKED"] = packed
        tag = "packed" if packed == "1" else "blocks"
        timeit(f"fwd {tag} caps=({ch},{co})", fwd, cflat[4], cflat[0],
               cflat[1], cflat[2], cflat[3])
        timeit(f"bwd {tag} caps=({ch},{co})", bwd, cflat[4], cflat[0],
               cflat[1], cflat[2], cflat[3], ga)


if __name__ == "__main__":
    main()
