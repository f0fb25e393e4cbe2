"""Mosaic codegen experiments for the radial AEV kernel shapes.

Times stripped kernel variants on [T, cap, W] pair tiles at bench scale to
locate where the cycles go (geometry / recurrence / reductions / masks /
lane padding). Informs ops/aev_pallas.py optimization."""

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


REPS = 10


def timeit(name, f, *args):
    """Amortized inside one lax.scan dispatch (axon tunnel adds ~27 ms
    per jitted call when the host is loaded)."""
    def scanned(p, *rest):
        def body(c, _):
            out = f(c, *rest)
            return c + 1e-30 * jnp.sum(out), None
        c, _ = jax.lax.scan(body, p, length=REPS)
        return c
    g = jax.jit(scanned)
    t0 = time.perf_counter()
    jax.block_until_ready(g(*args))
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(g(*args))
    jax.block_until_ready(g(*args))
    dt = (time.perf_counter() - t0) / (2 * REPS) * 1e3
    print(f"{name}: {dt:.2f} ms (compile {t_c:.1f}s)", flush=True)


def run_variant(name, body, nc, t_rows, cap, w, n_out_cols, extra_in=0):
    """body(px, py, pz, cx, cy, cz, cs, out) over (t_rows, ...) tiles."""
    key = jax.random.PRNGKey(0)
    px, py, pz = [jax.random.uniform(jax.random.fold_in(key, i),
                                     (nc, cap), jnp.float32, 0, 120)
                  for i in range(3)]
    cx, cy, cz = [jax.random.uniform(jax.random.fold_in(key, 10 + i),
                                     (nc, w), jnp.float32, 0, 120)
                  for i in range(3)]
    cs = jax.random.randint(jax.random.fold_in(key, 20), (nc, w), -1, 4)

    def call(*arrs):
        return pl.pallas_call(
            body,
            grid=(nc // t_rows,),
            in_specs=[pl.BlockSpec((t_rows, cap), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec((t_rows, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((t_rows, cap, n_out_cols),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nc, cap, n_out_cols),
                                           jnp.float32),
        )(*arrs)

    timeit(name, jax.jit(call), px, py, pz, cx, cy, cz, cs)


def geom(px, py, pz, cx, cy, cz):
    ax = px[...][:, :, None] - cx[...][:, None, :]
    ay = py[...][:, :, None] - cy[...][:, None, :]
    az = pz[...][:, :, None] - cz[...][:, None, :]
    return jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-12))


def v_geom_only(px, py, pz, cx, cy, cz, cs, out):
    d = geom(px, py, pz, cx, cy, cz)
    out[:, :, 0] = jnp.sum(d, axis=-1)


def v_geom_fc_exp(px, py, pz, cx, cy, cz, cs, out):
    d = geom(px, py, pz, cx, cy, cz)
    fc = jnp.where(d <= 5.1, 0.5 * jnp.cos(d * (math.pi / 5.1)) + 0.5, 0.0)
    x = jnp.minimum(d, 6.1) - 0.8
    t = 0.25 * fc * jnp.exp(-19.7 * x * x)
    b = jnp.exp(2.0 * 19.7 * 0.2867 * x)
    out[:, :, 0] = jnp.sum(t * b, axis=-1)


def v_recurrence16(px, py, pz, cx, cy, cz, cs, out):
    d = geom(px, py, pz, cx, cy, cz)
    fc = jnp.where(d <= 5.1, 0.5 * jnp.cos(d * (math.pi / 5.1)) + 0.5, 0.0)
    x = jnp.minimum(d, 6.1) - 0.8
    t = 0.25 * fc * jnp.exp(-19.7 * x * x)
    b = jnp.exp(2.0 * 19.7 * 0.2867 * x)
    for k in range(16):
        if k:
            t = t * b * 0.5
        out[:, :, k] = jnp.sum(t, axis=-1)


def v_full32(px, py, pz, cx, cy, cz, cs, out):
    d = geom(px, py, pz, cx, cy, cz)
    fc = jnp.where(d <= 5.1, 0.5 * jnp.cos(d * (math.pi / 5.1)) + 0.5, 0.0)
    x = jnp.minimum(d, 6.1) - 0.8
    t = 0.25 * fc * jnp.exp(-19.7 * x * x)
    b = jnp.exp(2.0 * 19.7 * 0.2867 * x)
    csv = cs[...]
    m0 = (csv[:, None, :] == 0).astype(jnp.float32)
    m1 = (csv[:, None, :] == 3).astype(jnp.float32)
    for k in range(16):
        if k:
            t = t * b * 0.5
        out[:, :, 2 * k] = jnp.sum(t * m0, axis=-1)
        out[:, :, 2 * k + 1] = jnp.sum(t * m1, axis=-1)


def v_full32_premask(px, py, pz, cx, cy, cz, cs, out):
    d = geom(px, py, pz, cx, cy, cz)
    fc = jnp.where(d <= 5.1, 0.5 * jnp.cos(d * (math.pi / 5.1)) + 0.5, 0.0)
    x = jnp.minimum(d, 6.1) - 0.8
    t = 0.25 * fc * jnp.exp(-19.7 * x * x)
    b = jnp.exp(2.0 * 19.7 * 0.2867 * x)
    csv = cs[...]
    t0 = t * (csv[:, None, :] == 0)
    t1 = t * (csv[:, None, :] == 3)
    for k in range(16):
        if k:
            bk = b * 0.5
            t0 = t0 * bk
            t1 = t1 * bk
        out[:, :, 2 * k] = jnp.sum(t0, axis=-1)
        out[:, :, 2 * k + 1] = jnp.sum(t1, axis=-1)


def v_full32_accum(px, py, pz, cx, cy, cz, cs, out):
    """Like full32 but with read-modify-write column accumulation (the
    production grouped-kernel output pattern)."""
    d = geom(px, py, pz, cx, cy, cz)
    fc = jnp.where(d <= 5.1, 0.5 * jnp.cos(d * (math.pi / 5.1)) + 0.5, 0.0)
    x = jnp.minimum(d, 6.1) - 0.8
    t = 0.25 * fc * jnp.exp(-19.7 * x * x)
    b = jnp.exp(2.0 * 19.7 * 0.2867 * x)
    csv = cs[...]
    m0 = (csv[:, None, :] == 0).astype(jnp.float32)
    m1 = (csv[:, None, :] == 3).astype(jnp.float32)

    @pl.when(pl.program_id(0) >= 0)
    def _():
        out[...] = jnp.zeros_like(out[...])

    for k in range(16):
        if k:
            t = t * b * 0.5
        out[:, :, 2 * k] = out[:, :, 2 * k] + jnp.sum(t * m0, axis=-1)
        out[:, :, 2 * k + 1] = out[:, :, 2 * k + 1] + jnp.sum(t * m1,
                                                              axis=-1)


def run_grouped(name, nc, t_rows, cap, w, ng):
    """Production-style grid-dim grouping."""
    import functools
    from lammps_ani_tpu.ops import aev_pallas as ap
    from lammps_ani_tpu.models import aev as aevmod
    key = jax.random.PRNGKey(0)
    spec = aevmod.ani2x_aev_spec()
    px, py, pz = [jax.random.uniform(jax.random.fold_in(key, i),
                                     (nc, cap), jnp.float32, 0, 120)
                  for i in range(3)]
    wg = w // ng
    cx, cy, cz = [jax.random.uniform(jax.random.fold_in(key, 10 + i),
                                     (ng, nc, wg), jnp.float32, 0, 120)
                  for i in range(3)]
    cs = jax.random.randint(jax.random.fold_in(key, 20), (ng, nc, wg),
                            -1, 4)
    kern = functools.partial(ap._radial_fwd_kernel, spec=spec, cap=cap,
                             present=(0, 3), n_off=27, n_groups=ng,
                             dtype=jnp.float32)

    def call(px_, *rest):
        py_, pz_, cx_, cy_, cz_, cs_ = rest
        return pl.pallas_call(
            kern,
            grid=(nc // 8, ng),
            in_specs=[ap._center_spec(cap)] * 3 + [ap._group_spec(wg)] * 4,
            out_specs=ap._out3_spec(cap, 112),
            out_shape=jax.ShapeDtypeStruct((nc, cap, 112), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(px_, py_, pz_, cx_, cy_, cz_, cs_)
    timeit(name, call, px, py, pz, cx, cy, cz, cs)


def main():
    nc, t_rows, cap = 6864, 8, 32
    for w in (864,):
        print(f"--- cap={cap} W={w} (slots {nc * cap * w / 1e6:.0f}M) ---",
              flush=True)
        run_variant(f"geom_only w={w}", v_geom_only, nc, t_rows, cap, w, 16)
        run_variant(f"recurrence16 w={w}", v_recurrence16, nc, t_rows, cap,
                    w, 16)
        run_variant(f"full32 w={w}", v_full32, nc, t_rows, cap, w, 32)
        run_variant(f"full32_premask w={w}", v_full32_premask, nc, t_rows,
                    cap, w, 32)
        run_variant(f"full32_accum w={w}", v_full32_accum, nc, t_rows,
                    cap, w, 32)
        for ng in (1, 3):
            run_grouped(f"production grouped ng={ng}", nc, t_rows, cap, w,
                        ng)


if __name__ == "__main__":
    main()
