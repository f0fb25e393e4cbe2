"""Microbenchmark: in-kernel lane compaction strategies on real TPU.

Decides the round-3 AEV kernel design. Mosaic's `tpu.dynamic_gather`
(jnp.take_along_axis) only lowers when the gathered axis fits ONE vreg
tile (axis=1 at width 128; axis=0 at 8 sublanes) — so W-wide window
compaction is expressed as ceil(W/128) chunk gathers + in-chunk selects:

    out[r, k] = x[r, idx[r, k]]  ==  sum_c select(idx//128 == c,
                  take_along_axis(x[:, c*128:(c+1)*128], idx mod 128))

~4*R*W VPU ops instead of the one-hot form's 2*A*R*W — the A/2-fold cut
that makes frozen-assignment compaction (and a near-true-pair radial
basis) affordable.

Timing: the axon tunnel result-caches (executable, args) — every outer
call passes a fresh scalar so the scan body actually re-executes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20
T = 8
_seed = [0]


def timeit(name, f, *args):
    def scanned(p, s, rest):
        def body(c, i):
            out = f(c + 1e-30 * (s + i.astype(c.dtype)), *rest)
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            bump = sum(jnp.sum(l).astype(c.dtype) for l in leaves)
            return c + 1e-30 * bump, None
        c, _ = jax.lax.scan(body, p, jnp.arange(REPS, dtype=jnp.int32))
        return c

    g = jax.jit(lambda p, s, *rest: jnp.sum(scanned(p, s, rest)))

    def call():
        # float() forces a host fetch — block_until_ready on the axon
        # tunnel returns before the remote execution finishes
        _seed[0] += 1
        return float(g(args[0], jnp.float32(_seed[0]), *args[1:]))

    t0 = time.perf_counter()
    call()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    call()
    call()
    dt = (time.perf_counter() - t0) / (2 * REPS) * 1e3
    print(f"{name}: {dt:.3f} ms (compile {t_compile:.1f}s)", flush=True)
    return dt


def chunk_gather(xv, iv, k, w):
    """out[r, :k] = xv[r, iv[r, :k]] via per-vreg gathers; iv is [R, 128]
    (first k lanes meaningful)."""
    r = xv.shape[0]
    n_chunks = (w + 127) // 128
    out = jnp.zeros((r, 128), jnp.float32)
    for c in range(n_chunks):
        lo = c * 128
        chunk = xv[:, lo:lo + 128]
        if chunk.shape[1] < 128:
            chunk = jnp.pad(chunk, ((0, 0), (0, 128 - chunk.shape[1])))
        local = jnp.clip(iv - lo, 0, 127)
        g = jnp.take_along_axis(chunk, local, axis=1)
        out = out + jnp.where((iv >= lo) & (iv < lo + 128), g, 0.0)
    return out[:, :k]


def run(n_tiles, cap, w, k):
    nc = n_tiles * T
    x = jax.random.normal(jax.random.PRNGKey(0), (nc, cap, w), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (nc, cap, 128), 0, w,
                             jnp.int32)
    widx = jax.random.randint(jax.random.PRNGKey(2), (nc, cap, w), 0, 128,
                              jnp.int32)

    def call(kern, shapes, out_w):
        in_specs = [pl.BlockSpec((T,) + s[1:], lambda i: (i,) + (0,) *
                                 (len(s) - 1), memory_space=pltpu.VMEM)
                    for s in shapes]
        return pl.pallas_call(
            kern, grid=(n_tiles,), in_specs=in_specs,
            out_specs=pl.BlockSpec((T, cap, out_w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nc, cap, out_w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    def base_kernel(xr, ir, out):
        out[...] = xr[...] * 2.0 + 1.0

    def gather1_kernel(xr, ir, out):
        xv = xr[...].reshape(T * cap, w)
        iv = ir[...].reshape(T * cap, 128)
        out[...] = chunk_gather(xv, iv, k, w).reshape(T, cap, k)

    def gather3_kernel(xr, ir, out):
        xv = xr[...].reshape(T * cap, w)
        iv = ir[...].reshape(T * cap, 128)
        acc = jnp.zeros((T * cap, k), jnp.float32)
        for c in range(3):
            acc = acc + chunk_gather(xv + float(c), iv, k, w)
        out[...] = acc.reshape(T, cap, k)

    def decompact_kernel(gr, ir, out):
        # [R, k] -> [R, w]: per-chunk gather from a single-vreg source
        gv = gr[...].reshape(T * cap, k)
        iv = ir[...].reshape(T * cap, w)  # target lane -> source slot (<128)
        gpad = jnp.pad(gv, ((0, 0), (0, 128 - k))) if k < 128 else gv
        outs = []
        for c in range((w + 127) // 128):
            lo = c * 128
            wd = min(128, w - lo)
            loc = iv[:, lo:lo + wd]
            if wd < 128:
                loc = jnp.pad(loc, ((0, 0), (0, 128 - wd)))
            g = jnp.take_along_axis(gpad, jnp.clip(loc, 0, 127), axis=1)
            outs.append(g[:, :wd])
        out[...] = jnp.concatenate(outs, axis=1).reshape(T, cap, w)

    def onehot_kernel(xr, ir, out):
        xv = xr[...].reshape(T * cap, w)
        iv = ir[...].reshape(T * cap, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T * cap, w), 1)
        cols = []
        for a in range(k):
            sel = (lane == iv[:, a:a + 1]).astype(jnp.float32)
            cols.append(jnp.sum(sel * xv, axis=-1)[:, None])
        out[...] = jnp.concatenate(cols, axis=-1).reshape(T, cap, k)

    print(f"--- tiles={n_tiles} cap={cap} W={w} K={k} "
          f"({nc * cap * w / 1e6:.0f}M window slots)", flush=True)
    sh_x = (nc, cap, w)
    sh_i = (nc, cap, 128)
    sh_w = (nc, cap, w)
    timeit("base (1 pass)",
           lambda x_, i_: call(base_kernel, [sh_x, sh_i], w)(x_, i_), x, idx)
    try:
        timeit("chunk-gather x1",
               lambda x_, i_: call(gather1_kernel, [sh_x, sh_i], k)(x_, i_),
               x, idx)
        timeit("chunk-gather x3",
               lambda x_, i_: call(gather3_kernel, [sh_x, sh_i], k)(x_, i_),
               x, idx)
        timeit("decompact",
               lambda x_, i_: call(decompact_kernel,
                                   [(nc, cap, k), sh_w], w)(x_, i_),
               x[..., :k].copy(), widx)
    except Exception as e:
        print(f"chunk-gather FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    timeit(f"onehot x{k}",
           lambda x_, i_: call(onehot_kernel, [sh_x, sh_i], k)(x_, i_),
           x, idx)


def main():
    # angular-like: W = 27*cap window, K = compacted slots
    run(n_tiles=1408, cap=20, w=540, k=32)
    # radial-like: coarse grid, K ~ true neighbor count + skin pad
    run(n_tiles=552, cap=28, w=756, k=96)


if __name__ == "__main__":
    main()
