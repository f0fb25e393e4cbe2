"""Pallas TPU kernels for the AEV fast path (the cuaev equivalent).

This is the flagship kernel work SURVEY.md §7.4 calls for: the reference
invests its entire custom-CUDA budget in fused AEV forward+backward kernels
(/root/reference/src/ani_csrc/CMakeLists.txt:28-31, cuaev); here the same
role is played by Pallas kernels over the cell-roll bin layout
(ops/cell_roll.py), designed around what the TPU is good at — and, just as
important, around what it is bad at:

  * No scatters, sorts, or random gathers anywhere in the per-step path
    (an XLA TPU scatter of 100k rows costs ~40 ms; gathers ~7.5 ns/elem).
    Atom state moves flat<->grid through BIJECTIVE row gathers in both
    directions (RollBins.inv is the inverse slot map, built once per
    rebuild), in the forward AND in the custom backward. Neighbor
    candidates are pre-materialized in XLA as (2*shell+1)^3 static halo
    slices concatenated into [ncells, n_off*cap] planes — layout copies.

  * The kernels see only contiguous, statically-shaped VMEM blocks: a tile
    of T cells' centers [T, cap] against one GROUP of their candidates
    [T, wg]. Groups are a second pallas grid dimension with their own
    block specs — never in-kernel lane slices, whose unaligned offsets
    force Mosaic relayouts worth ~100x the arithmetic (measured).

  * The angular kernel re-compacts each atom's angular neighbors from the
    candidate window EVERY STEP, inside VMEM (rank via one triangular-ones
    matmul, move via lane-layout one-hot reductions) — so the angular
    channel needs no frozen sub-list, no angular skin, and no mirror
    tables; its species-pair blocks then evaluate over [T, cap, A1*A2]
    lanes (the cuaev shared-memory tiling, re-expressed for the VPU).

  * The force backward never scatters: the center-role force is a lane
    reduction on the atom's own rows; the neighbor-role ("wing") force is
    accumulated per offset slab into a per-group buffer that a post-pass
    folds back with n_off static `jnp.roll`s (each roll = two slices +
    concat). This replaces both the reference's reverse MPI communication
    (pair_ani.cpp:461-484) and this repo's mirror tables (ops/nbr_grad).

  * The radial basis uses the uniform-grid recurrence (2 exps for 16
    basis functions, cf. ops/cell_roll._radial_basis); the box cotangent
    (virial path) is computed in-kernel from the wrap-shift tables
    (dE/dh = -sum S^T g, same identity as ops/nbr_grad).

Numerical contract: matches the generic oracle path (models/aev.py) up to
f32 summation order; in interpret mode (CPU tests) the kernels run in f64
and match the oracle to ~1e-12 (tests/test_aev_pallas.py) — the
cuaev-vs-pyaev parity pattern (/root/reference/models/test_models.py:32-35).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cell_roll as crmod


@functools.lru_cache(maxsize=None)
def _shell_offsets(shell: int) -> tuple[tuple[int, int, int], ...]:
    """(2*shell+1)^3 neighbor-cell offsets; shell=2 lets a fine grid (bin
    side >= (cutoff + skin)/2) serve a cutoff twice the bin side."""
    r = range(-shell, shell + 1)
    return tuple((i, j, k) for i in r for j in r for k in r)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


_T_ROWS = 8  # cell-tile height (Mosaic: block dim -2 must be 8-aligned)


# ---------------------------------------------------------------------------
# Layout plumbing (pure XLA, gather-only)
# ---------------------------------------------------------------------------


def _to_grid_rows(inv, x, park):
    """[n, ...] -> [NC, cap, ...] via the inverse slot map (row gather)."""
    pad = jnp.full((1,) + x.shape[1:], park, x.dtype)
    return jnp.concatenate([x, pad], axis=0)[inv]


def _halo_pad(g4, shell=1, row_shift=None):
    """[nx,ny,nz,...] -> [nx+2s,ny+2s,nz+2s,...] periodic halo of width s.

    `row_shift`: optional [3, ...] rows added to wrapped copies (positions
    get -h[axis] on the low halo, +h[axis] on the high halo, baking the
    periodic image shift into the copy)."""
    for axis in range(3):
        n = g4.shape[axis]
        lo = jax.lax.slice_in_dim(g4, n - shell, n, axis=axis)
        hi = jax.lax.slice_in_dim(g4, 0, shell, axis=axis)
        if row_shift is not None:
            lo = lo - row_shift[axis]
            hi = hi + row_shift[axis]
        g4 = jnp.concatenate([lo, g4, hi], axis=axis)
    return g4


def _cand_slices(grid, halo, shell):
    """Static slices of a halo array for every window offset, stacked on a
    new axis 3: [nx, ny, nz, n_off, ...]."""
    nx, ny, nz = grid.ncells
    outs = []
    for ox, oy, oz in _shell_offsets(shell):
        outs.append(halo[shell + ox:shell + ox + nx,
                         shell + oy:shell + oy + ny,
                         shell + oz:shell + oz + nz])
    return jnp.stack(outs, axis=3)


def _candidates(grid, pos4, csp4, h, shell):
    """(cand_pos [NC, n_off*cap, 3], cand_sp [NC, n_off*cap])."""
    cap = grid.cap
    n_off = len(_shell_offsets(shell))
    pos_halo = _halo_pad(pos4, shell,
                         row_shift=h[:, None, None, None, None, :])
    sp_halo = _halo_pad(csp4, shell)
    cp = _cand_slices(grid, pos_halo, shell).reshape(
        grid.total, n_off * cap, 3)
    cs = _cand_slices(grid, sp_halo, shell).reshape(grid.total, n_off * cap)
    return cp, cs


def _wrap_shift_tables(grid, shell, dtype=jnp.float32):
    """[NC, n_off, 3] per-(cell, offset) integer wrap shift S such that the
    candidate position equals owner + S @ h. Computed from iota (no large
    trace-time constants — keeps remote-compile payloads small)."""
    nx, ny, nz = grid.ncells
    ix = jnp.arange(nx, dtype=jnp.int32)
    iy = jnp.arange(ny, dtype=jnp.int32)
    iz = jnp.arange(nz, dtype=jnp.int32)

    def sgn(i, n, off):
        return (-(i + off < 0).astype(jnp.int32)
                + (i + off >= n).astype(jnp.int32))

    outs = []
    for ox, oy, oz in _shell_offsets(shell):
        sx = sgn(ix, nx, ox)[:, None, None]
        sy = sgn(iy, ny, oy)[None, :, None]
        sz = sgn(iz, nz, oz)[None, None, :]
        s = jnp.stack(jnp.broadcast_arrays(sx, sy, sz), axis=-1)
        outs.append(s.reshape(grid.total, 3))
    return jnp.stack(outs, axis=1).astype(dtype)  # [NC, n_off, 3]


def _n_groups(cap: int, n_off: int, bytes_per_slot: int) -> int:
    """Candidate-group count (second pallas grid dim) bounding the
    [T, cap, wg] pair registers to ~8 MB of the 16 MB VMEM."""
    budget = 8_000_000
    side = round(n_off ** (1 / 3))
    for n in (1, side, side * side, n_off):
        if _T_ROWS * cap * ((n_off // n) * cap) * bytes_per_slot <= budget:
            return n
    return n_off


def _pad_rows(x, nc_pad, fill):
    pad = nc_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                   constant_values=fill)


def _grouped(x, n_groups):
    """[NC, n_groups*wg, ...] -> [n_groups, NC, wg, ...] (group axis first
    so every block satisfies Mosaic's trailing-dim constraints)."""
    nc = x.shape[0]
    wg = x.shape[1] // n_groups
    x = x.reshape((nc, n_groups, wg) + x.shape[2:])
    return jnp.moveaxis(x, 1, 0)


def _prep_inputs(grid, inv, csp_grid, pos, h, shell, n_groups):
    """Padded kernel inputs: center planes [NCp, cap], grouped candidate
    planes [ng, NCp, wg], grouped shift tables [ng, NCp, n_o, 3]."""
    nx, ny, nz = grid.ncells
    cap = grid.cap
    nc = grid.total
    pos4g = _to_grid_rows(inv, pos, 1e6)  # [NC, cap, 3]
    pos4 = pos4g.reshape(nx, ny, nz, cap, 3)
    csp4 = csp_grid.reshape(nx, ny, nz, cap)
    cp, cs = _candidates(grid, pos4, csp4, h, shell)

    nc_pad = -(-nc // _T_ROWS) * _T_ROWS
    px = _pad_rows(pos4g[..., 0], nc_pad, 1e6)
    py = _pad_rows(pos4g[..., 1], nc_pad, 1e6)
    pz = _pad_rows(pos4g[..., 2], nc_pad, 1e6)
    cx = _grouped(_pad_rows(cp[..., 0], nc_pad, -1e6), n_groups)
    cy = _grouped(_pad_rows(cp[..., 1], nc_pad, -1e6), n_groups)
    cz = _grouped(_pad_rows(cp[..., 2], nc_pad, -1e6), n_groups)
    csp = _grouped(_pad_rows(cs, nc_pad, -1), n_groups)
    return nc_pad, px, py, pz, cx, cy, cz, csp


def _center_spec(cap):
    return pl.BlockSpec((_T_ROWS, cap), lambda i, g: (i, 0),
                        memory_space=pltpu.VMEM)


def _group_spec(wg):
    return pl.BlockSpec((1, _T_ROWS, wg), lambda i, g: (g, i, 0),
                        memory_space=pltpu.VMEM)


def _out3_spec(a, b):
    return pl.BlockSpec((_T_ROWS, a, b), lambda i, g: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _acc_spec():
    return pl.BlockSpec((8, 128), lambda i, g: (0, 0),
                        memory_space=pltpu.VMEM)


def _pair_geometry(pxv, pyv, pzv, cx, cy, cz, g, wg, cap, rc, self_off,
                   dtype):
    """Pair geometry vs one candidate group: (ax, ay, az, dist, in_cut)
    over [T, cap, wg]. `g` is the (traced) group id for self-exclusion."""
    t_rows = pxv.shape[0]
    cgx, cgy, cgz = cx[...][0], cy[...][0], cz[...][0]  # [T, wg]
    ax = pxv[:, :, None] - cgx[:, None, :]
    ay = pyv[:, :, None] - cgy[:, None, :]
    az = pzv[:, :, None] - cgz[:, None, :]
    d2 = ax * ax + ay * ay + az * az
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    lane = jax.lax.broadcasted_iota(jnp.int32, (t_rows, cap, wg), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (t_rows, cap, wg), 1)
    is_self = (lane + g * wg) == (self_off * cap + sub)
    in_cut = (dist <= rc) & ~is_self
    return ax, ay, az, dist, in_cut


def _radial_consts(spec, dtype):
    """Static scalars of the uniform-grid radial recurrence."""
    shf = np.asarray(spec.shf_r, np.float64)
    eta = float(spec.eta_r[0])
    assert len(spec.eta_r) == 1, "pallas radial kernel assumes single eta_r"
    delta = float(shf[1] - shf[0]) if len(shf) > 1 else 1.0
    assert len(shf) == 1 or np.allclose(np.diff(shf), delta, rtol=1e-6), (
        "pallas radial kernel assumes a uniform shf_r grid")
    steps = [float(np.exp(-eta * delta * delta * (2 * k - 1)))
             for k in range(len(shf))]
    return eta, float(shf[0]), delta, steps


# ---------------------------------------------------------------------------
# Radial kernels
# ---------------------------------------------------------------------------


def _radial_fwd_kernel(px, py, pz, cx, cy, cz, cs, out,
                       *, spec, cap, present, n_off, n_groups, dtype):
    """One (cell-tile, candidate-group) instance: centers [T, cap] vs
    candidates [T, wg]; accumulates into the revisited out block
    [T, cap, S*R] (torchani species-major channel layout)."""
    eta, mu0, delta, steps = _radial_consts(spec, dtype)
    rc = spec.radial_cutoff
    n_shf = len(spec.shf_r)
    wg = n_off * cap // n_groups
    self_off = (n_off - 1) // 2
    g = pl.program_id(1)

    pxv, pyv, pzv = px[...], py[...], pz[...]
    _, _, _, dist, in_cut = _pair_geometry(
        pxv, pyv, pzv, cx, cy, cz, g, wg, cap, rc, self_off, dtype)
    fc = jnp.where(in_cut,
                   0.5 * jnp.cos(dist * (math.pi / rc)) + 0.5,
                   jnp.zeros((), dtype))
    x = jnp.minimum(dist, rc + 1.0) - mu0  # clamp parked ~1e6 slots
    pref = 0.25 * fc
    csg = cs[...][0]
    masks = [(csg[:, None, :] == s).astype(dtype) for s in present]

    @pl.when(g == 0)
    def _():
        out[...] = jnp.zeros_like(out[...])

    # direct exp per shift: the uniform-grid recurrence t0 * B^k
    # UNDERFLOWS in f32 (t0 = exp(-eta x^2) = 0 beyond ~2.9 A) and can
    # never recover, silently zeroing every outer radial shell
    for k in range(n_shf):
        xk = x - k * delta
        t = pref * jnp.exp(-eta * xk * xk)
        for si, s in enumerate(present):
            col = s * n_shf + k
            out[:, :, col] = out[:, :, col] + jnp.sum(t * masks[si],
                                                      axis=-1)


def _radial_bwd_kernel(px, py, pz, cx, cy, cz, cs, ga, sh,
                       fcen, wing, dh, *, spec, cap, present, n_off,
                       n_groups, dtype):
    """Backward for one (tile, group): gamma per directed pair, then
      fcen [T, 3, cap]  = sum_c gamma u   (center role; accumulated
                                           across groups)
      wing [1, T, 3, wg] = -sum_a gamma u (neighbor role, per group)
      dh   [8, 128]     -= S^T (gamma u)  (box cotangent, accumulated
                                           across the whole grid)
    ga: [T, cap, S*R] cotangent of the radial AEV rows.
    sh: [1, T, n_o, 3] wrap-shift table for this (tile, group)."""
    eta, mu0, delta, steps = _radial_consts(spec, dtype)
    rc = spec.radial_cutoff
    n_shf = len(spec.shf_r)
    t_rows = px.shape[0]
    wg = n_off * cap // n_groups
    n_o = n_off // n_groups
    self_off = (n_off - 1) // 2
    g = pl.program_id(1)

    pxv, pyv, pzv = px[...], py[...], pz[...]
    gav = ga[...]
    ax, ay, az, dist, in_cut = _pair_geometry(
        pxv, pyv, pzv, cx, cy, cz, g, wg, cap, rc, self_off, dtype)
    fc = jnp.where(in_cut,
                   0.5 * jnp.cos(dist * (math.pi / rc)) + 0.5,
                   jnp.zeros((), dtype))
    dfc = jnp.where(
        in_cut,
        (-0.5 * math.pi / rc) * jnp.sin(dist * (math.pi / rc)),
        jnp.zeros((), dtype))
    x = jnp.minimum(dist, rc + 1.0) - mu0
    csg = cs[...][0]
    masks = [(csg[:, None, :] == s).astype(dtype) for s in present]

    gamma = jnp.zeros((t_rows, cap, wg), dtype)
    for k in range(n_shf):
        # direct exp per shift (f32-safe; see forward kernel note)
        xk = x - k * delta
        e = jnp.exp(-eta * xk * xk)
        # d basis_k / d dist = 0.25 e_k (dfc - 2 eta (x - k delta) fc)
        db = 0.25 * e * (dfc - (2.0 * eta) * xk * fc)
        for si, s in enumerate(present):
            g_col = gav[:, :, s * n_shf + k]  # [T, cap]
            gamma = gamma + db * (g_col[:, :, None] * masks[si])

    inv_d = 1.0 / dist
    gx = gamma * ax * inv_d
    gy = gamma * ay * inv_d
    gz = gamma * az * inv_d

    @pl.when(g == 0)
    def _():
        fcen[...] = jnp.zeros_like(fcen[...])

    fcen[:, 0, :] = fcen[:, 0, :] + jnp.sum(gx, axis=-1)
    fcen[:, 1, :] = fcen[:, 1, :] + jnp.sum(gy, axis=-1)
    fcen[:, 2, :] = fcen[:, 2, :] + jnp.sum(gz, axis=-1)
    wing[0, :, 0, :] = -jnp.sum(gx, axis=1)
    wing[0, :, 1, :] = -jnp.sum(gy, axis=1)
    wing[0, :, 2, :] = -jnp.sum(gz, axis=1)

    # dh[m, c] = -sum_pairs S_m (gamma u)_c; S constant per offset slab.
    # Lane-expand S via per-offset lane masks (Mosaic can't reshape
    # [T, n_o] -> [T, n_o*cap] lanes directly).
    @pl.when((pl.program_id(0) == 0) & (g == 0))
    def _():
        dh[...] = jnp.zeros_like(dh[...])

    shv = sh[...][0]  # [T, n_o, 3]
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    off_id = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1, wg), 2) // cap
    dh_acc = jnp.zeros((8, 128), dtype)
    for m in range(3):
        s_lane = jnp.zeros((t_rows, 1, wg), dtype)
        for o in range(n_o):
            s_lane = s_lane + jnp.where(
                off_id == o, shv[:, o, m][:, None, None], 0.0)
        for c, g_c in enumerate((gx, gy, gz)):
            v = -jnp.sum(s_lane * g_c)
            dh_acc = dh_acc + jnp.where((rows8 == m) & (cols8 == c),
                                        v, 0.0)
    dh[...] = dh[...] + dh_acc


def _fold_wing(grid, shell, n_groups, fcen, wing, nc):
    """Combine center-role force and rolled-back wing slabs -> [NC,cap,3].

    Wing slab o of cell c belongs to cell c + off_o (mod ncells): roll by
    +off (np.roll semantics: out[i] = in[i - off])."""
    nx, ny, nz = grid.ncells
    cap = grid.cap
    offsets = _shell_offsets(shell)
    dpos = jnp.transpose(fcen[:nc], (0, 2, 1))  # [NC, cap, 3]
    # wing: [ng, NCp, 3, wg] -> [NC, n_off*cap, 3]
    wing = jnp.moveaxis(wing[:, :nc], 0, 1)  # [NC, ng, 3, wg]
    wing = jnp.transpose(wing, (0, 1, 3, 2)).reshape(
        nc, len(offsets) * cap, 3)
    wing = wing.reshape(nx, ny, nz, len(offsets), cap, 3)
    for o, (ox, oy, oz) in enumerate(offsets):
        slab = wing[:, :, :, o]
        dpos = dpos + jnp.roll(slab, (ox, oy, oz),
                               axis=(0, 1, 2)).reshape(nc, cap, 3)
    return dpos


def _radial_fwd_impl(spec, grid, present, interpret, shell, pos, h,
                     inv, csp_grid, cell, slot):
    cap = grid.cap
    dtype = pos.dtype
    nc = grid.total
    n_off = len(_shell_offsets(shell))
    ng = _n_groups(cap, n_off, 40)
    wg = n_off * cap // ng
    nc_pad, px, py, pz, cx, cy, cz, csp = _prep_inputs(
        grid, inv, csp_grid, pos, h, shell, ng)

    srl = spec.num_species * len(spec.shf_r) * len(spec.eta_r)
    kern = functools.partial(_radial_fwd_kernel, spec=spec, cap=cap,
                             present=present, n_off=n_off, n_groups=ng,
                             dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(nc_pad // _T_ROWS, ng),
        in_specs=[_center_spec(cap)] * 3 + [_group_spec(wg)] * 4,
        out_specs=_out3_spec(cap, srl),
        out_shape=jax.ShapeDtypeStruct((nc_pad, cap, srl), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(px, py, pz, cx, cy, cz, csp)
    return out[:nc][cell, slot]


def _radial_bwd_impl(spec, grid, present, interpret, shell, pos, h,
                     inv, csp_grid, cell, slot, ga_flat):
    cap = grid.cap
    dtype = pos.dtype
    nc = grid.total
    n_off = len(_shell_offsets(shell))
    ng = _n_groups(cap, n_off, 56)
    wg = n_off * cap // ng
    nc_pad, px, py, pz, cx, cy, cz, csp = _prep_inputs(
        grid, inv, csp_grid, pos, h, shell, ng)
    ga = _pad_rows(_to_grid_rows(inv, ga_flat, 0.0), nc_pad, 0.0)
    sh = _grouped(_pad_rows(_wrap_shift_tables(grid, shell, dtype)
                            .reshape(grid.total, -1), nc_pad, 0.0), ng)
    n_o = n_off // ng
    sh = sh.reshape(ng, nc_pad, n_o, 3)

    srl = ga_flat.shape[-1]
    kern = functools.partial(_radial_bwd_kernel, spec=spec, cap=cap,
                             present=present, n_off=n_off, n_groups=ng,
                             dtype=dtype)
    fcen, wing, dh_pad = pl.pallas_call(
        kern,
        grid=(nc_pad // _T_ROWS, ng),
        in_specs=[_center_spec(cap)] * 3 + [_group_spec(wg)] * 4
        + [_out3_spec(cap, srl),
           pl.BlockSpec((1, _T_ROWS, n_o, 3), lambda i, g: (g, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[_out3_spec(3, cap),
                   pl.BlockSpec((1, _T_ROWS, 3, wg),
                                lambda i, g: (g, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   _acc_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((nc_pad, 3, cap), dtype),
            jax.ShapeDtypeStruct((ng, nc_pad, 3, wg), dtype),
            jax.ShapeDtypeStruct((8, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(px, py, pz, cx, cy, cz, csp, ga, sh)

    dpos_grid = _fold_wing(grid, shell, ng, fcen, wing, nc)
    dpos = dpos_grid[cell, slot]
    return dpos, dh_pad[:3, :3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _radial_flat_aev(spec, grid, present, interpret, shell, pos, h,
                     inv, csp_grid, cell, slot):
    """[n, S*R] radial AEV (flat atom rows in, flat rows out)."""
    return _radial_fwd_impl(spec, grid, present, interpret, shell,
                            pos, h, inv, csp_grid, cell, slot)


def _radial_flat_fwd(spec, grid, present, interpret, shell, pos, h,
                     inv, csp_grid, cell, slot):
    out = _radial_fwd_impl(spec, grid, present, interpret, shell,
                           pos, h, inv, csp_grid, cell, slot)
    return out, (pos, h, inv, csp_grid, cell, slot)


def _radial_flat_bwd(spec, grid, present, interpret, shell, res, ga):
    pos, h, inv, csp_grid, cell, slot = res
    dpos, dh = _radial_bwd_impl(spec, grid, present, interpret, shell,
                                pos, h, inv, csp_grid, cell, slot, ga)
    return dpos, dh, None, None, None, None


_radial_flat_aev.defvjp(_radial_flat_fwd, _radial_flat_bwd)


def _present_species(spec, species_counts=None):
    if species_counts is not None:
        return tuple(s for s, c in enumerate(species_counts) if c > 0)
    return tuple(range(spec.num_species))


def radial_aev_pallas(aev_spec, grid, bins, pos, box,
                      species_counts=None, interpret=None, shell=1):
    """[n, S*R] radial AEV, drop-in for ops.cell_roll.radial_aev_cellroll.

    Differentiable w.r.t. `pos` and `box.h` (custom VJP: gather-free force
    plus the exact box cotangent). `species_counts` (static) prunes the
    species loop to the system's composition. `shell=2` serves bins half
    the cutoff wide (the shared fine grid)."""
    if interpret is None:
        interpret = _interpret_default()
    present = _present_species(aev_spec, species_counts)
    assert bins.inv is not None, "RollBins.inv required (rebuild bins)"
    return _radial_flat_aev(aev_spec, grid, present, interpret, shell,
                            pos, box.h, bins.inv, bins.species_grid,
                            bins.cell, bins.slot)


# ---------------------------------------------------------------------------
# Angular kernels (shell-1 window, per-step in-kernel compaction)
# ---------------------------------------------------------------------------


def _angular_consts(spec, dtype):
    """Static scalars for the angular kernels (single eta_a / zeta)."""
    assert len(spec.eta_a) == 1 and len(spec.zeta) == 1, (
        "pallas angular kernel assumes single eta_a and zeta")
    shf_a = np.asarray(spec.shf_a, np.float64)
    eta = float(spec.eta_a[0])
    zeta = float(spec.zeta[0])
    delta = float(shf_a[1] - shf_a[0]) if len(shf_a) > 1 else 1.0
    assert len(shf_a) == 1 or np.allclose(np.diff(shf_a), delta,
                                          rtol=1e-6), (
        "pallas angular kernel assumes a uniform shf_a grid")
    steps = [float(np.exp(-eta * delta * delta * (2 * j - 1)))
             for j in range(len(shf_a))]
    cos_m = [float(np.cos(v)) for v in spec.shf_z]
    sin_m = [float(np.sin(v)) for v in spec.shf_z]
    return eta, zeta, float(shf_a[0]), delta, steps, cos_m, sin_m


def _zeta_pow(base, zeta):
    """base ** zeta with integer zeta done by square-and-multiply.

    ANI's zeta is 32: 5 multiplies instead of exp(zeta*log(base)) — two
    VPU transcendentals per pair-lane per shf_z section. base > 0 always
    (|0.95*cos| <= 0.95 bounds it away from 0), so both forms are exact;
    the backward uses (zeta / base) * f1 either way."""
    zi = int(round(zeta))
    if abs(zeta - zi) > 1e-9 or not (1 <= zi <= 128):
        return jnp.exp(zeta * jnp.log(base))
    acc, sq, n = None, base, zi
    while n:
        if n & 1:
            acc = sq if acc is None else acc * sq
        n >>= 1
        if n:
            sq = sq * sq
    return acc


def _pair_blocks(spec, caps):
    """Static species-pair blocks [(s1, s2, A1, A2, ch0, same), ...] in
    torchani triu enumeration order (only blocks with both caps > 0)."""
    asub = spec.angular_sublength
    triu = spec.triu_index()
    blocks = []
    for s1 in range(spec.num_species):
        for s2 in range(s1, spec.num_species):
            a1, a2 = caps[s1], caps[s2]
            if a1 == 0 or a2 == 0:
                continue
            blocks.append((s1, s2, a1, a2, int(triu[s1, s2]) * asub,
                           s1 == s2))
    return blocks


def _compact(spec, caps, present, pxv, pyv, pzv, cx, cy, cz, csv, cap,
             dtype):
    """Per-step in-VMEM compaction of angular neighbors.

    Returns per-species dict s -> dict(u{x,y,z} [T,cap,A], d [T,cap,A],
    fc, dfc, mask, oh [R, A, W]) plus the worst per-species capacity
    deficit (scalar; > 0 means caps truncated real neighbors this step)
    and the raw window geometry."""
    rca = spec.angular_cutoff
    t_rows = pxv.shape[0]
    w = cx.shape[-1]
    self_off = 13  # (0,0,0) in the 27-window
    ax, ay, az, dist, in_cut = _pair_geometry(
        pxv, pyv, pzv, cx, cy, cz, 0, w, cap, rca, self_off, dtype)
    csw = csv[:, None, :]  # [T, 1, W]

    lane_w = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    tri = (lane_w < col_w).astype(dtype)  # rank[c] = sum_{c'<c} mask[c']

    big = jnp.asarray(2.0 * rca + 10.0, dtype)
    out = {}
    deficit = jnp.full((), -(2.0 ** 20), dtype)
    r_rows = t_rows * cap  # merged rows (Mosaic: no batched dots)
    for s in present:
        a_s = caps[s]
        if a_s == 0:
            continue
        m = (in_cut & (csw == s)).astype(dtype)  # [T,cap,W]
        count = jnp.sum(m, axis=-1)  # [T, cap]
        deficit = jnp.maximum(deficit, jnp.max(count) - a_s)
        m2 = m.reshape(r_rows, w)
        rank = jax.lax.dot_general(
            m2, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype)  # [R, W]
        # per-slot masked passes instead of a materialized [R, A, W]
        # one-hot: same flops, 1/A the VMEM (the one-hot form blew the
        # 16 MB scoped-vmem limit in the backward kernel); Mosaic cannot
        # lower batched dots either way.
        sels = [((rank == float(a)) * m2) for a in range(a_s)]

        def compact(x):
            x2 = x.reshape(r_rows, w)
            cols = [jnp.sum(sel * x2, axis=-1)[:, None] for sel in sels]
            return jnp.concatenate(cols, axis=-1).reshape(
                t_rows, cap, a_s)

        cax, cay, caz, cd = (compact(ax), compact(ay), compact(az),
                             compact(dist))
        mask = cd > 1e-6
        d_safe = jnp.where(mask, cd, big)
        inv = 1.0 / d_safe
        fc = jnp.where(mask & (cd <= rca),
                       0.5 * jnp.cos(cd * (math.pi / rca)) + 0.5,
                       jnp.zeros((), dtype))
        dfc = jnp.where(
            mask & (cd <= rca),
            (-0.5 * math.pi / rca) * jnp.sin(cd * (math.pi / rca)),
            jnp.zeros((), dtype))
        out[s] = dict(ux=cax * inv, uy=cay * inv, uz=caz * inv,
                      d=d_safe, fc=fc, dfc=dfc, mask=mask, sels=sels)
    return out, deficit, (ax, ay, az, dist)


def _expand_pair(x1, x2, a1, a2):
    """([..., A1], [..., A2]) -> ([..., A1*A2], [..., A1*A2]).

    Built from slices + broadcasts + concats only — Mosaic cannot merge
    trailing vector dims with a reshape."""
    lead = x1.shape[:-1]
    p1 = jnp.concatenate(
        [jnp.broadcast_to(x1[..., i:i + 1], lead + (a2,))
         for i in range(a1)], axis=-1)
    p2 = jnp.concatenate([x2] * a1, axis=-1)
    return p1, p2


def _arm_reduce(val, a1, a2, arm):
    """[..., a1*a2] -> per-slot sums: arm=1 sums each a2-block
    ([..., a1]); arm=2 sums across blocks ([..., a2])."""
    if arm == 2:
        acc = jnp.zeros(val.shape[:-1] + (a2,), val.dtype)
        for i in range(a1):
            acc = acc + val[..., i * a2:(i + 1) * a2]
        return acc
    pieces = [jnp.sum(val[..., i * a2:(i + 1) * a2], axis=-1)[..., None]
              for i in range(a1)]
    return jnp.concatenate(pieces, axis=-1)


def _angular_pair_terms(spec, consts, sl1, sl2, a1, a2, same, dtype):
    """Shared forward quantities for one species-pair block.

    Returns dict with pair tensors [T,cap,q]: cos geometry, fc-less f2
    factors e_j, fc12, f1_m, plus masks/scales."""
    d1p, d2p = _expand_pair(sl1["d"], sl2["d"], a1, a2)
    fc1p, fc2p = _expand_pair(sl1["fc"], sl2["fc"], a1, a2)
    u1x, u2x = _expand_pair(sl1["ux"], sl2["ux"], a1, a2)
    u1y, u2y = _expand_pair(sl1["uy"], sl2["uy"], a1, a2)
    u1z, u2z = _expand_pair(sl1["uz"], sl2["uz"], a1, a2)
    pt = _pair_terms_core(spec, consts, d1p, d2p, fc1p, fc2p,
                          (u1x, u1y, u1z), (u2x, u2y, u2z), dtype)
    if same:
        tq = d1p.shape
        qi = jax.lax.broadcasted_iota(jnp.int32, tq, len(tq) - 1)
        diag = (qi // a2) == (qi % a2)
        pt["fc12"] = jnp.where(diag, jnp.zeros((), dtype), pt["fc12"])
    return pt


def _pair_terms_core(spec, consts, d1p, d2p, fc1p, fc2p, u1, u2, dtype):
    """Pair-term body on already-expanded pair tensors (any packing:
    the a1*a2 _expand_pair grid or the triangle-packed lanes)."""
    eta, zeta, mu0, delta, steps, cos_m, sin_m = consts
    rca = spec.angular_cutoff
    u1x, u1y, u1z = u1
    u2x, u2y, u2z = u2

    cosq = jnp.clip(u1x * u2x + u1y * u2y + u1z * u2z, -1.0, 1.0)
    c95 = 0.95 * cosq
    sv = jnp.sqrt(1.0 - c95 * c95)

    fc12 = fc1p * fc2p

    rmean = 0.5 * (d1p + d2p)
    x2 = jnp.minimum(rmean, rca + 1.0) - mu0  # clamp: parked slots are big
    # direct exp per shift (the recurrence underflows f32 at far rmean).
    # Flush the f32 denormal band to exact zero so no subnormal operand
    # reaches downstream kernels (the packed MXU dots in particular):
    # exp(-75) = 2.7e-33 contributes nothing at f32 precision. f64 never
    # reaches its flush bound in practice, so f64 oracle parity is
    # bit-identical.
    tiny = jnp.asarray(-75.0 if dtype == jnp.float32 else -700.0, dtype)
    e_j = []
    for j in range(len(spec.shf_a)):
        a = -eta * (x2 - j * delta) ** 2
        e_j.append(jnp.where(a > tiny, jnp.exp(a), jnp.zeros((), dtype)))

    base_m, f1_m = [], []
    for m in range(len(spec.shf_z)):
        base = 0.5 * (1.0 + c95 * cos_m[m] + sv * sin_m[m])
        base_m.append(base)
        f1_m.append(_zeta_pow(base, zeta))
    return dict(d1p=d1p, d2p=d2p, fc1p=fc1p, fc2p=fc2p,
                u1=(u1x, u1y, u1z), u2=(u2x, u2y, u2z),
                cosq=cosq, c95=c95, sv=sv, fc12=fc12, x2=x2,
                e_j=e_j, base_m=base_m, f1_m=f1_m)


def _angular_fwd_kernel(px, py, pz, cx, cy, cz, cs, out, ovf,
                        *, spec, cap, caps, present, dtype):
    """Angular AEV for one tile: per-step in-VMEM compaction, then
    species-pair blocks over [T, cap, A1*A2] lanes.

    out: [T, cap, angular_length]; ovf: [8,128] slot (0,0) holds the max
    per-species capacity deficit (accumulated across the grid)."""
    consts = _angular_consts(spec, dtype)
    nsz = len(spec.shf_z)
    pxv, pyv, pzv = px[...], py[...], pz[...]
    csv = cs[...][0]

    slots, deficit, _ = _compact(spec, caps, present, pxv, pyv, pzv,
                                 cx, cy, cz, csv, cap, dtype)

    out[...] = jnp.zeros_like(out[...])
    for s1, s2, a1, a2, ch0, same in _pair_blocks(spec, caps):
        if s1 not in slots or s2 not in slots:
            continue
        pt = _angular_pair_terms(spec, consts, slots[s1], slots[s2],
                                 a1, a2, same, dtype)
        scale = 1.0 if same else 2.0  # 2*(sum over unordered pairs); same-
        # species blocks hold each unordered pair twice -> 2 * 0.5
        for j, e in enumerate(pt["e_j"]):
            f2 = pt["fc12"] * e
            for m, f1 in enumerate(pt["f1_m"]):
                out[:, :, ch0 + j * nsz + m] = scale * jnp.sum(
                    f2 * f1, axis=-1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf[...] = jnp.full_like(ovf[...], -(2.0 ** 20))

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dmask = (rows8 == 0) & (cols8 == 0)
    ovf[...] = jnp.maximum(ovf[...], jnp.where(dmask, deficit,
                                               -(2.0 ** 20)))


def _angular_bwd_kernel(px, py, pz, cx, cy, cz, cs, ga, sh,
                        fcen, wing, dh, *, spec, cap, caps, present, dtype):
    """Backward of the angular kernel. Recomputes compaction + pair terms,
    chains the AEV cotangent ga [T, cap, angular_length] back to per-slot
    cotangents, decompacts them to the candidate window, and emits
    center/wing forces + the box cotangent exactly like the radial
    backward."""
    consts = _angular_consts(spec, dtype)
    eta, zeta, mu0, delta, steps, cos_m, sin_m = consts
    rca = spec.angular_cutoff
    nsz = len(spec.shf_z)
    t_rows = px.shape[0]
    w = cx.shape[-1]

    pxv, pyv, pzv = px[...], py[...], pz[...]
    csv = cs[...][0]
    gav = ga[...]
    shv = sh[...][0]

    slots, _, geom = _compact(spec, caps, present, pxv, pyv, pzv,
                              cx, cy, cz, csv, cap, dtype)
    ax, ay, az, dist = geom

    # per-slot cotangent accumulators
    gacc = {s: dict(ux=jnp.zeros_like(sl["d"]), uy=jnp.zeros_like(sl["d"]),
                    uz=jnp.zeros_like(sl["d"]), d=jnp.zeros_like(sl["d"]),
                    fc=jnp.zeros_like(sl["d"]))
            for s, sl in slots.items()}

    for s1, s2, a1, a2, ch0, same in _pair_blocks(spec, caps):
        if s1 not in slots or s2 not in slots:
            continue
        sl1, sl2 = slots[s1], slots[s2]
        pt = _angular_pair_terms(spec, consts, sl1, sl2, a1, a2, same,
                                 dtype)
        scale = 1.0 if same else 2.0
        tq = pt["fc12"].shape

        df2 = [jnp.zeros(tq, dtype) for _ in spec.shf_a]  # dE/d f2_j
        dcos = jnp.zeros(tq, dtype)
        for m in range(nsz):
            f1 = pt["f1_m"][m]
            # dE/d f1_m = sum_j g_jm f2_j ; chain to cos via
            # d f1/d cos = zeta f1 / base * 0.5 (cos_m - c95/sv sin_m)*0.95
            df1_m = jnp.zeros(tq, dtype)
            for j in range(len(spec.shf_a)):
                g_jm = gav[:, :, ch0 + j * nsz + m] * scale  # [T, cap]
                f2 = pt["fc12"] * pt["e_j"][j]
                df1_m = df1_m + g_jm[:, :, None] * f2
                df2[j] = df2[j] + g_jm[:, :, None] * f1
            dbase = df1_m * (zeta / pt["base_m"][m]) * f1
            dcos = dcos + dbase * 0.5 * (
                cos_m[m] - pt["c95"] / pt["sv"] * sin_m[m]) * 0.95

        # chain f2_j = fc12 * e_j(rmean)
        drmean = jnp.zeros(tq, dtype)
        dfc12 = jnp.zeros(tq, dtype)
        for j in range(len(spec.shf_a)):
            e = pt["e_j"][j]
            drmean = drmean + df2[j] * pt["fc12"] * e * (
                -2.0 * eta) * (pt["x2"] - j * delta)
            dfc12 = dfc12 + df2[j] * e
        # clamp gradient: rmean beyond rca+1 is parked
        drmean = jnp.where(pt["d1p"] + pt["d2p"] <= 2.0 * (rca + 1.0),
                           drmean, jnp.zeros((), dtype))
        if same:
            qi = jax.lax.broadcasted_iota(jnp.int32, tq, 2)
            diag = (qi // a2) == (qi % a2)
            dfc12 = jnp.where(diag, jnp.zeros((), dtype), dfc12)

        u1x, u1y, u1z = pt["u1"]
        u2x, u2y, u2z = pt["u2"]
        terms = [
            (s1, 1, dict(ux=dcos * u2x, uy=dcos * u2y, uz=dcos * u2z,
                         d=0.5 * drmean, fc=dfc12 * pt["fc2p"])),
            (s2, 2, dict(ux=dcos * u1x, uy=dcos * u1y, uz=dcos * u1z,
                         d=0.5 * drmean, fc=dfc12 * pt["fc1p"])),
        ]
        for s_arm, arm, parts in terms:
            for key, val in parts.items():
                gacc[s_arm][key] = gacc[s_arm][key] + _arm_reduce(
                    val, a1, a2, arm)

    # slot -> candidate cotangents, then forces
    gtx = jnp.zeros((t_rows, cap, w), dtype)
    gty = jnp.zeros((t_rows, cap, w), dtype)
    gtz = jnp.zeros((t_rows, cap, w), dtype)
    for s, sl in slots.items():
        g = gacc[s]
        inv = 1.0 / sl["d"]
        gu_dot_u = (g["ux"] * sl["ux"] + g["uy"] * sl["uy"]
                    + g["uz"] * sl["uz"])
        g_cax = jnp.where(sl["mask"], g["ux"] * inv, jnp.zeros((), dtype))
        g_cay = jnp.where(sl["mask"], g["uy"] * inv, jnp.zeros((), dtype))
        g_caz = jnp.where(sl["mask"], g["uz"] * inv, jnp.zeros((), dtype))
        g_cd = jnp.where(sl["mask"],
                         g["d"] + g["fc"] * sl["dfc"] - gu_dot_u * inv,
                         jnp.zeros((), dtype))
        # decompact [T,cap,A] -> [T,cap,W] (transpose of the compaction):
        # per-slot masked accumulation (memory-lean; see _compact)
        a_s = g_cd.shape[-1]
        r_rows = t_rows * cap
        sels = sl["sels"]

        def decompact(gq):
            g2 = gq.reshape(r_rows, a_s)
            acc = jnp.zeros((r_rows, w), dtype)
            for a in range(a_s):
                acc = acc + sels[a] * g2[:, a:a + 1]
            return acc.reshape(t_rows, cap, w)

        gx_w = decompact(g_cax)
        gy_w = decompact(g_cay)
        gz_w = decompact(g_caz)
        gd_w = decompact(g_cd)
        inv_d = 1.0 / dist
        gtx = gtx + gx_w + gd_w * ax * inv_d
        gty = gty + gy_w + gd_w * ay * inv_d
        gtz = gtz + gz_w + gd_w * az * inv_d

    fcen[:, 0, :] = jnp.sum(gtx, axis=-1)
    fcen[:, 1, :] = jnp.sum(gty, axis=-1)
    fcen[:, 2, :] = jnp.sum(gtz, axis=-1)
    wing[0, :, 0, :] = -jnp.sum(gtx, axis=1)
    wing[0, :, 1, :] = -jnp.sum(gty, axis=1)
    wing[0, :, 2, :] = -jnp.sum(gtz, axis=1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh[...] = jnp.zeros_like(dh[...])

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dh_acc = jnp.zeros((8, 128), dtype)
    off_id = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1, w), 2) // cap
    for m in range(3):
        s_lane = jnp.zeros((t_rows, 1, w), dtype)
        for o in range(27):
            s_lane = s_lane + jnp.where(
                off_id == o, shv[:, o, m][:, None, None], 0.0)
        for c, g_c in enumerate((gtx, gty, gtz)):
            v = -jnp.sum(s_lane * g_c)
            dh_acc = dh_acc + jnp.where((rows8 == m) & (cols8 == c), v, 0.0)
    dh[...] = dh[...] + dh_acc


def _angular_fwd_impl(spec, grid, caps, present, interpret, pos, h,
                      inv, csp_grid, cell, slot):
    cap = grid.cap
    dtype = pos.dtype
    nc = grid.total
    nc_pad, px, py, pz, cx, cy, cz, csp = _prep_inputs(
        grid, inv, csp_grid, pos, h, 1, 1)

    w = 27 * cap
    al = spec.angular_length
    kern = functools.partial(_angular_fwd_kernel, spec=spec, cap=cap,
                             caps=caps, present=present, dtype=dtype)
    out, ovf = pl.pallas_call(
        kern,
        grid=(nc_pad // _T_ROWS, 1),
        in_specs=[_center_spec(cap)] * 3 + [_group_spec(w)] * 4,
        out_specs=[_out3_spec(cap, al), _acc_spec()],
        out_shape=[jax.ShapeDtypeStruct((nc_pad, cap, al), dtype),
                   jax.ShapeDtypeStruct((8, 128), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(px, py, pz, cx, cy, cz, csp)
    return out[:nc][cell, slot], ovf[0, 0]


def _angular_bwd_impl(spec, grid, caps, present, interpret, pos, h,
                      inv, csp_grid, cell, slot, ga_flat):
    cap = grid.cap
    dtype = pos.dtype
    nc = grid.total
    nc_pad, px, py, pz, cx, cy, cz, csp = _prep_inputs(
        grid, inv, csp_grid, pos, h, 1, 1)
    ga = _pad_rows(_to_grid_rows(inv, ga_flat, 0.0), nc_pad, 0.0)
    sh = _grouped(_pad_rows(_wrap_shift_tables(grid, 1, dtype)
                            .reshape(grid.total, -1), nc_pad, 0.0), 1)
    sh = sh.reshape(1, nc_pad, 27, 3)

    w = 27 * cap
    al = ga_flat.shape[-1]
    kern = functools.partial(_angular_bwd_kernel, spec=spec, cap=cap,
                             caps=caps, present=present, dtype=dtype)
    fcen, wing, dh_pad = pl.pallas_call(
        kern,
        grid=(nc_pad // _T_ROWS, 1),
        in_specs=[_center_spec(cap)] * 3 + [_group_spec(w)] * 4
        + [_out3_spec(cap, al),
           pl.BlockSpec((1, _T_ROWS, 27, 3), lambda i, g: (g, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[_out3_spec(3, cap),
                   pl.BlockSpec((1, _T_ROWS, 3, w),
                                lambda i, g: (g, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   _acc_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((nc_pad, 3, cap), dtype),
            jax.ShapeDtypeStruct((1, nc_pad, 3, w), dtype),
            jax.ShapeDtypeStruct((8, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(px, py, pz, cx, cy, cz, csp, ga, sh)

    dpos_grid = _fold_wing(grid, 1, 1, fcen, wing, nc)
    dpos = dpos_grid[cell, slot]
    return dpos, dh_pad[:3, :3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _angular_flat_aev(spec, grid, caps, present, interpret, pos, h,
                      inv, csp_grid, cell, slot):
    """([n, angular_length], deficit), flat atom rows in and out."""
    return _angular_fwd_impl(spec, grid, caps, present, interpret,
                             pos, h, inv, csp_grid, cell, slot)


def _angular_flat_fwd(spec, grid, caps, present, interpret, pos, h,
                      inv, csp_grid, cell, slot):
    out = _angular_fwd_impl(spec, grid, caps, present, interpret,
                            pos, h, inv, csp_grid, cell, slot)
    return out, (pos, h, inv, csp_grid, cell, slot)


def _angular_flat_bwd(spec, grid, caps, present, interpret, res, g):
    ga, _ = g  # deficit output carries no useful cotangent
    pos, h, inv, csp_grid, cell, slot = res
    dpos, dh = _angular_bwd_impl(spec, grid, caps, present, interpret,
                                 pos, h, inv, csp_grid, cell, slot, ga)
    return dpos, dh, None, None, None, None


_angular_flat_aev.defvjp(_angular_flat_fwd, _angular_flat_bwd)


def angular_aev_pallas(aev_spec, grid, bins, pos, box, caps,
                       species_counts=None, interpret=None):
    """([n, angular_length], deficit) — the angular AEV block.

    `caps`: static per-species angular-neighbor capacities (the engine's
    composition-derived spec.angular_caps). `deficit` > 0 means a cap
    truncated real neighbors THIS step (stronger than the rebuild-time
    check of the mirror path); fold it into the overflow channel.

    Differentiable w.r.t. `pos` and `box.h`; the deficit output carries a
    zero cotangent."""
    if interpret is None:
        interpret = _interpret_default()
    present = tuple(s for s in _present_species(aev_spec, species_counts)
                    if caps[s] > 0)
    assert bins.inv is not None, "RollBins.inv required (rebuild bins)"
    return _angular_flat_aev(aev_spec, grid, tuple(caps), present,
                             interpret, pos, box.h, bins.inv,
                             bins.species_grid, bins.cell, bins.slot)
