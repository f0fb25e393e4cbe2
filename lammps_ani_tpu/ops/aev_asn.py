"""Assignment-compacted Pallas AEV kernels (the round-3 fast path).

The round-2 kernels (ops/aev_pallas.py) evaluate pair terms on the FULL
candidate window — (2s+1)^3 * cap slots per center, ~20x the true pair
count (docs/DESIGN.md "honest accounting"), because TPUs cannot gather
neighbor data per-element at speed and the window is the only gather-free
candidate structure. This module cuts that padding with a layer the round-2
design lacked: a *frozen per-rebuild lane assignment* compacted through
Mosaic's per-vreg dynamic gather.

  * At rebuild, a Pallas kernel ranks each center's window lanes within
    (cutoff + skin) into per-species compact sections, emitting
      idx [NC, cap, kpad]  — window lane of the k-th kept neighbor
      inv [NC, cap, wpad]  — compact lane of window lane w (dead: kpad-1)
    The rank is one triangular-ones matmul (MXU); idx comes from a binary
    search over the kept-lane cumsum (log2(wpad) per-vreg gathers).

  * Per step, kernels read candidate coordinates through `idx` with
    `jnp.take_along_axis`, which Mosaic lowers to `tpu.dynamic_gather` —
    but ONLY within a single (8, 128) vreg tile (measured: wider shapes
    fail to compile). W-wide windows are therefore gathered per 128-lane
    chunk with in-chunk selects (_gather_lanes): ~4 ops per window slot
    instead of the one-hot form's 2*K ops — the change that moves the
    radial basis and the angular pair blocks from W window lanes to
    ~true-pair compact lanes.

  * The angular channel re-compacts per step WITHIN the exact cutoff from
    the frozen (cutoff + skin) superset — cumsum-bisect + one dynamic
    gather per quantity onto a packed per-species A axis — so angular
    pair blocks stay as tight as the round-2 per-step compaction while
    the heavy window->compact move is frozen. The per-step within-cutoff
    cap check (deficit) is retained.

  * Backward: gamma on compact lanes; center force = lane reduction;
    neighbor ("wing") force decompacted to window lanes via `inv` gathers
    and folded back with the static rolls of ops/aev_pallas._fold_wing;
    the box cotangent contracts wrap shifts gathered per compact lane
    (offset id = idx // cap, one vreg-local gather per axis).

  * The radial kernel optionally emits XTB repulsion energies from the
    same compact geometry (2 exps/pair), unlocking the reference's
    reactive models (ANI-1xnr + RepulsionXTB,
    /root/reference/models/ani_models.py:40-53) on the fast path.

Numerical contract: matches the generic oracle (models/aev.py) to f32/f64
summation order, same as ops/aev_pallas (tests/test_aev_asn.py). Skin
semantics are the mirror path's: assignments are valid while no atom moves
more than skin/2 from its rebuild position (LAMMPS `check yes` handles
violations).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cell_roll as crmod
from .aev_pallas import (
    _T_ROWS,
    _angular_consts,
    _angular_pair_terms,
    _arm_reduce,
    _candidates,
    _center_spec,
    _fold_wing,
    _interpret_default,
    _pad_rows,
    _pair_blocks,
    _pair_terms_core,
    _radial_consts,
    _shell_offsets,
    _to_grid_rows,
    _wrap_shift_tables,
)

_LANE = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Assignment:
    """Frozen per-rebuild window-lane assignment for one AEV channel."""

    idx: jax.Array  # [NC, cap, kpad] int16; dead = wpad
    inv: jax.Array  # [NC, cap, wpad] int16; dead = kpad - 1
    ovf: jax.Array  # [] dtype: max over rows/species of (count - k_s); > 0
    # means a section overflowed at rebuild (regrow sections and retry)
    ovf_sec: jax.Array | None = None  # [num_species] per-species deficit
    # (count - k_s), so regrows can bump exactly the overflowing section


def _sec_offsets(sections):
    """sections ((species, k_s), ...) -> lane offsets + total."""
    offs, off = [], 0
    for s, k in sections:
        offs.append(off)
        off += k
    return tuple(offs), off


def _round_lane(n: int) -> int:
    return -(-n // _LANE) * _LANE


def _gather_lanes_multi(srcs, iv, out_chunks):
    """out_s[r, k] = srcs[s][r, iv[r, k]] with srcs [R, wpad], iv [R, kc*128].

    Mosaic's dynamic_gather works per 128-lane vreg, so the gather runs
    per (output vreg, source vreg) pair with in-chunk selects. Indices
    == wpad (dead) match no chunk and yield 0.

    Several same-shape sources share one index set: the per-chunk-pair
    index temps (shifted/clipped indices + bounds mask) are computed once
    for all sources, and select-accumulate (where(hit, g, acc) — hit is
    disjoint across source chunks) replaces the gather+where+add chain.
    Both cuts matter because Mosaic's stack allocator never reuses slots
    within a kernel body: the 3-axis wing decompact was the largest
    stack term of the backward kernels (measured 19.6 MB at cap 36 /
    wpad 1024 / 8 cell rows before this form; the VMEM scoped limit is
    16 MB)."""
    r, wpad = srcs[0].shape
    outs = [[] for _ in srcs]
    for kc in range(out_chunks):
        ivc = iv[:, kc * _LANE:(kc + 1) * _LANE]
        accs = [jnp.zeros((r, _LANE), s.dtype) for s in srcs]
        for c in range(wpad // _LANE):
            lo = c * _LANE
            loc = jnp.clip(ivc - lo, 0, _LANE - 1)
            hit = (ivc >= lo) & (ivc < lo + _LANE)
            for si, src in enumerate(srcs):
                g = jnp.take_along_axis(src[:, lo:lo + _LANE], loc, axis=1)
                accs[si] = jnp.where(hit, g, accs[si])
        for si, acc in enumerate(accs):
            outs[si].append(acc)
    return tuple(jnp.concatenate(o, axis=1) if len(o) > 1 else o[0]
                 for o in outs)


def _gather_lanes(src, iv, out_chunks):
    return _gather_lanes_multi((src,), iv, out_chunks)[0]


def _bcast_rows(plane, cap):
    """[T, wpad] -> [T*cap, wpad] (each cell's plane shared by its slots)."""
    t, wpad = plane.shape
    return jnp.broadcast_to(plane[:, None, :], (t, cap, wpad)).reshape(
        t * cap, wpad)


def _gather_window_multi(planes, iv, cap, kpad):
    """Gather [T, wpad] window planes by [R, kpad] indices -> [R, kpad]
    each, sharing the index temps across planes."""
    srcs = tuple(_bcast_rows(p, cap) for p in planes)
    return _gather_lanes_multi(srcs, iv, kpad // _LANE)


def _prep_asn(grid, inv_bins, csp_grid, pos, h, wpad):
    """Kernel inputs: center planes [NCp, 1, cap] + lane-padded candidate
    planes [NCp, 1, wpad] (+ center species plane). shell=1 window.

    The singleton middle axis lets blocks carry FEWER than 8 cell rows
    (Mosaic requires the last two block dims be 8/128-divisible OR equal
    to the array dims; (1, X) satisfies the latter for any leading t) —
    capacity regrows shrink t via _t_cells instead of OOMing VMEM."""
    nx, ny, nz = grid.ncells
    cap = grid.cap
    nc = grid.total
    pos4g = _to_grid_rows(inv_bins, pos, 1e6)  # [NC, cap, 3]
    pos4 = pos4g.reshape(nx, ny, nz, cap, 3)
    csp4 = csp_grid.reshape(nx, ny, nz, cap)
    cp, cs = _candidates(grid, pos4, csp4, h, 1)

    nc_pad = -(-nc // _T_ROWS) * _T_ROWS
    w = 27 * cap

    def lanes(x, park):
        return jnp.pad(x, ((0, 0), (0, wpad - w)), constant_values=park)

    def plane(x):
        return x[:, None, :]

    px = plane(_pad_rows(pos4g[..., 0], nc_pad, 1e6))
    py = plane(_pad_rows(pos4g[..., 1], nc_pad, 1e6))
    pz = plane(_pad_rows(pos4g[..., 2], nc_pad, 1e6))
    pcs = plane(_pad_rows(csp_grid, nc_pad, -1))
    cx = plane(_pad_rows(lanes(cp[..., 0], -1e6), nc_pad, -1e6))
    cy = plane(_pad_rows(lanes(cp[..., 1], -1e6), nc_pad, -1e6))
    cz = plane(_pad_rows(lanes(cp[..., 2], -1e6), nc_pad, -1e6))
    csp = plane(_pad_rows(lanes(cs, -1), nc_pad, -1))
    return nc_pad, px, py, pz, pcs, cx, cy, cz, csp


def _ldp(ref):
    """Load a [t, 1, X] plane block as [t, X] (free leading merge)."""
    v = ref[...]
    return v.reshape(v.shape[0], v.shape[-1])


def _win_spec(wpad, t=_T_ROWS):
    return pl.BlockSpec((t, 1, wpad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(width, rows):
    """2-D [rows, width] blocks (rows must be a multiple of 8)."""
    return pl.BlockSpec((rows, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _out1_spec(a, b, t=_T_ROWS):
    return pl.BlockSpec((t, a, b), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _acc1_spec():
    return pl.BlockSpec((8, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _cen_spec(cap, t=_T_ROWS):
    return pl.BlockSpec((t, 1, cap), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _k3_spec(a, b, t=_T_ROWS):
    return pl.BlockSpec((t, a, b), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Assignment build (once per rebuild)
# ---------------------------------------------------------------------------


def _build_inv_kernel(px, py, pz, cx, cy, cz, cs, inv_o, ovf,
                      *, cap, sections, kpad, wpad, keep_r, dtype):
    """Rank window lanes within keep_r into per-species compact sections,
    emitting the inverse map (window lane -> compact lane).

    Processed per 128-lane window chunk with per-species rank carries so
    peak VMEM stays ~2 MB (a whole-window tri matmul with its [wpad,wpad]
    ones matrix and live geometry blew the 16 MB scoped limit)."""
    t_rows = px.shape[0]
    r_rows = t_rows * cap
    offs, k_total = _sec_offsets(sections)

    lane_c = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    tri = (lane_c < col_c).astype(dtype)

    def b3(plane, lo):
        chunk = plane[:, lo:lo + _LANE]
        return jnp.broadcast_to(chunk[:, None, :], (t_rows, cap, _LANE))

    sub3 = jax.lax.broadcasted_iota(jnp.int32, (t_rows, cap, _LANE), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (t_rows, cap, _LANE), 2)
    pxv, pyv, pzv = _ldp(px), _ldp(py), _ldp(pz)
    cxv, cyv, czv, csv = _ldp(cx), _ldp(cy), _ldp(cz), _ldp(cs)

    carries = {s: jnp.zeros((r_rows, 1), dtype) for s, _ in sections}
    inv_chunks = []
    for c in range(wpad // _LANE):
        lo = c * _LANE
        dx = (pxv[:, :, None] - b3(cxv, lo)).reshape(r_rows, _LANE)
        dy = (pyv[:, :, None] - b3(cyv, lo)).reshape(r_rows, _LANE)
        dz = (pzv[:, :, None] - b3(czv, lo)).reshape(r_rows, _LANE)
        d2 = dx * dx + dy * dy + dz * dz
        is_self = ((lane3 + lo) == 13 * cap + sub3).reshape(r_rows, _LANE)
        in_keep = (d2 <= keep_r * keep_r) & ~is_self
        csb = b3(csv, lo).reshape(r_rows, _LANE)
        inv_c = jnp.full((r_rows, _LANE), float(kpad - 1), dtype)
        for (s, k_s), off in zip(sections, offs):
            m = (in_keep & (csb == s)).astype(dtype)
            rank = jax.lax.dot_general(
                m, tri, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype) + carries[s]
            carries[s] = carries[s] + jnp.sum(m, axis=-1)[:, None]
            inv_c = jnp.where(m > 0.5, rank + float(off), inv_c)
        inv_chunks.append(inv_c)

    inv_acc = (jnp.concatenate(inv_chunks, axis=-1)
               if len(inv_chunks) > 1 else inv_chunks[0])
    inv_o[...] = inv_acc.astype(jnp.int32).reshape(t_rows, cap, wpad)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf[...] = jnp.full_like(ovf[...], -(2.0 ** 20))

    # per-SPECIES deficits (row 0, col = species): regrows bump exactly
    # the overflowing section instead of every section
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    plane = jnp.full((8, _LANE), -(2.0 ** 20), dtype)
    for (s, k_s), off in zip(sections, offs):
        plane = jnp.maximum(plane, jnp.where(
            (rows8 == 0) & (cols8 == s),
            jnp.max(carries[s]) - k_s, -(2.0 ** 20)))
    ovf[...] = jnp.maximum(ovf[...], plane)


def _build_idx_kernel(inv_r, idx_o, *, kpad, wpad, sections, dtype):
    """idx (compact lane -> window lane) from the inverse map by binary
    search over per-section cumulative counts.

    Within a species section compact ranks are assigned in window-lane
    order, so the kept-lane indicator's inclusive cumsum cum_s is
    monotone and idx[r, off_s + t] is the unique (kept) w with
    cum_s[r, w] = t + 1. cum_s is one triangular matmul per 128-lane
    chunk (MXU, the inv kernel's rank pattern); the search is
    log2(wpad) per-vreg dynamic gathers per section. This replaces a
    fori_loop one-hot sweep whose VPU work was k_total * wpad selects
    per row — the bulk of the measured 440 ms assignment build at the
    101k-atom bench box (docs/DESIGN.md round-3 accounting).

    The computation is purely row-local, so the grid runs over flat
    [rows, wpad] blocks sized by _idx_row_block — capacity regrows
    (larger cap -> wider windows) shrink the block instead of blowing
    the 16 MB scoped-VMEM limit (Mosaic's stack allocator does not
    reuse slots within a kernel body)."""
    r_rows = inv_r.shape[0]
    invv = inv_r[...]
    invf = invv.astype(dtype)
    offs, _ = _sec_offsets(sections)

    lane_c = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    tri_inc = (lane_c <= col_c).astype(dtype)

    n_bits = max(1, (wpad - 1).bit_length())
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (r_rows, kpad), 1)
    k_f = k_iota.astype(dtype)
    idx = jnp.full((r_rows, kpad), wpad, jnp.int32)
    for (s, k_s), off in zip(sections, offs):
        carry = jnp.zeros((r_rows, 1), dtype)
        cum_chunks = []
        for c in range(wpad // _LANE):
            iv_c = invv[:, c * _LANE:(c + 1) * _LANE]
            ind = ((iv_c >= off) & (iv_c < off + k_s)).astype(dtype)
            cum_chunks.append(jax.lax.dot_general(
                ind, tri_inc, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dtype) + carry)
            carry = carry + jnp.sum(ind, axis=-1)[:, None]
        cum = (jnp.concatenate(cum_chunks, axis=-1)
               if len(cum_chunks) > 1 else cum_chunks[0])
        # bisect_left for the smallest w with cum[w] >= t + 1 (that w is
        # a kept lane: cum increments exactly at kept lanes)
        target = k_f - float(off) + 1.0
        lo = jnp.zeros((r_rows, kpad), jnp.int32)
        hi = jnp.full((r_rows, kpad), wpad - 1, jnp.int32)
        for _ in range(n_bits):
            mid = (lo + hi) >> 1
            pred = _gather_lanes(cum, mid, kpad // _LANE) >= target
            hi = jnp.where(pred, mid, hi)
            lo = jnp.where(pred, lo, mid + 1)
        # verify the found lane carries exactly compact index k: rejects
        # t beyond the row's kept count (search saturates at wpad - 1,
        # a parked dead lane) and out-of-section k lanes
        found = _gather_lanes(invf, hi, kpad // _LANE) == k_f
        in_sec = (k_iota >= off) & (k_iota < off + k_s)
        idx = jnp.where(in_sec & found, hi, idx)
    idx_o[...] = idx


def _idx_row_block(wpad, kpad, n_sections):
    """Rows per idx-build block: bound the kernel stack ~<= 10 MB.

    Empirical per-row stack (f32 bytes): the wpad-wide arrays (inv, invf,
    one live cum per section) plus the kpad-wide bisect temps and
    per-iteration gather results per section. Calibrated against a
    measured 22.2 MB stack at 384 rows, wpad 1408, kpad 256, 2 sections
    (57.7 KB/row; formula: 53 KB/row)."""
    n_bits = max(1, (wpad - 1).bit_length())
    bpr = 4 * wpad * (2 + n_sections) + 4 * kpad * n_sections * (n_bits + 4)
    return max(8, min(256, int((10 * 2 ** 20) // bpr) // 8 * 8))


def _t_cells(cap, wpad):
    """Cell rows per block for the window-structured build/step kernels:
    keep rows*wpad stack temps bounded as capacity regrows widen the
    window (cap 32 -> the historical 8-cell block, proven on hardware;
    cap 36+ -> 4).

    50 B/(row*window lane) was calibrated against the then-worst
    offender (the pre-split angular decompact monolith, 69.6 B/row-lane
    before _gather_lanes_multi; that kernel now sizes itself via
    _t_chain/_t_wing) and pinned so cap 32 keeps t=8 (the default
    capacity, compiled and run on-chip) while cap 36 drops to t=4 — the
    previous 48 B estimate left cap 36 EXACTLY at the threshold
    (8*36*1024*48 == the 13.5 MB bound, and the comparison was strict),
    so a mid-run capacity regrow kept t=8 and died in compile at
    19.58 MB scoped VMEM (hard limit 16 MB)."""
    t = 8
    while t > 1 and t * cap * wpad * 50 >= 13 * 2 ** 20 + 2 ** 19:
        t //= 2
    return t


def _t_env(name, t):
    v = _os.environ.get(name)
    return int(v) if v else t


def _t_chain(cap, kpad, nc_pad):
    """Cell rows per chain/assemble kernel instance (kpad-wide temps
    only: gvx/gvy/gvz + per-chunk stage-2 and dh gather temps + the
    fused path's 3 radial gamma inputs). Calibrated against a measured
    16.25 MB stack for _chain_sum_kernel at t=16, cap 36, kpad 128
    (~55 live [row*cap, kpad] f32 planes; modeled at 60 for headroom)."""
    t = 32
    while t > 1 and (t * cap * kpad * 4 * 60 >= 13 * 2 ** 20
                     or t > nc_pad or nc_pad % t):
        t //= 2
    return _t_env("ASN_T_CHAIN", t)


def _t_rgam(cap, kpad, wpad, nc_pad):
    """Cell rows per radial-gamma kernel instance: the monolith's 50
    B/(row*window lane) bound covered the wpad-wide wing decompact
    temps; without them the stack is the window geometry gathers + the
    16-shf gamma chain (~30 B/row-wlane, calibrated so cap 36 runs t=8
    — the monolith's t=4 doubled instance count and charged ~14 ms/step
    of pure overhead at the bench box)."""
    t = 8
    while t > 1 and (t * cap * wpad * 30 >= 13 * 2 ** 20 + 2 ** 19
                     or t > nc_pad or nc_pad % t):
        t //= 2
    return _t_env("ASN_T_RGAM", t)


def _t_wing(cap, kpad, wpad, nc_pad):
    """Cell rows per wing kernel instance. The streamed form keeps, per
    row: inv [wpad] i32, 3 src [kpad] f32, and per-out-chunk temps that
    Mosaic's no-reuse stack allocator makes live simultaneously across
    all wpad/128 chunks (~5 [128] planes each)."""
    bpr = 4 * (wpad + 3 * kpad + (wpad // _LANE) * 5 * _LANE)
    t = 16
    # t must DIVIDE nc_pad (rounded to 8, not to 16): a non-dividing t
    # truncates the pallas grid and leaves the tail rows' output
    # uninitialized — observed as NaN wing rows at nc_pad = 216
    while t > 1 and (t * cap * bpr >= 13 * 2 ** 20 or t > nc_pad
                     or nc_pad % t):
        t //= 2
    return _t_env("ASN_T_WING", t)


def build_assignment(grid, bins, pos, box, sections, kpad, keep_radius,
                     interpret=None):
    """Assignment over grid's 27-cell window for lanes within keep_radius.

    `sections`: static ((species, k_s), ...) for present species; compact
    lanes [off_s, off_s + k_s) hold species s neighbors ranked by window
    lane order. `kpad`: multiple of 128, sum(k_s) <= kpad - 1 (last lane
    reserved as the dead slot for the inverse map)."""
    if interpret is None:
        interpret = _interpret_default()
    offs, k_total = _sec_offsets(sections)
    assert kpad % _LANE == 0 and k_total <= kpad - 1, (k_total, kpad)
    cap = grid.cap
    nc = grid.total
    dtype = pos.dtype
    wpad = _round_lane(27 * cap)
    nc_pad, px, py, pz, pcs, cx, cy, cz, csp = _prep_asn(
        grid, bins.inv, bins.species_grid, pos, box.h, wpad)
    kern = functools.partial(
        _build_inv_kernel, cap=cap, sections=sections, kpad=kpad,
        wpad=wpad, keep_r=keep_radius, dtype=dtype)
    t_b = _t_cells(cap, wpad)
    inv, ovf = pl.pallas_call(
        kern,
        grid=(nc_pad // t_b,),
        in_specs=[_cen_spec(cap, t_b)] * 3 + [_win_spec(wpad, t_b)] * 4,
        out_specs=[_k3_spec(cap, wpad, t_b), _acc1_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((nc_pad, cap, wpad), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(px, py, pz, cx, cy, cz, csp)
    # idx build is row-local: run it over flat row blocks so its stack
    # stays bounded at any (cap, kpad)
    rb = _idx_row_block(wpad, kpad, len(sections))
    r_tot = nc_pad * cap
    r_pad = -(-r_tot // rb) * rb
    inv_flat = inv.reshape(r_tot, wpad)
    if r_pad != r_tot:
        inv_flat = jnp.pad(inv_flat, ((0, r_pad - r_tot), (0, 0)),
                           constant_values=kpad - 1)
    idx = pl.pallas_call(
        functools.partial(_build_idx_kernel, kpad=kpad,
                          wpad=wpad, sections=sections, dtype=dtype),
        grid=(r_pad // rb,),
        in_specs=[_row_spec(wpad, rb)],
        out_specs=_row_spec(kpad, rb),
        out_shape=jax.ShapeDtypeStruct((r_pad, kpad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(inv_flat)
    idx = idx[:r_tot].reshape(nc_pad, cap, kpad)
    # store both tables as int16: values are lane indices (idx < wpad
    # <= 27*cap + pad, inv < kpad), far inside int16 range; the tables
    # are the dominant frozen HBM residents (inv alone is
    # [NC, cap, 27*cap] — ~400 MB at the 101k bench box in int32)
    assert wpad < 2 ** 15 and kpad < 2 ** 15, (wpad, kpad)
    n_sp = 1 + max(s for s, _ in sections)
    return Assignment(idx=idx[:nc].astype(jnp.int16),
                      inv=inv[:nc].astype(jnp.int16),
                      ovf=jnp.max(ovf[0, :n_sp]),
                      ovf_sec=ovf[0, :n_sp])


# ---------------------------------------------------------------------------
# Shared per-step pieces
# ---------------------------------------------------------------------------


def _compact_geometry(px, py, pz, cx, cy, cz, idxr, cap, kpad, wpad):
    """Gather candidate coords through the assignment; return compact-lane
    geometry (ax, ay, az [R, kpad], dist, valid) with R = T*cap."""
    t_rows = px.shape[0]
    r_rows = t_rows * cap
    # assignment tables live in HBM as int16 (halved footprint — the inv
    # table is the largest frozen resident, ~1 GB at 240k atoms); upcast
    # once at load, all lane arithmetic stays int32
    iv = idxr[...].astype(jnp.int32).reshape(r_rows, kpad)

    def sub_center(plane, g):
        # [T,cap] - [R,kpad]: via the 3-D broadcast form (Mosaic cannot
        # reshape [T,cap] -> [R,1]); leading-dim merges/splits are free
        g3 = g.reshape(t_rows, cap, kpad)
        return (plane[:, :, None] - g3).reshape(r_rows, kpad)

    gcx, gcy, gcz = _gather_window_multi(
        (_ldp(cx), _ldp(cy), _ldp(cz)), iv, cap, kpad)
    ax = sub_center(_ldp(px), gcx)
    ay = sub_center(_ldp(py), gcy)
    az = sub_center(_ldp(pz), gcz)
    valid = iv < wpad
    d2 = ax * ax + ay * ay + az * az
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    dist = jnp.where(valid, dist, 1e6)
    return iv, ax, ay, az, dist, valid


def _mul_rows(x2, row, t_rows, cap):
    """x2 [R, K] * row [T, cap] broadcast per row -> [R, K].

    Mosaic cannot reshape [T, cap] to [R, 1] (lanes -> sublanes); the
    supported route is a leading-dim split, a trailing-None broadcast,
    and a leading-dim merge."""
    k = x2.shape[-1]
    return (x2.reshape(t_rows, cap, k)
            * row[:, :, None]).reshape(t_rows * cap, k)


def _row_sum(x2, t_rows, cap):
    """[R, K] -> [T, cap] lane reduction (via the 3-D split)."""
    return jnp.sum(x2.reshape(t_rows, cap, x2.shape[-1]), axis=-1)


def _sec_masks(sections, r_rows, kpad, dtype):
    """Static per-section lane masks [R, kpad] (f32) from lane iota."""
    offs, _ = _sec_offsets(sections)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, kpad), 1)
    out = {}
    for (s, k_s), off in zip(sections, offs):
        out[s] = ((lane >= off) & (lane < off + k_s)).astype(dtype)
    return out


def _div_const(v, d: int, bound: int):
    """v // d for non-negative v < bound via multiply-shift (exactness
    verified over the full range at trace time): vector integer division
    by a non-power-of-2 constant may not lower to the VPU."""
    if d & (d - 1) == 0:
        return v >> d.bit_length() - 1
    s = 20
    m = (1 << s) // d + 1
    ar = np.arange(bound + 1, dtype=np.int64)
    if not np.array_equal((ar * m) >> s, ar // d):
        return v // d  # magic failed for this (d, bound); rare
    return (v * m) >> s


def _dh_from_compact(sh, iv, cap, kpad, gx, gy, gz, dtype):
    """Box cotangent from compact lanes: dh[m, c] = -sum S_m (gamma u)_c.

    The wrap shift of compact lane k is the shift of its window offset
    id = idx // cap, gathered from the per-cell 27-entry table (one
    vreg-local dynamic gather per axis)."""
    t_rows = sh.shape[0]
    r_rows = gx.shape[0]
    o_k = jnp.clip(_div_const(iv, cap, 27 * cap + _LANE), 0, _LANE - 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dh_acc = jnp.zeros((8, 128), dtype)
    for m in range(3):
        table = jnp.pad(sh[:, :, m], ((0, 0), (0, _LANE - sh.shape[1])))
        table_b = _bcast_rows(table, cap)  # [R, 128]
        pieces = [jnp.take_along_axis(
            table_b, o_k[:, kc * _LANE:(kc + 1) * _LANE], axis=1)
            for kc in range(kpad // _LANE)]
        s_m = (jnp.concatenate(pieces, axis=1) if len(pieces) > 1
               else pieces[0])
        for c, g_c in enumerate((gx, gy, gz)):
            v = -jnp.sum(s_m * g_c)
            dh_acc = dh_acc + jnp.where((rows8 == m) & (cols8 == c), v, 0.0)
    return dh_acc


# ---------------------------------------------------------------------------
# Radial channel (+ optional XTB repulsion side channel)
# ---------------------------------------------------------------------------

_ANGSTROM2BOHR = 1.8897261258369282


def _rep_consts(rep, sections, dtype):
    """Per-section (alpha, zeff) lane constants + center tables."""
    alpha = {s: float(rep.alpha[s]) for s, _ in sections}
    zeff = {s: float(rep.zeff[s]) for s, _ in sections}
    return alpha, zeff


def _rep_params(rep, sections, masks, pcs2, t_rows, cap, dtype):
    """(a_ij, z_ij) [R, kpad]: neighbor species from the static section
    lane masks, center species from the [T, cap] species plane."""
    alpha, zeff = _rep_consts(rep, sections, dtype)
    a_j = sum(masks[s] * alpha[s] for s, _ in sections)
    z_j = sum(masks[s] * zeff[s] for s, _ in sections)
    a_i = sum((pcs2 == s).astype(dtype) * alpha[s] for s, _ in sections)
    z_i = sum((pcs2 == s).astype(dtype) * zeff[s] for s, _ in sections)
    a_ij = jnp.sqrt(jnp.maximum(_mul_rows(a_j, a_i, t_rows, cap), 1e-12))
    z_ij = _mul_rows(z_j, z_i, t_rows, cap)
    return a_ij, z_ij


def _rep_pair(rep, dist, a_ij, z_ij, valid, dtype):
    """Repulsion pair energy (Hartree) + d/d dist, on compact lanes.

    E_pair = z_ij / r_b * exp(-a_ij r_b^kf) * env(r), r_b in bohr
    (models/repulsion.py contract; kf = 1.5, smooth envelope)."""
    rc = rep.cutoff
    in_cut = valid & (dist < rc)
    r_b = dist * _ANGSTROM2BOHR
    safe = jnp.where(in_cut, r_b, 1.0)
    kf = rep.k_f
    r_kf = jnp.exp(kf * jnp.log(safe)) if kf != 1.5 else safe * jnp.sqrt(
        safe)
    core = z_ij / safe * jnp.exp(-a_ij * r_kf)
    # d core / d r_b = core * (-1/r_b - a_ij kf r_b^{kf-1})
    dcore_db = core * (-1.0 / safe - a_ij * kf * r_kf / safe)
    x = dist / rc
    if rep.cutoff_fn == "cosine":
        env = 0.5 * jnp.cos(jnp.pi * x) + 0.5
        denv = -0.5 * jnp.pi / rc * jnp.sin(jnp.pi * x)
    elif rep.cutoff_fn == "none":
        env = jnp.ones_like(x)
        denv = jnp.zeros_like(x)
    else:  # smooth
        x2 = jnp.clip(x * x, 0.0, 1.0 - 1e-6)
        u = 1.0 - x2
        env = jnp.exp(1.0 - 1.0 / u)
        denv = env * (-2.0 * x / (rc * u * u))
    e = jnp.where(in_cut, core * env, 0.0)
    de = jnp.where(in_cut, dcore_db * _ANGSTROM2BOHR * env + core * denv,
                   0.0)
    return 0.5 * e, 0.5 * de  # half per directed pair


def _radial_basis(spec, x, dtype):
    """e_k = exp(-eta (x - k*delta)^2) for the uniform radial shift grid
    via a TWO-ANCHOR recurrence: 3 exps + ~4 muls/shift instead of
    n_shf exps (the ANI-2x grid has 16).

    A single up-recurrence is wrong in f32: e_0 flushes to zero for x
    near the far shifts while the true e_k rises back above the flush
    bound toward the peak. Running it from BOTH anchors and taking the
    elementwise max fixes that: for any k, one of the two paths has all
    its intermediates >= min(anchor, e_k), and for live lanes
    (x in [-0.8, 4.5]) the worst-case anchor exp(-eta (x_mid)^2) ~
    exp(-80) stays f32-normal; a flushed path yields 0 and loses the
    max. Intermediates cannot overflow: max over x of e_{k-1} * B is
    exp(eta delta^2 (2k-1)) ~ e^41. f64 never flushes, so both paths
    agree to rounding there. LAT_EXP_RECUR=0 reverts to direct exps."""
    eta, mu0, delta, steps = _radial_consts(spec, dtype)
    n_shf = len(spec.shf_r)
    if (n_shf < 4 or _os.environ.get("LAT_EXP_RECUR", "1") == "0"):
        return [jnp.exp(-eta * (x - k * delta) ** 2)
                for k in range(n_shf)]
    tiny = jnp.asarray(1e-30 if dtype == jnp.float32 else 0.0, dtype)
    up = [None] * n_shf
    dn = [None] * n_shf
    up[0] = jnp.exp(-eta * x * x)
    b_up = jnp.exp((2.0 * eta * delta) * x)
    for k in range(1, n_shf):
        up[k] = up[k - 1] * b_up * steps[k]
    xl = x - (n_shf - 1) * delta
    dn[n_shf - 1] = jnp.exp(-eta * xl * xl)
    b_dn = jnp.exp((-2.0 * eta * delta) * x)
    for k in range(n_shf - 1, 0, -1):
        dn[k - 1] = dn[k] * b_dn * (1.0 / steps[k])
    return [jnp.where(e > tiny, e, jnp.zeros((), dtype))
            for e in (jnp.maximum(u, d) for u, d in zip(up, dn))]


def _radial_cols_mxu(spec, rep, sections, masks, pcs, dist, valid,
                     t_rows, cap, kpad, compact_cols, n_cols, dtype):
    """Radial (+repulsion) AEV columns [T, cap, n_cols] via one-hot MXU
    dots: each shift's basis row t_k [R, kpad] contracts against a
    static lane->column mask (lane in section si AND column == its
    (si, k) slot) — replacing 2*n_shf+1 VPU lane reductions per row
    with n_shf+1 mask matmuls on the otherwise-idle MXU. The repulsion
    energy rides the LAST column (its own output would need a separate
    block spec; see the round-4 notes on regrown-shape Mosaic rules)."""
    eta, mu0, delta, steps = _radial_consts(spec, dtype)
    rc = spec.radial_cutoff
    n_shf = len(spec.shf_r)
    r_rows = t_rows * cap
    in_cut = valid & (dist <= rc)
    fc = jnp.where(in_cut, 0.5 * jnp.cos(dist * (math.pi / rc)) + 0.5,
                   jnp.zeros((), dtype))
    x = jnp.minimum(dist, rc + 1.0) - mu0
    pref = 0.25 * fc
    offs, _ = _sec_offsets(sections)
    li = jax.lax.broadcasted_iota(jnp.int32, (kpad, n_cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (kpad, n_cols), 1)
    pmin = jnp.asarray(1e-30 if dtype == jnp.float32 else 0.0, dtype)

    e_k = _radial_basis(spec, x, dtype)
    acc = jnp.zeros((r_rows, n_cols), dtype)
    for k in range(n_shf):
        w = None
        for si, ((s, k_s), off) in enumerate(zip(sections, offs)):
            col = (si if compact_cols else s) * n_shf + k
            m = (li >= off) & (li < off + k_s) & (ci == col)
            w = m if w is None else (w | m)
        t = pref * e_k[k]
        t = jnp.where(t > pmin, t, jnp.zeros((), dtype))
        acc = acc + _mask_dot(t, w.astype(dtype), dtype)
    if rep is not None:
        a_ij, z_ij = _rep_params(rep, sections, masks, _ldp(pcs), t_rows,
                                 cap, dtype)
        e, _ = _rep_pair(rep, dist, a_ij, z_ij, valid & (z_ij > 0), dtype)
        e = jnp.where(e > pmin, e, jnp.where(e < -pmin, e,
                                             jnp.zeros((), dtype)))
        wrep = (ci == n_cols - 1).astype(dtype)
        acc = acc + _mask_dot(e, wrep, dtype)
    return acc.reshape(t_rows, cap, n_cols)


def _radial_fwd_asn_kernel(px, py, pz, pcs, cx, cy, cz, idxr, out,
                           *, spec, rep, cap, sections, kpad, wpad,
                           compact_cols, dtype):
    t_rows = px.shape[0]
    r_rows = t_rows * cap

    iv, ax, ay, az, dist, valid = _compact_geometry(
        px, py, pz, cx, cy, cz, idxr, cap, kpad, wpad)
    masks = _sec_masks(sections, r_rows, kpad, dtype)
    out[...] = _radial_cols_mxu(
        spec, rep, sections, masks, pcs, dist, valid, t_rows, cap, kpad,
        compact_cols, out.shape[-1], dtype)


def _radial_gamma_core(spec, rep, sections, masks, pcs, ga, iv, ax, ay,
                       az, dist, valid, t_rows, cap, kpad, compact_cols,
                       dtype):
    """Shared radial-backward body: (gx, gy, gz) [R, kpad] compact-lane
    vector cotangents from the radial (+ repulsion) AEV cotangent."""
    eta, mu0, delta, steps = _radial_consts(spec, dtype)
    rc = spec.radial_cutoff
    n_shf = len(spec.shf_r)
    r_rows = t_rows * cap
    in_cut = valid & (dist <= rc)
    fc = jnp.where(in_cut, 0.5 * jnp.cos(dist * (math.pi / rc)) + 0.5,
                   jnp.zeros((), dtype))
    dfc = jnp.where(in_cut,
                    (-0.5 * math.pi / rc) * jnp.sin(dist * (math.pi / rc)),
                    jnp.zeros((), dtype))
    x = jnp.minimum(dist, rc + 1.0) - mu0
    gav3 = ga[...]  # [T, cap, srl + 1]; last lane = repulsion cotangent

    e_k = _radial_basis(spec, x, dtype)
    gamma = jnp.zeros((r_rows, kpad), dtype)
    for k in range(n_shf):
        xk = x - k * delta
        db = 0.25 * e_k[k] * (dfc - (2.0 * eta) * xk * fc)
        for si, (s, _) in enumerate(sections):
            col = (si if compact_cols else s) * n_shf + k
            gamma = gamma + _mul_rows(db * masks[s],
                                      gav3[:, :, col],
                                      t_rows, cap)

    if rep is not None:
        a_ij, z_ij = _rep_params(rep, sections, masks, _ldp(pcs), t_rows,
                                 cap, dtype)
        _, de = _rep_pair(rep, dist, a_ij, z_ij, valid & (z_ij > 0), dtype)
        gamma = gamma + _mul_rows(de, gav3[:, :, gav3.shape[-1] - 1],
                                  t_rows, cap)

    inv_d = 1.0 / dist
    return gamma * ax * inv_d, gamma * ay * inv_d, gamma * az * inv_d


def _radial_bwd_asn_kernel(px, py, pz, pcs, cx, cy, cz, idxr, ga,
                           sh, gx_o, gy_o, gz_o, fcen, dh,
                           *, spec, rep, cap, sections, kpad, wpad,
                           compact_cols, dtype):
    t_rows = px.shape[0]
    r_rows = t_rows * cap

    iv, ax, ay, az, dist, valid = _compact_geometry(
        px, py, pz, cx, cy, cz, idxr, cap, kpad, wpad)
    masks = _sec_masks(sections, r_rows, kpad, dtype)
    gx, gy, gz = _radial_gamma_core(
        spec, rep, sections, masks, pcs, ga, iv, ax, ay, az, dist, valid,
        t_rows, cap, kpad, compact_cols, dtype)

    # center force here; the wpad-wide wing decompact runs in its own
    # kernel (`_wing_kernel`, shared with the angular channel) — the
    # monolith's wpad stack temps forced t=4 at cap 36 (1024 instances,
    # measured 24.8 ms/step vs 10.9 at cap 32/t=8: instance overhead,
    # not arithmetic)
    gx_o[...] = gx.reshape(t_rows, cap, kpad)
    gy_o[...] = gy.reshape(t_rows, cap, kpad)
    gz_o[...] = gz.reshape(t_rows, cap, kpad)
    fcen[:, 0, :] = _row_sum(gx, t_rows, cap)
    fcen[:, 1, :] = _row_sum(gy, t_rows, cap)
    fcen[:, 2, :] = _row_sum(gz, t_rows, cap)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh[...] = jnp.zeros_like(dh[...])

    dh[...] = dh[...] + _dh_from_compact(sh[...][0], iv, cap, kpad,
                                         gx, gy, gz, dtype)


def _radial_gamma_only_kernel(px, py, pz, pcs, cx, cy, cz, idxr, ga,
                              gx_o, gy_o, gz_o,
                              *, spec, rep, cap, sections, kpad, wpad,
                              compact_cols, dtype):
    """Fused-path radial backward: ONLY the compact-lane vector
    cotangents — center force, dh, and the wing decompact are produced
    once from the SUMMED radial+angular cotangents downstream
    (_chain_sum_kernel + one _wing_kernel), instead of per channel."""
    t_rows = px.shape[0]
    r_rows = t_rows * cap
    iv, ax, ay, az, dist, valid = _compact_geometry(
        px, py, pz, cx, cy, cz, idxr, cap, kpad, wpad)
    masks = _sec_masks(sections, r_rows, kpad, dtype)
    gx, gy, gz = _radial_gamma_core(
        spec, rep, sections, masks, pcs, ga, iv, ax, ay, az, dist, valid,
        t_rows, cap, kpad, compact_cols, dtype)
    gx_o[...] = gx.reshape(t_rows, cap, kpad)
    gy_o[...] = gy.reshape(t_rows, cap, kpad)
    gz_o[...] = gz.reshape(t_rows, cap, kpad)


def _radial_asn_impl(spec, grid, sections, kpad, rep, interpret, n_out,
                     compact_cols, pos, h, inv_bins, csp_grid, cell, slot,
                     aidx):
    cap = grid.cap
    nc = grid.total
    dtype = pos.dtype
    no = n_out if n_out is not None else cell.shape[0]
    wpad = _round_lane(27 * cap)
    nc_pad, px, py, pz, pcs, cx, cy, cz, csp = _prep_asn(
        grid, inv_bins, csp_grid, pos, h, wpad)
    aidx_p = _pad_rows(aidx, nc_pad, wpad)

    n_sp = len(sections) if compact_cols else spec.num_species
    srl = n_sp * len(spec.shf_r) * len(spec.eta_r)
    kern = functools.partial(
        _radial_fwd_asn_kernel, spec=spec, rep=rep, cap=cap,
        sections=sections, kpad=kpad, wpad=wpad,
        compact_cols=compact_cols, dtype=dtype)
    t = _t_cells(cap, wpad)
    out = pl.pallas_call(
        kern,
        grid=(nc_pad // t,),
        in_specs=[_cen_spec(cap, t)] * 4 + [_win_spec(wpad, t)] * 3
        + [_k3_spec(cap, kpad, t)],
        out_specs=_out1_spec(cap, srl + 1, t),
        out_shape=jax.ShapeDtypeStruct((nc_pad, cap, srl + 1), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(px, py, pz, pcs, cx, cy, cz, aidx_p)
    # AEV rows only for the first n_out atoms (the sharded path's locals:
    # ghost centers contribute environment, not energy) — the force
    # backward still covers every binned atom via the full cell/slot
    rows = out[:nc][cell[:no], slot[:no]]
    return rows[:, :srl], rows[:, srl]


def _radial_asn_bwd_impl(spec, grid, sections, kpad, rep, interpret, n_out,
                         compact_cols, pos, h, inv_bins, csp_grid, cell,
                         slot, aidx, ainv, ga_flat, grep_flat):
    cap = grid.cap
    nc = grid.total
    dtype = pos.dtype
    wpad = _round_lane(27 * cap)
    nc_pad, px, py, pz, pcs, cx, cy, cz, csp = _prep_asn(
        grid, inv_bins, csp_grid, pos, h, wpad)
    aidx_p = _pad_rows(aidx, nc_pad, wpad)
    ainv_p = _pad_rows(ainv, nc_pad, kpad - 1)
    # repulsion cotangent rides the last lane of the radial cotangent
    # block (see _radial_fwd_asn_kernel for why it is not its own output)
    gac = jnp.concatenate([ga_flat, grep_flat[:, None]], axis=-1)
    if gac.shape[0] < cell.shape[0]:
        # n_out mode: ghost-center rows carry zero AEV cotangent
        gac = jnp.pad(gac, ((0, cell.shape[0] - gac.shape[0]), (0, 0)))
    ga = _pad_rows(_to_grid_rows(inv_bins, gac, 0.0), nc_pad, 0.0)
    sh = _wrap_shift_tables(grid, 1, dtype)  # [NC, 27, 3]
    sh = _pad_rows(sh.reshape(nc, -1), nc_pad, 0.0).reshape(
        1, nc_pad, 27, 3)

    srl = ga_flat.shape[-1]
    kern = functools.partial(
        _radial_bwd_asn_kernel, spec=spec, rep=rep, cap=cap,
        sections=sections, kpad=kpad, wpad=wpad,
        compact_cols=compact_cols, dtype=dtype)
    t = _t_rgam(cap, kpad, wpad, nc_pad)
    gx, gy, gz, fcen, dh_pad = pl.pallas_call(
        kern,
        grid=(nc_pad // t,),
        in_specs=[_cen_spec(cap, t)] * 4 + [_win_spec(wpad, t)] * 3
        + [_k3_spec(cap, kpad, t),
           _out1_spec(cap, srl + 1, t),
           pl.BlockSpec((1, t, 27, 3), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[_k3_spec(cap, kpad, t)] * 3
        + [_out1_spec(3, cap, t), _acc1_spec()],
        out_shape=[jax.ShapeDtypeStruct((nc_pad, cap, kpad), dtype)] * 3
        + [jax.ShapeDtypeStruct((nc_pad, 3, cap), dtype),
           jax.ShapeDtypeStruct((8, 128), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(px, py, pz, pcs, cx, cy, cz, aidx_p, ga, sh)

    t_w = _t_wing(cap, kpad, wpad, nc_pad)
    kern_w = functools.partial(
        _wing_kernel, cap=cap, kpad=kpad, wpad=wpad, dtype=dtype)
    wing = pl.pallas_call(
        kern_w,
        grid=(nc_pad // t_w,),
        in_specs=[_k3_spec(cap, kpad, t_w)] * 3
        + [_k3_spec(cap, wpad, t_w)],
        out_specs=pl.BlockSpec((1, t_w, 3, wpad),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nc_pad, 3, wpad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gx, gy, gz, ainv_p)

    dpos = _fold_wing_pad(grid, fcen, wing, nc, wpad)[cell, slot]
    return dpos, dh_pad[:3, :3]


def _fold_wing_pad(grid, fcen, wing, nc, wpad):
    """_fold_wing over lane-padded wings (drop the pad lanes first)."""
    w = 27 * grid.cap
    return _fold_wing(grid, 1, 1, fcen, wing[:, :, :, :w], nc)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _radial_asn_flat(spec, grid, sections, kpad, rep, interpret, n_out,
                     compact_cols, pos, h, inv_bins, csp_grid, cell, slot,
                     aidx, ainv):
    return _radial_asn_impl(spec, grid, sections, kpad, rep, interpret,
                            n_out, compact_cols, pos, h, inv_bins,
                            csp_grid, cell, slot, aidx)


def _radial_asn_fwd(spec, grid, sections, kpad, rep, interpret, n_out,
                    compact_cols, pos, h, inv_bins, csp_grid, cell, slot,
                    aidx, ainv):
    out = _radial_asn_impl(spec, grid, sections, kpad, rep, interpret,
                           n_out, compact_cols, pos, h, inv_bins,
                           csp_grid, cell, slot, aidx)
    return out, (pos, h, inv_bins, csp_grid, cell, slot, aidx, ainv)


def _radial_asn_bwd(spec, grid, sections, kpad, rep, interpret, n_out,
                    compact_cols, res, g):
    ga, grep = g
    pos, h, inv_bins, csp_grid, cell, slot, aidx, ainv = res
    dpos, dh = _radial_asn_bwd_impl(
        spec, grid, sections, kpad, rep, interpret, n_out, compact_cols,
        pos, h, inv_bins, csp_grid, cell, slot, aidx, ainv, ga, grep)
    return dpos, dh, None, None, None, None, None, None


_radial_asn_flat.defvjp(_radial_asn_fwd, _radial_asn_bwd)


def radial_aev_asn(aev_spec, grid, bins, asn, pos, box, sections,
                   repulsion=None, interpret=None, n_out=None,
                   compact_cols=False):
    """([n_out, S*R] radial AEV, [n_out] repulsion energies [Hartree]).

    Drop-in for radial_aev_pallas on the assignment path; `sections` is
    the static per-species compact layout used at build_assignment time.
    Differentiable w.r.t. pos and box.h (custom VJP).

    `n_out` (static): emit AEV rows only for the FIRST n_out binned atoms
    — the sharded path's owned atoms (ghosts contribute environment and
    receive forces through dpos, but need no AEV/energy rows).

    `compact_cols` (static): emit only the present species' radial
    sections (packed in `sections` order) instead of the full
    num_species layout with zero columns for absent species; the
    cotangent must arrive in the same compact layout."""
    if interpret is None:
        interpret = _interpret_default()
    kpad = asn.idx.shape[-1]
    return _radial_asn_flat(aev_spec, grid, sections, kpad, repulsion,
                            interpret, n_out, compact_cols, pos, box.h,
                            bins.inv, bins.species_grid, bins.cell,
                            bins.slot, asn.idx, asn.inv)


# ---------------------------------------------------------------------------
# Angular channel (frozen superset + per-step exact re-compaction)
# ---------------------------------------------------------------------------


def _stage2_compact(spec, sections, caps, ax, ay, az, dist, valid,
                    t_rows, cap, kpad, dtype):
    """Per-step within-cutoff compaction on frozen compact lanes.

    Packed-A layout (per-species sections along one <=127-lane axis) is
    produced directly: for each packed slot t of species s, the source
    stage-1 lane is found by binary search on the inclusive in-cutoff
    cumsum (= the exclusive MXU rank + the indicator — no extra matmul),
    then every geometric quantity is ONE per-vreg dynamic gather. This
    replaces the per-slot one-hot selects (a_s * kpad lane-ops per
    quantity per row, the dominant VPU cost of the per-step compaction
    kernel).

    Returns (packed dict of [T, cap, atot] quantities, deficit, rank2)."""
    rca = spec.angular_cutoff
    r_rows = t_rows * cap
    masks = _sec_masks(sections, r_rows, kpad, dtype)
    in_ang = valid & (dist <= rca)

    lane_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, kpad), 0)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, kpad), 1)
    tri = (lane_k < col_k).astype(dtype)

    # per-SPECIES deficits on row 0 of an (8, 128) plane (col = species):
    # run() grows exactly the overflowing caps (+deficit) with no degree
    # re-measure, so a regrow costs one chunk recompile and nothing else
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)
    deficit = jnp.full((8, _LANE), -(2.0 ** 20), dtype)
    # packed stage-2 rank per stage-1 lane (dead: LANE-1 -> zero pad lane
    # of any gather source); offsets follow the packed A-axis layout
    rank2 = jnp.full((r_rows, kpad), _LANE - 1, jnp.int32)
    a_offs, atot = _a_offsets(sections, caps)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (r_rows, _LANE), 1)
    a_f = a_iota.astype(dtype)
    k_of_a = jnp.full((r_rows, _LANE), kpad, jnp.int32)
    n_bits = max(1, (kpad - 1).bit_length())
    for s, _ in sections:
        a_s = caps[s]
        if a_s == 0:
            continue
        a_off = a_offs[s][0]
        m = in_ang.astype(dtype) * masks[s]
        count = jnp.sum(m, axis=-1)
        deficit = jnp.maximum(deficit, jnp.where(
            (rows8 == 0) & (cols8 == s), jnp.max(count) - a_s,
            -(2.0 ** 20)))
        rank = jax.lax.dot_general(
            m, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype)
        rank2 = jnp.where((m > 0.5) & (rank < a_s),
                          rank.astype(jnp.int32) + a_off, rank2)
        cum = rank + m  # inclusive cumsum of the kept-lane indicator
        # bisect_left: smallest stage-1 lane w with cum[w] >= t + 1 (cum
        # steps by 1 exactly at kept lanes, so that w IS the t-th kept)
        target = a_f - float(a_off) + 1.0
        lo = jnp.zeros((r_rows, _LANE), jnp.int32)
        hi = jnp.full((r_rows, _LANE), kpad - 1, jnp.int32)
        for _ in range(n_bits):
            mid = (lo + hi) >> 1
            pred = _gather_lanes(cum, mid, 1) >= target
            hi = jnp.where(pred, mid, hi)
            lo = jnp.where(pred, lo, mid + 1)
        # cum[hi] == target rejects slots beyond the row's kept count
        # (search then saturates below target)
        hit = _gather_lanes(cum, hi, 1) == target
        in_sec = (a_iota >= a_off) & (a_iota < a_off + a_s)
        k_of_a = jnp.where(in_sec & hit, hi, k_of_a)

    live = k_of_a < kpad
    k_clip = jnp.clip(k_of_a, 0, kpad - 1)

    def trim(g):
        g = jnp.where(live, g, jnp.zeros((), dtype))
        return g[:, :atot].reshape(t_rows, cap, atot)

    big = jnp.asarray(2.0 * rca + 10.0, dtype)
    cax, cay, caz = (trim(g) for g in _gather_lanes_multi(
        (ax, ay, az), k_clip, 1))
    cd = jnp.sqrt(jnp.maximum(
        cax * cax + cay * cay + caz * caz, 1e-12))
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
    packed = dict(ux=cax * inv, uy=cay * inv, uz=caz * inv,
                  d=d_safe, fc=fc, dfc=dfc)
    return packed, deficit, rank2

def _a_offsets(sections, caps):
    """Packed per-species offsets along the stage-2 compact A axis."""
    offs, off = {}, 0
    for s, _ in sections:
        if caps[s] == 0:
            continue
        offs[s] = (off, caps[s])
        off += caps[s]
    return offs, off


_COMPACT_KEYS = ("ux", "uy", "uz", "d", "fc", "dfc")


def _compact_asn_kernel(px, py, pz, cx, cy, cz, idxr, *refs,
                        spec, cap, caps, sections, kpad, wpad, dtype):
    """Stage-2 compaction to packed per-species A sections (one small
    kernel: Mosaic's stack allocator never reuses slots inside a kernel
    body, so the angular channel is split into several bounded kernels
    with HBM intermediates instead of one monolith)."""
    out_refs = dict(zip(_COMPACT_KEYS, refs[:-2]))
    rank_o, ovf = refs[-2], refs[-1]
    t_rows = px.shape[0]
    iv, ax, ay, az, dist, valid = _compact_geometry(
        px, py, pz, cx, cy, cz, idxr, cap, kpad, wpad)
    packed, deficit, rank2 = _stage2_compact(
        spec, sections, caps, ax, ay, az, dist, valid, t_rows, cap,
        kpad, dtype)
    for key in _COMPACT_KEYS:
        out_refs[key][...] = packed[key]
    rank_o[...] = rank2.reshape(t_rows, cap, kpad)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf[...] = jnp.full_like(ovf[...], -(2.0 ** 20))

    ovf[...] = jnp.maximum(ovf[...], deficit)


def _step_fused_kernel(px, py, pz, pcs, cx, cy, cz, idxr, *refs,
                       spec, rep, cap, caps, sections, kpad, wpad,
                       compact_cols, dtype):
    """Fused per-step forward: ONE window geometry pass (the compact-lane
    coordinate gathers + distances, ~40% of each channel kernel's work)
    serves BOTH the radial basis (+ repulsion side channel) and the
    angular stage-2 compaction. Both channels read the same frozen
    assignment, so splitting them (round 3) computed identical geometry
    twice per step — measured 8.9 ms (radial fwd) + 7.6 ms (stage-2)
    at the 101k bench box."""
    rad_o = refs[0]
    out_refs = dict(zip(_COMPACT_KEYS, refs[1:7]))
    rank_o, ovf = refs[7], refs[8]
    t_rows = px.shape[0]
    r_rows = t_rows * cap
    iv, ax, ay, az, dist, valid = _compact_geometry(
        px, py, pz, cx, cy, cz, idxr, cap, kpad, wpad)
    masks = _sec_masks(sections, r_rows, kpad, dtype)

    # radial channel (one-hot MXU section sums)
    rad_o[...] = _radial_cols_mxu(
        spec, rep, sections, masks, pcs, dist, valid, t_rows, cap, kpad,
        compact_cols, rad_o.shape[-1], dtype)

    # angular stage-2 compaction
    packed, deficit, rank2 = _stage2_compact(
        spec, sections, caps, ax, ay, az, dist, valid, t_rows, cap,
        kpad, dtype)
    for key in _COMPACT_KEYS:
        out_refs[key][...] = packed[key]
    rank_o[...] = rank2.reshape(t_rows, cap, kpad)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf[...] = jnp.full_like(ovf[...], -(2.0 ** 20))

    ovf[...] = jnp.maximum(ovf[...], deficit)


def _sect(ref3, off, a):
    return ref3[...][:, :, off:off + a]


def _block_slots(refs, off, a):
    vals = dict(zip(_COMPACT_KEYS, (_sect(r, off, a) for r in refs)))
    return vals


def _chunk1(a1, a2):
    """(c1, n_g): arm-1 slots per grid instance and instance count.

    Every pair temp is [rows, c1*a2] and Mosaic pads the lane dim to
    128, so any chunk <= 128 lanes occupies the SAME padded stack —
    filling the vreg is free memory-wise and proportionally faster.
    c1 is the largest chunk with c1*a2 <= 128; a1 that c1 does not
    divide is PADDED up to n_g*c1 with dead lanes (fc = 0), which is
    cheaper than shrinking c1 to a divisor: e.g. the bench box's
    (H, O) block at caps (20, 16) ran c1 = 5 (80/128 lanes live, 4
    instances); padding runs c1 = 8 (128 lanes, 3 instances)."""
    budget = int(_os.environ.get("ASN_CHUNK_LANES", "128"))
    c1 = max(1, min(budget // max(a2, 1), a1))
    n_g = -(-a1 // c1)
    return c1, n_g


def _block_cost(a1, a2, same=False):
    """Padded-lane VPU cost of one species-pair block per row (the tier
    search's work model; mirrors _chunk1's chunking, or the triangle
    packing for same-species blocks when enabled)."""
    # a1 < _LANE (not <=): the tri kernels park dead pair lanes on pad
    # lane _LANE - 1, which must be a DEDICATED pad slot (fc = 0) — at
    # a1 == _LANE it would alias real slot 127 and the forward would sum
    # a spurious scaled (127, 127) self-pair
    if same and a1 < _LANE and _tri_on():
        return _tri_block_cost(a1)
    c1, n_g = _chunk1(a1, a2)
    return n_g * (-(-(c1 * a2) // _LANE) * _LANE)


_ARM_PADS = (0.0, 0.0, 0.0, None, 0.0)  # ux, uy, uz, d (-> big), fc


def _pad_arm1(arm1, a1, c1, n_g, rca, dtype):
    """Lane-pad the 5 arm-1 quantities from a1 to n_g*c1 dead slots."""
    w = n_g * c1
    if w == a1:
        return arm1
    big = 2.0 * rca + 10.0
    return [jnp.pad(x, ((0, 0), (0, w - a1)),
                    constant_values=(big if v is None else v))
            for x, v in zip(arm1, _ARM_PADS)]


def _slots_from(refs, with_dfc=False, lead=False):
    keys = _COMPACT_KEYS if with_dfc else _COMPACT_KEYS[:5]
    vals = ((r[...][0] if lead else r[...]) for r in refs)
    return dict(zip(keys, vals))


def _pair_terms_chunk(spec, sl1, sl2, c1, a2, same, g, dtype):
    """_angular_pair_terms for one arm-1 chunk; the same-species diagonal
    uses the chunk's global slot offset (g * c1)."""
    consts = _angular_consts(spec, dtype)
    pt = _angular_pair_terms(spec, consts, sl1, sl2, c1, a2, False, dtype)
    if same:
        tq = pt["fc12"].shape
        qi = jax.lax.broadcasted_iota(jnp.int32, tq, len(tq) - 1)
        diag = (qi // a2 + g * c1) == (qi % a2)
        pt["fc12"] = jnp.where(diag, jnp.zeros((), dtype), pt["fc12"])
        pt["diag"] = diag
    return pt


def _block_fwd_kernel(*refs, spec, c1, a2, same, dtype):
    """One species-pair block of the angular AEV, one arm-1 chunk per
    grid instance, accumulated into the revisited out block."""
    sl1 = _slots_from(refs[0:5], lead=True)
    sl2 = _slots_from(refs[5:10])
    out = refs[10]
    g = pl.program_id(1)
    pt = _pair_terms_chunk(spec, sl1, sl2, c1, a2, same, g, dtype)
    scale = 1.0 if same else 2.0

    @pl.when(g == 0)
    def _():
        out[...] = jnp.zeros_like(out[...])

    # accumulate the 32 column sums in registers and commit with ONE
    # read-modify-write: per-column `out[:, :, col] +=` forced 32 masked
    # single-lane RMW round trips through the output ref per instance
    cols = []
    for j, e in enumerate(pt["e_j"]):
        f2 = pt["fc12"] * e
        for m, f1 in enumerate(pt["f1_m"]):
            cols.append(jnp.sum(f2 * f1, axis=-1))
    out[...] = out[...] + scale * jnp.stack(cols, axis=-1)


def _place(val, off, atot):
    """[T, cap, a] -> [T, cap, atot] at static lane offset (concat form)."""
    t, c, a = val.shape
    pieces = []
    if off:
        pieces.append(jnp.zeros((t, c, off), val.dtype))
    pieces.append(val)
    if atot - off - a:
        pieces.append(jnp.zeros((t, c, atot - off - a), val.dtype))
    return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else val


def _block_bwd_kernel(*refs, spec, c1, a2, same, dtype):
    """Per-slot cotangents of one species-pair block, one arm-1 chunk per
    grid instance. Outputs: 5 arm-1 quantities written to the instance's
    own chunk slice, 5 arm-2 quantities accumulated across instances."""
    sl1 = _slots_from(refs[0:5], lead=True)
    sl2 = _slots_from(refs[5:10])
    ga = refs[10]
    arm1_o = refs[11:16]
    arm2_o = refs[16:21]
    eta, zeta, mu0, delta, steps, cos_m, sin_m = _angular_consts(spec,
                                                                 dtype)
    rca = spec.angular_cutoff
    nsz = len(spec.shf_z)
    g = pl.program_id(1)
    pt = _pair_terms_chunk(spec, sl1, sl2, c1, a2, same, g, dtype)
    scale = 1.0 if same else 2.0
    tq = pt["fc12"].shape
    gav = ga[...]

    df2 = [jnp.zeros(tq, dtype) for _ in spec.shf_a]
    dcos = jnp.zeros(tq, dtype)
    for m in range(nsz):
        f1 = pt["f1_m"][m]
        df1_m = jnp.zeros(tq, dtype)
        for j in range(len(spec.shf_a)):
            g_jm = gav[..., j * nsz + m] * scale
            f2 = pt["fc12"] * pt["e_j"][j]
            df1_m = df1_m + g_jm[..., None] * f2
            df2[j] = df2[j] + g_jm[..., None] * f1
        dbase = df1_m * (zeta / pt["base_m"][m]) * f1
        dcos = dcos + dbase * 0.5 * (
            cos_m[m] - pt["c95"] / pt["sv"] * sin_m[m]) * 0.95

    drmean = jnp.zeros(tq, dtype)
    dfc12 = jnp.zeros(tq, dtype)
    for j in range(len(spec.shf_a)):
        e = pt["e_j"][j]
        drmean = drmean + df2[j] * pt["fc12"] * e * (
            -2.0 * eta) * (pt["x2"] - j * delta)
        dfc12 = dfc12 + df2[j] * e
    drmean = jnp.where(pt["d1p"] + pt["d2p"] <= 2.0 * (rca + 1.0),
                       drmean, jnp.zeros((), dtype))
    if same:
        dfc12 = jnp.where(pt["diag"], jnp.zeros((), dtype), dfc12)

    u1x, u1y, u1z = pt["u1"]
    u2x, u2y, u2z = pt["u2"]
    arm1 = dict(ux=dcos * u2x, uy=dcos * u2y, uz=dcos * u2z,
                d=0.5 * drmean, fc=dfc12 * pt["fc2p"])
    arm2 = dict(ux=dcos * u1x, uy=dcos * u1y, uz=dcos * u1z,
                d=0.5 * drmean, fc=dfc12 * pt["fc1p"])
    for ref, (key, val) in zip(arm1_o, arm1.items()):
        ref[0] = _arm_reduce(val, c1, a2, 1)

    @pl.when(g == 0)
    def _():
        for ref in arm2_o:
            ref[...] = jnp.zeros_like(ref[...])

    for ref, (key, val) in zip(arm2_o, arm2.items()):
        ref[...] = ref[...] + _arm_reduce(val, c1, a2, 2)


def _tri_on():
    """Triangle-packed same-species pair blocks (LAT_ANG_TRI=0 reverts
    to the full-matrix form for A/B)."""
    return _os.environ.get("LAT_ANG_TRI", "1") != "0"


@functools.lru_cache(maxsize=None)
def _tri_layout(a):
    """Static chunking of the strict-upper-triangle pair lanes of one
    same-species block: q = a*(a-1)/2 unordered pairs in j-major order,
    split into 128-lane chunks (each its own pallas_call — the segment
    structure below is chunk-static, so chunks cannot share one traced
    grid body).

    Returns (n_g, q, segs): segs[g] a tuple of (j, k0, lane0, w) runs —
    chunk lanes [lane0, lane0+w) hold the pairs (j, k0..k0+w-1),
    contiguous because the order is j-major."""
    j_of = np.concatenate([np.full(a - 1 - j, j, np.int32)
                           for j in range(a - 1)])
    k_of = np.concatenate([np.arange(j + 1, a, dtype=np.int32)
                           for j in range(a - 1)])
    q = j_of.size
    n_g = max(1, -(-q // _LANE))
    segs = []
    for g in range(n_g):
        lo, hi = g * _LANE, min((g + 1) * _LANE, q)
        runs = []
        t = lo
        while t < hi:
            j = int(j_of[t])
            end = min(hi, t + (a - int(k_of[t])))
            runs.append((j, int(k_of[t]), t - lo, end - t))
            t = end
        segs.append(tuple(runs))
    return n_g, q, tuple(segs)


def _tri_idx(g, a, q, r):
    """In-kernel [r, 128] arm-slot index maps for triangle chunk g
    (pallas kernels cannot capture array constants, so the j-major
    pair -> (j, k) maps are rebuilt from iota + static scalars: j via
    the a-1 segment-offset compares, k from the closed-form offset
    j*(2a-j-1)/2). Dead lanes (t >= q) index the pad lane 127."""
    t = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1) + g * _LANE
    j = jnp.zeros_like(t)
    for jj in range(1, a - 1):
        j = j + (t >= jj * (2 * a - jj - 1) // 2).astype(jnp.int32)
    k = t - (j * (2 * a - j - 1)) // 2 + j + 1
    valid = t < q
    dead = jnp.full_like(t, _LANE - 1)
    i1 = jnp.where(valid, j, dead)
    i2 = jnp.where(valid, k, dead)
    return (jnp.broadcast_to(i1, (r, _LANE)),
            jnp.broadcast_to(i2, (r, _LANE)))


def _tri_pair_terms(spec, sl, g, a, q, dtype):
    """Gather both pair arms of triangle chunk g from the [r, a] arm
    slots with ONE per-vreg dynamic gather per (quantity, arm): the
    slots are lane-padded to 128 with the parked-slot constants (dead
    pair lanes index the pad lane -> fc = 0 kills their contribution
    exactly, forward and backward), then run the shared pair-term
    body."""
    r = sl["ux"].shape[0]
    big = 2.0 * spec.angular_cutoff + 10.0
    i1, i2 = _tri_idx(g, a, q, r)
    p = {}
    for key, padv in zip(_COMPACT_KEYS[:5], _ARM_PADS):
        v = big if padv is None else padv
        xp = jnp.pad(sl[key], ((0, 0), (0, _LANE - a)),
                     constant_values=v)
        p[key + "1"] = jnp.take_along_axis(xp, i1, axis=1)
        p[key + "2"] = jnp.take_along_axis(xp, i2, axis=1)
    consts = _angular_consts(spec, dtype)
    return _pair_terms_core(
        spec, consts, p["d1"], p["d2"], p["fc1"], p["fc2"],
        (p["ux1"], p["uy1"], p["uz1"]), (p["ux2"], p["uy2"], p["uz2"]),
        dtype)


def _tri_reduce1(val, segs, a, dtype):
    """[r, 128] pair-lane values -> [r, a] arm-1 (j) slot sums: each j's
    pairs are one contiguous chunk run (j-major order)."""
    r = val.shape[0]
    pieces = {}
    for j, k0, lane0, w in segs:
        s = jnp.sum(jax.lax.slice(val, (0, lane0), (r, lane0 + w)),
                    axis=-1)
        pieces[j] = pieces[j] + s if j in pieces else s
    zero = None
    cols = []
    for j in range(a):
        if j in pieces:
            cols.append(pieces[j][:, None])
        else:
            if zero is None:
                zero = jnp.zeros((r, 1), dtype)
            cols.append(zero)
    return jnp.concatenate(cols, axis=-1)


def _tri_reduce2(val, segs, a, dtype):
    """[r, 128] pair-lane values -> [r, a] arm-2 (k) slot sums: run
    (j, k0, lane0, w) lands on slots k0..k0+w-1, a static lane shift."""
    r = val.shape[0]
    acc = jnp.zeros((r, a), dtype)
    for j, k0, lane0, w in segs:
        seg = jax.lax.slice(val, (0, lane0), (r, lane0 + w))
        acc = acc + jnp.pad(seg, ((0, 0), (k0, a - k0 - w)))
    return acc


def _block_fwd_tri_kernel(*refs, spec, g, a, q, dtype):
    """Triangle-packed same-species forward block, one 128-lane pair
    chunk per call: each unordered pair evaluated ONCE at scale 2
    (the full-matrix form evaluates both orders at scale 1 — the terms
    are symmetric, so 2x one order is exact and halves the lane work)."""
    sl = _slots_from(refs[0:5])
    out = refs[5]
    pt = _tri_pair_terms(spec, sl, g, a, q, dtype)
    cols = []
    for j, e in enumerate(pt["e_j"]):
        f2 = pt["fc12"] * e
        for m, f1 in enumerate(pt["f1_m"]):
            cols.append(jnp.sum(f2 * f1, axis=-1))
    out[...] = 2.0 * jnp.stack(cols, axis=-1)


def _block_bwd_tri_kernel(*refs, spec, g, a, q, segs, dtype):
    """Per-slot cotangents of one triangle-packed chunk: both arms'
    pair cotangents reduce into ONE [r, a] output per quantity (slot j
    collects its arm-1 runs, slot k its shifted arm-2 runs)."""
    sl = _slots_from(refs[0:5])
    ga = refs[5]
    arm_o = refs[6:11]
    eta, zeta, mu0, delta, steps, cos_m, sin_m = _angular_consts(spec,
                                                                 dtype)
    rca = spec.angular_cutoff
    nsz = len(spec.shf_z)
    pt = _tri_pair_terms(spec, sl, g, a, q, dtype)
    tq = pt["fc12"].shape
    gav = ga[...]

    df2 = [jnp.zeros(tq, dtype) for _ in spec.shf_a]
    dcos = jnp.zeros(tq, dtype)
    for m in range(nsz):
        f1 = pt["f1_m"][m]
        df1_m = jnp.zeros(tq, dtype)
        for j in range(len(spec.shf_a)):
            g_jm = gav[..., j * nsz + m] * 2.0
            f2 = pt["fc12"] * pt["e_j"][j]
            df1_m = df1_m + g_jm[..., None] * f2
            df2[j] = df2[j] + g_jm[..., None] * f1
        dbase = df1_m * (zeta / pt["base_m"][m]) * f1
        dcos = dcos + dbase * 0.5 * (
            cos_m[m] - pt["c95"] / pt["sv"] * sin_m[m]) * 0.95

    drmean = jnp.zeros(tq, dtype)
    dfc12 = jnp.zeros(tq, dtype)
    for j in range(len(spec.shf_a)):
        e = pt["e_j"][j]
        drmean = drmean + df2[j] * pt["fc12"] * e * (
            -2.0 * eta) * (pt["x2"] - j * delta)
        dfc12 = dfc12 + df2[j] * e
    drmean = jnp.where(pt["d1p"] + pt["d2p"] <= 2.0 * (rca + 1.0),
                       drmean, jnp.zeros((), dtype))

    u1x, u1y, u1z = pt["u1"]
    u2x, u2y, u2z = pt["u2"]
    arm1 = dict(ux=dcos * u2x, uy=dcos * u2y, uz=dcos * u2z,
                d=0.5 * drmean, fc=dfc12 * pt["fc2p"])
    arm2 = dict(ux=dcos * u1x, uy=dcos * u1y, uz=dcos * u1z,
                d=0.5 * drmean, fc=dfc12 * pt["fc1p"])
    for ref, key in zip(arm_o, _COMPACT_KEYS[:5]):
        ref[...] = (_tri_reduce1(arm1[key], segs, a, dtype)
                    + _tri_reduce2(arm2[key], segs, a, dtype))


def _tri_block_cost(a):
    if a < 2:
        return 0
    return -(-(a * (a - 1) // 2) // _LANE) * _LANE


def _r_bwd_tri(r, a, segs):
    """Backward rows per tri chunk: the segment reduces hold one [r,128]
    temp per run per quantity on Mosaic's no-reuse stack; model ~70 base
    planes + 5*(runs+1) against the 15 MB scoped-vmem budget."""
    n_seg = max(len(s) for s in segs)
    planes = 70 + 5 * (n_seg + 1)
    while r > 8 and r * 512 * planes > 15 * 2 ** 20:
        r //= 2
    return r


def _flat2_spec1(a, r):
    """_flat2_spec for the 1-D tri grids (rows only)."""
    return pl.BlockSpec((r, a), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _run_tri_fwd(spec, a, arm, rows_t, r, interpret, dtype):
    """All triangle chunks of one same-species forward block; returns
    [rows_t, asub] (zeros when a < 2: the only pair is the diagonal)."""
    asub = spec.angular_sublength
    if a < 2:
        return jnp.zeros((rows_t, asub), dtype)
    n_g, q, segs = _tri_layout(a)
    blk = None
    for g in range(n_g):
        kern = functools.partial(
            _block_fwd_tri_kernel, spec=spec, g=g, a=a, q=q,
            dtype=dtype)
        b = pl.pallas_call(
            kern,
            grid=(rows_t // r,),
            in_specs=[_flat2_spec1(a, r)] * 5,
            out_specs=_flat2_spec1(asub, r),
            out_shape=jax.ShapeDtypeStruct((rows_t, asub), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*arm)
        blk = b if blk is None else blk + b
    return blk


def _run_tri_bwd(spec, a, arm, ga_blk, rows_t, r, interpret, dtype):
    """All triangle chunks of one same-species backward block; returns
    5 x [rows_t, a] combined-arm cotangent sums (None when a < 2)."""
    asub = spec.angular_sublength
    if a < 2:
        return None
    n_g, q, segs = _tri_layout(a)
    outs = None
    rb = _r_bwd_tri(r, a, segs)
    for g in range(n_g):
        kern = functools.partial(
            _block_bwd_tri_kernel, spec=spec, g=g, a=a, q=q,
            segs=segs[g], dtype=dtype)
        o = pl.pallas_call(
            kern,
            grid=(rows_t // rb,),
            in_specs=[_flat2_spec1(a, rb)] * 5
            + [_flat2_spec1(asub, rb)],
            out_specs=[_flat2_spec1(a, rb)] * 5,
            out_shape=[jax.ShapeDtypeStruct((rows_t, a), dtype)] * 5,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*arm, ga_blk)
        outs = o if outs is None else [x + y for x, y in zip(outs, o)]
    return outs


# ---------------------------------------------------------------------------
# Packed pair blocks (round 5): ALL species-pair blocks' true pairs in one
# static chunked lane layout + one-hot MXU reductions
# ---------------------------------------------------------------------------


def _packed_on():
    """Packed pair blocks (LAT_ANG_PACKED=0 reverts to the per-block
    full-matrix/triangle kernels for A/B)."""
    return _os.environ.get("LAT_ANG_PACKED", "1") != "0"


def _packed_layout(spec, caps, a_offs):
    """Static global pair-lane layout: every present species-pair
    block's TRUE pairs — strict upper triangle for same-species, full
    rectangle for cross-species, each unordered pair exactly once at
    scale 2 — packed consecutively and chunked by 128 lanes.

    This removes the two structural wastes of the per-block kernels:
    the 128-lane floor each block paid separately, and the cross-block
    rectangle that triangle packing couldn't reach (VERDICT r4 #1's
    "cross-species pair-lane packing" lever); with exact per-caps pair
    counts, tier caps can shrink to the true degree distribution.

    Returns (blocks, q_total, n_chunks) with blocks =
    [(s1, s2, ch0, off1, off2, a1, a2, same, base)] in _pair_blocks
    order; base = the block's first global pair index."""
    blocks = []
    base = 0
    for s1, s2, a1, a2, ch0, same in _pair_blocks(spec, caps):
        if s1 not in a_offs or s2 not in a_offs:
            continue
        q_b = a1 * (a1 - 1) // 2 if same else a1 * a2
        if q_b == 0:
            continue
        blocks.append((s1, s2, ch0, a_offs[s1][0], a_offs[s2][0],
                       a1, a2, same, base))
        base += q_b
    if not blocks:
        return None
    return tuple(blocks), base, -(-base // _LANE)


def _packed_cost(spec, caps, a_offs):
    """Padded pair lanes per row under the packed layout (tier-search
    work model)."""
    lay = _packed_layout(spec, caps, a_offs)
    return 0 if lay is None else lay[2] * _LANE


def _packed_maps(blocks, q_total, g, shape, dim):
    """Per-lane (arm-1 slot, arm-2 slot, output column base) maps for
    chunk `g` (traced), on a `shape`-shaped iota along `dim`.

    Closed forms only (pallas kernels cannot capture array constants):
    same-species j from the triangle segment-offset compares + k from
    j*(2a-j-1)/2; cross-species j = t // a2 (constant divisor). Dead
    lanes (t >= q_total) park on pad lane _LANE - 1 (fc = 0 there kills
    their contribution exactly) and output column 0."""
    t = jax.lax.broadcasted_iota(jnp.int32, shape, dim) + g * _LANE
    i1 = jnp.full(shape, _LANE - 1, jnp.int32)
    i2 = jnp.full(shape, _LANE - 1, jnp.int32)
    col0 = jnp.zeros(shape, jnp.int32)
    asub_i = 0
    for bi, (s1, s2, ch0, off1, off2, a1, a2, same, base) in enumerate(
            blocks):
        q_b = a1 * (a1 - 1) // 2 if same else a1 * a2
        tt = t - base
        inb = (tt >= 0) & (tt < q_b)
        if same:
            j = jnp.zeros(shape, jnp.int32)
            for jj in range(1, a1 - 1):
                j = j + (tt >= jj * (2 * a1 - jj - 1) // 2).astype(
                    jnp.int32)
            # j*(2a-j-1) is even; //2 lowers to a shift. A general
            # constant divisor may not (signed non-power-of-2 vector
            # division), hence the compare form for the cross blocks
            k = tt - (j * (2 * a1 - j - 1)) // 2 + j + 1
        else:
            j = jnp.zeros(shape, jnp.int32)
            for jj in range(1, a1):
                j = j + (tt >= jj * a2).astype(jnp.int32)
            k = tt - j * a2
        i1 = jnp.where(inb, off1 + j, i1)
        i2 = jnp.where(inb, (off1 if same else off2) + k, i2)
        col0 = jnp.where(inb, bi, col0)
    valid = t < q_total
    i1 = jnp.where(valid, i1, _LANE - 1)
    i2 = jnp.where(valid, i2, _LANE - 1)
    return i1, i2, col0, valid


# one-hot/membership mask dots: fp32 contract precision (Mosaic supports
# only DEFAULT=bf16 and HIGHEST=fp32 in-kernel; bf16 would round the
# VALUE side to 8 mantissa bits)
_DOT_HI = dict(precision=jax.lax.Precision.HIGHEST)


def _mask_dot(x, w, dtype):
    """x @ w for 0/1 mask weights (exact in bf16), full f32 accuracy.

    f32 path: manual bf16x3 split of x, one DEFAULT (single-pass bf16)
    dot per piece — each piece is bf16-exact so the pass is lossless,
    and the 0/1 mask side needs no split at all, which makes three
    single passes reproduce the full-f32 product at ~1/3 the cost of
    Mosaic's fp32 contract mode (6-ish emulation passes; measured
    ~8.4 ms vs ~0.8 ms per 32 [256,128]x[128,96] dots). Split pieces
    are flushed so no subnormal reaches the MXU. Other dtypes (f64
    oracle/interpret): one HIGHEST dot, bit-stable."""
    if x.dtype != jnp.float32:
        return jax.lax.dot(x, w, preferred_element_type=x.dtype,
                           **_DOT_HI)
    acc = None
    r = x
    for i in range(3):
        hi = r.astype(jnp.bfloat16).astype(jnp.float32)
        d = jax.lax.dot(hi, w, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
        acc = d if acc is None else acc + d
        if i < 2:
            r = r - hi
            r = jnp.where(jnp.abs(r) > 1e-36, r, 0.0)
    return acc


def _packed_gather_arms(spec, refs, blocks, q_total, g, dtype):
    """Gather both arms of chunk g from the full [r, atot] compact rows
    (one per-vreg dynamic gather per quantity per arm) and run the
    shared pair-term body. Returns (pt, i1, i2, col0)."""
    r = refs[0].shape[0]
    big = 2.0 * spec.angular_cutoff + 10.0
    i1, i2, col0, valid = _packed_maps(blocks, q_total, g, (r, _LANE), 1)
    p = {}
    for ref, key, padv in zip(refs, _COMPACT_KEYS[:5], _ARM_PADS):
        v = big if padv is None else padv
        x = ref[...]
        xp = jnp.pad(x, ((0, 0), (0, _LANE - x.shape[1])),
                     constant_values=v)
        p[key + "1"] = jnp.take_along_axis(xp, i1, axis=1)
        p[key + "2"] = jnp.take_along_axis(xp, i2, axis=1)
    consts = _angular_consts(spec, dtype)
    pt = _pair_terms_core(
        spec, consts, p["d1"], p["d2"], p["fc1"], p["fc2"],
        (p["ux1"], p["uy1"], p["uz1"]), (p["ux2"], p["uy2"], p["uz2"]),
        dtype)
    return pt, i1, i2, col0


def _packed_fwd_kernel(*refs, spec, blocks, q_total, ncols, dtype):
    """Forward over packed pair chunks: grid = (row tiles, chunks); the
    32 (shf_a, shf_z) column sums of every block land in one [r, ncols]
    output through one-hot MXU dots (the VPU log-shuffle lane reductions
    were the forward's top cost; the MXU is idle here)."""
    sl = refs[0:5]
    out = refs[5]
    g = pl.program_id(1)
    pt, i1, i2, col0 = _packed_gather_arms(spec, sl, blocks, q_total, g,
                                           dtype)
    nsz = len(spec.shf_z)
    r = sl[0].shape[0]
    # the weight masks need the per-lane column base on SUBLANES: rebuild
    # the map in [_LANE, ncols] orientation (a [r, 128] row extract +
    # [:, None] would be a Mosaic lane->sublane relayout — measured as a
    # ~1000x kernel cliff)
    _, _, col0s, _ = _packed_maps(blocks, q_total, g, (_LANE, ncols), 0)
    cbase = col0s * (len(spec.shf_a) * nsz)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_LANE, ncols), 1)

    @pl.when(g == 0)
    def _():
        out[...] = jnp.zeros_like(out[...])

    # flush small products before they reach the MXU: keeps every bf16
    # split term of _mask_dot normal (no subnormal operands) at zero
    # accuracy cost — the dropped terms are < 1e-30 of an O(1) column sum
    pmin = jnp.asarray(1e-30 if dtype == jnp.float32 else 0.0, dtype)
    acc = jnp.zeros((r, ncols), dtype)
    for j, e in enumerate(pt["e_j"]):
        f2 = pt["fc12"] * e
        for m, f1 in enumerate(pt["f1_m"]):
            w = (ci == cbase + (j * nsz + m)).astype(dtype)
            c = f2 * f1
            c = jnp.where(c > pmin, c, jnp.zeros((), dtype))
            acc = acc + _mask_dot(c, w, dtype)
    out[...] = out[...] + 2.0 * acc


def _packed_bwd_kernel(*refs, spec, blocks, q_total, ncols, atot, dtype):
    """Backward over packed pair chunks: per-lane cotangent columns come
    in by one-hot MXU dots (gav @ W), and both arms' per-slot sums leave
    by membership MXU dots ([r, 128] pair values @ [128, atot] slot
    masks) — no strided VPU reduces, no per-block output merging."""
    sl = refs[0:5]
    ga = refs[5]
    outs = refs[6:11]
    g = pl.program_id(1)
    eta, zeta, mu0, delta, steps, cos_m, sin_m = _angular_consts(spec,
                                                                 dtype)
    rca = spec.angular_cutoff
    nsz = len(spec.shf_z)
    pt, i1, i2, col0 = _packed_gather_arms(spec, sl, blocks, q_total, g,
                                           dtype)
    r = sl[0].shape[0]
    gav = ga[...]
    colb = col0[0] * (len(spec.shf_a) * nsz)  # [128]
    ri = jax.lax.broadcasted_iota(jnp.int32, (ncols, _LANE), 0)
    tq = pt["fc12"].shape

    df2 = [jnp.zeros(tq, dtype) for _ in spec.shf_a]
    dcos = jnp.zeros(tq, dtype)
    for m in range(nsz):
        f1 = pt["f1_m"][m]
        df1_m = jnp.zeros(tq, dtype)
        for j in range(len(spec.shf_a)):
            wt = (ri == (colb + (j * nsz + m))[None, :]).astype(dtype)
            g_jm = _mask_dot(gav, wt, dtype) * 2.0
            f2 = pt["fc12"] * pt["e_j"][j]
            df1_m = df1_m + g_jm * f2
            df2[j] = df2[j] + g_jm * f1
        dbase = df1_m * (zeta / pt["base_m"][m]) * f1
        dcos = dcos + dbase * 0.5 * (
            cos_m[m] - pt["c95"] / pt["sv"] * sin_m[m]) * 0.95

    drmean = jnp.zeros(tq, dtype)
    dfc12 = jnp.zeros(tq, dtype)
    for j in range(len(spec.shf_a)):
        e = pt["e_j"][j]
        drmean = drmean + df2[j] * pt["fc12"] * e * (
            -2.0 * eta) * (pt["x2"] - j * delta)
        dfc12 = dfc12 + df2[j] * e
    drmean = jnp.where(pt["d1p"] + pt["d2p"] <= 2.0 * (rca + 1.0),
                       drmean, jnp.zeros((), dtype))

    u1x, u1y, u1z = pt["u1"]
    u2x, u2y, u2z = pt["u2"]
    arm1 = dict(ux=dcos * u2x, uy=dcos * u2y, uz=dcos * u2z,
                d=0.5 * drmean, fc=dfc12 * pt["fc2p"])
    arm2 = dict(ux=dcos * u1x, uy=dcos * u1y, uz=dcos * u1z,
                d=0.5 * drmean, fc=dfc12 * pt["fc1p"])

    # membership masks [128, atot] from the slot maps (sublane-oriented
    # rebuild of the same closed forms; pad lanes map to no slot)
    i1s, i2s, _, _ = _packed_maps(blocks, q_total, g, (_LANE, atot), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (_LANE, atot), 1)
    m1 = (i1s == si).astype(dtype)
    m2 = (i2s == si).astype(dtype)

    @pl.when(g == 0)
    def _():
        for ref in outs:
            ref[...] = jnp.zeros_like(ref[...])

    for ref, key in zip(outs, _COMPACT_KEYS[:5]):
        ref[...] = ref[...] + (_mask_dot(arm1[key], m1, dtype)
                               + _mask_dot(arm2[key], m2, dtype))


def _r_packed(r, ncols, bwd):
    """Row tile for the packed kernels against the ~15 MB scoped-vmem
    budget (Mosaic's stack allocator never reuses slots: the backward
    holds ~95 live [r, 128] planes + the [r, ncols] cotangent rows)."""
    planes = (95 + ncols // 16) if bwd else (55 + ncols // 16)
    while r > 8 and r * 512 * planes > 14 * 2 ** 20:
        r //= 2
    return r


def _run_packed_fwd(spec, caps_t, a_offs, cfl_t, rows_t, r, interpret,
                    dtype):
    """All pair blocks of one tier through the packed forward; returns
    {channel offset: [rows_t, asub]} like _run_fwd_blocks."""
    asub = spec.angular_sublength
    lay = _packed_layout(spec, caps_t, a_offs)
    if lay is None:
        return {}
    blocks, q_total, n_chunks = lay
    ncols = len(blocks) * asub
    atot = cfl_t[0].shape[1]
    rp = _r_packed(r, ncols, bwd=False)
    kern = functools.partial(
        _packed_fwd_kernel, spec=spec, blocks=blocks, q_total=q_total,
        ncols=ncols, dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(rows_t // rp, n_chunks),
        in_specs=[_flat2_spec(atot, rp)] * 5,
        out_specs=_flat2_spec(ncols, rp),
        out_shape=jax.ShapeDtypeStruct((rows_t, ncols), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*cfl_t)
    return {b[2]: jax.lax.slice(out, (0, i * asub),
                                (rows_t, (i + 1) * asub))
            for i, b in enumerate(blocks)}


def _run_packed_bwd(spec, caps_t, a_offs, atot, cfl_t, ga_t, ga_off,
                    rows_t, r, interpret, dtype):
    """All pair blocks of one tier through the packed backward; returns
    the 5 per-slot cotangent sums [rows_t, atot] like _run_bwd_blocks.
    `ga_t` columns are reordered to the packed blocks' order first (the
    kernel's column-base map assumes block-major asub runs)."""
    asub = spec.angular_sublength
    lay = _packed_layout(spec, caps_t, a_offs)
    if lay is None:
        return None
    blocks, q_total, n_chunks = lay
    ncols = len(blocks) * asub
    cols = [jax.lax.slice(ga_t, (0, ga_off[b[2]]),
                          (rows_t, ga_off[b[2]] + asub)) for b in blocks]
    ga_p = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    rp = _r_packed(r, ncols, bwd=True)
    kern = functools.partial(
        _packed_bwd_kernel, spec=spec, blocks=blocks, q_total=q_total,
        ncols=ncols, atot=atot, dtype=dtype)
    outs = pl.pallas_call(
        kern,
        grid=(rows_t // rp, n_chunks),
        in_specs=[_flat2_spec(atot, rp)] * 5 + [_flat2_spec(ncols, rp)],
        out_specs=[_flat2_spec(atot, rp)] * 5,
        out_shape=[jax.ShapeDtypeStruct((rows_t, atot), dtype)] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*cfl_t, ga_p)
    return list(outs)


def _chain_to_stage1(spec, compact_refs, g_refs, rank2, r_rows, t_rows,
                     cap, kpad, atot, dtype):
    """Per-slot cotangents -> stage-1 compact lanes: chain the packed-A
    slot cotangents into vector cotangents, then one rank-indexed vreg
    gather per quantity. Returns (gtx, gty, gtz) [r_rows, kpad]."""
    cux, cuy, cuz, cd, cfc, cdfc = compact_refs
    gux, guy, guz, gd, gfc = g_refs
    uxv, uyv, uzv, dv, fcv, dfcv = (r[...] for r in
                                    (cux, cuy, cuz, cd, cfc, cdfc))
    mask = dv < spec.angular_cutoff + 5.0
    inv_d = jnp.where(mask, 1.0 / dv, 0.0)
    gu_dot_u = (gux[...] * uxv + guy[...] * uyv + guz[...] * uzv)
    g_cd = jnp.where(mask,
                     gd[...] + gfc[...] * dfcv - gu_dot_u * inv_d,
                     jnp.zeros((), dtype))
    gvx = jnp.where(mask, gux[...] * inv_d, 0.0) + g_cd * uxv
    gvy = jnp.where(mask, guy[...] * inv_d, 0.0) + g_cd * uyv
    gvz = jnp.where(mask, guz[...] * inv_d, 0.0) + g_cd * uzv

    # stage-2 decompact: stage-1 lane k's cotangent = g_vec[rank2[k]]
    # (one vreg-local dynamic gather; dead lanes hit the zero pad lane)
    def pack128(v3):
        v2 = v3.reshape(r_rows, atot)
        return jnp.pad(v2, ((0, 0), (0, _LANE - atot)))

    r_clip = jnp.clip(rank2, 0, _LANE - 1)
    live = rank2 < atot
    chunks = {0: [], 1: [], 2: []}
    for kc in range(kpad // _LANE):
        sl_ = slice(kc * _LANE, (kc + 1) * _LANE)
        for ci, src in enumerate((gvx, gvy, gvz)):
            g = jnp.take_along_axis(pack128(src), r_clip[:, sl_], axis=1)
            chunks[ci].append(jnp.where(live[:, sl_], g, 0.0))
    cat = lambda ps: (jnp.concatenate(ps, axis=1) if len(ps) > 1
                      else ps[0])
    return cat(chunks[0]), cat(chunks[1]), cat(chunks[2])


def _decompact_chain_kernel(rank_r, idxr, cux, cuy, cuz, cd, cfc,
                            cdfc, gux, guy, guz, gd, gfc, sh,
                            gtx_o, gty_o, gtz_o, fcen, dh,
                            *, spec, cap, caps, sections, kpad, atot,
                            dtype):
    """Per-slot cotangents -> stage-1 lanes (one rank-indexed vreg gather
    per quantity), center force + box cotangent. kpad-wide only — the
    wpad-wide wing decompact runs in its own kernel (`_wing_kernel`) so
    BOTH get much larger row blocks than the old monolith, whose wpad
    stack temps capped it at 4 cells/instance (1024 instances at the
    bench box, ~25 ms: the largest single kernel in the step trace)."""
    t_rows = rank_r.shape[0]
    r_rows = t_rows * cap
    rank2 = rank_r[...].astype(jnp.int32).reshape(r_rows, kpad)
    iv = idxr[...].astype(jnp.int32).reshape(r_rows, kpad)
    gtx, gty, gtz = _chain_to_stage1(
        spec, (cux, cuy, cuz, cd, cfc, cdfc), (gux, guy, guz, gd, gfc),
        rank2, r_rows, t_rows, cap, kpad, atot, dtype)
    gtx_o[...] = gtx.reshape(t_rows, cap, kpad)
    gty_o[...] = gty.reshape(t_rows, cap, kpad)
    gtz_o[...] = gtz.reshape(t_rows, cap, kpad)

    fcen[:, 0, :] = _row_sum(gtx, t_rows, cap)
    fcen[:, 1, :] = _row_sum(gty, t_rows, cap)
    fcen[:, 2, :] = _row_sum(gtz, t_rows, cap)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh[...] = jnp.zeros_like(dh[...])

    dh[...] = dh[...] + _dh_from_compact(sh[...][0], iv, cap, kpad,
                                         gtx, gty, gtz, dtype)


def _chain_sum_kernel(rank_r, idxr, cux, cuy, cuz, cd, cfc, cdfc,
                      gux, guy, guz, gd, gfc, grx, gry, grz, sh,
                      gtx_o, gty_o, gtz_o, fcen, dh,
                      *, spec, cap, caps, sections, kpad, atot, dtype):
    """Fused-path chain: the angular stage-1 cotangents are SUMMED with
    the radial gamma grids (grx/gry/grz — both channels live on the same
    compact lanes), so center force, box cotangent, and the downstream
    wing decompact + fold run ONCE for both channels instead of per
    channel (round 3 paid a second wing kernel + fold-roll pass +
    [NC, cap, kpad] x3 round trip for the radial channel)."""
    t_rows = rank_r.shape[0]
    r_rows = t_rows * cap
    rank2 = rank_r[...].astype(jnp.int32).reshape(r_rows, kpad)
    iv = idxr[...].astype(jnp.int32).reshape(r_rows, kpad)
    gtx, gty, gtz = _chain_to_stage1(
        spec, (cux, cuy, cuz, cd, cfc, cdfc), (gux, guy, guz, gd, gfc),
        rank2, r_rows, t_rows, cap, kpad, atot, dtype)
    gtx = gtx + grx[...].reshape(r_rows, kpad)
    gty = gty + gry[...].reshape(r_rows, kpad)
    gtz = gtz + grz[...].reshape(r_rows, kpad)
    gtx_o[...] = gtx.reshape(t_rows, cap, kpad)
    gty_o[...] = gty.reshape(t_rows, cap, kpad)
    gtz_o[...] = gtz.reshape(t_rows, cap, kpad)

    fcen[:, 0, :] = _row_sum(gtx, t_rows, cap)
    fcen[:, 1, :] = _row_sum(gty, t_rows, cap)
    fcen[:, 2, :] = _row_sum(gtz, t_rows, cap)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh[...] = jnp.zeros_like(dh[...])

    dh[...] = dh[...] + _dh_from_compact(sh[...][0], iv, cap, kpad,
                                         gtx, gty, gtz, dtype)


def _wing_kernel(gtx_r, gty_r, gtz_r, inv_r, wing,
                 *, cap, kpad, wpad, dtype):
    """Window-lane wing force: wing[t, c, w] = -sum_slots g_c[slot,
    inv[slot, w]]. Streams one 128-lane output chunk at a time (gather
    via per-source-chunk select-accumulate, slot-reduce, write) instead
    of materializing full [R, wpad] decompact temps — the old form's
    dominant stack term."""
    t_rows = inv_r.shape[0]
    r_rows = t_rows * cap
    srcs = (gtx_r[...].reshape(r_rows, kpad),
            gty_r[...].reshape(r_rows, kpad),
            gtz_r[...].reshape(r_rows, kpad))
    invv = inv_r[...].astype(jnp.int32).reshape(r_rows, wpad)
    for kc in range(wpad // _LANE):
        ivc = invv[:, kc * _LANE:(kc + 1) * _LANE]
        accs = [jnp.zeros((r_rows, _LANE), dtype) for _ in srcs]
        for c in range(kpad // _LANE):
            lo = c * _LANE
            loc = jnp.clip(ivc - lo, 0, _LANE - 1)
            hit = (ivc >= lo) & (ivc < lo + _LANE)
            for si, src in enumerate(srcs):
                g = jnp.take_along_axis(src[:, lo:lo + _LANE], loc,
                                        axis=1)
                accs[si] = jnp.where(hit, g, accs[si])
        for ci, acc in enumerate(accs):
            wing[0, :, ci, kc * _LANE:(kc + 1) * _LANE] = -jnp.sum(
                acc.reshape(t_rows, cap, _LANE), axis=1)


def _angular_specs(cap, kpad, wpad, atot, al, nc_pad, dtype, t=_T_ROWS):
    cmp_specs = [_k3_spec(cap, atot, t)] * 6
    cmp_shapes = [jax.ShapeDtypeStruct((nc_pad, cap, atot), dtype)] * 6
    return cmp_specs, cmp_shapes


def _angular_compact_call(spec, grid, sections, kpad, caps, interpret,
                          planes, aidx_p, nc_pad, dtype):
    cap = grid.cap
    wpad = planes[4].shape[-1]
    a_offs, atot = _a_offsets(sections, caps)
    # the packed A axis must fit one 128-lane vreg with a dead pad lane
    # (stage-2 bisect layout fwd, rank2 dead slot LANE-1 bwd)
    assert atot <= _LANE - 1, atot
    px, py, pz, cx, cy, cz = planes[:3] + planes[4:7]
    t = _t_cells(cap, wpad)
    cmp_specs, cmp_shapes = _angular_specs(cap, kpad, wpad, atot,
                                           spec.angular_length, nc_pad,
                                           dtype, t)
    kern = functools.partial(
        _compact_asn_kernel, spec=spec, cap=cap, caps=caps,
        sections=sections, kpad=kpad, wpad=wpad, dtype=dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nc_pad // t,),
        in_specs=[_cen_spec(cap, t)] * 3 + [_win_spec(wpad, t)] * 3
        + [_k3_spec(cap, kpad, t)],
        out_specs=cmp_specs + [_k3_spec(cap, kpad, t), _acc1_spec()],
        out_shape=cmp_shapes
        + [jax.ShapeDtypeStruct((nc_pad, cap, kpad), jnp.int32),
           jax.ShapeDtypeStruct((8, 128), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(px, py, pz, cx, cy, cz, aidx_p)
    compact, rank2, ovf = outs[:6], outs[6], outs[7]
    return compact, rank2, ovf[0, :spec.num_species], a_offs, atot


def _run_fwd_blocks(spec, caps_t, a_offs, cfl_t, rows_t, r, interpret,
                    dtype):
    """Species-pair forward blocks over one tier's row region; returns
    {channel offset: [rows_t, asub]}."""
    asub = spec.angular_sublength
    rca = spec.angular_cutoff
    if _packed_on():
        return _run_packed_fwd(spec, caps_t, a_offs, cfl_t, rows_t, r,
                               interpret, dtype)
    pieces = {}
    for s1, s2, a1, a2, ch0, same in _pair_blocks(spec, caps_t):
        if s1 not in a_offs or s2 not in a_offs:
            continue
        arm1, arm2 = _arm_inputs_flat(cfl_t, a_offs, s1, s2, a1, a2)
        # a1 < _LANE: the tri pad-lane trick needs a dedicated dead slot
        # (see _block_cost)
        if same and a1 < _LANE and _tri_on():
            pieces[ch0] = _run_tri_fwd(spec, a1, arm1, rows_t, r,
                                       interpret, dtype)
            continue
        c1, n_g = _chunk1(a1, a2)
        arm1 = _pad_arm1(arm1, a1, c1, n_g, rca, dtype)
        arm1 = [_group_flat1(x, n_g, c1) for x in arm1]
        kern = functools.partial(
            _block_fwd_kernel, spec=spec, c1=c1, a2=a2, same=same,
            dtype=dtype)
        blk = pl.pallas_call(
            kern,
            grid=(rows_t // r, n_g),
            in_specs=[_flat1_spec(c1, r)] * 5
            + [_flat2_spec(a2, r)] * 5,
            out_specs=_flat2_spec(asub, r),
            out_shape=jax.ShapeDtypeStruct((rows_t, asub), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(*arm1, *arm2)
        pieces[ch0] = blk
    return pieces


def _angular_asn_impl(spec, grid, sections, kpad, caps, tiers, interpret,
                      n_out, compact_cols, pos, h, inv_bins, csp_grid,
                      cell, slot, aidx, want_compact=False):
    cap = grid.cap
    nc = grid.total
    dtype = pos.dtype
    wpad = _round_lane(27 * cap)
    nc_pad, px, py, pz, pcs, cx, cy, cz, csp = _prep_asn(
        grid, inv_bins, csp_grid, pos, h, wpad)
    aidx_p = _pad_rows(aidx, nc_pad, wpad)
    planes = (px, py, pz, pcs, cx, cy, cz, csp)
    compact, rank2, deficit, a_offs, atot = _angular_compact_call(
        spec, grid, sections, kpad, caps, interpret, planes, aidx_p,
        nc_pad, dtype)
    # n_out: pair blocks run only over the first n_out atoms' rows (the
    # sharded path's locals — ghost centers carry zero AEV cotangent)
    n = n_out if n_out is not None else cell.shape[0]
    out, part = _angular_pair_stage(
        spec, sections, caps, tiers, interpret, n, compact, deficit,
        a_offs, cell, slot, nc, dtype, compact_cols)
    if want_compact:
        return out, (compact, rank2, part)
    return out


def _angular_pair_stage(spec, sections, caps, tiers, interpret, n,
                        compact, deficit, a_offs, cell, slot, nc, dtype,
                        compact_cols):
    """Flat-row species-pair blocks over the stage-2 compact arrays
    (shared by the per-channel and fused forward paths). Returns
    ((angular, deficit), part)."""
    asub = spec.angular_sublength
    rca = spec.angular_cutoff
    # FLAT-ROW pair blocks: the pair-term kernels are row-independent
    # (each row = one center atom), so they run over gathered flat atom
    # rows instead of the [nc, cap] grid layout — zero dead cap-slot
    # rows (cap sits ~45% above mean occupancy at the bench box), fewer
    # instances, and the per-block output gather disappears.
    cflat = _compact_to_flat(compact, cell[:n], slot[:n], nc, n, rca,
                             dtype)
    n_pad2 = cflat[0].shape[0]
    r = _r_flat(n)
    tiers_n = _norm_tiers(tiers, caps, r, n_pad2)
    part = None
    cat_out = None
    if tiers_n is None:
        pieces = _run_fwd_blocks(spec, caps, a_offs, cflat, n_pad2, r,
                                 interpret, dtype)
        pieces = {ch0: blk[:n] for ch0, blk in pieces.items()}
        part = {"cflat": tuple(cflat)}
        if compact_cols:
            cat_out = jnp.concatenate(
                [pieces[ch0] for ch0 in sorted(pieces)], axis=1)
    else:
        atot = cflat[0].shape[1]
        cnts, sp_order = _row_counts(cflat[3], a_offs, rca)
        pos_of, row_ats, valids, spill = _tier_partition(
            cnts, sp_order, tiers_n, n)
        cflat_cat = jnp.concatenate(cflat, axis=1)
        pad_row = _tier_pad_row(atot, rca, dtype)
        tier_pieces = []
        cats = []
        for (caps_t, rows_t), row_at, valid in zip(tiers_n, row_ats,
                                                   valids):
            cat_t = _gather_tier_cat(cflat_cat, row_at, valid, pad_row)
            cats.append(cat_t)
            cfl_t = _split_cat(cat_t, atot)
            tier_pieces.append(_run_fwd_blocks(
                spec, caps_t, a_offs, cfl_t, rows_t, r, interpret,
                dtype))
        # the gathered tier rows ride the VJP residuals (`cats`): the
        # backward consumes the SAME arm inputs, so saving them deletes
        # its whole regather chain (compact->flat gathers + concat +
        # per-tier row gathers + the layout fixups XLA wraps them in)
        part = {"pos_of": pos_of, "row_at": tuple(row_ats),
                "valid": tuple(valids), "cats": tuple(cats)}
        # concat PRESENT blocks only (columns) and tiers (rows); ONE row
        # gather returns atom order — absent species pairs (zero columns,
        # up to 28-choose for 7 species) must not ride the gather.
        # Spilled rows read garbage, flagged by the deficit below.
        chans = sorted(tier_pieces[0])
        cat = jnp.concatenate(
            [jnp.concatenate([tp[ch0] for tp in tier_pieces], axis=0)
             for ch0 in chans], axis=1)[pos_of[:n]]
        deficit = jnp.concatenate([deficit, spill.astype(dtype)[None]])
        if compact_cols:
            # the gathered tier concat IS the compact matrix (present
            # blocks only, ascending ch0) — no split/re-concat
            cat_out = cat
        else:
            pieces = {ch0: jax.lax.slice(cat, (0, i * asub),
                                         (n, (i + 1) * asub))
                      for i, ch0 in enumerate(chans)}
    if compact_cols:
        out = cat_out, deficit
    else:
        zero_blk = None
        cols = []
        for pair_i in range(spec.num_pairs):
            ch0 = pair_i * asub
            if ch0 in pieces:
                cols.append(pieces[ch0])
            else:
                if zero_blk is None:
                    zero_blk = jnp.zeros((n, asub), dtype)
                cols.append(zero_blk)
        out = jnp.concatenate(cols, axis=1), deficit
    return out, part


def _arm1_spec(cap, c1, t=_T_ROWS):
    # chunk (group) axis FIRST: Mosaic only tiles the last two dims when
    # they are 8/128-divisible or equal the array dims
    return pl.BlockSpec((1, t, cap, c1), lambda i, g: (g, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _flat1_spec(c1, r):
    """Arm-1 grouped flat rows [n_g, n_pad, c1] -> block [1, r, c1]."""
    return pl.BlockSpec((1, r, c1), lambda i, g: (g, i, 0),
                        memory_space=pltpu.VMEM)


def _flat2_spec(a, r):
    """Flat rows [n_pad, a] -> block [r, a]."""
    return pl.BlockSpec((r, a), lambda i, g: (i, 0),
                        memory_space=pltpu.VMEM)


def _r_flat(n):
    """Rows per flat pair-block instance: fill the ~45-plane * [r, 128]
    VMEM stack budget (cf. _t_ang), shrink for small systems."""
    r = 256
    while r > 8 and r >= 2 * n:
        r //= 2
    return r


def _pad_rows2(x, rows, val):
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)),
                   constant_values=val)


def _group_flat1(x, n_g, c1):
    """[N, a1] -> [n_g, N, c1] (chunk axis first)."""
    npad, a1 = x.shape
    return jnp.moveaxis(x.reshape(npad, n_g, c1), 1, 0)


def _compact_to_flat(compact, cell, slot, nc, n, rca, dtype):
    """Gather the 5 pair-kernel compact quantities [nc_pad, cap, atot]
    to flat atom rows [n_pad2, atot] (rows = centers, in atom order).

    Pad rows get the parked-slot convention (u=0, d=big, fc=0) so
    discarded tail rows can't produce non-finite lanes."""
    r = _r_flat(n)
    n_pad2 = -(-n // r) * r
    big = jnp.asarray(2.0 * rca + 10.0, dtype)
    pads = (0.0, 0.0, 0.0, big, 0.0)
    return [_pad_rows2(c[:nc][cell, slot], n_pad2, v)
            for c, v in zip(compact[:5], pads)]


def _arm_inputs_flat(cflat, a_offs, s1, s2, w1=None, w2=None):
    """Per-arm slices of the flat compact arrays. `w1`/`w2` narrow the
    slice to a tier's caps: stage-2 packs each section from its start,
    so the first w lanes of a section hold ALL neighbors of any row
    whose per-species degree fits the tier."""
    npad = cflat[0].shape[0]
    off1, a1 = a_offs[s1]
    off2, a2 = a_offs[s2]
    w1 = a1 if w1 is None else w1
    w2 = a2 if w2 is None else w2
    arm1 = [jax.lax.slice(c, (0, off1), (npad, off1 + w1))
            for c in cflat]
    arm2 = [jax.lax.slice(c, (0, off2), (npad, off2 + w2))
            for c in cflat]
    return arm1, arm2


# ---------------------------------------------------------------------------
# Occupancy-tiered row dispatch
#
# The pair-block kernels pad every row's arm lanes to the species caps —
# at the bench box the caps sit ~1.6-3x the MEAN per-species degree, so
# most pair lanes are dead (quadratically: ~2x total). Tiers fix this:
# rows whose per-species degrees fit smaller "tier" caps run pair blocks
# with statically narrower arms. Rows are partitioned per step by their
# stage-2 counts (prefix packing makes narrower slices exact), placed
# into fixed-capacity tier regions, and gathered back — all with
# cumsum/searchsorted + gathers, no scatters. Spill cascades to the next
# tier (bigger caps are always correct); only the LAST tier's row
# capacity is a correctness bound, reported in the deficit channel.
# ---------------------------------------------------------------------------


def sections_from_degrees(degs, margin):
    """Static per-species compact sections from measured keep-radius
    degrees: `margin` headroom, rounded to 4, then margin lanes (never
    measured demand) trimmed so the section total sits at the 128-lane
    boundary — every kpad-wide kernel (radial fwd/bwd, stage-2 compact,
    both wing decompacts) pads the compact axis to the next 128, so
    headroom that crosses a boundary doubles their work (measured
    170 -> 146 ms/step at the 101k bench box when 130 -> 124 lanes).
    If a trajectory truly needs more, the deficit-driven regrow pays one
    recompile and crosses the boundary honestly."""
    degs = np.asarray(degs)
    out = [(s, int(-(-int(d * margin + 2) // 4) * 4))
           for s, d in enumerate(degs) if d > 0]
    floor = [(s, int(-(-(int(d) + 1) // 4) * 4))
             for s, d in enumerate(degs) if d > 0]
    total = sum(k for _, k in out)
    bound = -(-sum(k for _, k in floor) // _LANE) * _LANE
    while total > bound:
        # shave the section with the most margin headroom
        i = max(range(len(out)), key=lambda j: out[j][1] - floor[j][1])
        if out[i][1] - floor[i][1] <= 0:
            break
        out[i] = (out[i][0], out[i][1] - 4)
        total -= 4
    return tuple(out)


def search_tiers(cnt, caps):
    """Host-side tier-0 cap search over the measured per-row degree
    matrix `cnt` [n, num_species] (int): minimize the padded-lane
    pair-block work model (fit rows run tier-0 caps, the rest the full
    `caps`). Returns (caps0 full-length tuple, fit_count) or None when
    tiering isn't worth the dispatch overhead."""
    import itertools as _it

    caps = tuple(int(c) for c in caps)
    present = [s for s in range(len(caps)) if caps[s] > 0]
    if not present:
        return None
    cnt = np.asarray(cnt)
    n = cnt.shape[0]

    def work(cp):
        if _packed_on():
            # packed layout: exact pair counts, one shared 128-lane pad
            q = sum(cp[s1] * (cp[s1] - 1) // 2 if s1 == s2
                    else cp[s1] * cp[s2]
                    for i, s1 in enumerate(present)
                    for s2 in present[i:])
            return -(-q // _LANE) * _LANE
        return sum(_block_cost(cp[s1], cp[s2], s1 == s2)
                   for i, s1 in enumerate(present)
                   for s2 in present[i:])

    w_full = work(caps)
    if len(present) > 4:
        # joint search blows up combinatorially; one robust quantile cut
        caps0 = tuple(
            min(caps[s], max(4, -(-int(np.percentile(cnt[:, s], 97))
                                  // 4) * 4)) if caps[s] else 0
            for s in range(len(caps)))
        combos = [caps0]
    else:
        cands = {s: list(range(4, caps[s] + 1, 4)) for s in present}
        combos = [tuple(dict(zip(present, combo)).get(s, 0)
                        for s in range(len(caps)))
                  for combo in _it.product(*(cands[s] for s in present))]
    best = None
    for cp in combos:
        fit = np.ones(n, bool)
        for s in present:
            fit &= cnt[:, s] <= cp[s]
        n0 = int(fit.sum())
        cost = 1.05 * n0 * work(cp) + 1.1 * (n - n0) * w_full
        if best is None or cost < best[0]:
            best = (cost, cp, n0)
    cost, cp, n0 = best
    if cp == caps or cost / (n * w_full) > 0.92:
        return None
    return cp, n0


def search_tier_ladder(cnt, caps, max_pre=2):
    """Multi-tier ladder under the PACKED pair-lane cost model: for each
    chunk budget below the full layout's, find the caps with maximal row
    coverage whose exact pair count fits the budget, then pick the
    subset of candidates (up to `max_pre` tiers before the full-caps
    tier) minimizing total padded-lane work. The packed layout makes
    fine ladders worthwhile: per-block kernels paid a 128-lane floor
    PER BLOCK, so sub-tier caps saved nothing below 3 blocks x 128.

    Returns ((caps_t, n_fit_exclusive), ...) for the pre-tiers (chunk
    count ascending), or None when one tier is already optimal."""
    import itertools as _it

    caps = tuple(int(c) for c in caps)
    present = [s for s in range(len(caps)) if caps[s] > 0]
    if not present:
        return None
    cnt = np.asarray(cnt)
    n = cnt.shape[0]

    def q_pairs(cp):
        return sum(cp[s1] * (cp[s1] - 1) // 2 if s1 == s2
                   else cp[s1] * cp[s2]
                   for i, s1 in enumerate(present)
                   for s2 in present[i:])

    chunks_full = -(-q_pairs(caps) // _LANE)
    if chunks_full <= 1:
        return None
    if len(present) > 4:
        combos = None  # grid blows up; fall back to quantile candidates
    else:
        cands = {s: list(range(2, caps[s] + 1, 2)) for s in present}
        combos = [tuple(dict(zip(present, combo)).get(s, 0)
                        for s in range(len(caps)))
                  for combo in _it.product(*(cands[s] for s in present))]

    def fit_mask(cp):
        f = np.ones(n, bool)
        for s in present:
            f &= cnt[:, s] <= cp[s]
        return f

    def fits(cp):
        return int(fit_mask(cp).sum())

    best_at = {}
    if combos is None:
        for pc in (70, 85, 93, 97):
            cp = tuple(
                min(caps[s], max(2, -(-int(np.percentile(cnt[:, s], pc))
                                      // 2) * 2)) if caps[s] else 0
                for s in range(len(caps)))
            c = -(-q_pairs(cp) // _LANE)
            if c < chunks_full:
                nf = fits(cp)
                if c not in best_at or nf > best_at[c][0]:
                    best_at[c] = (nf, cp)
    else:
        for cp in combos:
            c = -(-q_pairs(cp) // _LANE)
            if c >= chunks_full:
                continue
            nf = fits(cp)
            if c not in best_at or nf > best_at[c][0]:
                best_at[c] = (nf, cp)
    cand = sorted((c, nf, cp) for c, (nf, cp) in best_at.items())
    if not cand:
        return None

    masks = {cp: fit_mask(cp) for _, _, cp in cand}
    best = (1.0 * n * chunks_full, ())  # untiered baseline
    subsets = [s for k in range(1, max_pre + 1)
               for s in _it.combinations(cand, k)]
    for sub in subsets:
        assigned = np.zeros(n, bool)
        cost = 0.0
        rows = []
        for c, _, cp in sub:  # chunk-count ascending (cap tuples need
            m = masks[cp] & ~assigned  # not nest — exact masks)
            n_t = int(m.sum())
            cost += 1.06 * n_t * c
            rows.append((cp, n_t))
            assigned |= m
        cost += 1.1 * (n - int(assigned.sum())) * chunks_full
        # per-tier dispatch overhead (row gathers + partition bisects),
        # in chunk-equivalents per row — keeps near-empty tiers out
        cost += 0.12 * n * len(sub)
        if cost < best[0]:
            best = (cost, tuple(rows))
    if not best[1] or best[0] / (n * chunks_full) > 0.95:
        return None
    return best[1]


def _norm_tiers(tiers, caps, r, n_pad2):
    """Static tier layout ((caps_t, rows_t), ...): clamp tier caps into
    [4, caps] (uniform block sets across tiers), round row capacities to
    the flat row block, force the last tier to the full caps."""
    if not tiers or len(tiers) < 2:
        return None

    def rows(x):
        return max(r, min(-(-int(x) // r) * r, n_pad2))

    out = []
    for caps_t, rows_t in tiers[:-1]:
        eff = tuple(min(max(int(ct), 4), int(c)) if c else 0
                    for ct, c in zip(caps_t, caps))
        out.append((eff, rows(rows_t)))
    out.append((tuple(int(c) for c in caps), rows(tiers[-1][1])))
    return tuple(out)


def _row_counts(cd_flat, a_offs, rca):
    """Per-row per-section within-cutoff counts from the packed compact
    distances (live lanes are <= Rca by stage-2, dead lanes parked at
    2*Rca + 10)."""
    cols, order = [], []
    for s, (off, a_s) in a_offs.items():
        c = jnp.sum((cd_flat[:, off:off + a_s] < rca + 1.0)
                    .astype(jnp.int32), axis=1)
        cols.append(c)
        order.append(s)
    return jnp.stack(cols, axis=1), tuple(order)


def _tier_partition(cnts, sp_order, tiers, n):
    """Partition flat atom rows into tier regions.

    Returns (pos_of [n_pad2] destination row in the concatenated tier
    regions, per-tier gather rows row_at [rows_t], per-tier valid masks,
    spill = rows the last tier's capacity could not hold). Rows that
    outgrow a tier's caps — or its row capacity — fall through to the
    next tier (whose caps are wider, so the result stays exact).

    Everything runs on [chunks, 128] 2-D int32 shapes: 1-D int arrays
    land in TPU scalar space, where a first-cut jnp.searchsorted inverse
    measured ~23 ms/step. The inverse here is scatter/search-free: the
    global inclusive taken-count G increments exactly at taken rows, so
    the q-th taken row is the first position with G == q; its chunk is
    #{k: chunk_cumsum[k] < q} (a fused compare-sum over the ~n/128-entry
    chunk table), and its lane a min-reduce over one gathered G row."""
    n_pad2 = cnts.shape[0]
    nchunk = n_pad2 // _LANE
    lane = jnp.arange(_LANE, dtype=jnp.int32)[None, :]
    iota2 = jnp.arange(nchunk, dtype=jnp.int32)[:, None] * _LANE + lane
    real = iota2 < n
    cnts2 = [cnts[:, j].reshape(nchunk, _LANE)
             for j in range(cnts.shape[1])]
    assigned = jnp.zeros((nchunk, _LANE), bool)
    pos_of = jnp.zeros((nchunk, _LANE), jnp.int32)
    row_ats, valids = [], []
    base = 0
    spill = jnp.zeros((), jnp.int32)
    last = len(tiers) - 1
    for t, (caps_t, rows_t) in enumerate(tiers):
        fits = real & ~assigned
        if t != last:
            for j, s in enumerate(sp_order):
                fits = fits & (cnts2[j] <= caps_t[s])
        f_i = fits.astype(jnp.int32)
        f_sum = jnp.sum(f_i, axis=1)
        rank = ((jnp.cumsum(f_sum) - f_sum)[:, None]
                + jnp.cumsum(f_i, axis=1) - f_i)  # exclusive global rank
        take = fits & (rank < rows_t)
        pos_of = jnp.where(take, base + rank, pos_of)
        t_i = take.astype(jnp.int32)
        t_sum = jnp.sum(t_i, axis=1)
        cumt = jnp.cumsum(t_sum)  # [nchunk] inclusive per-chunk counts
        g_t = (cumt - t_sum)[:, None] + jnp.cumsum(t_i, axis=1)
        total = cumt[nchunk - 1]
        qr = rows_t // _LANE
        q2 = (jnp.arange(qr, dtype=jnp.int32)[:, None] * _LANE + lane
              + 1)  # 1-based destination ranks
        # two-level chunk bisect: the flat compare-sum over all nchunk
        # (~n/128) entries materializes a [qr, 128, nchunk] temp
        # (~300 MB / ~7 ms per call at the bench box); search 128-entry
        # super-chunk boundaries first, then one gathered super row
        ns = -(-nchunk // _LANE)
        cumt_p = jnp.pad(cumt, (0, ns * _LANE - nchunk),
                         constant_values=np.iinfo(np.int32).max)
        cumt_p = cumt_p.reshape(ns, _LANE)
        j_sup = jnp.sum((q2[:, :, None] > cumt_p[None, None, :, -1])
                        .astype(jnp.int32), axis=-1)
        j_sup = jnp.minimum(j_sup, ns - 1)
        sub = cumt_p[j_sup]  # [qr, 128, 128]
        j_in = jnp.sum((q2[:, :, None] > sub).astype(jnp.int32), axis=-1)
        jq = jnp.minimum(j_sup * _LANE + j_in, nchunk - 1)
        rows_g = g_t[jq]  # [qr, 128, 128] row gather (vector path)
        hit = rows_g == q2[:, :, None]
        li = jax.lax.broadcasted_iota(jnp.int32, rows_g.shape, 2)
        lane_src = jnp.min(jnp.where(hit, li, _LANE), axis=2)
        src = jq * _LANE + jnp.minimum(lane_src, _LANE - 1)
        valid = q2 <= total
        row_ats.append(jnp.where(valid, src, 0).reshape(rows_t))
        valids.append(valid.reshape(rows_t))
        assigned = assigned | take
        if t == last:
            spill = jnp.sum(f_i) - total
        base += rows_t
    return pos_of.reshape(n_pad2), row_ats, valids, spill


def _tier_pad_row(atot, rca, dtype):
    """Dead-row value for the 5 concatenated quantities [5*atot]."""
    big = 2.0 * rca + 10.0
    vals = np.zeros(5 * atot, np.float64)
    vals[3 * atot:4 * atot] = big
    return jnp.asarray(vals, dtype)


def _gather_tier_cat(cflat_cat, row_at, valid, pad_row):
    """One wide row-gather brings a tier's rows in (5 quantities stay
    concatenated — wider rows amortize the gather's tile granularity);
    invalid rows get the dead-slot convention."""
    g = cflat_cat[row_at]
    return jnp.where(valid[:, None], g, pad_row[None, :])


def _split_cat(cat, atot):
    return [jax.lax.slice(cat, (0, i * atot), (cat.shape[0],
                                               (i + 1) * atot))
            for i in range(5)]


def _t_ang(cap):
    """Cell rows per pair-block kernel instance: the backward holds ~45
    live [t*cap, 128]-lane pair temps (measured 16.4 MB at 384 rows),
    so bound rows as capacity regrows raise cap."""
    t = 8
    while t > 1 and t * cap * 44 * 1024 > 12 * 2 ** 20:
        t //= 2
    return t


def _group_arm1(x, n_g, c1):
    """[NCp, cap, a1] -> [n_g, NCp, cap, c1] (chunk axis first)."""
    ncp, cap, a1 = x.shape
    return jnp.moveaxis(x.reshape(ncp, cap, n_g, c1), 2, 0)


def _ungroup_arm1(x):
    """[n_g, NCp, cap, c1] -> [NCp, cap, a1]."""
    n_g, ncp, cap, c1 = x.shape
    return jnp.moveaxis(x, 0, 2).reshape(ncp, cap, n_g * c1)


def _ungroup_flat1(x):
    """[n_g, N, c1] -> [N, n_g * c1]."""
    n_g, npad, c1 = x.shape
    return jnp.moveaxis(x, 0, 1).reshape(npad, n_g * c1)


def _arm2_spec(cap, a, t=_T_ROWS):
    return pl.BlockSpec((t, cap, a), lambda i, g: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _arm_inputs(compact, a_offs, s1, s2, nc_pad, cap, with_dfc=False):
    """XLA-sliced per-arm views of the packed compact arrays (free
    slices; lets the chunked BlockSpecs start at block index 0)."""
    nq = 6 if with_dfc else 5
    off1, a1 = a_offs[s1]
    off2, a2 = a_offs[s2]
    arm1 = [jax.lax.slice(c, (0, 0, off1), (nc_pad, cap, off1 + a1))
            for c in compact[:nq]]
    arm2 = [jax.lax.slice(c, (0, 0, off2), (nc_pad, cap, off2 + a2))
            for c in compact[:nq]]
    return arm1, arm2


def _r_bwd(r, c1):
    """Backward rows per block: the bwd kernel's arm-reduce temp chains
    scale with c1 (Mosaic's stack allocator never reuses slots), so large
    chunks must trade row count for stack. Model fit through two measured
    stacks at r=256 — 16.12 MB at c1=8 and 23.7 MB at c1=16, i.e.
    ~56 + 8.4*c1 live [r, 128] planes — against the 16 MB scoped-vmem
    limit (kept at 15 MB for headroom)."""
    while r > 8 and r * 512 * (56 + 8.4 * c1) > 15 * 2 ** 20:
        r //= 2
    return r


def _run_bwd_blocks(spec, caps_t, a_offs, atot, cfl_t, ga_t, ga_off,
                    rows_t, r, interpret, dtype):
    """Species-pair backward blocks over one tier's row region; returns
    the 5 per-slot cotangent sums [rows_t, atot] on the packed A axis.
    `ga_off` maps a block's channel offset to its column in ga_t (tiers
    carry only the present blocks' cotangent columns)."""
    asub = spec.angular_sublength
    rca = spec.angular_cutoff
    if _packed_on():
        return _run_packed_bwd(spec, caps_t, a_offs, atot, cfl_t, ga_t,
                               ga_off, rows_t, r, interpret, dtype)

    def placed(val, off, a):
        return jnp.pad(val, ((0, 0), (off, atot - off - a)))

    gsum = None
    for s1, s2, a1, a2, ch0, same in _pair_blocks(spec, caps_t):
        if s1 not in a_offs or s2 not in a_offs:
            continue
        off1 = a_offs[s1][0]
        off2 = a_offs[s2][0]
        arm1, arm2 = _arm_inputs_flat(cfl_t, a_offs, s1, s2, a1, a2)
        go = ga_off[ch0]
        ga_blk = jax.lax.slice(ga_t, (0, go), (rows_t, go + asub))
        # a1 < _LANE: the tri pad-lane trick needs a dedicated dead slot
        # (see _block_cost)
        if same and a1 < _LANE and _tri_on():
            outs = _run_tri_bwd(spec, a1, arm1, ga_blk, rows_t, r,
                                interpret, dtype)
            if outs is None:
                continue
            contrib = [placed(o, off1, a1) for o in outs]
            gsum = contrib if gsum is None else [a + b for a, b in
                                                 zip(gsum, contrib)]
            continue
        c1, n_g = _chunk1(a1, a2)
        arm1 = _pad_arm1(arm1, a1, c1, n_g, rca, dtype)
        arm1 = [_group_flat1(x, n_g, c1) for x in arm1]
        rb = _r_bwd(r, c1)
        kern = functools.partial(
            _block_bwd_kernel, spec=spec, c1=c1, a2=a2, same=same,
            dtype=dtype)
        outs = pl.pallas_call(
            kern,
            grid=(rows_t // rb, n_g),
            in_specs=[_flat1_spec(c1, rb)] * 5
            + [_flat2_spec(a2, rb)] * 5
            + [_flat2_spec(asub, rb)],
            out_specs=[_flat1_spec(c1, rb)] * 5
            + [_flat2_spec(a2, rb)] * 5,
            out_shape=[jax.ShapeDtypeStruct((n_g, rows_t, c1),
                                            dtype)] * 5
            + [jax.ShapeDtypeStruct((rows_t, a2), dtype)] * 5,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(*arm1, *arm2, ga_blk)
        # drop arm-1 pad-lane cotangents (dead slots by construction)
        contrib = [placed(_ungroup_flat1(o1)[:, :a1], off1, a1)
                   + placed(o2, off2, a2)
                   for o1, o2 in zip(outs[:5], outs[5:])]
        gsum = contrib if gsum is None else [a + b for a, b in
                                             zip(gsum, contrib)]
    return gsum


def _angular_gsum_grid(spec, sections, caps, tiers, interpret, n,
                       compact_cols, inv_bins, cell, slot, compact,
                       ga_flat, part, nc, nc_pad, dtype):
    """Pair-block backward over flat rows -> 5 per-slot cotangent sums
    in GRID layout [nc_pad, cap, atot] (shared by the per-channel and
    fused backward paths). Returns (gsum list, a_offs, atot)."""
    cap = compact[0].shape[1]
    rca = spec.angular_cutoff
    a_offs, atot = _a_offsets(sections, caps)
    assert atot <= _LANE - 1, atot
    # the forward's gathered arm rows ride the residuals (`part`): the
    # backward consumes the SAME inputs, so nothing here regathers the
    # grid-layout compact arrays unless the residuals are absent
    has_cflat = isinstance(part, dict) and "cflat" in part
    has_cats = isinstance(part, dict) and "cats" in part
    if has_cflat:
        cflat = list(part["cflat"])
    elif not has_cats:
        cflat = _compact_to_flat(compact, cell[:n], slot[:n], nc, n,
                                 rca, dtype)
    else:
        cflat = None
    n_pad2 = (cflat[0].shape[0] if cflat is not None
              else -(-n // _r_flat(n)) * _r_flat(n))
    r = _r_flat(n)
    tiers_n = _norm_tiers(tiers, caps, r, n_pad2)
    asub = spec.angular_sublength
    chans_c = sorted(pb[4] for pb in _pair_blocks(spec, caps)
                     if pb[0] in a_offs and pb[1] in a_offs)
    if tiers_n is None:
        ga_pad = _pad_rows2(ga_flat, n_pad2, 0.0)
        if compact_cols:
            ga_off = {ch0: i * asub for i, ch0 in enumerate(chans_c)}
        else:
            ga_off = {pb[4]: pb[4] for pb in _pair_blocks(spec, caps)}
        gsum = [gf[:n] for gf in _run_bwd_blocks(
            spec, caps, a_offs, atot, cflat, ga_pad, ga_off, n_pad2, r,
            interpret, dtype)]
    else:
        if has_cats:
            pos_of = part["pos_of"]
            row_ats, valids = part["row_at"], part["valid"]
            cats = part["cats"]
        else:
            cnts, sp_order = _row_counts(cflat[3], a_offs, rca)
            pos_of, row_ats, valids, _ = _tier_partition(
                cnts, sp_order, tiers_n, n)
            cflat_cat = jnp.concatenate(cflat, axis=1)
            pad_row = _tier_pad_row(atot, rca, dtype)
            cats = [
                _gather_tier_cat(cflat_cat, row_at, valid, pad_row)
                for (_, _), row_at, valid in zip(tiers_n, row_ats,
                                                 valids)]
        # present blocks' cotangent columns only, concatenated — the
        # tier row-gathers must not move the absent pairs' zero columns.
        # compact_cols mode: ga_flat already IS that layout.
        ga_off = {ch0: i * asub for i, ch0 in enumerate(chans_c)}
        ga_cat = _pad_rows2(
            ga_flat if compact_cols else jnp.concatenate(
                [jax.lax.slice(ga_flat, (0, ch0), (n, ch0 + asub))
                 for ch0 in chans_c], axis=1), n_pad2, 0.0)
        parts = []
        for (caps_t, rows_t), row_at, valid, cat_t in zip(
                tiers_n, row_ats, valids, cats):
            cfl_t = _split_cat(cat_t, atot)
            ga_t = jnp.where(valid[:, None], ga_cat[row_at], 0.0)
            parts.append(_run_bwd_blocks(
                spec, caps_t, a_offs, atot, cfl_t, ga_t, ga_off, rows_t,
                r, interpret, dtype))
        # concat quantities (cols) and tiers (rows); ONE row gather back
        # to atom order, then split
        gcat = jnp.concatenate(
            [jnp.concatenate([p[qi] for p in parts], axis=0)
             for qi in range(5)], axis=1)[pos_of[:n]]
        gsum = _split_cat(gcat, atot)
    if n < cell.shape[0]:
        # n_out mode: ghost-center rows carry zero pair-block cotangents
        gsum = [jnp.pad(gf, ((0, cell.shape[0] - n), (0, 0)))
                for gf in gsum]
    # back to grid layout for the window-structured decompact kernels
    gsum = [_pad_rows(_to_grid_rows(inv_bins, gf, 0.0), nc_pad, 0.0)
            for gf in gsum]
    return gsum, a_offs, atot


def _angular_asn_bwd_impl(spec, grid, sections, kpad, caps, tiers,
                          interpret, n_out, compact_cols, inv_bins, cell,
                          slot, aidx, ainv, compact, rank2, ga_flat,
                          part=None):
    """Backward from the forward's saved compact/rank2 arrays.

    The compact quantities and the stage-2 rank map are HBM outputs the
    forward materializes anyway, so saving them as VJP residuals deletes
    the entire re-compaction (position row gathers, window geometry
    gathers, cumsum-bisect) from the backward — it needs no positions at
    all. The tier partition also rides the residuals (`part`); absent,
    it is recomputed from the saved compact distances (integer
    cumsum/bisect on identical inputs: exact)."""
    cap = grid.cap
    nc = grid.total
    dtype = compact[0].dtype
    wpad = _round_lane(27 * cap)
    nc_pad = compact[0].shape[0]
    aidx_p = _pad_rows(aidx, nc_pad, wpad)
    ainv_p = _pad_rows(ainv, nc_pad, kpad - 1)
    n = n_out if n_out is not None else cell.shape[0]
    gsum, a_offs, atot = _angular_gsum_grid(
        spec, sections, caps, tiers, interpret, n, compact_cols,
        inv_bins, cell, slot, compact, ga_flat, part, nc, nc_pad, dtype)

    sh = _wrap_shift_tables(grid, 1, dtype)
    sh = _pad_rows(sh.reshape(nc, -1), nc_pad, 0.0).reshape(
        1, nc_pad, 27, 3)
    t_a = _t_chain(cap, kpad, nc_pad)
    kern_a = functools.partial(
        _decompact_chain_kernel, spec=spec, cap=cap, caps=caps,
        sections=sections, kpad=kpad, atot=atot, dtype=dtype)
    gtx, gty, gtz, fcen, dh_pad = pl.pallas_call(
        kern_a,
        grid=(nc_pad // t_a,),
        in_specs=[_k3_spec(cap, kpad, t_a), _k3_spec(cap, kpad, t_a)]
        + [_k3_spec(cap, atot, t_a)] * 11
        + [pl.BlockSpec((1, t_a, 27, 3), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[_k3_spec(cap, kpad, t_a)] * 3
        + [_out1_spec(3, cap, t_a), _acc1_spec()],
        out_shape=[jax.ShapeDtypeStruct((nc_pad, cap, kpad), dtype)] * 3
        + [jax.ShapeDtypeStruct((nc_pad, 3, cap), dtype),
           jax.ShapeDtypeStruct((8, 128), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(rank2, aidx_p, *compact, *gsum, sh)

    t_w = _t_wing(cap, kpad, wpad, nc_pad)
    kern_w = functools.partial(
        _wing_kernel, cap=cap, kpad=kpad, wpad=wpad, dtype=dtype)
    wing = pl.pallas_call(
        kern_w,
        grid=(nc_pad // t_w,),
        in_specs=[_k3_spec(cap, kpad, t_w)] * 3
        + [_k3_spec(cap, wpad, t_w)],
        out_specs=pl.BlockSpec((1, t_w, 3, wpad),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nc_pad, 3, wpad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gtx, gty, gtz, ainv_p)

    dpos = _fold_wing_pad(grid, fcen, wing, nc, wpad)[cell, slot]
    return dpos, dh_pad[:3, :3]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _angular_asn_flat(spec, grid, sections, kpad, caps, tiers, interpret,
                      n_out, compact_cols, pos, h, inv_bins, csp_grid,
                      cell, slot, aidx, ainv):
    return _angular_asn_impl(spec, grid, sections, kpad, caps, tiers,
                             interpret, n_out, compact_cols, pos, h,
                             inv_bins, csp_grid, cell, slot, aidx)


def _angular_asn_fwd(spec, grid, sections, kpad, caps, tiers, interpret,
                     n_out, compact_cols, pos, h, inv_bins, csp_grid,
                     cell, slot, aidx, ainv):
    out, (compact, rank2, part) = _angular_asn_impl(
        spec, grid, sections, kpad, caps, tiers, interpret, n_out,
        compact_cols, pos, h, inv_bins, csp_grid, cell, slot, aidx,
        want_compact=True)
    # rank2 values < kpad: int16 halves the largest angular VJP residual
    return out, (inv_bins, cell, slot, aidx, ainv, compact,
                 rank2.astype(jnp.int16), part)


def _angular_asn_bwd(spec, grid, sections, kpad, caps, tiers, interpret,
                     n_out, compact_cols, res, g):
    ga, _ = g
    inv_bins, cell, slot, aidx, ainv, compact, rank2, part = res
    dpos, dh = _angular_asn_bwd_impl(
        spec, grid, sections, kpad, caps, tiers, interpret, n_out,
        compact_cols, inv_bins, cell, slot, aidx, ainv, compact, rank2,
        ga, part=part)
    return dpos, dh, None, None, None, None, None, None


_angular_asn_flat.defvjp(_angular_asn_fwd, _angular_asn_bwd)


# ---------------------------------------------------------------------------
# Fused both-channels op (the production force path)
# ---------------------------------------------------------------------------


def _both_asn_impl(spec, grid, sections, kpad, caps, tiers, rep,
                   interpret, n_out, pos, h, inv_bins, csp_grid, cell,
                   slot, aidx, want_res=False):
    """Fused forward: one geometry pass serves radial (+repulsion) and
    angular stage-2; always compact AEV columns."""
    cap = grid.cap
    nc = grid.total
    dtype = pos.dtype
    wpad = _round_lane(27 * cap)
    nc_pad, px, py, pz, pcs, cx, cy, cz, csp = _prep_asn(
        grid, inv_bins, csp_grid, pos, h, wpad)
    aidx_p = _pad_rows(aidx, nc_pad, wpad)
    n = n_out if n_out is not None else cell.shape[0]

    a_offs, atot = _a_offsets(sections, caps)
    assert atot <= _LANE - 1, atot
    srl = len(sections) * len(spec.shf_r) * len(spec.eta_r)
    t = _t_cells(cap, wpad)
    cmp_specs, cmp_shapes = _angular_specs(cap, kpad, wpad, atot,
                                           spec.angular_length, nc_pad,
                                           dtype, t)
    kern = functools.partial(
        _step_fused_kernel, spec=spec, rep=rep, cap=cap, caps=caps,
        sections=sections, kpad=kpad, wpad=wpad, compact_cols=True,
        dtype=dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nc_pad // t,),
        in_specs=[_cen_spec(cap, t)] * 4 + [_win_spec(wpad, t)] * 3
        + [_k3_spec(cap, kpad, t)],
        out_specs=[_out1_spec(cap, srl + 1, t)] + cmp_specs
        + [_k3_spec(cap, kpad, t), _acc1_spec()],
        out_shape=[jax.ShapeDtypeStruct((nc_pad, cap, srl + 1), dtype)]
        + cmp_shapes
        + [jax.ShapeDtypeStruct((nc_pad, cap, kpad), jnp.int32),
           jax.ShapeDtypeStruct((8, 128), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(px, py, pz, pcs, cx, cy, cz, aidx_p)
    rad_rows = outs[0][:nc][cell[:n], slot[:n]]
    radial, erep = rad_rows[:, :srl], rad_rows[:, srl]
    compact, rank2 = outs[1:7], outs[7]
    deficit = outs[8][0, :spec.num_species]
    (angular, deficit), part = _angular_pair_stage(
        spec, sections, caps, tiers, interpret, n, compact, deficit,
        a_offs, cell, slot, nc, dtype, compact_cols=True)
    out = (radial, erep, angular, deficit)
    if want_res:
        return out, (compact, rank2, part)
    return out


def _both_asn_bwd_impl(spec, grid, sections, kpad, caps, tiers, rep,
                       interpret, n_out, pos, h, inv_bins, csp_grid,
                       cell, slot, aidx, ainv, compact, rank2, part,
                       g_rad, g_rep, g_ang):
    """Fused backward: radial gamma on compact lanes + angular chain,
    SUMMED before one wing decompact + one fold + one dh — both
    channels share the same frozen assignment lanes, so round 3's
    per-channel wing/fold/dh pairs were duplicate work."""
    cap = grid.cap
    nc = grid.total
    dtype = pos.dtype
    wpad = _round_lane(27 * cap)
    nc_pad = compact[0].shape[0]
    aidx_p = _pad_rows(aidx, nc_pad, wpad)
    ainv_p = _pad_rows(ainv, nc_pad, kpad - 1)
    n = n_out if n_out is not None else cell.shape[0]
    n_all = cell.shape[0]

    # radial gamma grids (geometry recomputed: VMEM-only in the forward)
    nc_pad2, px, py, pz, pcs, cx, cy, cz, csp = _prep_asn(
        grid, inv_bins, csp_grid, pos, h, wpad)
    gac = jnp.concatenate([g_rad, g_rep[:, None]], axis=-1)
    if gac.shape[0] < n_all:
        gac = jnp.pad(gac, ((0, n_all - gac.shape[0]), (0, 0)))
    ga = _pad_rows(_to_grid_rows(inv_bins, gac, 0.0), nc_pad, 0.0)
    srl = g_rad.shape[-1]
    t_g = _t_rgam(cap, kpad, wpad, nc_pad)
    kern_g = functools.partial(
        _radial_gamma_only_kernel, spec=spec, rep=rep, cap=cap,
        sections=sections, kpad=kpad, wpad=wpad, compact_cols=True,
        dtype=dtype)
    grx, gry, grz = pl.pallas_call(
        kern_g,
        grid=(nc_pad // t_g,),
        in_specs=[_cen_spec(cap, t_g)] * 4 + [_win_spec(wpad, t_g)] * 3
        + [_k3_spec(cap, kpad, t_g), _out1_spec(cap, srl + 1, t_g)],
        out_specs=[_k3_spec(cap, kpad, t_g)] * 3,
        out_shape=[jax.ShapeDtypeStruct((nc_pad, cap, kpad), dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(px, py, pz, pcs, cx, cy, cz, aidx_p, ga)

    # angular pair-block cotangents -> grid layout
    gsum, a_offs, atot = _angular_gsum_grid(
        spec, sections, caps, tiers, interpret, n, True, inv_bins, cell,
        slot, compact, g_ang, part, nc, nc_pad, dtype)

    sh = _wrap_shift_tables(grid, 1, dtype)
    sh = _pad_rows(sh.reshape(nc, -1), nc_pad, 0.0).reshape(
        1, nc_pad, 27, 3)
    t_a = _t_chain(cap, kpad, nc_pad)
    kern_a = functools.partial(
        _chain_sum_kernel, spec=spec, cap=cap, caps=caps,
        sections=sections, kpad=kpad, atot=atot, dtype=dtype)
    gtx, gty, gtz, fcen, dh_pad = pl.pallas_call(
        kern_a,
        grid=(nc_pad // t_a,),
        in_specs=[_k3_spec(cap, kpad, t_a), _k3_spec(cap, kpad, t_a)]
        + [_k3_spec(cap, atot, t_a)] * 11
        + [_k3_spec(cap, kpad, t_a)] * 3
        + [pl.BlockSpec((1, t_a, 27, 3), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[_k3_spec(cap, kpad, t_a)] * 3
        + [_out1_spec(3, cap, t_a), _acc1_spec()],
        out_shape=[jax.ShapeDtypeStruct((nc_pad, cap, kpad), dtype)] * 3
        + [jax.ShapeDtypeStruct((nc_pad, 3, cap), dtype),
           jax.ShapeDtypeStruct((8, 128), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(rank2, aidx_p, *compact, *gsum, grx, gry, grz, sh)

    t_w = _t_wing(cap, kpad, wpad, nc_pad)
    kern_w = functools.partial(
        _wing_kernel, cap=cap, kpad=kpad, wpad=wpad, dtype=dtype)
    wing = pl.pallas_call(
        kern_w,
        grid=(nc_pad // t_w,),
        in_specs=[_k3_spec(cap, kpad, t_w)] * 3
        + [_k3_spec(cap, wpad, t_w)],
        out_specs=pl.BlockSpec((1, t_w, 3, wpad),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nc_pad, 3, wpad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gtx, gty, gtz, ainv_p)

    dpos = _fold_wing_pad(grid, fcen, wing, nc, wpad)[cell, slot]
    return dpos, dh_pad[:3, :3]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _both_asn_flat(spec, grid, sections, kpad, caps, tiers, rep,
                   interpret, n_out, pos, h, inv_bins, csp_grid, cell,
                   slot, aidx, ainv):
    return _both_asn_impl(spec, grid, sections, kpad, caps, tiers, rep,
                          interpret, n_out, pos, h, inv_bins, csp_grid,
                          cell, slot, aidx)


def _both_asn_fwd(spec, grid, sections, kpad, caps, tiers, rep,
                  interpret, n_out, pos, h, inv_bins, csp_grid, cell,
                  slot, aidx, ainv):
    out, (compact, rank2, part) = _both_asn_impl(
        spec, grid, sections, kpad, caps, tiers, rep, interpret, n_out,
        pos, h, inv_bins, csp_grid, cell, slot, aidx, want_res=True)
    return out, (pos, h, inv_bins, csp_grid, cell, slot, aidx, ainv,
                 compact, rank2.astype(jnp.int16), part)


def _both_asn_bwd(spec, grid, sections, kpad, caps, tiers, rep,
                  interpret, n_out, res, g):
    g_rad, g_rep, g_ang, _ = g
    (pos, h, inv_bins, csp_grid, cell, slot, aidx, ainv, compact, rank2,
     part) = res
    dpos, dh = _both_asn_bwd_impl(
        spec, grid, sections, kpad, caps, tiers, rep, interpret, n_out,
        pos, h, inv_bins, csp_grid, cell, slot, aidx, ainv, compact,
        rank2, part, g_rad, g_rep, g_ang)
    return dpos, dh, None, None, None, None, None, None


_both_asn_flat.defvjp(_both_asn_fwd, _both_asn_bwd)


def aev_asn_fused(aev_spec, grid, bins, asn, pos, box, sections, caps,
                  tiers=None, repulsion=None, interpret=None, n_out=None):
    """(radial, erep, angular, deficit) — both channels through ONE
    fused op: one geometry pass forward, one summed wing/fold/dh
    backward. Always compact AEV columns (see present_channels /
    radial sections order). The production force path; the per-channel
    radial_aev_asn / angular_aev_asn remain as the parity oracle
    surface."""
    if interpret is None:
        interpret = _interpret_default()
    kpad = asn.idx.shape[-1]
    tiers_t = (tuple((tuple(c), int(rw)) for c, rw in tiers)
               if tiers else None)
    return _both_asn_flat(aev_spec, grid, sections, kpad, tuple(caps),
                          tiers_t, repulsion, interpret, n_out, pos,
                          box.h, bins.inv, bins.species_grid, bins.cell,
                          bins.slot, asn.idx, asn.inv)


def present_channels(aev_spec, caps, sections):
    """Ascending torchani channel offsets (ch0) of the species-pair
    blocks present under `caps`/`sections` — the static column map of
    the compact_cols angular output."""
    a_offs, _ = _a_offsets(sections, tuple(caps))
    return tuple(sorted(pb[4] for pb in _pair_blocks(aev_spec, tuple(caps))
                        if pb[0] in a_offs and pb[1] in a_offs))


def angular_aev_asn(aev_spec, grid, bins, asn, pos, box, sections, caps,
                    tiers=None, interpret=None, n_out=None,
                    compact_cols=False):
    """([n_out, angular_length], deficit) over a frozen assignment.

    `compact_cols` (static): emit only the PRESENT species-pair blocks'
    columns (ascending ch0, see present_channels) instead of the full
    torchani layout with zero blocks for absent pairs — at water
    composition that is 3 of 28 blocks, deleting ~90% of the angular
    output/cotangent bytes. The cotangent must arrive in the same
    compact layout.

    `sections`/`asn` may be any assignment whose keep radius covers
    (Rca + skin) — in production the RADIAL assignment is shared (one
    coarse grid, one build; stage-2 re-compacts within-Rca lanes per
    step anyway). `caps` are the per-step within-cutoff capacities
    (ANISpec.angular_caps). deficit > 0 means a cap truncated real
    neighbors THIS step.

    `tiers` (static, optional): occupancy tiers ((caps_t, rows_t), ...)
    dispatching rows whose per-species degrees fit narrower caps to
    proportionally cheaper pair blocks; the last tier always runs the
    full `caps`. When tiered, the deficit gains one trailing entry: the
    number of rows the last tier's row capacity could not hold (grow
    rows_t and retry, same contract as the per-species entries).

    `n_out` (static): AEV rows + pair-block work only for the FIRST
    n_out binned atoms (the sharded path's owned atoms; ghost centers
    still receive neighbor-role forces through dpos)."""
    if interpret is None:
        interpret = _interpret_default()
    kpad = asn.idx.shape[-1]
    tiers_t = (tuple((tuple(c), int(rw)) for c, rw in tiers)
               if tiers else None)
    return _angular_asn_flat(aev_spec, grid, sections, kpad, tuple(caps),
                             tiers_t, interpret, n_out, compact_cols,
                             pos, box.h, bins.inv, bins.species_grid,
                             bins.cell, bins.slot, asn.idx, asn.inv)
