"""Profiling annotations and helpers (reference NVTX-equivalent surface).

The reference labels phases with NVTX ranges callable from TorchScript
("AEV forward", "NN forward", "Force and Stress" — mnp.cpp via
models/lammps_ani.py:173-207) and wraps runs in Nsight
(run_one.py --nsys). The TPU equivalents:

  * `phase(name)` — `jax.named_scope` alias used across the engine so XLA
    op names carry the phase (visible in traces and HLO metadata);
  * `trace(dir)` — context manager around `jax.profiler.trace` +
    block_until_ready discipline;
  * `summarize_trace(dir)` — aggregate device op durations from the
    captured .trace.json.gz (what we used to drive every optimization in
    docs/DESIGN.md).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json

import jax

phase = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(str(log_dir)):
        yield


def summarize_trace(log_dir: str, top: int = 25):
    """[(total_ms, op_name)] aggregated device-op durations."""
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    by = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and not e.get(
                "name", "").startswith(("$", "jit_", "block", "prog")):
            args = e.get("args") or {}
            # prefer the semantic op name (named_scope / source op) over
            # the HLO instruction name ("fusion.123", "while.7", "0")
            label = (args.get("long_name") or args.get("tf_op")
                     or args.get("name") or e["name"])
            by[f"{label} [{e['name']}]" if label != e["name"]
               else label] += e["dur"]
    return [(dur / 1e3, name) for name, dur in by.most_common(top)]
