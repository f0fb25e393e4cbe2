"""Benchmark sweeps (reference: run_one.py + submit_scaling.py + read_perf).

Single-chip saturation sweep over box sizes; prints one JSON line per run
(ns/day, steps/s, Matom-step/s) like read_perf.py extracts from LAMMPS
logs. Weak/strong scaling across chips goes through DomainSimulation once
a multi-chip slice is attached.
"""
import json
import os
import subprocess
import sys

SIZES = [int(s) for s in os.environ.get(
    "SWEEP_REPS", "5,8,10,13,15").split(",")]

for rep in SIZES:
    env = dict(os.environ, BENCH_REP=str(rep), BENCH_CHUNKS="3")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "..", "..", "bench.py")],
        env=env, capture_output=True, text=True)
    line = out.stdout.strip().splitlines()[-1] if out.stdout else "{}"
    print(line, flush=True)
