#!/usr/bin/env python
"""Hardware-vs-engine scaling attribution probe.

The pinned 4→16-core gate (BENCH/scaling.py) compares ONE JVM at two widths,
so a sub-0.8 efficiency has two possible causes that the ratio alone cannot
distinguish:

  (a) the ENGINE stops scaling (shuffle contention, lock convoys, skew);
  (b) the BOX stops scaling (the Firecracker guest's DRAM-bandwidth share
      caps aggregate throughput regardless of how work is arranged).

This probe separates them. Phase A runs the flagship pipeline in one
local[16] JVM. Phase B runs FOUR CONCURRENT, fully independent local[4]
JVMs — separate processes, separate Spark sessions, separate inputs of the
same size, zero shared engine state. Four independent 4-core jobs cannot
suffer any cross-JVM engine bottleneck, so:

  * if aggregate(B) ≈ 4 × single-4-core throughput  →  the box scales and a
    low 4v16 ratio would be the engine's fault;
  * if aggregate(B) ≈ single local[16] throughput (both far below
    4 × 4-core) →  the ceiling is hardware: the guest's memory-bandwidth
    share is exhausted, and NO arrangement of 16 busy cores — including a
    perfectly-scaling engine — can exceed it.

Writes BENCH/bandwidth_probe_latest.json.

Usage: python BENCH/bandwidth_probe.py [n_pages_per_job]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", str(2 * {cores}) + "g")
from geoclimate_spark.session import get_spark
from geoclimate_spark.plans.flagship import zone_tile_language_mix
from geoclimate_spark.sources.pages import synth_pages

cores, n = {cores}, {n}
spark = get_spark(app=f"bwprobe-{{cores}}-{{os.getpid()}}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = synth_pages(spark, n, partitions=128)
for tag in ("warmup", "measured"):
    t0 = time.perf_counter()
    groups = zone_tile_language_mix(pages).count()
    dt = time.perf_counter() - t0
    print(json.dumps({{"tag": tag, "cores": cores, "sec": dt,
                       "pages_per_sec": n / dt, "groups": groups}}),
          flush=True)
spark.stop()
"""


def _steal() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _parse_measured(stdout: str) -> dict:
    recs = [json.loads(l) for l in stdout.splitlines() if l.startswith("{")]
    return next(r for r in recs if r["tag"] == "measured")


def run_single(cores: int, n: int) -> dict:
    code = _WORKER.format(root=str(ROOT), cores=cores, n=n)
    s0, t0 = _steal()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    s1, t1 = _steal()
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    rec = _parse_measured(out.stdout)
    rec["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
    return rec


def run_concurrent(n_jobs: int, cores: int, n: int) -> dict:
    """n_jobs independent JVMs started together; aggregate throughput is
    measured over the MEASURED phases only — each worker prints its own
    timings, and the warmup phases overlap identically across workers, so
    summing per-worker measured pages/s is the honest aggregate (each
    worker's measured window runs while the other three are equally busy)."""
    code = _WORKER.format(root=str(ROOT), cores=cores, n=n)
    s0, t0 = _steal()
    wall0 = time.perf_counter()
    procs = [subprocess.Popen([sys.executable, "-c", code],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True) for _ in range(n_jobs)]
    outs = [p.communicate(timeout=1800) for p in procs]
    wall = time.perf_counter() - wall0
    s1, t1 = _steal()
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(se[-2000:])
    recs = [_parse_measured(so) for so, _ in outs]
    return {
        "n_jobs": n_jobs, "cores_each": cores, "pages_each": n,
        "per_job_pages_per_sec": [round(r["pages_per_sec"], 1) for r in recs],
        "aggregate_pages_per_sec": round(sum(r["pages_per_sec"] for r in recs), 1),
        "wall_sec_all_jobs": round(wall, 1),
        "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    result = {"n_pages_per_job": n}
    single4 = run_single(4, n)
    result["single_local4"] = {
        "pages_per_sec": round(single4["pages_per_sec"], 1),
        "steal_pct": single4["steal_pct"]}
    single16 = run_single(16, n)
    result["single_local16"] = {
        "pages_per_sec": round(single16["pages_per_sec"], 1),
        "steal_pct": single16["steal_pct"]}
    result["four_independent_local4"] = run_concurrent(4, 4, n)
    agg = result["four_independent_local4"]["aggregate_pages_per_sec"]
    one16 = result["single_local16"]["pages_per_sec"]
    ideal = 4 * result["single_local4"]["pages_per_sec"]
    result["ideal_4x_local4"] = round(ideal, 1)
    result["aggregate_vs_ideal"] = round(agg / ideal, 3)
    result["local16_vs_ideal"] = round(one16 / ideal, 3)
    result["verdict"] = (
        "hardware ceiling: independent JVMs cap at the same aggregate as one "
        "local[16] — the guest's memory-bandwidth share, not the engine, "
        "limits >8-core scaling"
        if agg < 0.8 * ideal and abs(agg - one16) / max(agg, one16) < 0.35
        else ("engine-attributable gap: independent JVMs scale but one "
              "local[16] does not" if agg >= 0.8 * ideal and one16 < 0.8 * ideal
              else "box scales: both aggregate and local[16] near 4x ideal"))
    result["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out = Path(__file__).parent / "bandwidth_probe_latest.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
