#!/usr/bin/env python
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec}, "sf": ...,
   "throughput_pages_per_sec": ..., "synth_pages": ...}

The headline metric is the full flagship pipeline (html → extract → PIP join →
tile → agg) over a deterministic synthetic pages table of SPARK_GRAFT_BENCH_N
rows (default 1e6) — the documents-derived tables are too small to measure
throughput. Scaling-efficiency evidence (local[8] vs local[32], north rule)
is produced by BENCH/scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_N = int(os.environ.get("SPARK_GRAFT_BENCH_N", "1000000"))


def _cpu_sample() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()[1:]
    v = [int(x) for x in f]
    return sum(v), v[7]  # total jiffies, steal jiffies


def _membw_gbps() -> float:
    """~1 s single-thread memory-bandwidth probe (numpy sum over a
    cache-defeating 256 MiB array). The shared host's effective DRAM share
    swings ~1.6× between windows with ZERO /proc/stat steal (see
    BENCH/bandwidth_probe.py), so each artifact records its own window."""
    import numpy as np
    a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB
    a.sum()  # fault pages in
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 0.8:
        a.sum()
        n += 1
    return round(n * a.nbytes / (time.perf_counter() - t0) / 1e9, 2)


def main() -> None:
    from geoclimate_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up codegen/JIT/parquet-footer paths on the smallest fixture so
    # the first timed query does not absorb one-time JVM costs
    try:
        entrymod.entry(spark).count()
        spark.catalog.clearCache()
    except Exception as e:  # pragma: no cover - warmup must never kill bench
        print(f"# warmup failed: {e}", file=sys.stderr)

    # headline FIRST (right after warmup): synthetic pages pipeline
    # throughput. It used to run after the 100+-query section, ~12 minutes
    # after launch — on this shared host the noise window at launch and the
    # window at +12 min routinely differ (BENCH/BASELINE.md rows 20-33), so
    # a run started in a verified-quiet window still drew noisy trials. The
    # metric itself is unchanged: one untimed warmup of the same plan, then
    # the MEDIAN of 5 timed trials (the round-3 pinned protocol), all
    # trials recorded.
    from geoclimate_spark.plans.flagship import zone_tile_language_mix
    from geoclimate_spark.sources.pages import synth_pages

    pages = synth_pages(spark, SYNTH_N, partitions=CPUS * 4)
    n_groups = zone_tile_language_mix(pages).count()  # warmup, untimed
    membw_pre = _membw_gbps()
    cpu0 = _cpu_sample()
    # steal-gated trials (round-4 verdict #7): the r4 median absorbed two
    # 4-second host-noise trials. Measure /proc/stat steal around EACH
    # trial; a trial with >= 1% steal is recorded but NOT kept — rerun
    # until 5 clean trials (cap 12 attempts; if the whole window is dirty,
    # fall back to all trials and say so in the artifact).
    trials: list[float] = []
    trial_log: list[dict] = []
    while len(trials) < 5 and len(trial_log) < 12:
        c0 = _cpu_sample()
        t0 = time.perf_counter()
        zone_tile_language_mix(pages).count()
        sec = round(time.perf_counter() - t0, 3)
        c1 = _cpu_sample()
        steal = round(100.0 * (c1[1] - c0[1]) / max(1, c1[0] - c0[0]), 2)
        clean = steal < 1.0
        trial_log.append({"sec": sec, "steal_pct": steal, "clean": clean})
        if clean:
            trials.append(sec)
    degraded = len(trials) < 3
    if degraded:  # hopelessly noisy window — report it, don't hide it
        trials = [t["sec"] for t in trial_log]
    cpu1 = _cpu_sample()
    membw_post = _membw_gbps()
    host = {
        "steal_pct_headline": round(100.0 * (cpu1[1] - cpu0[1])
                                    / max(1, cpu1[0] - cpu0[0]), 2),
        "membw_gbps_pre": membw_pre,
        "membw_gbps_post": membw_post,
        "headline_trial_log": trial_log,
        "headline_clean_trials": sum(1 for t in trial_log if t["clean"]),
        "headline_window_degraded": degraded,
    }
    pipeline_sec = sorted(trials)[len(trials) // 2]
    print(f"# synth_pipeline: median {pipeline_sec:.2f}s of {trials} "
          f"(log {trial_log}), {n_groups} groups", file=sys.stderr)
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        # isolate queries: operators persist intermediates (shingle sets,
        # LSH signatures); without clearing, later timings silently reuse
        # earlier caches AND accumulate executor-memory/GC pressure
        spark.catalog.clearCache()
        # localCheckpoint RDD blocks (CC loops, pagerank) are only released
        # by the ContextCleaner after their py4j refs are GC'd on BOTH
        # sides; without an explicit collect a 100+-query session slowly
        # fills storage memory and late queries inherit straggler tails
        import gc as _gc
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        # one untimed warmup run, then the timed run — the SAME protocol the
        # headline uses. The first execution of a plan shape pays one-time
        # JVM codegen/JIT compilation (measured: dedup_minhash_lsh 10.3 s
        # cold vs 2.1 s steady-state at sf0.1); at the target scale that
        # compile cost amortizes to zero, so recording it as the per-query
        # cost misranks the operators. clearCache between the runs makes the
        # timed run recompute everything (persists are re-materialized;
        # fresh DataFrame lineage means no shuffle-stage reuse either).
        fn(spark, SF_DIR).count()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()  # materialize the full plan
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    timings["synth_pipeline"] = round(pipeline_sec, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "flagship_pipeline_sec_synth_pages",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "synth_pages": SYNTH_N,
        "throughput_pages_per_sec": round(SYNTH_N / pipeline_sec, 1),
        "pipeline_trials": trials,
        "cpus": CPUS,
        "host": host,
    }
    scaling_path = Path(__file__).parent / "BENCH" / "scaling_latest.json"
    if scaling_path.exists():
        result["scaling"] = json.loads(scaling_path.read_text())
    # round-over-round comparison (judge protocol): pinned headline numbers
    # from the prior rounds ride in every artifact so regressions are
    # self-evident without cross-referencing old files
    hist_path = Path(__file__).parent / "BENCH" / "round_history.json"
    if hist_path.exists():
        result["prev_rounds"] = json.loads(hist_path.read_text())
    # persist the FULL result so the artifact survives driver stdout
    # truncation (BENCH_r{N}.json keeps only the final 2000 stdout chars)
    (Path(__file__).parent / "BENCH" / "bench_latest.json").write_text(
        json.dumps(result, indent=2) + "\n")
    # the driver parses the LAST stdout line from a 2000-char tail window —
    # r1/r2 both failed to parse because the one-line artifact outgrew it.
    # Emit a compact line that always fits: headline + scaling summary +
    # as many per-query timings as fit (slowest first — the informative end)
    compact = {k: result[k] for k in (
        "metric", "value", "unit", "sf", "synth_pages",
        "throughput_pages_per_sec", "pipeline_trials", "cpus", "host")}
    if "scaling" in result:
        s = result["scaling"]
        compact["scaling"] = {k: s[k] for k in (
            "n_pages", "cores_small", "cores_big", "throughput_small",
            "throughput_big", "scaling_efficiency",
            "median_pair_efficiency", "subsat_2v8_median",
            "subsat_2v8_best", "pass") if k in s}
    if "prev_rounds" in result:
        # headline numbers ONLY — the full per-round records grow each round
        # and would eventually push the compact line past the 2000-char
        # driver tail window again (full history rides in bench_latest.json)
        compact["prev_rounds"] = {
            r: {"headline_sec": v.get("headline_sec"),
                "pages_per_sec": v.get("throughput_pages_per_sec")}
            for r, v in result["prev_rounds"].items()}
    compact["queries_total"] = len(timings)
    compact["full_artifact"] = "BENCH/bench_latest.json"
    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    compact["queries"] = {}
    budget = 1900  # hard driver tail window is 2000
    # even headline-only history grows one entry per round; if the BASE
    # object ever outgrows the window the queries loop below cannot save
    # it, so shed the optional blocks first (both ride in bench_latest.json)
    for shed in ("prev_rounds", "host"):
        if len(json.dumps(compact)) > budget and shed in compact:
            del compact[shed]
    for name, sec in by_cost:
        compact["queries"][name] = sec
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            compact["queries_shown"] = len(compact["queries"])
            break
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
