"""Scaling-efficiency evidence (BASELINE.md protocol; [B:2,B:14]).

No multi-node cluster exists in this sandbox, so the N -> 4N executor
criterion is evidenced by running the IDENTICAL pipeline on IDENTICAL input
at two CPU-pinned parallelism levels — one subprocess per configuration so
each JVM is fresh — with medians over the configured repetitions:

    raw efficiency    = (throughput_hi / throughput_lo) / (hi/lo)   gate >= 0.8
    engine efficiency = pipeline speedup / best minimal-JVM-Spark
                        speedup on the same span (platform ceiling) gate >= 0.8

GATE LABELING (ADVICE r3): the raw number is the gate AS WRITTEN in
BASELINE.json and is reported first; the engine number is the protocol
rev-3 PROPOSAL (this repo's own BASELINE.md revision) and is labeled
"pending upstream acceptance" — redefining an acceptance criterion is the
criterion owner's call, not the implementation's.  The ceiling denominator
is measured over several draws and reported as a RANGE, with the engine
efficiency computed against best/median/worst draws.

Primary span: 1 -> 4 pinned CPUs (the host's only linear-grant span).
Second span (round 4, VERDICT item 7): 8 -> 32 pinned CPUs — a second
evidence point for the ceiling claim: if the engine tracks the minimal-JVM
ceiling on a span where the hypervisor grant is deeply sublinear, the
normalization argument is not an artifact of the 1->4 choice.

Usage:  python bench_tools/scaling.py [n_rows] [reps] [--second-span]
Writes BENCH.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_RUN_SNIPPET = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from kgforge.conf import get_spark
from kgforge import pipeline

# Task slots per config are tuned to that config's own swept optimum
# (_SLOT_OPTIMA below; sweeps disclosed in BENCH.md).  Overcommit only wins
# at 4 cpus; 1 slot/core is fastest at 1, 8, and 32 pinned cpus.
# Both sides best-vs-best.
# initial shuffle partitions = 4x cores: AQE coalesces small shuffles DOWN
# but can never split an oversized reduce partition UP — at the larger
# corpus sizes slots-many partitions spill (measured stage-2 blowup at 2x
# rows on the 4-cpu config); both configs get the same 4x rule.
spark = get_spark("scaling", master="local[{slots}]", shuffle_partitions={cores} * 4,
                  extra={{"spark.local.dir": "/dev/shm/spark-local-{cores}"}})
src = spark.read.parquet({corpus!r})
src.count()  # warm: file listing + footer reads out of the measurement
# outputs on tmpfs: the scaling criterion measures compute/shuffle scaling,
# not this sandbox's single virtio disk (a real cluster writes to distributed
# storage whose bandwidth scales with executors)
out = "/dev/shm/kgforge_scaling_out_{cores}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
m = pipeline.run(spark, src, out, n_parts=64, resume=False, run_id="scale{cores}")
wall = time.time() - t0
print("RESULT " + json.dumps({{"wall": wall, "n": m["n_source"],
    "stage1": m["stage1_wall_s"], "stage2": m["stage2_wall_s"],
    "phases": {{k: v for k, v in m.items() if k.startswith("t_")}}}}))
spark.stop()
"""

# minimal PURE-JVM Spark jobs (no Python anywhere): the platform's own
# ceiling for Spark-shaped work on this host — context for the efficiency
# number (an engine cannot out-scale what a bare scan+agg achieves)
_REF_SNIPPET = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from kgforge.conf import get_spark
from pyspark.sql import functions as F
spark = get_spark("ref", master="local[{slots}]", shuffle_partitions={cores},
                  extra={{"spark.local.dir": "/dev/shm/sl-ref{cores}"}})
src = spark.read.parquet({corpus!r})
src.count()
t = time.time()
(src.withColumn("h", F.sha2(F.encode("content", "UTF-8"), 256))
    .groupBy(F.substring("h", 1, 2).alias("k"))
    .agg(F.count("*"), F.avg(F.length("content"))).count())
scan_agg = time.time() - t
t = time.time()
src.select(F.concat("repo", "path", "commit").alias("k"), "lang").distinct().count()
distinct = time.time() - t
print("RESULT " + json.dumps({{"scan_agg": scan_agg, "distinct": distinct}}))
spark.stop()
"""


def _pin_prefix(cores: int) -> list:
    return ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"]


def run_reference(cores: int, corpus: str) -> dict:
    slots = cores if cores == 1 else 2 * cores  # bare-JVM jobs: no Python stalls to hide
    code = _REF_SNIPPET.format(repo=REPO, cores=cores, slots=slots, corpus=corpus)
    cmd = _pin_prefix(cores) + [sys.executable, "-c", code]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no reference RESULT: {p.stderr[-1500:]}")


# Per-config task-slot optima, each swept on THIS host and disclosed in
# BENCH.md.  3 slots/core only wins at 4 cpus (hides JVM<->Python stalls);
# at 8/32 pinned cpus 1 slot/core is fastest and overcommit actively hurts
# (round-4 sweep, 1.92M rows: 8 cpus -> 8 slots 29.6s / 16 slots 31.6s /
# 24 slots 51.3s; 32 cpus -> 32 slots 20.7s / 48 slots 28.0s / 96 slots
# 88.4s — 96 slots on a hypervisor with sublinear grants simply thrashes).
_SLOT_OPTIMA = {1: 1, 4: 12, 8: 8, 32: 32}


def run_once(cores: int, corpus: str, pin: bool = True) -> dict:
    """Run the pipeline once at local[cores].  With pin=True the whole process
    tree (JVM + pyspark workers) is taskset-pinned to exactly ``cores`` CPUs —
    without pinning, a local[1] job free-rides its Python workers and GC
    threads on idle cores and understates the true 1-core baseline."""
    slots = _SLOT_OPTIMA.get(cores, cores)
    code = _RUN_SNIPPET.format(repo=REPO, cores=cores, slots=slots, corpus=corpus)
    cmd = [sys.executable, "-c", code]
    if pin:
        cmd = _pin_prefix(cores) + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT from local[{cores}]: {p.stdout[-2000:]} {p.stderr[-2000:]}")


def measure_span(
    lo: int, hi: int, corpus: str, n_rows: int, reps: int, ref_draws: int
) -> dict:
    """Pipeline medians at both core counts + a multi-draw ceiling."""
    results: dict = {}
    for cores in (lo, hi):
        walls, s1s, s2s = [], [], []
        for _ in range(reps):
            r = run_once(cores, corpus)
            walls.append(r["wall"])
            s1s.append(r["stage1"])
            s2s.append(r["stage2"])
        results[cores] = {
            "wall_median_s": round(statistics.median(walls), 2),
            "walls": [round(w, 2) for w in walls],
            "stage1_median_s": round(statistics.median(s1s), 2),
            "stage2_median_s": round(statistics.median(s2s), 2),
            "throughput_rows_per_s": round(n_rows / statistics.median(walls), 1),
        }
    # ceiling: several independent subprocess draws per config; the speedup
    # per draw pairs draw i at lo with draw i at hi, and the RANGE across
    # draws is reported (ADVICE r3: a single draw makes the denominator a
    # lottery — disclosed drift ~2.07-3.00x across r3 draws)
    draws = []
    for _ in range(ref_draws):
        ref_lo = run_reference(lo, corpus)
        ref_hi = run_reference(hi, corpus)
        draws.append(
            {k: round(ref_lo[k] / ref_hi[k], 2) for k in ("scan_agg", "distinct")}
        )
    per_draw_best = [max(d.values()) for d in draws]
    ceiling = {
        "draws": draws,
        "best": max(per_draw_best),
        "median": round(statistics.median(per_draw_best), 2),
        "min": min(per_draw_best),
    }
    factor = hi / lo
    thr_lo = results[lo]["throughput_rows_per_s"]
    thr_hi = results[hi]["throughput_rows_per_s"]
    speedup = round(thr_hi / thr_lo, 2)
    return {
        "lo": lo,
        "hi": hi,
        "results": results,
        "raw_efficiency": round((thr_hi / thr_lo) / factor, 3),
        "pipeline_speedup": speedup,
        "ceiling": ceiling,
        "engine_efficiency": {
            "vs_best_ceiling": round(speedup / ceiling["best"], 2),
            "vs_median_ceiling": round(speedup / ceiling["median"], 2),
            "vs_min_ceiling": round(speedup / ceiling["min"], 2),
        },
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(args[0]) if args else 120_000
    reps = int(args[1]) if len(args) > 1 else 3
    second_span = "--second-span" in sys.argv

    from kgforge.corpus import CORPUS_VERSION, write_corpus_parquet

    corpus = f"/tmp/kgforge_scaling_corpus_v{CORPUS_VERSION}_{n_rows}.parquet"
    if not os.path.exists(corpus):
        write_corpus_parquet(corpus, n_rows)

    # N=1 -> 4N=4: the only span where this sandbox's hypervisor grants a
    # full 4x CPU (measured host throughput grants: 1->4 cpus = 4.07x,
    # 4->16 = 3.16x, 8->32 = 2.3x; see BENCH.md).  Both runs CPU-pinned.
    span14 = measure_span(1, 4, corpus, n_rows, reps, ref_draws=3)
    span832 = None
    if second_span:
        span832 = measure_span(8, 32, corpus, n_rows, max(2, reps - 1), ref_draws=3)

    eff = span14["raw_efficiency"]
    eng = span14["engine_efficiency"]
    gate_status = (
        f"raw {'PASS' if eff >= 0.8 else 'FAIL'} ({eff}); proposed-rev-3 "
        f"engine vs ceiling draws: best {eng['vs_best_ceiling']} / median "
        f"{eng['vs_median_ceiling']} / min {eng['vs_min_ceiling']} "
        "(pending upstream acceptance; no single draw is privileged)"
    )
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": eff,
        "gate": 0.8,
        "passes": eff >= 0.8,
        "gate_status": gate_status,
        "pipeline_speedup_1to4": span14["pipeline_speedup"],
        "ceiling_1to4": span14["ceiling"],
        "engine_efficiency_1to4": eng,
        "second_span_8to32": span832,
        "n_rows": n_rows,
        "reps": reps,
        "N_1cpu": span14["results"][1],
        "4N_4cpu": span14["results"][4],
    }
    print(json.dumps(summary))
    _write_bench_md(n_rows, reps, span14, span832)


def _span_table(span: dict) -> str:
    lo, hi, res = span["lo"], span["hi"], span["results"]
    slots = f"local[{_SLOT_OPTIMA.get(lo, lo)}]"
    slots_hi = f"local[{_SLOT_OPTIMA.get(hi, hi)}]"
    return f"""| config | median wall (s) | stage1 (s) | stage2 (s) | rows/s |
| --- | --- | --- | --- | --- |
| {lo} cpu ({slots}) | {res[lo]['wall_median_s']} | {res[lo]['stage1_median_s']} | {res[lo]['stage2_median_s']} | {res[lo]['throughput_rows_per_s']} |
| {hi} cpus ({slots_hi}) | {res[hi]['wall_median_s']} | {res[hi]['stage1_median_s']} | {res[hi]['stage2_median_s']} | {res[hi]['throughput_rows_per_s']} |
"""


def _write_bench_md(n_rows: int, reps: int, span14: dict, span832: dict | None) -> None:
    eff = span14["raw_efficiency"]
    eng = span14["engine_efficiency"]
    ceil = span14["ceiling"]
    res = span14["results"]
    second = ""
    if span832 is not None:
        c832 = span832["ceiling"]
        second = f"""
## Second evidence span: 8 -> 32 pinned CPUs (round 4)

On this span the hypervisor grant is deeply sublinear (~2.3x for pure-CPU
pools), so NEITHER the pipeline nor bare JVM Spark can approach 4x; the
claim under test is that the pipeline TRACKS the minimal-JVM ceiling, i.e.
the engine adds no scaling loss of its own on a second, independent span.

{_span_table(span832)}
Pipeline speedup 8->32: **{span832['pipeline_speedup']}x**; minimal-JVM-Spark
ceiling draws (best-per-draw): {[max(d.values()) for d in c832['draws']]}
(best {c832['best']}x, median {c832['median']}x, min {c832['min']}x).
Engine efficiency on this span: **{span832['engine_efficiency']['vs_best_ceiling']}
(vs best draw)** / {span832['engine_efficiency']['vs_median_ceiling']} (vs median) /
{span832['engine_efficiency']['vs_min_ceiling']} (vs min).  Raw efficiency
{span832['raw_efficiency']} is dominated by the grant curve, as predicted by
the protocol's normalization argument.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence (generated {time.strftime('%Y-%m-%d %H:%M')} UTC)

Protocol: BASELINE.md "Scaling-measurement protocol" — the identical KG
pipeline on the identical {n_rows:,}-row deterministic corpus at two
CPU-pinned parallelism levels (sandbox stand-in for N vs 4N executors),
{reps} repetitions, median reported.

**GATE RESULT (labeling per ADVICE r3): raw {"PASS" if eff >= 0.8 else "FAIL"} ({eff} vs 0.8).
Proposed-rev-3 engine efficiency, reported against the ceiling's observed
RANGE rather than any single draw: {eng['vs_best_ceiling']} (vs best draw) /
{eng['vs_median_ceiling']} (vs median) / {eng['vs_min_ceiling']} (vs min) —
this metric is this repo's protocol revision, PENDING UPSTREAM ACCEPTANCE;
the raw number is the gate as originally written and is always co-reported
first.**

**Why N=1 CPU vs 4N=4 CPUs:** this host's hypervisor does not grant linear
CPU beyond ~4 busy vCPUs (measured pure-CPU throughput grants with pinned
worker pools: 1->4 cpus = 4.07x, 4->16 = 3.16x, 8->32 = 2.3x), so 1->4 is
the only span where the HARDWARE can express a 4x speedup at all.  Each
config is taskset-pinned to exactly its CPU budget — unpinned, a "1-core"
local[1] job free-rides its separate-process Python workers on idle cores.
Task slots are tuned per config to its own swept optimum and disclosed:
1 slot at 1 CPU (2 slots: +14% wall, re-swept r3); 12 slots at 4 CPUs
(r3 sweep: 8/12/16 slots = 52.3/49.3/58.6 s — overcommit hides JVM<->Python
stalls only here); 8 slots at 8 CPUs (r4 sweep: 8/16/24 slots =
29.6/31.6/51.3 s); 32 slots at 32 CPUs (r4 sweep: 32/48/96 slots =
20.7/28.0/88.4 s — overcommit on a sublinear-grant hypervisor thrashes).
Outputs + shuffle dirs on tmpfs: the criterion targets compute/shuffle
scaling, not this sandbox's single virtio disk.

{_span_table(span14)}
**Raw scaling efficiency = (thr_4N / thr_N) / 4 = {eff}** (gate >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
**Engine scaling efficiency (proposed rev 3, pending upstream acceptance) =
pipeline speedup / platform Spark ceiling = {span14['pipeline_speedup']} /
[{ceil['min']} .. {ceil['best']}]: vs best draw {eng['vs_best_ceiling']}
({"PASS" if eng['vs_best_ceiling'] >= 0.8 else "FAIL"}), vs median draw
{eng['vs_median_ceiling']} ({"PASS" if eng['vs_median_ceiling'] >= 0.8 else "FAIL"}),
vs min draw {eng['vs_min_ceiling']} ({"PASS" if eng['vs_min_ceiling'] >= 0.8 else "FAIL"})**
— no single draw is privileged; the spread IS the finding (the denominator
is a measured, noisy quantity).

Raw walls: N {res[1]['walls']}, 4N {res[4]['walls']}.

The ceiling denominator is a measured, noisy quantity — reported as the
per-draw best-speedup list {[max(d.values()) for d in ceil['draws']]}
(best {ceil['best']}x / median {ceil['median']}x / min {ceil['min']}x), never a
single draw (ADVICE r3).

The raw ratio moves INVERSELY with serial-side engineering: round 3's
task-committed parse sink cut the 1-CPU stage-1 wall by ~20-25% (the JVM
parquet encode it removed was a pure serial bottleneck), which lowers the
numerator of the ratio even though both configs got faster in absolute
terms.  Both numbers are reported every round; the engine metric is the
one that measures design rather than the sandbox's shared memory bus (see
BASELINE.md "Scaling-measurement protocol", revision note).

## Platform ceiling (measured, same corpus, same pinning)

Minimal PURE-JVM Spark jobs — a bare parquet scan + sha2 + groupBy/agg, and
a bare wide-string distinct, no Python, no kgforge code — are the host's
own ceiling for Spark-shaped work (ALU-pure multiprocessing scales 4.07x
over the same span; the shortfall is the platform's memory/hypervisor
behavior for JVM-shaped work, not engine design).  The kgforge pipeline
speeds up **{span14['pipeline_speedup']}x** over the 1->4 span, i.e.
{eng['vs_best_ceiling']}-{eng['vs_min_ceiling']}x the minimal-Spark ceiling
depending on the draw — the engine tracks what bare Spark achieves here to
within the ceiling's own measurement noise; on a real multi-executor
cluster the per-executor memory bandwidth is not shared, which is what the
>=0.8 gate assumes.
{second}
## Memory note: parse-cache budget (round 4)

The fused parse stage memoizes per distinct query string through a
byte-budgeted LRU (kgforge/operators/extract.py:_ByteLRU, default 64 MiB
per Python worker, env KGFORGE_PARSE_CACHE_BYTES).  A 500k-distinct-query
fuzz run (tests/test_fuzz.py::test_parse_cache_bounded_on_high_distinct_corpus)
holds the cache at its budget with LRU eviction and <~1 GiB total process
RSS growth — the prior 200k-ENTRY cap admitted unbounded bytes per entry on
high-cardinality corpora.

## Benchmark-metric discontinuity note (ADVICE r3)

bench.py's headline metric is named `sum_of_query_medians_sec` from round 4
on: rounds 1-2 reported a true single-pass wall under `total_wall_sec`,
round 3 reported the sum of per-query 3-rep medians under that same name.
Cross-round comparisons spanning r2->r3 carry that measurement change;
r3->r4 comparisons are like-for-like (same median-sum definition).
"""
        )


if __name__ == "__main__":
    main()
