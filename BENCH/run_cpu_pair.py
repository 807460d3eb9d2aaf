#!/usr/bin/env python
"""CPU-work scaling pair — the dirty-window-tolerant evidence channel.

The wall-clock N→4N sweep (run_scaling.py) needs a probe-clean host,
which this VM sometimes refuses to provide for hours. CPU-seconds do
not have that problem: a hypervisor stall inflates wall-clock but not
`executorCpuTime`, so running the IDENTICAL replay at N=local[2] and
4N=local[8] and comparing total executor CPU gives stall-resistant
evidence that the engine does 4N-level parallelism without adding
serialization or contention — the same total work, spread over 4x the
cores. (It cannot prove the host DELIVERED 4x CPU — that is what the
probe-gated wall-clock pair shows when a window opens — but an engine
that serialized or thrashed at higher parallelism would show CPU ratio
>> 1, and none of the integrity counters would survive bit-identical.)

Runs ungated, appends its section to BENCH/BASELINE.md and writes
BENCH/cpu_pair.json with full telemetry including the (possibly dirty)
probe brackets so a reader can adjudicate.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import default_log_cache, run_level  # noqa: E402

N, N4 = 2, 8


def main() -> None:
    n_events = int(os.environ.get("BENCH_CDC_EVENTS", "16000000"))
    n_batches = int(os.environ.get("BENCH_CDC_BATCHES", "4"))
    cache = os.environ.get("BENCH_CDC_LOG_CACHE", default_log_cache())
    os.environ["BENCH_CDC_LOG_CACHE"] = cache
    # don't settle-wait inside the children: this channel is explicitly
    # dirty-window tolerant, and CPU totals don't care about stalls
    os.environ["BENCH_CLEAN_WAIT_SEC"] = os.environ.get(
        "BENCH_CLEAN_WAIT_SEC", "0"
    )

    results = {}
    for cpus in (N, N4):
        r = run_level(cpus, n_events, n_batches)
        results[cpus] = r
        print(
            f"local[{cpus}]: wall {r['cdc_wall_sec']}s, "
            f"{r['cdc_events_per_sec']:,.0f} ev/s, "
            f"tree CPU {r.get('tree_cpu_sec')}s "
            f"(user {r.get('tree_user_sec')}s / sys {r.get('tree_sys_sec')}s, "
            f"minflt {r.get('tree_minflt')}, "
            f"JVM-only {r.get('executor_cpu_sec')}s)",
            flush=True,
        )

    a, b = results[N], results[N4]
    for k in ("dedup_drops", "rows_written", "late_events"):
        assert a[k] == b[k], f"integrity mismatch on {k}: {a[k]} != {b[k]}"

    # tree CPU (whole process tree: JVM + Python/Arrow workers) is the
    # honest work metric; the JVM-only REST metric is reported alongside.
    # USER CPU is the headline ratio: sys CPU absorbs the host's
    # fault-handler pathology (see bench.tree_cpu_stats), so on a
    # degraded host total-CPU ratios measure the hypervisor, not the
    # engine — user-CPU ratios stay honest in both regimes.
    cN = a.get("tree_cpu_sec") or a.get("executor_cpu_sec")
    c4 = b.get("tree_cpu_sec") or b.get("executor_cpu_sec")
    ratio = round(c4 / cN, 3) if cN and c4 else None
    uN, u4 = a.get("tree_user_sec"), b.get("tree_user_sec")
    user_ratio = round(u4 / uN, 3) if uN and u4 else None
    fN, f4 = a.get("tree_minflt"), b.get("tree_minflt")
    flt_ratio = round(f4 / fN, 3) if fN and f4 else None
    out = {
        "events": n_events,
        "batches": n_batches,
        "N": {"cpus": N, **a},
        "N4": {"cpus": N4, **b},
        "cpu_ratio_4N_over_N": ratio,
        "user_cpu_ratio_4N_over_N": user_ratio,
        "minflt_ratio_4N_over_N": flt_ratio,
        "wall_efficiency": round(
            (b["cdc_events_per_sec"] / a["cdc_events_per_sec"]) / (N4 / N), 3
        ),
        "generated": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    with open(os.path.join(REPO, "BENCH", "cpu_pair.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("cpu_ratio_4N_over_N", "user_cpu_ratio_4N_over_N",
                       "minflt_ratio_4N_over_N", "wall_efficiency")}),
          flush=True)

    write_section(os.path.join(REPO, "BENCH", "BASELINE.md"), cpu_pair_md(out))
    print("wrote CPU-pair section to BENCH/BASELINE.md", flush=True)


SECTION_HEADING = "## CPU-work invariance pair (stall-resistant channel)"


def write_section(path: str, md: str, heading: str = SECTION_HEADING) -> None:
    """Replace any existing section(s) with this heading (through the
    next '## ' heading or EOF) and append the fresh one — reruns update
    the evidence in place instead of accumulating stale copies."""
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        text = ""
    while heading in text:
        start = text.index(heading)
        nxt = text.find("\n## ", start + len(heading))
        text = text[:start].rstrip() + ("\n" + text[nxt + 1:] if nxt != -1 else "\n")
    with open(path, "w") as f:
        f.write(text.rstrip() + "\n" + md)


def cpu_pair_md(out: dict) -> str:
    """Render the BASELINE.md section from a cpu_pair.json payload —
    shared with run_scaling.py, which re-appends this section after it
    rewrites BASELINE.md (the clean-window sweep must not destroy the
    stall-resistant evidence channel)."""
    a, b = out["N"], out["N4"]
    n_events, n_batches = out["events"], out["batches"]
    ratio = out["cpu_ratio_4N_over_N"]
    user_ratio = out.get("user_cpu_ratio_4N_over_N")
    flt_ratio = out.get("minflt_ratio_4N_over_N")
    # decompose: the JVM does the Spark-side work (scan/shuffle/codegen);
    # the difference tree - JVM is the forked Python/Arrow merge workers
    jvm_n, jvm_4 = a.get("executor_cpu_sec"), b.get("executor_cpu_sec")
    jvm_ratio = round(jvm_4 / jvm_n, 3) if jvm_n and jvm_4 else None
    sN, s4 = a.get("tree_sys_sec"), b.get("tree_sys_sec")
    sys_ratio = round(s4 / sN, 3) if sN and s4 else None

    def probes(r: dict) -> str:
        p, q = r["probe_pre"], r["probe_post"]
        return (f"{p['first_touch_gbs']}/{p['steady_gbs']} → "
                f"{q['first_touch_gbs']}/{q['steady_gbs']}")

    def flt(r: dict) -> str:
        mn, mj = r.get("tree_minflt"), r.get("tree_majflt")
        return f"{mn:,} / {mj:,}" if mn is not None else "n/a"

    return f"""

## CPU-work invariance pair (stall-resistant channel)

Generated by `python BENCH/run_cpu_pair.py` on {out["generated"]}:
the identical {n_events:,}-event replay ({n_batches} micro-batches,
shared staged changelog, fresh JVM per level) at N=local[{N}] and
4N=local[{N4}], comparing **process-tree CPU split into user and sys**
over the timed merge loop (JVM plus its forked Python/Arrow workers,
bracketed /proc subtree scan — the JVM-only `executorCpuTime` REST
metric misses the Arrow merge kernel, which runs in Python workers).

**Why user CPU is the headline.** A hypervisor stall inflates
wall-clock but is not charged as guest CPU, so CPU-seconds survive
windows the probe-gated wall-clock sweep must discard. But the two
halves differ on THIS host's specific pathology (collapsed first-touch
page-fault bandwidth): fault handling is kernel time, so when each
fault costs 10-100x its normal cycles, **sys** CPU balloons with zero
extra engine work, while **user** CPU — the engine's own instruction
stream — stays honest. The minor-fault COUNTS printed alongside close
the argument: if 4N faults the same number of pages as N (ratio ≈ 1)
yet burns more sys time, the delta is the host's fault handler, not
the engine allocating more.

| level | user CPU (s) | sys CPU (s) | JVM-only CPU (s) | minflt / majflt | wall (s) | events/sec | probes pre→post (first/steady GB/s) |
|---|---|---|---|---|---|---|---|
| local[{N}]  (N)  | {a.get("tree_user_sec")} | {a.get("tree_sys_sec")} | {a.get("executor_cpu_sec")} | {flt(a)} | {a["cdc_wall_sec"]} | {a["cdc_events_per_sec"]:,.1f} | {probes(a)} |
| local[{N4}] (4N) | {b.get("tree_user_sec")} | {b.get("tree_sys_sec")} | {b.get("executor_cpu_sec")} | {flt(b)} | {b["cdc_wall_sec"]} | {b["cdc_events_per_sec"]:,.1f} | {probes(b)} |

**User-CPU ratio 4N/N = {user_ratio}** (total incl. sys: {ratio};
JVM-only {jvm_ratio}; sys-only {sys_ratio}; minor-fault count ratio
{flt_ratio}). A user ratio near 1.0 means quadrupling parallelism adds
no engine-side work — the same instruction stream spread over 4x the
cores; an engine that serialized, spun on locks, or thrashed its
allocator at 4N would show user CPU >> 1 and could not keep the replay
integrity counters bit-identical. One residual caveat: user cycles do
charge memory-STALL time, so on a single shared bus concurrent workers
can inflate the user ratio somewhat when aggregate demand crosses the
host ceiling — on a real N→4N cluster each executor brings its own
memory bus, so the measured user ratio is an UPPER bound on engine-side
scaling loss. Wall-clock efficiency on this pair read
{out["wall_efficiency"]} under the bracketing probes shown (adjudicate
against the clean-window headline above). Replay integrity counters
(dedup drops {a["dedup_drops"]:,}, rows MERGEd {a["rows_written"]:,},
late events {a["late_events"]:,}) are bit-identical across both levels.
"""


if __name__ == "__main__":
    main()
