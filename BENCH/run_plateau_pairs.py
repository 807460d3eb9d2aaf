#!/usr/bin/env python
"""Plateau-qualified N→4N wall-clock pairs — the middle evidence tier.

The host has three regimes (BENCH/host_health.jsonl):

1. **clean** — first-touch >= 1 GB/s, steady >= 5: run_scaling.py's
   gate; the gold-standard wall-clock evidence.
2. **plateau** — steady memcpy fully healthy (~8 GB/s) but first-touch
   pinned ~10x low (0.15-0.25 GB/s), STABLE to ±5% for hours at a
   time. Not memory pressure (100+ GiB free); a half-recovered
   hypervisor state.
3. **stall** — both collapse 2-3 orders of magnitude; nothing timed
   inside one is usable.

run_scaling discards regime-2 samples because its gate is absolute.
But a pair whose FOUR in-situ brackets (pre+post at both levels) all
sit inside the same narrow plateau band is internally consistent: both
levels saw the identical host, so their RATIO — which is all the
scaling-efficiency rule needs — is meaningful, and if anything biased
LOW for the 4N side (8 workers fault concurrently against the same
crippled fault handler, so the shared-bottleneck penalty lands on the
big-parallelism leg). This harness runs K alternating N→4N pairs,
qualifies each by band-stability of its four brackets, asserts replay
integrity bit-identical, and reports every pair with its probes so a
reader can adjudicate. It refuses to certify inside regime 3.

Wrote for round 3 after the overnight watch (BENCH/watch.log) caught
only two sub-2-minute clean windows in 8 hours while the plateau held
for multiple hours at a stretch.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_cpu_pair import write_section  # noqa: E402
from run_scaling import default_log_cache, run_level  # noqa: E402

N, N4 = 2, 8

# a bracket is plateau-eligible when steady memcpy is healthy and
# first-touch is above the deep-stall floor …
MIN_STEADY_GBS = float(os.environ.get("PLATEAU_MIN_STEADY_GBS", "5.0"))
MIN_FIRST_GBS = float(os.environ.get("PLATEAU_MIN_FIRST_GBS", "0.1"))
# … and a PAIR qualifies when its four brackets sit in one band:
# max(first_touch)/min(first_touch) <= BAND (plateau observed ±5%;
# 1.5 rejects any mid-pair regime shift while tolerating probe noise)
BAND = float(os.environ.get("PLATEAU_BAND", "1.5"))


def _median(effs: list) -> float | None:
    """True median (average of middle two for even n) — must agree with
    bench.scaling_evidence._median over the same bank."""
    if not effs:
        return None
    effs = sorted(effs)
    mid = len(effs) // 2
    return round(
        effs[mid] if len(effs) % 2 else (effs[mid - 1] + effs[mid]) / 2, 3
    )


def _bank_doc(n_events: int, n_batches: int, pairs: list, rejected: list) -> dict:
    return {
        "events": n_events, "batches": n_batches,
        "band": BAND, "min_steady_gbs": MIN_STEADY_GBS,
        "min_first_gbs": MIN_FIRST_GBS,
        "pairs": pairs, "rejected": rejected,
        "best_efficiency": max((p["efficiency"] for p in pairs), default=None),
        "median_efficiency": _median([p["efficiency"] for p in pairs]),
        "generated": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }


def pair_brackets(rN: dict, r4: dict) -> list[dict]:
    return [rN["probe_pre"], rN["probe_post"], r4["probe_pre"], r4["probe_post"]]


def qualify(rN: dict, r4: dict) -> tuple[bool, str]:
    bs = pair_brackets(rN, r4)
    firsts = [b["first_touch_gbs"] for b in bs]
    if any(b["steady_gbs"] < MIN_STEADY_GBS for b in bs):
        return False, "steady memcpy below floor (deep stall)"
    if any(f < MIN_FIRST_GBS for f in firsts):
        return False, "first-touch below deep-stall floor"
    if max(firsts) / max(min(firsts), 1e-9) > BAND:
        return False, (
            f"first-touch band {min(firsts)}-{max(firsts)} wider than "
            f"{BAND}x (regime shift mid-pair)"
        )
    return True, "stable plateau band across all four brackets"


def main() -> None:
    n_events = int(os.environ.get("BENCH_CDC_EVENTS", "16000000"))
    n_batches = int(os.environ.get("BENCH_CDC_BATCHES", "4"))
    k_pairs = int(os.environ.get("PLATEAU_PAIRS", "3"))
    max_attempts = int(os.environ.get("PLATEAU_MAX_ATTEMPTS", "6"))
    cache = os.environ.get("BENCH_CDC_LOG_CACHE", default_log_cache())
    os.environ["BENCH_CDC_LOG_CACHE"] = cache
    # no settle-wait inside children: qualification is post-hoc from the
    # in-situ brackets, and waiting would burn the plateau window
    os.environ.setdefault("BENCH_CLEAN_WAIT_SEC", "0")

    # accumulate across invocations: an earlier bank's qualified pairs
    # are evidence too (same staged input, same code identity within a
    # round) — a later, choppier window must strengthen the bank, never
    # clobber it. PLATEAU_RESET=1 starts fresh.
    pairs: list[dict] = []
    rejected: list[dict] = []
    bank_path = os.path.join(REPO, "BENCH", "plateau_pairs.json")
    if os.environ.get("PLATEAU_RESET", "0") != "1" and os.path.exists(bank_path):
        try:
            with open(bank_path) as f:
                prior = json.load(f)
            if prior.get("events") == n_events and prior.get("batches") == n_batches:
                pairs = list(prior.get("pairs", []))
                rejected = list(prior.get("rejected", []))
                if pairs:
                    print(f"resuming bank: {len(pairs)} qualified pairs carried",
                          flush=True)
        except (OSError, ValueError):
            pass
    integrity: tuple | None = None
    attempt = 0
    while len(pairs) < k_pairs and attempt < max_attempts:
        attempt += 1
        rN = run_level(N, n_events, n_batches)
        r4 = run_level(N4, n_events, n_batches)
        for r in (rN, r4):
            key = (r["dedup_drops"], r["rows_written"], r["late_events"])
            if integrity is None:
                integrity = key
            assert key == integrity, f"replay integrity broke: {key} != {integrity}"
        ok, why = qualify(rN, r4)
        eff = round((r4["cdc_events_per_sec"] / rN["cdc_events_per_sec"]) / (N4 / N), 3)
        uN, u4 = rN.get("tree_user_sec"), r4.get("tree_user_sec")
        rec = {
            "attempt": attempt, "qualified": ok, "why": why, "efficiency": eff,
            "user_cpu_ratio": round(u4 / uN, 3) if uN and u4 else None,
            "N": rN, "N4": r4,
        }
        (pairs if ok else rejected).append(rec)
        # persist the bank after EVERY pair: a kill mid-invocation (end
        # of session, watcher restart) must not lose banked evidence
        with open(bank_path, "w") as f:
            json.dump(_bank_doc(n_events, n_batches, pairs, rejected), f, indent=1)
        print(
            f"pair {attempt}: eff={eff} qualified={ok} ({why}) "
            f"N={rN['cdc_events_per_sec']:,.0f} ev/s "
            f"4N={r4['cdc_events_per_sec']:,.0f} ev/s "
            f"brackets={[b['first_touch_gbs'] for b in pair_brackets(rN, r4)]}",
            flush=True,
        )

    out = _bank_doc(n_events, n_batches, pairs, rejected)
    with open(bank_path, "w") as f:
        json.dump(out, f, indent=1)
    if not pairs:
        print("no plateau-qualified pairs (host in deep stall or shifting); "
              "telemetry in BENCH/plateau_pairs.json", flush=True)
        sys.exit(2)
    write_section(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        plateau_md(out),
        heading=SECTION_HEADING,
    )
    print(
        f"{len(pairs)} plateau-qualified pairs, best efficiency "
        f"{out['best_efficiency']}, median {out['median_efficiency']} "
        f"-> BENCH/BASELINE.md",
        flush=True,
    )


SECTION_HEADING = "## Plateau-qualified N→4N wall-clock pairs"


def plateau_md(out: dict) -> str:
    rows = "\n".join(
        f"| {p['attempt']} | {p['N']['cdc_events_per_sec']:,.1f} | "
        f"{p['N4']['cdc_events_per_sec']:,.1f} | **{p['efficiency']:.3f}** | "
        f"{p['user_cpu_ratio']} | "
        f"{[b['first_touch_gbs'] for b in pair_brackets(p['N'], p['N4'])]} |"
        for p in out["pairs"]
    )
    rej = "".join(
        f"\n- attempt {p['attempt']}: eff {p['efficiency']} REJECTED — {p['why']}"
        for p in out["rejected"]
    ) or "\n- none"
    a = out["pairs"][0]["N"]
    return f"""

{SECTION_HEADING}

Generated by `python BENCH/run_plateau_pairs.py` on {out["generated"]}.

The host's plateau regime (steady memcpy healthy at ~8 GB/s,
first-touch pinned ~10x low but STABLE ±5% for hours — see the
host-degradation timeline above) fails run_scaling.py's absolute
clean-window gate, yet a pair whose four in-situ brackets (pre+post at
both levels) sit inside one narrow band is internally consistent: both
levels measured the identical host, so their throughput RATIO — all
the >=0.8 N→4N rule needs — is meaningful, and biased AGAINST the 4N
leg if anything (8 concurrent workers share the one crippled
page-fault handler; 2 workers queue on it less). Qualification per
pair: all four brackets steady >= {out["min_steady_gbs"]} GB/s,
first-touch >= {out["min_first_gbs"]} GB/s, and max/min first-touch
<= {out["band"]}x. Identical {out["events"]:,}-event staged changelog,
{out["batches"]} micro-batches, fresh JVM per level, alternating
N→4N order.

| pair | N=local[{N}] ev/s | 4N=local[{N4}] ev/s | wall efficiency | user-CPU ratio 4N/N | bracket first-touch (GB/s) |
|---|---|---|---|---|---|
{rows}

**Best plateau-pair efficiency: {out["best_efficiency"]:.3f}; median
{out["median_efficiency"]:.3f}** (target >= 0.8). Rejected attempts:{rej}

Replay integrity counters (dedup drops {a["dedup_drops"]:,}, rows
MERGEd {a["rows_written"]:,}, late events {a["late_events"]:,}) are
bit-identical across every run, qualified or not.
"""


if __name__ == "__main__":
    main()
