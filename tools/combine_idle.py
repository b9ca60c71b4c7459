#!/usr/bin/env python3
"""Combine N full graft.Bench sweeps into a BENCH_IDLE_r{N}.json
(per-entry minimum + drift analysis vs the previous round's idle
artifact). Dev-only, driver-side python."""
import json, sys


def load(path):
    line = open(path).read()
    return json.loads(line[line.index('{'):])


WARMUP_DESC = {
    "small": ("per-entry untimed warm-up at sf0.001 (same codegen/JIT/"
              "operator init, ~100x less data) plus a full-table "
              "page-cache pre-read and two sf0.1 streaming burn-in "
              "gates for the shared C2-JIT row loops"),
    "full": "per-entry untimed warm-up pass at the timed SF",
    "session": "one untimed pass over 4 representative entries only",
    "none": "no warm-up (coldest numbers)",
}


def method(runs, keys):
    """Generate the methodology note FROM the run data (round-16
    ADVICE: the old hardcoded text claimed completeness and
    'small'-mode warm-up regardless of inputs)."""
    coverage = []
    for i, r in enumerate(runs, 1):
        missing = len(keys) - len(r["queries"])
        if missing:
            coverage.append(f"run {i} is PARTIAL ({len(r['queries'])}/"
                            f"{len(keys)} entries)")
    cov = ("; ".join(coverage) + "; per-entry minimum is over the runs "
           "that have the entry. " if coverage
           else "All entries present in every run. ")
    warms = [r.get("warmup", "full") for r in runs]
    if len(set(warms)) == 1:
        warm = (f"Warm-up mode '{warms[0]}' in every run: "
                f"{WARMUP_DESC.get(warms[0], 'unknown mode')}. ")
    else:
        warm = ("MIXED warm-up modes ("
                + ", ".join(f"run {i}: '{w}'"
                            for i, w in enumerate(warms, 1))
                + ") — per-run totals are not directly comparable; "
                + " ".join(f"'{m}' = {WARMUP_DESC.get(m, 'unknown')}."
                           for m in dict.fromkeys(warms)) + " ")
    return (
        f"{len(runs)} graft.Bench sweeps, per-entry minimum. " + cov
        + "Bench keeps the default state-store maintenance interval "
        "and unloads retained providers deterministically between "
        "entries (StateStoreHooks, the r14 root-cause fix). " + warm
        + "/proc/loadavg sampled around each sweep (loadavg_per_run) "
        "so drift analyses can cite measured host contention.")


def main(round_no, prev_path, out_path, run_paths):
    runs = [load(p) for p in run_paths]
    keys = set()
    for r in runs:
        keys |= set(r['queries'])
    def vals(k):
        return [r['queries'][k] for r in runs
                if k in r['queries'] and r['queries'][k] >= 0]
    mins = {k: (min(vals(k)) if vals(k) else -1.0) for k in sorted(keys)}
    failed = [k for k, v in mins.items() if v < 0]
    prev = json.load(open(prev_path))['queries_min_sec']
    common = [k for k in mins if k in prev and prev[k] > 0 and mins[k] > 0]
    now_t = sum(mins[k] for k in common)
    old_t = sum(prev[k] for k in common)
    regress = sorted(((k, prev[k], mins[k]) for k in common
                      if mins[k] > 0.5 and mins[k] / prev[k] > 1.3),
                     key=lambda t: -(t[2] / t[1]))
    improve = sorted(((k, prev[k], mins[k]) for k in common
                      if prev[k] > 1 and mins[k] / prev[k] < 0.77),
                     key=lambda t: t[2] / t[1])
    new = sorted(k for k in mins if k not in prev)
    drift = (
        f"Common-entry min-of-{len(runs)} total vs r{round_no - 1}: "
        f"{now_t:.1f}s vs {old_t:.1f}s = {now_t / old_t:.2f}x. "
        f"{len(new)} new entries add "
        f"{sum(mins[k] for k in new):.1f}s. "
        "Regressions >1.3x (now >0.5s): "
        + (", ".join(f"{k} {o:.2f}->{n:.2f}s" for k, o, n in regress)
           or "none") + ". "
        "Improvements >1.3x (was >1s): "
        + (", ".join(f"{k} {o:.2f}->{n:.2f}s" for k, o, n in improve)
           or "none") + ".")
    out = {
        "round": round_no,
        "sf": runs[0]["sf"],
        "cpus": 32,
        "runs": len(runs),
        "totals_per_run_sec": [round(r["value"], 1) for r in runs],
        "warmup_mode_per_run": [r.get("warmup", "full") for r in runs],
        "loadavg_per_run": [
            {"before": r.get("loadavg_before"),
             "after": r.get("loadavg_after")} for r in runs],
        "method": method(runs, keys),
        "failed_entries": failed,
        "min_total_sec": round(sum(v for v in mins.values() if v > 0), 2),
        "queries_min_sec": mins,
        "drift_analysis": drift,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(drift)
    print(f"wrote {out_path}: total {out['min_total_sec']}s, "
          f"{len(mins)} entries, {len(failed)} failed")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4:])
