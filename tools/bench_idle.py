#!/usr/bin/env python3
"""Aggregate N idle graft.Bench sweeps into BENCH_IDLE_r{N}.json.

Usage: python3 tools/bench_idle.py <round> <out.json> <run1.json> [run2.json ...]

Each run file is the one-line JSON graft.Bench prints. Per-entry
MINIMUM over the runs (the variance-robust estimator the round
records use); entries missing from some runs (added mid-sequence)
take the min over the runs that have them, and the method note says
so. Dev-only tooling — driver-side python, not shipped library code.
"""
import sys, json


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])  # strip any sbt [info] prefix


def main(rnd, out, runs):
    datas = [load(r) for r in runs]
    totals = [round(sum(v for v in d["queries"].values() if v >= 0), 1)
              for d in datas]
    names = sorted({n for d in datas for n in d["queries"]})
    mins, failed, partial = {}, [], []
    for n in names:
        vals = [d["queries"][n] for d in datas if n in d["queries"]]
        ok = [v for v in vals if v >= 0]
        if not ok:
            failed.append(n)
            continue
        if len(vals) < len(datas):
            partial.append(n)
        mins[n] = round(min(ok), 2)
    doc = {
        "round": rnd,
        "sf": datas[0].get("sf", 0.1),
        "cpus": 32,
        "runs": len(datas),
        "totals_per_run_sec": totals,
        "method": (f"{len(datas)} full graft.Bench sweeps on an idle "
                   "container, per-entry minimum. "
                   + (f"Entries present in fewer runs (landed "
                      f"mid-sequence): {sorted(partial)}. " if partial
                      else "All entries present in every run. ")
                   + "Bench sets stateStore.maintenanceInterval=5s "
                     "(the round-8 streaming-variance mitigation)."),
        "failed_entries": sorted(failed),
        "min_total_sec": round(sum(mins.values()), 2),
        "queries_min_sec": {n: mins[n] for n in sorted(mins)},
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(mins)} entries, min_total "
          f"{doc['min_total_sec']}s, failed {failed}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3:])
