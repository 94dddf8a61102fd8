"""Assemble the round's BENCH_SCALING.json from the individual measurement
artifacts (run_scaling.py writes one pair per invocation; the isolation
probe prints a PROBE line). Keeps every run disclosed — scaling efficiency
on this shared host moves ±4% run-to-run, so the file carries the full run
table, per-pair efficiencies, and the attribution probe.

    python scripts/merge_scaling.py pair1.json [pair1b.json ...] --pair4 pair4v16.json \
        --probe probe.log --out BENCH_SCALING.json
"""

from __future__ import annotations

import json
import sys


def load_pair(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_probe(path: str) -> dict:
    with open(path) as f:
        for line in f:
            if line.startswith("PROBE "):
                return json.loads(line[len("PROBE "):])
    raise SystemExit(f"no PROBE line in {path}")


def main() -> None:
    args = sys.argv[1:]
    pairs_1v4, pair_4v16, probe_path, out_path = [], None, None, "BENCH_SCALING.json"
    it = iter(args)
    for a in it:
        if a == "--pair4":
            pair_4v16 = load_pair(next(it))
        elif a == "--probe":
            probe_path = next(it)
        elif a == "--out":
            out_path = next(it)
        else:
            pairs_1v4.append(load_pair(a))
    probe = load_probe(probe_path) if probe_path else None

    doc = {
        "metric": ("applied change-events/sec, replay-to-converged-table "
                   "(merge-on-read, epoch group-commit), scale fixture = "
                   "20.64M events / 3GB over 8 epochs + initial load of 2M keys"),
        "pairs": pairs_1v4 + ([pair_4v16] if pair_4v16 else []),
        "invocation": "spark-submit --py-files (scripts/run_scaling.py scale N 4N; "
                      "scripts/isolation_probe.py for attribution)",
    }
    if probe:
        doc["process_isolation_probe"] = probe
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"pairs": len(doc["pairs"]),
                      "probe": bool(probe), "out": out_path}))


if __name__ == "__main__":
    main()
