#!/usr/bin/env python
"""Merge 'ours'-side twin histories into an existing twin_<task>.json and
emit the converged summary (same arithmetic as digital_twin_tiny.main).

The multi-seed hard-twin runs on one CPU core take hours per side; this
lets the reference half (recovered from its own logs) and our half (run
separately, possibly across interrupted sessions) be joined without
re-running either. Ours-side histories are read either from a JSON file
{"<seed>": {"clean": [...], "adv": [...]}} or parsed from a run log
containing lines `OURS S<seed> DONE: {json}` and/or incremental
`[ours seed<k>] epoch <e>: clean <c> adv <a>` lines (the log format of
tools/digital_twin_tiny.run_ours).

    python tools/twin_merge.py --twin output/twin_hard/twin_hard.json \
        --ours-log /tmp/ours_hard_all.log [--allow-partial]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np


def converged(hist, k=2):
    return {m: float(np.mean(hist[m][-k:])) for m in ("clean", "adv")}


def parse_ours_log(path: str) -> dict:
    done = {}
    partial: dict = {}
    rx = re.compile(r"\[ours seed(\d+)\] epoch (\d+): clean ([\d.]+) "
                    r"adv ([\d.]+)")
    for line in open(path):
        m = rx.search(line)
        if m:
            s, e, c, a = m.groups()
            h = partial.setdefault(s, {"clean": [], "adv": []})
            assert len(h["clean"]) == int(e), (s, e, len(h["clean"]))
            h["clean"].append(float(c))
            h["adv"].append(float(a))
        elif line.startswith("OURS S") and "DONE:" in line:
            seed = line.split()[1][1:]
            done[seed] = json.loads(line.split("DONE:", 1)[1])
    # a completed seed's DONE line supersedes its incremental lines
    return {**partial, **done}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--twin", required=True,
                    help="twin_<task>.json with the reference half filled")
    ap.add_argument("--ours-log", help="run_ours log to parse")
    ap.add_argument("--ours-json", help="ours histories as JSON")
    ap.add_argument("--allow-partial", action="store_true",
                    help="accept seeds with fewer epochs than the recipe "
                         "(converged mean still uses the last 2 present)")
    args = ap.parse_args()

    res = json.load(open(args.twin))
    epochs = res["recipe"]["epochs"]
    ours = {}
    if args.ours_json:
        ours.update(json.load(open(args.ours_json)))
    if args.ours_log:
        ours.update(parse_ours_log(args.ours_log))
    for seed, h in sorted(ours.items()):
        if len(h["clean"]) < epochs and not args.allow_partial:
            print(f"seed {seed}: only {len(h['clean'])}/{epochs} epochs — "
                  f"skipped (use --allow-partial to keep)", file=sys.stderr)
            continue
        res["ours"][seed] = h

    seeds = [s for s in map(str, res["seeds"])
             if s in res["reference"] and s in res["ours"]]
    if not seeds:
        sys.exit("no seed has both sides complete")
    with open(args.twin, "w") as f:
        json.dump(res, f, indent=1)

    summary = {"task": res["task"], "seeds": [int(s) for s in seeds],
               "epochs_per_seed": {s: len(res["ours"][s]["clean"])
                                   for s in seeds}}
    conv_ref = [converged(res["reference"][s]) for s in seeds]
    conv_ours = [converged(res["ours"][s]) for s in seeds]
    for m in ("clean", "adv"):
        rv = [c[m] for c in conv_ref]
        ov = [c[m] for c in conv_ours]
        summary[m] = {
            "ref_mean": float(np.mean(rv)), "ref_vals": rv,
            "ours_mean": float(np.mean(ov)), "ours_vals": ov,
            "band": float(max(max(rv) - min(rv), max(ov) - min(ov))),
            "gap": float(abs(np.mean(rv) - np.mean(ov))),
        }
    d, base = os.path.split(args.twin)
    out = os.path.join(d, base.replace("twin_", "summary_", 1)
                       if base.startswith("twin_")
                       else base + ".summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
