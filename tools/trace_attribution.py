"""Attribute TPU device time from a jax.profiler trace.

Usage::

    python tools/trace_attribution.py <profile_dir> [--steps N] [--top K]

Parses the newest ``*.trace.json.gz`` under ``<profile_dir>`` (written by
``jax.profiler.start_trace`` — the trainers expose this via
``profile_dir=``, `dalm_tpu/core/profiling.py`), aggregates complete
("X") events on the device process rows by op name, and prints a
device-time table: total, per-step (with ``--steps``), and the top ops.

The reference has no profiling at all (SURVEY §5); this is part of the
first-party observability layer.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def load_events(profile_dir: str):
    paths = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {profile_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    return paths[-1], data.get("traceEvents", [])


def attribute(events):
    """Returns (device_name -> {"programs": {name: us}, "ops": {name: us}}).

    Device rows carry three threads: "Steps" (one marker per step —
    ignored), "XLA Modules" (per-program totals) and "XLA Ops"
    (fusions / custom-calls — Pallas kernels land here)."""
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    out = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = procs.get(e.get("pid"), "")
        if "/device:" not in pname:
            continue
        tname = threads.get((e.get("pid"), e.get("tid")), "")
        if tname == "Steps":
            continue
        dev = out.setdefault(pname, {"programs": defaultdict(float), "ops": defaultdict(float)})
        bucket = "programs" if tname == "XLA Modules" else "ops"
        dev[bucket][e.get("name", "?")] += float(e.get("dur", 0.0))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--steps", type=int, default=None, help="trace window step count (per-step math)")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--no-collapse", action="store_true",
                    help="keep per-instance op names instead of family totals")
    args = ap.parse_args()

    path, events = load_events(args.profile_dir)
    print(f"# {path}", file=sys.stderr)
    devices = attribute(events)
    if not devices:
        raise SystemExit("no device rows in trace (host-only capture?)")
    for dev, rows in sorted(devices.items()):
        prog_total = sum(rows["programs"].values())
        op_total = sum(rows["ops"].values())
        print(f"\n== {dev} ==")
        per_step = f"  ({prog_total / args.steps / 1e3:.2f} ms/step)" if args.steps else ""
        print(f"program device time: {prog_total / 1e3:.2f} ms{per_step}")
        for name, us in sorted(rows["programs"].items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"  {us / 1e3:10.2f} ms  {name}")
        ops = rows["ops"]
        if not args.no_collapse:
            fam = defaultdict(lambda: [0.0, 0])
            for name, us in ops.items():
                f = re.sub(r"\.\d+$", "", name)
                fam[f][0] += us
                fam[f][1] += 1
            ops = {f"{name} (x{n})" if n > 1 else name: us for name, (us, n) in fam.items()}
        print(f"op device time:      {op_total / 1e3:.2f} ms")
        for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
            share = 100.0 * us / op_total if op_total else 0.0
            print(f"  {us / 1e3:10.2f} ms  {share:5.1f}%  {name}")


if __name__ == "__main__":
    main()
