"""Summarize a ``jax.profiler`` trace: top device ops by total time.

The reference ships no profiling tooling beyond torch-tb-profiler in its
requirements (unused in code); this is the TPU-side analogue for the
``bench.py --profile DIR`` workflow — it digests the perfetto
``*.trace.json.gz`` files the profiler writes under
``DIR/plugins/profile/<ts>/`` into the numbers PERF.md quotes
(per-macro device cost split into the fused kernel vs the "tiny-op soup"
of preprocess/pack/compose work around it).

Usage:
    python -m skelsplat_tpu.tools.trace_summary /tmp/prof [--top 30]
                                                 [--macros N]

With ``--macros N`` every total is also divided by N (e.g. 125 macro
steps for the stock 500-iteration config) to report per-macro-step cost.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace_events(profile_dir: str):
    """All complete ('ph' == 'X') events from every trace.json.gz under
    ``profile_dir`` (searched recursively), with their process/thread
    names resolved."""
    paths = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"),
                  recursive=True)
        + glob.glob(os.path.join(profile_dir, "**", "*.trace.json"),
                    recursive=True))
    if not paths:
        raise FileNotFoundError(
            f"no *.trace.json[.gz] under {profile_dir} — run "
            "`python bench.py --profile {profile_dir}` first")
    events, names = [], {}
    for path in paths:
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") in ("process_name",
                                                "thread_name"):
                key = (ev.get("pid"), ev.get("tid") if ev["name"] ==
                       "thread_name" else None)
                names[key] = ev.get("args", {}).get("name", "")
            elif ph == "X":
                events.append(ev)
    for ev in events:
        ev["_proc"] = names.get((ev.get("pid"), None), "")
        ev["_thread"] = names.get((ev.get("pid"), ev.get("tid")), "")
    return events


def device_events(events):
    """Events on TPU/accelerator timelines (XLA Ops / device queues) —
    process names look like '/device:TPU:0' or contain 'XLA Ops'."""
    out = []
    for ev in events:
        scope = f"{ev['_proc']}|{ev['_thread']}"
        if ("TPU" in scope or "device" in scope.lower()) and \
                "host" not in scope.lower():
            out.append(ev)
    return out


def summarize(events, top: int = 30, macros: int | None = None,
              out=print):
    per_op = collections.Counter()
    counts = collections.Counter()
    for ev in events:
        per_op[ev["name"]] += ev.get("dur", 0)
        counts[ev["name"]] += 1
    total = sum(per_op.values())
    out(f"{len(events)} device events, {total / 1e3:.3f} ms total")
    if macros:
        out(f"per-macro ({macros} steps): {total / macros:.1f} us")
    out(f"{'op':<64} {'total ms':>9} {'n':>6} {'us/call':>8}"
        + (f" {'us/macro':>9}" if macros else ""))
    for name, dur in per_op.most_common(top):
        row = (f"{name[:64]:<64} {dur / 1e3:>9.3f} {counts[name]:>6} "
               f"{dur / counts[name]:>8.1f}")
        if macros:
            row += f" {dur / macros:>9.2f}"
        out(row)
    return per_op, counts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--macros", type=int, default=None,
                    help="divide totals by this macro-step count")
    args = ap.parse_args(argv)
    events = load_trace_events(args.profile_dir)
    dev = device_events(events)
    if not dev:
        scopes = collections.Counter(
            f"{e['_proc']}|{e['_thread']}" for e in events)
        print("no device-timeline events found; timelines present:")
        for scope, n in scopes.most_common(20):
            print(f"  {n:>7}  {scope}")
        return
    summarize(dev, top=args.top, macros=args.macros)


if __name__ == "__main__":
    main()
