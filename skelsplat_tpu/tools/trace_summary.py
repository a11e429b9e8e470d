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


def exclusive_times(events):
    """Per-op EXCLUSIVE (self) durations via event containment.

    Trace timelines nest (a while loop contains its body's fusions, a
    conditional its branch ops), so summing raw durations double-counts
    every level of the hierarchy. Per (pid, tid) lane, a sweep with a
    containment stack subtracts each child's duration from its parent —
    the flat-sum view made `cond` look like the whole macro step when
    its self-cost (branch dispatch) was a tenth of it."""
    lanes = collections.defaultdict(list)
    for ev in events:
        lanes[(ev.get("pid"), ev.get("tid"))].append(ev)
    self_time = collections.Counter()
    counts = collections.Counter()
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (ts, dur, name)
        for ev in evs:
            ts, dur = ev["ts"], ev.get("dur", 0)
            while stack and ts >= stack[-1][0] + stack[-1][1]:
                stack.pop()
            self_time[ev["name"]] += dur
            counts[ev["name"]] += 1
            if stack:
                self_time[stack[-1][2]] -= dur
            stack.append((ts, dur, ev["name"]))
    return self_time, counts


def hlo_source_map(hlo_path: str):
    """op name → 'file:line' from an optimized-HLO text dump
    (``jit(f).lower(...).compile().as_text()``) — attributes the tiny-op
    soup to the python that emitted it."""
    import re
    pat = re.compile(
        r'%([\w.\-]+) = .*?source_file="([^"]*)" source_line=(\d+)')
    loc = {}
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                name, src, ln = m.groups()
                loc[name] = f"{os.path.basename(src)}:{ln}"
    return loc


def summarize(events, top: int = 30, macros: int | None = None,
              out=print, hlo: str | None = None):
    # whole-module executions live on their own "XLA Modules" lane —
    # report them as totals and keep them out of the op breakdown
    # (they would double-count every op they contain)
    modules = [e for e in events if "Modules" in e["_thread"]]
    events = [e for e in events if "Modules" not in e["_thread"]]
    for ev in sorted(modules, key=lambda e: -e.get("dur", 0))[:5]:
        out(f"module {ev['name']}: {ev.get('dur', 0) / 1e3:.3f} ms"
            + (f" ({ev.get('dur', 0) / macros:.1f} us/macro)"
               if macros else ""))
    per_op, counts = exclusive_times(events)
    total = sum(per_op.values())
    loc = hlo_source_map(hlo) if hlo else {}
    out(f"{len(events)} device events, {total / 1e3:.3f} ms exclusive")
    if macros:
        out(f"per-macro ({macros} steps): {total / macros:.1f} us")
    out(f"{'op':<48} {'self ms':>9} {'n':>6} {'us/call':>8}"
        + (f" {'us/macro':>9}" if macros else "")
        + ("  source" if loc else ""))
    for name, dur in per_op.most_common(top):
        row = (f"{name[:48]:<48} {dur / 1e3:>9.3f} {counts[name]:>6} "
               f"{dur / max(counts[name], 1):>8.1f}")
        if macros:
            row += f" {dur / macros:>9.2f}"
        if loc:
            row += f"  {loc.get(name, '')}"
        out(row)
    if loc:
        by_src = collections.Counter()
        n_src = collections.Counter()
        for name, dur in per_op.items():
            src = loc.get(name, "<unattributed>")
            by_src[src] += dur
            n_src[src] += 1
        out("")
        out(f"{'source line':<44} {'self ms':>9} {'#ops':>5}"
            + (f" {'us/macro':>9}" if macros else ""))
        for src, dur in by_src.most_common(top):
            row = f"{src:<44} {dur / 1e3:>9.3f} {n_src[src]:>5}"
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
    ap.add_argument("--hlo", default=None, metavar="HLO_TXT",
                    help="optimized-HLO text dump of the profiled program "
                         "(jit(f).lower(...).compile().as_text()): "
                         "attributes ops to source file:line and adds a "
                         "per-source-line rollup")
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
    summarize(dev, top=args.top, macros=args.macros, hlo=args.hlo)


if __name__ == "__main__":
    main()
