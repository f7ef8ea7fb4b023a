#!/usr/bin/env python3
"""Diff two bench_queries.json artifacts, separating STRUCTURE from TIME.

Usage: python3 tools/diff_bench.py OLD.json NEW.json [--time-ratio 1.5]

Structure (rows, exchange count) is stable run-to-run; wall time is not.
A plan regression therefore shows as structure drift even on a contended
box, while a pure wall-time swing with matching structure and an elevated
gc share / loadavg canary reads as measurement contamination, not a code
regression (the r12 lesson: 4-8x official-bench swings on the gate family
with bit-identical outputs).

Handles both schemas: the flat map {"q": sec} (pre-r13 and the stdout
line) and the rich map {"q": {"sec":..,"gc_sec":..,"heap_mb_delta":..,
"rows":..,"exchanges":..}} written to bench_queries.json from r13 on.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {}
    for name, v in d.get("queries", {}).items():
        if isinstance(v, dict):
            qs[name] = v
        else:
            qs[name] = {"sec": float(v)}
    return d, qs


def main():
    argv = sys.argv[1:]
    args, ratio, skip_next = [], 1.5, False
    for i, a in enumerate(argv):
        if skip_next:
            skip_next = False
        elif a.startswith("--time-ratio"):
            if "=" in a:
                ratio = float(a.split("=", 1)[1])
            else:
                ratio = float(argv[i + 1])
                skip_next = True  # the value is consumed, not positional
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    (da, qa), (db, qb) = load(args[0]), load(args[1])

    print(f"== canaries ==")
    for key in ("canary_loadavg_at_start", "canary_warmup_sec",
                "canary_max_heap_mb", "gc_sec_total",
                "shuffle_write_mb_total", "spill_mb_total",
                "value", "n_errors"):
        print(f"  {key:28s} {da.get(key, '-'):>10} -> {db.get(key, '-'):>10}")

    names = sorted(set(qa) | set(qb))
    structure, time_moves, io_moves = [], [], []
    for n in names:
        a, b = qa.get(n), qb.get(n)
        if a is None or b is None:
            structure.append((n, "added" if a is None else "removed", "", ""))
            continue
        for field in ("rows", "exchanges"):
            if field in a and field in b and a[field] != b[field]:
                structure.append((n, field, a[field], b[field]))
        # shuffle bytes written are plan-determined (same data, same plan
        # -> same bytes modulo compression jitter), so a real move is a
        # plan/volume change; spill is environmental (memory pressure)
        # and reads with the wall-time section instead.
        swa, swb = a.get("shuffle_write_mb"), b.get("shuffle_write_mb")
        if swa is not None and swb is not None and max(swa, swb) >= 10.0 \
                and (swa == 0 or swb == 0 or swb / swa >= 1.3
                     or swa / swb >= 1.3):
            io_moves.append((n, "shuffle_write_mb", swa, swb))
        sa, sb = a["sec"], b["sec"]
        if sa > 0 and (sb / sa >= ratio or (sb > 0 and sa / sb >= ratio)) \
                and max(sa, sb) >= 1.0:
            notes = []
            if "gc_sec" in b and sb > 0:
                notes.append(f"new gc share {b['gc_sec'] / sb:.0%}")
            if "spill_mb" in b:
                notes.append(f"spill {a.get('spill_mb', 0):.0f}->"
                             f"{b['spill_mb']:.0f}MB")
            if "shuffle_read_mb" in b:
                notes.append(f"shufR {a.get('shuffle_read_mb', 0):.0f}->"
                             f"{b['shuffle_read_mb']:.0f}MB")
            gc_note = ("  (" + ", ".join(notes) + ")") if notes else ""
            time_moves.append((n, sa, sb, gc_note))

    print(f"\n== structure drift ({len(structure)}) — "
          "investigate as plan regressions ==")
    for n, field, va, vb in structure:
        print(f"  {n:32s} {field:10s} {va} -> {vb}")
    if not structure:
        print("  none — plans produce identical cardinality and shuffles")

    print(f"\n== IO drift ({len(io_moves)}) — shuffle-write moves are "
          "plan/volume changes, not noise ==")
    for n, field, va, vb in io_moves:
        print(f"  {n:32s} {field:18s} {va:10.1f} -> {vb:10.1f} MB")
    if not io_moves:
        print("  none")

    print(f"\n== wall-time moves >= {ratio}x on queries >= 1s "
          f"({len(time_moves)}) — read against canaries/gc first ==")
    for n, sa, sb, gc_note in time_moves:
        print(f"  {n:32s} {sa:8.2f}s -> {sb:8.2f}s ({sb / sa:5.2f}x){gc_note}")
    if not time_moves:
        print("  none")

    sys.exit(1 if structure else 0)


if __name__ == "__main__":
    main()
