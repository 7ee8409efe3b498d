#!/usr/bin/env python3
"""Regenerate BASELINE.md's pinned-run table (and bench.json) from the
quieter run of a back-to-back graft.Bench pair.

Usage: tools/pin_baseline.py RUN_A.log RUN_B.log

Each log is an `sbt runMain graft.Bench` capture whose LAST line
starting with '{' is the bench JSON. The quieter run (smaller total) is
written to bench.json and its per-query rows replace the table between
the '| query |' header and the 'Sum of rows:' line in BASELINE.md; the
sum line and the headline total are updated. Narrative text above the
table is NOT touched — update counts/ratios by hand from the printed
comparison. Prints a shared-query ratio report against the PREVIOUS
bench.json pin (written to stderr) for the pin-to-pin adjudication.
"""
import json
import re
import sys


def load(path):
    last = None
    for line in open(path, encoding="utf-8"):
        s = line.strip()
        # Bench prints the full artifact line (with per-query "metrics"
        # maxima) and a slowest-queries summary line — take the full one
        i = s.find('{"metric"')
        if i >= 0 and '"metrics"' in s:
            last = s[i:]
    if last is None:
        sys.exit(f"no full bench JSON line (with metrics) found in {path}")
    return json.loads(last)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    quiet, loud = (a, b) if a["value"] <= b["value"] else (b, a)
    print(f"pair totals: {a['value']} / {b['value']} -> pin {quiet['value']}",
          file=sys.stderr)
    if quiet.get("failed"):
        sys.exit(f"pinned run has failures: {quiet['failed']}")

    try:
        prev = json.load(open("bench.json"))
        shared = sorted(set(prev["queries"]) & set(quiet["queries"]))
        prev_sum = sum(prev["queries"][q] for q in shared)
        new_sum = sum(quiet["queries"][q] for q in shared)
        # Rank regressions by the FLOORED ratio new/max(prev, 1s): a
        # sub-second pin row is the quietest sample of a noise-dominated
        # query, so its raw ratio flags load windows, not plan changes
        # (r17's p10_block_cap: 0.80 -> 1.65 s read as ">2x" with
        # byte-identical per-task maxima). The raw ratio is still
        # printed for the adjudication.
        ratios = sorted(
            ((quiet["queries"][q] / max(prev["queries"][q], 1.0),
              quiet["queries"][q] / prev["queries"][q], q) for q in shared
             if prev["queries"][q] > 0), reverse=True)
        import statistics
        print(f"shared {len(shared)}: prev {prev_sum:.1f}s new {new_sum:.1f}s "
              f"ratio {new_sum / prev_sum:.3f} median "
              f"{statistics.median(raw for _, raw, _ in ratios):.3f}",
              file=sys.stderr)
        print("worst 8 shared-query FLOORED ratios (new/max(prev,1s); "
              "adjudicate >2x with maxima):", file=sys.stderr)
        for rf, raw, q in ratios[:8]:
            pm = prev.get("metrics", {}).get(q, {})
            nm = quiet.get("metrics", {}).get(q, {})
            same = all(pm.get(k) == nm.get(k) for k in pm) if pm else None
            print(f"  {q}: {prev['queries'][q]:.2f} -> "
                  f"{quiet['queries'][q]:.2f} (floored {rf:.2f}x, raw {raw:.2f}x)"
                  f" maxima_unchanged={same}",
                  file=sys.stderr)
    except FileNotFoundError:
        print("no previous bench.json — skipping ratio report", file=sys.stderr)

    json.dump(quiet, open("bench.json", "w"), indent=0, sort_keys=True)

    rows = []
    for q in sorted(quiet["queries"]):
        s = quiet["queries"][q]
        m = quiet["metrics"][q]
        rows.append(
            f"| {q} | {s:.2f} | {m['max_task_input_mb']:.1f} | "
            f"{m['max_task_shuffle_read_mb']:.1f} | "
            f"{m['max_task_shuffle_write_mb']:.1f} | "
            f"{m['max_task_shuffle_records']} | {m['spill_mb']:.1f} | "
            f"{m['tasks']} |")
    total = sum(quiet["queries"].values())

    text = open("BASELINE.md", encoding="utf-8").read()
    header = ("| query | sec | max task input MB | max task shuffle-read MB "
              "| max task shuffle-write MB | max task shuffle records "
              "| spill MB | tasks |")
    start = text.index(header)
    sep_end = text.index("\n", text.index("\n", start) + 1) + 1
    sum_at = text.index("Sum of rows:", sep_end)
    new = (text[:sep_end] + "\n".join(rows) + "\n\n" +
           f"Sum of rows: {total:.1f} s = pinned total "
           f"({quiet['value']} s)." + text[text.index("\n", sum_at):])
    open("BASELINE.md", "w", encoding="utf-8").write(new)
    print(f"wrote bench.json + BASELINE.md table: {len(rows)} rows, "
          f"{total:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
