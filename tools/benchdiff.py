#!/usr/bin/env python3
"""Round-over-round bench regression gate (VERDICT r15 Next #7).

Usage:
  python3 tools/benchdiff.py [current.json] [previous.json]

Defaults: current = BENCH_LOCAL_latest.json, previous = the
highest-numbered committed BENCH_LOCAL_r{N}.json that differs from
current. Compares the per-query headline medians and flags any query
slower than FLAG_RATIO x its previous reading (absolute floor
MIN_ABS_S so sub-100ms jitter never flags). The sentinel line is
printed first so machine-load drift is separable from structural
regressions (if the sentinel moved by ~the same factor, it's the box).

Exit 1 iff any query flags — run this before committing a round's
final bench so a q_link_recs-style creep is caught by the builder,
not the judge.
"""
import glob
import json
import os
import re
import sys

FLAG_RATIO = 1.5
MIN_ABS_S = 0.25  # ignore ratio flags where both readings are tiny


def load(path):
    """First JSON object line with a `queries` map + the totals line."""
    full, totals = None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in obj and full is None:
                full = obj
            if "bench_totals" in obj:
                totals = obj["bench_totals"]
    if full is None:
        raise SystemExit(f"{path}: no bench JSON line with a queries map")
    return full, totals


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL_latest.json"
    if len(sys.argv) > 2:
        prev_path = sys.argv[2]
    else:
        cands = sorted(
            glob.glob("BENCH_LOCAL_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        cands = [p for p in cands if not os.path.samefile(p, cur_path)] \
            if os.path.exists(cur_path) else cands
        if not cands:
            raise SystemExit("no committed BENCH_LOCAL_r*.json to diff against")
        prev_path = cands[-1]
    cur, cur_tot = load(cur_path)
    prev, prev_tot = load(prev_path)

    if cur_tot and prev_tot:
        cs, ps = cur_tot["sentinel"]["s"], prev_tot["sentinel"]["s"]
        print(f"sentinel q1_agg: {ps:.3f}s -> {cs:.3f}s "
              f"({cs / ps:.2f}x box-drift factor)")

    flags, improved, new = [], [], []
    for name, v in sorted(cur["queries"].items()):
        p = prev["queries"].get(name)
        if p is None:
            new.append((name, v))
            continue
        if p <= 0 or v <= 0:
            continue
        ratio = v / p
        if ratio >= FLAG_RATIO and v >= MIN_ABS_S:
            flags.append((name, p, v, ratio))
        elif ratio <= 1 / FLAG_RATIO and p >= MIN_ABS_S:
            improved.append((name, p, v, ratio))

    for name, p, v, r in sorted(flags, key=lambda t: -t[3]):
        print(f"[FLAG] {name}: {p:.3f}s -> {v:.3f}s ({r:.2f}x)")
    for name, p, v, r in sorted(improved, key=lambda t: t[3])[:10]:
        print(f"[better] {name}: {p:.3f}s -> {v:.3f}s ({r:.2f}x)")
    for name, v in new:
        print(f"[new] {name}: {v:.3f}s")
    dropped = sorted(set(prev["queries"]) - set(cur["queries"]))
    for name in dropped:
        print(f"[dropped] {name}")

    print(f"\n{cur_path} vs {prev_path}: {len(flags)} flagged, "
          f"{len(improved)} improved, {len(new)} new, "
          f"{len(dropped)} dropped over {len(cur['queries'])} lines")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
