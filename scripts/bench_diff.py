"""Compare two bench artifacts and flag per-query regressions.

Accepts either raw ``bench.py`` output lines or the driver's
``BENCH_r{N}.json`` wrapper (with a ``parsed`` key). Usage:

    python scripts/bench_diff.py OLD.json NEW.json [threshold]

Prints queries slower than ``threshold``x (default 1.5) and the
total-wall delta; exits 1 when any common query regresses past the
threshold — keeping in mind the documented 2-3x shared-JVM swing, so
treat single-run artifacts as a screen, not a verdict (bench.py's
median-of-3 exists for exactly this reason).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    if "queries" not in data:
        raise SystemExit(f"{path}: no 'queries' key (not a bench artifact)")
    return data


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit("usage: bench_diff.py OLD.json NEW.json [threshold]")
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    regressions = []
    for q in common:
        a, b = old["queries"][q], new["queries"][q]
        if a > 0 and b / a > threshold:
            regressions.append((b / a, q, a, b))
    print(
        f"total: {old.get('value')} -> {new.get('value')} s | common {len(common)}"
        f" | added {len(added)} | removed {len(removed)}"
    )
    for ratio, q, a, b in sorted(regressions, reverse=True):
        print(f"  REGRESSION {ratio:4.1f}x  {q}: {a} -> {b} s")
    for q in added:
        print(f"  new {q}: {new['queries'][q]} s")
    if removed:
        print(f"  removed: {', '.join(removed)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
