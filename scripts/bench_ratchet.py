"""Standing isolated-median ratchet for the most expensive bench queries.

The contended full-bench total swings 1.3x+ with machine state (three
identical-code round-7 runs spanned 204-237 s), so round-over-round
adjudication needs a stable signal. This script maintains it:

    python scripts/bench_ratchet.py [DETAIL.json] [--top N] [--runs K]
                                    [--threshold X]

1. Reads the detail artifact (default repo BENCH_DETAIL.json), picks
   its N slowest queries (default 10).
2. Remeasures them isolated — ONE warm subprocess per run (the
   bench_diff protocol: per-query JVMs mis-measure sub-second queries),
   K runs (default 2) so run-to-run variance is DEMONSTRATED, not
   assumed. The per-run medians and their max/min ratio are printed.
3. Ratchets BENCH_ISOLATED.json's ``baseline`` bucket: a query's
   baseline only ever moves DOWN (min of old and new) — improvements
   ratchet in, regressions never absorb themselves. A fresh median
   past ``threshold`` x the recorded baseline is flagged (exit 1) for
   adjudication; queries with no baseline yet are seeded.
4. Prints the ``isolated_top10`` figure (sum of the final baselines
   over the measured set) — the number bench.py reports alongside the
   contended total.

Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_BENCH_REPEATS like bench.py.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_SPEC = importlib.util.spec_from_file_location(
    "bench_diff", os.path.join(_HERE, "bench_diff.py")
)
bench_diff = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_diff)


def main() -> int:
    argv = list(sys.argv[1:])

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            val = cast(argv[i + 1])
            del argv[i : i + 2]
            return val
        return default

    top_n = opt("--top", 10, int)
    runs = opt("--runs", 2, int)
    threshold = opt("--threshold", 1.5, float)
    detail_path = argv[0] if argv else os.path.join(
        os.path.dirname(_HERE), "BENCH_DETAIL.json"
    )
    with open(detail_path) as f:
        detail = json.load(f)
    sf = detail.get("sf")
    if sf is None:
        raise SystemExit(f"{detail_path}: no 'sf' field — refusing to ratchet")
    contended = {**detail.get("queries", {}), **detail.get("stub_queries", {})}
    targets = [
        q for q, _ in sorted(contended.items(), key=lambda kv: kv[1], reverse=True)
    ][:top_n]
    print(f"top-{top_n} by contended time: {', '.join(targets)}")

    run_medians: list[dict[str, float]] = []
    for i in range(runs):
        m = bench_diff.remeasure_isolated(targets)
        run_medians.append(m)
        print(f"  run {i + 1}: " + json.dumps({q: m.get(q) for q in targets}))

    # per-query spread across runs — the variance the ratchet relies on
    spreads = {}
    for q in targets:
        vals = [m[q] for m in run_medians if m.get(q)]
        if len(vals) >= 2 and min(vals) > 0:
            spreads[q] = round(max(vals) / min(vals), 3)
    worst = max(spreads.values()) if spreads else None
    print(f"run-to-run spread per query (max/min): {json.dumps(spreads)}")
    if worst is not None:
        print(f"worst spread: {worst}x")

    best = {
        q: min(m[q] for m in run_medians if m.get(q))
        for q in targets
        if any(m.get(q) for m in run_medians)
    }
    state = bench_diff.load_isolated(sf)
    baseline, pending = state["baseline"], state["pending"]
    flagged = []
    for q, new in best.items():
        old = baseline.get(q)
        if q in pending:
            # an open pending adjudication belongs to bench_diff — seeding
            # (or ratcheting) here would let a confirmed regression become
            # the baseline with no adjudication at all
            print(f"  skipping {q}: pending adjudication open ({pending[q]} s)")
            continue
        if old is None:
            baseline[q] = new
        elif new > threshold * old:
            flagged.append((q, old, new))
            # do NOT ratchet a regression in — it stays at the old value
        else:
            baseline[q] = min(old, new)
    bench_diff.save_isolated(state, sf)

    iso_total = round(sum(baseline[q] for q in targets if q in baseline), 3)
    print(
        json.dumps(
            {
                "metric": "isolated_top_n_seconds",
                "value": iso_total,
                "n": len(targets),
                "sf": sf,
                "worst_run_spread": worst,
                "flagged": [
                    {"query": q, "baseline": o, "fresh": n} for q, o, n in flagged
                ],
            }
        )
    )
    for q, o, n in flagged:
        print(f"  FLAG {q}: isolated {n} s vs baseline {o} s (> {threshold}x)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
