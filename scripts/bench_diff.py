"""Compare two bench artifacts and flag per-query regressions.

Accepts either raw ``bench.py`` output lines or the driver's
``BENCH_r{N}.json`` wrapper (with a ``parsed`` key). Usage:

    python scripts/bench_diff.py OLD.json NEW.json [threshold] [--report PATH]

Prints queries slower than ``threshold``x (default 1.5) and the
total-wall delta; exits 1 when any common query regresses past the
threshold — keeping in mind the documented 2-3x shared-JVM swing, so
treat single-run artifacts as a screen, not a verdict (bench.py's
median-of-3 exists for exactly this reason).

``--report PATH`` additionally writes a markdown diff report (full
per-query table, regressions flagged) — the per-round committed
artifact the round workflow keeps (BENCH_DIFF.md): run the sf0.1 bench,
diff against the prior round's committed BENCH_DETAIL.json, commit both.

``--remeasure`` automates the noise adjudication previously done by
hand: each flagged query is re-run ALONE in a fresh subprocess
(bench.py subset mode — no shared-JVM contention), and the flag is
kept only if the isolated median still exceeds threshold x old. The
exit code then reflects CONFIRMED regressions only; adjudicated-noise
rows stay in the report with their isolated number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def remeasure_isolated(queries: list[str]) -> dict[str, float]:
    """Re-run the given bench queries in ONE fresh subprocess (isolated
    from this process's JVM, queries still median-of-3 warm) and return
    their isolated timings. Honors SPARK_GRAFT_SF_DIR."""
    if not queries:
        return {}
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        detail_path = tf.name
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_QUERIES=",".join(queries),
        SPARK_GRAFT_BENCH_DETAIL=detail_path,
    )
    try:
        subprocess.run(
            [sys.executable, bench],
            env=env,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(detail_path) as f:
            detail = json.load(f)
        return {**detail.get("queries", {}), **detail.get("stub_queries", {})}
    finally:
        os.unlink(detail_path)


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    if "queries" not in data:
        raise SystemExit(f"{path}: no 'queries' key (not a bench artifact)")
    return data


def write_report(
    path: str,
    old: dict,
    new: dict,
    threshold: float,
    common: list,
    added: list,
    removed: list,
    regressions: list,
) -> None:
    flagged = {q: iso for _, q, _, _, iso in regressions}
    lines = [
        "# BENCH DIFF",
        "",
        f"old total: {old.get('value')} s ({len(old['queries'])} queries) | "
        f"new total: {new.get('value')} s ({len(new['queries'])} queries) | "
        f"threshold: {threshold}x",
        "",
        f"common {len(common)} | added {len(added)} | removed {len(removed)} | "
        f"**regressions past threshold: {len(regressions)}**",
        "",
        "| query | old s | new s | ratio | |",
        "|---|---|---|---|---|",
    ]
    for q in common:
        a, b = old["queries"][q], new["queries"][q]
        ratio = b / a if a > 0 else float("inf")
        if q in flagged:
            iso = flagged[q]
            if iso is None:
                flag = "REGRESSION"
            elif a > 0 and iso / a > threshold:
                flag = f"REGRESSION (confirmed isolated: {iso} s)"
            else:
                flag = f"noise (isolated: {iso} s)"
        else:
            flag = ""
        lines.append(f"| {q} | {a} | {b} | {ratio:.2f}x | {flag} |")
    for q in added:
        lines.append(f"| {q} | — | {new['queries'][q]} | new | |")
    for q in removed:
        lines.append(f"| {q} | {old['queries'][q]} | — | removed | |")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> int:
    argv = list(sys.argv[1:])
    report_path = None
    if "--report" in argv:
        i = argv.index("--report")
        report_path = argv[i + 1]
        del argv[i : i + 2]
    remeasure = "--remeasure" in argv
    if remeasure:
        argv.remove("--remeasure")
    if len(argv) < 2:
        raise SystemExit(
            "usage: bench_diff.py OLD.json NEW.json [threshold] "
            "[--report PATH] [--remeasure]"
        )
    old, new = load(argv[0]), load(argv[1])
    threshold = float(argv[2]) if len(argv) > 2 else 1.5
    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    flagged = [
        q
        for q in common
        if old["queries"][q] > 0
        and new["queries"][q] / old["queries"][q] > threshold
    ]
    isolated = remeasure_isolated(flagged) if remeasure else {}
    regressions = []  # (ratio, query, old, new, isolated-or-None)
    confirmed = 0
    for q in flagged:
        a, b = old["queries"][q], new["queries"][q]
        iso = isolated.get(q)
        regressions.append((b / a, q, a, b, iso))
        if iso is None or iso / a > threshold:
            confirmed += 1
    print(
        f"total: {old.get('value')} -> {new.get('value')} s | common {len(common)}"
        f" | added {len(added)} | removed {len(removed)}"
    )
    for ratio, q, a, b, iso in sorted(regressions, reverse=True):
        if iso is not None and iso / a <= threshold:
            print(f"  noise {ratio:4.1f}x  {q}: {a} -> {b} s (isolated: {iso} s)")
        elif iso is not None:
            print(
                f"  REGRESSION {ratio:4.1f}x  {q}: {a} -> {b} s "
                f"(confirmed isolated: {iso} s)"
            )
        else:
            print(f"  REGRESSION {ratio:4.1f}x  {q}: {a} -> {b} s")
    for q in added:
        print(f"  new {q}: {new['queries'][q]} s")
    if removed:
        print(f"  removed: {', '.join(removed)}")
    if report_path:
        write_report(
            report_path, old, new, threshold, common, added, removed, regressions
        )
        print(f"  report written: {report_path}")
    return 1 if confirmed else 0


if __name__ == "__main__":
    sys.exit(main())
