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
hand: the flagged queries are re-run in ONE fresh subprocess,
sequentially, with extra repeats (bench.py subset mode) — free of
other processes, but deliberately NOT one JVM per query: a JVM that
has executed only a single sub-second query never reaches the JIT
warmth the full bench gives query #100, and measured per-query-JVM
medians came out ~2x SLOWER than the same query's contended number,
inverting the adjudication. One warm subprocess reproduces the
bench's own contended-sequential conditions for the flagged subset.
Isolated-subset timings still differ systematically from full-bench
ones, so the re-run is compared
LIKE-FOR-LIKE against an isolated baseline, not the contended old
number: NOISE-adjudicated isolated medians are persisted to
``BENCH_ISOLATED.json`` (cumulative, keyed by scale factor so an sf1
remeasure never becomes an sf0.1 baseline; confirmed regressions are
NOT absorbed — a persistent regression must not ratchet itself into
the baseline and self-clear on the next run), and a flag is confirmed
when ``iso_new > threshold * iso_old`` for a query with a recorded
isolated baseline. Queries with NO isolated baseline yet (first time
flagged) are adjudicated conservatively: cleared as noise only when
the isolated re-run beats even the CONTENDED old number
(``iso_new <= old``) — anything slower than that stays a confirmed
regression, because the contended old time is an upper bound on the
unknown isolated old time. The exit code reflects CONFIRMED
regressions only; adjudicated-noise rows stay in the report with
their isolated number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ISOLATED_BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_ISOLATED.json",
)


def remeasure_isolated(queries: list[str]) -> dict[str, float]:
    """Re-run the given bench queries in ONE fresh subprocess (free of
    other processes; sequential within a shared warm JVM like the
    bench itself — see the module docstring for why per-query JVMs
    mis-measure sub-second queries) with 5 repeats so the median sits
    on warm samples. Honors SPARK_GRAFT_SF_DIR."""
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
        SPARK_GRAFT_BENCH_REPEATS=os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"),
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


def load_isolated_baseline(sf) -> dict[str, float]:
    """Baselines are keyed by scale factor — an sf1 ad-hoc remeasure
    must never become the baseline an sf0.1 round adjudicates against."""
    if not os.path.isfile(ISOLATED_BASELINE):
        return {}
    with open(ISOLATED_BASELINE) as f:
        data = json.load(f)
    return data.get(str(sf), {})


def update_isolated_baseline(timings: dict[str, float], sf) -> None:
    data = {}
    if os.path.isfile(ISOLATED_BASELINE):
        with open(ISOLATED_BASELINE) as f:
            data = json.load(f)
    data.setdefault(str(sf), {}).update(timings)
    with open(ISOLATED_BASELINE, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


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
    flagged = {q: label for _, q, _, _, label in regressions}
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
        flag = flagged.get(q, "")
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
    sf = new.get("sf")
    isolated = remeasure_isolated(flagged) if remeasure else {}
    iso_baseline = load_isolated_baseline(sf) if remeasure else {}
    regressions = []  # (ratio, query, old, new, label)
    noise_timings: dict[str, float] = {}
    confirmed = 0
    for q in flagged:
        a, b = old["queries"][q], new["queries"][q]
        iso, iso_old = isolated.get(q), iso_baseline.get(q)
        if not remeasure or iso is None:
            label, is_real = "REGRESSION", True
        elif iso_old is not None and iso_old > 0:
            # like-for-like: isolated re-run vs recorded isolated baseline
            is_real = iso / iso_old > threshold
            label = (
                f"REGRESSION (isolated: {iso} s vs baseline {iso_old} s)"
                if is_real
                else f"noise (isolated: {iso} s vs baseline {iso_old} s)"
            )
        else:
            # no isolated baseline yet: the contended old time is an UPPER
            # bound on the unknown isolated old time, so only an isolated
            # re-run beating it outright is safely adjudicated as noise
            is_real = iso > a
            label = (
                f"REGRESSION (isolated: {iso} s > contended old, no iso baseline)"
                if is_real
                else f"noise (isolated: {iso} s <= contended old {a} s)"
            )
        regressions.append((b / a, q, a, b, label))
        confirmed += is_real
        if iso is not None and not is_real:
            # only NOISE-adjudicated timings enter the baseline — a
            # confirmed regression must NOT ratchet itself in and
            # self-clear on the next run
            noise_timings[q] = iso
    if noise_timings:
        update_isolated_baseline(noise_timings, sf)
    print(
        f"total: {old.get('value')} -> {new.get('value')} s | common {len(common)}"
        f" | added {len(added)} | removed {len(removed)}"
    )
    for ratio, q, a, b, label in sorted(regressions, reverse=True):
        print(f"  {ratio:4.1f}x  {q}: {a} -> {b} s — {label}")
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
