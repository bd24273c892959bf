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
ones, so the re-run is compared LIKE-FOR-LIKE against an isolated
reference, never the contended old number.

``BENCH_ISOLATED.json`` holds, per scale factor, two buckets:

- ``baseline`` — isolated medians of queries adjudicated NOISE (or
  ratcheted in by ``bench_ratchet.py``). A flag is CONFIRMED when
  ``iso_new > threshold * baseline``.
- ``pending`` — isolated medians of queries whose flag could NOT be
  cleared (no baseline, and the isolated re-run did not beat the
  contended old bound). A confirmed regression must NOT ratchet
  itself into the baseline and self-clear — but throwing the
  measurement away (the round-7 behavior) left the next round with
  no reference either, so the flag re-fired forever with no way to
  adjudicate it. Pending entries are REMEASURED on every
  ``--remeasure`` run (whether or not the query flags again) and
  compared like-for-like against the pending value. Promotion to
  baseline requires BOTH a stable isolated time AND the contended
  flag having cleared: stability alone cannot distinguish
  environment drift from a real committed slowdown, but the two
  diverge on the contended axis — a genuine regression keeps
  re-flagging against the still-fast committed basis (the diff basis
  only advances when a green close commits), while a drift flag
  stops firing one round later when the basis catches up. A pending
  query that re-flags stays confirmed (exit 1) no matter how stable
  its isolated time; one that stopped flagging and is stable
  promotes (min of the two medians); one still past the threshold
  stays pending at the smaller reference.

Queries with NO record at all (first time flagged) are adjudicated
conservatively: cleared as noise only when the isolated re-run beats
even the CONTENDED old number (``iso_new <= old``) — the contended old
time is an upper bound on the unknown isolated old time. The exit code
reflects CONFIRMED regressions only; adjudicated-noise rows stay in
the report with their isolated number.

Baselines are keyed by the detail file's ``sf`` field; a detail file
WITHOUT ``sf`` skips all persistence with a warning (an ad-hoc run at
an unknown scale factor must never contaminate another sf's bucket).
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


def _load_isolated_file() -> dict:
    if not os.path.isfile(ISOLATED_BASELINE):
        return {}
    with open(ISOLATED_BASELINE) as f:
        return json.load(f)


def _sf_bucket(data: dict, sf) -> dict:
    """The {'baseline': {...}, 'pending': {...}} bucket for ``sf``.
    Legacy flat buckets ({query: median}) are read as baseline."""
    bucket = data.get(str(sf), {})
    if bucket and "baseline" not in bucket and "pending" not in bucket:
        bucket = {"baseline": bucket}  # legacy format
    return {
        "baseline": dict(bucket.get("baseline", {})),
        "pending": dict(bucket.get("pending", {})),
    }


def load_isolated(sf) -> dict:
    """Baselines are keyed by scale factor — an sf1 ad-hoc remeasure
    must never become the baseline an sf0.1 round adjudicates against.
    A missing sf yields empty buckets (and persistence is skipped)."""
    if sf is None:
        return {"baseline": {}, "pending": {}}
    return _sf_bucket(_load_isolated_file(), sf)


def save_isolated(bucket: dict, sf) -> None:
    if sf is None:
        print(
            "  WARNING: detail file has no 'sf' field — skipping "
            "BENCH_ISOLATED.json persistence (unknown scale factor must "
            "not contaminate another sf's baselines)",
            file=sys.stderr,
        )
        return
    data = _load_isolated_file()
    data[str(sf)] = {
        "baseline": dict(sorted(bucket["baseline"].items())),
        "pending": dict(sorted(bucket["pending"].items())),
    }
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
    pending_rows: list,
) -> None:
    flagged = {q: label for _, q, _, _, label in regressions}

    def _iso10(d: dict) -> str:
        v = d.get("isolated_top10")
        return f"{v} s" if v is not None else "n/a"

    lines = [
        "# BENCH DIFF",
        "",
        f"old total: {old.get('value')} s ({len(old['queries'])} queries) | "
        f"new total: {new.get('value')} s ({len(new['queries'])} queries) | "
        f"threshold: {threshold}x",
        "",
        # the stable round-over-round ratchet: sum of isolated-median
        # baselines over the run's 10 slowest queries — trust this over
        # the contended total, which drifts with machine state
        f"isolated_top10: {_iso10(old)} -> {_iso10(new)}",
        "",
        # round-9 verdict nit: the committed BENCH_r{N}.json headline and
        # this diff's totals come from DIFFERENT runs of the same surface
        # (~2% run-to-run JVM noise) — name the provenance so the ratchet
        # is unambiguous about which run each number describes
        "provenance: totals above are this diff run's remeasure of "
        "BENCH_DETAIL.json (old = last committed detail, new = the "
        "fresh close run); the driver's BENCH_r{N}.json headline is a "
        "separate run and may differ by run-to-run noise.",
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
    if pending_rows:
        lines += [
            "",
            "## Pending adjudications (carried from a prior run)",
            "",
            "| query | pending iso s | fresh iso s | verdict |",
            "|---|---|---|---|",
        ]
        for q, pend, iso, verdict in pending_rows:
            lines.append(f"| {q} | {pend} | {iso} | {verdict} |")
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
    iso_state = load_isolated(sf) if remeasure else {"baseline": {}, "pending": {}}
    baseline, pending = iso_state["baseline"], iso_state["pending"]
    # pending entries are re-adjudicated EVERY remeasure run, flagged or
    # not — that's what makes the pending mechanism converge instead of
    # leaving the query formally open forever
    pending_only = sorted(
        q for q in pending if q not in flagged and q in new["queries"]
    )
    # pending rows for queries no longer in the bench are dead — delete
    # them now (not just skip them), or they'd squat in BENCH_ISOLATED
    # forever and block bench_ratchet seeding if the name is ever reused
    dead_pending = sorted(q for q in pending if q not in new["queries"])
    isolated = remeasure_isolated(flagged + pending_only) if remeasure else {}
    regressions = []  # (ratio, query, old, new, label)
    pending_rows = []  # (query, pending_iso, fresh_iso, verdict) for the report
    dirty = False
    confirmed = 0

    def adjudicate(q: str, iso: float, contended_old: float | None,
                   currently_flagged: bool):
        """(is_real, label) + baseline/pending bookkeeping."""
        nonlocal dirty
        iso_old = baseline.get(q)
        pend_old = pending.get(q)
        if iso_old is not None and iso_old > 0:
            # like-for-like: isolated re-run vs recorded isolated baseline.
            # pending is NOT touched here — it exists only for queries
            # with no baseline; a baselined regression keeps re-flagging
            # against its baseline until fixed or deliberately re-based.
            is_real = iso / iso_old > threshold
            if is_real:
                label = f"REGRESSION (isolated: {iso} s vs baseline {iso_old} s)"
            else:
                label = f"noise (isolated: {iso} s vs baseline {iso_old} s)"
                baseline[q] = min(iso, iso_old)
                pending.pop(q, None)
                dirty = True
            return is_real, label
        if pend_old is not None and pend_old > 0:
            # like-for-like vs the pending reference from the prior run.
            # Stability alone cannot distinguish environment drift from a
            # real committed slowdown, so promotion requires the contended
            # flag to have CLEARED too: a genuine regression keeps
            # re-flagging against the still-fast committed basis (the diff
            # basis only advances when a green close commits), while a
            # drift flag stops firing one round later when the basis
            # catches up — only then does a stable isolated time prove
            # noise and promote.
            stable = iso / pend_old <= threshold
            if currently_flagged:
                is_real = True
                label = (
                    f"REGRESSION (isolated: {iso} s "
                    f"{'stable vs' if stable else 'vs'} pending {pend_old} s, "
                    "but the contended flag re-fired — a stable-but-slow "
                    "time does not self-clear while the committed basis "
                    "still disagrees)"
                )
                pending[q] = min(iso, pend_old)
            elif stable:
                is_real = False
                label = (
                    f"noise (isolated: {iso} s stable vs pending {pend_old} s"
                    " and the contended flag cleared — promoted to baseline)"
                )
                baseline[q] = min(iso, pend_old)
                pending.pop(q, None)
            else:
                is_real = True
                label = (
                    f"REGRESSION (isolated: {iso} s vs pending {pend_old} s)"
                )
                pending[q] = min(iso, pend_old)
            dirty = True
            return is_real, label
        # no record at all: the contended old time is an UPPER bound on the
        # unknown isolated old time, so only an isolated re-run beating it
        # outright is safely adjudicated as noise
        is_real = contended_old is None or iso > contended_old
        if is_real:
            label = (
                f"REGRESSION (isolated: {iso} s > contended old, no iso "
                "baseline — recorded as pending)"
            )
            pending[q] = iso
        else:
            label = f"noise (isolated: {iso} s <= contended old {contended_old} s)"
            baseline[q] = iso
        dirty = True
        return is_real, label

    for q in flagged:
        a, b = old["queries"][q], new["queries"][q]
        iso = isolated.get(q)
        if not remeasure or iso is None:
            label, is_real = "REGRESSION", True
        else:
            is_real, label = adjudicate(q, iso, a, currently_flagged=True)
        regressions.append((b / a, q, a, b, label))
        confirmed += is_real
    for q in pending_only:
        iso = isolated.get(q)
        if iso is None:
            continue
        pend_old = pending.get(q)
        is_real, label = adjudicate(q, iso, None, currently_flagged=False)
        pending_rows.append((q, pend_old, iso, label))
        confirmed += is_real
    if remeasure:
        for q in dead_pending:
            pending.pop(q, None)
            pending_rows.append(
                (q, None, None, "dropped (query no longer in the bench)")
            )
            dirty = True
    if dirty:
        save_isolated({"baseline": baseline, "pending": pending}, sf)
    print(
        f"total: {old.get('value')} -> {new.get('value')} s | common {len(common)}"
        f" | added {len(added)} | removed {len(removed)}"
    )
    for ratio, q, a, b, label in sorted(regressions, reverse=True):
        print(f"  {ratio:4.1f}x  {q}: {a} -> {b} s — {label}")
    for q, pend_old, iso, label in pending_rows:
        print(f"  pending {q}: {pend_old} -> {iso} s isolated — {label}")
    for q in added:
        print(f"  new {q}: {new['queries'][q]} s")
    if removed:
        print(f"  removed: {', '.join(removed)}")
    if report_path:
        write_report(
            report_path,
            old,
            new,
            threshold,
            common,
            added,
            removed,
            regressions,
            pending_rows,
        )
        print(f"  report written: {report_path}")
    return 1 if confirmed else 0


if __name__ == "__main__":
    sys.exit(main())
