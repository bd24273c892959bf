"""The re-bootstrap transition's cost curve, measured (round 12).

`rebin_hist_state` is documented as "the one honest bounded fact
rescan": re-binning (day, bin, n) state under a new edge family needs
the underlying values, but ONLY for days >= seam - 1 — history before
the seam keeps its old-family rows untouched. The claim under test:
the transition's cost scales with the RESCAN WINDOW (days from the
seam's baseline to the end of the fact), not with the full history —
so at 100 TB, where the fact is years deep and a drift seam is days
old, the recovery costs a few days' scan, never a history rescan.

Protocol: sf10 events (10M rows / 30 days), old family = 10-bin edges
bootstrapped on days <= 01-15, old store accumulated over the whole
window; new family = 8-bin edges on days 16..19. For each seam in a
sweep (late seam = small rescan .. early seam = near-full rescan) and
for the degenerate full re-bin (hist_state over all 30 days — what an
operator without the transition op would run), time:

  rebin  = rebin_hist_state(fact, ..., seam, old_state)  [materialized
           via .count(); includes the mass-conservation check]
  stitch = stitched_psi(old_state, rebinned, seam).collect()

and report the rescanned row count per leg (the predicted cost
driver). reps per leg, median. One JSON line out.

Usage:

    python scripts/bench_scale_rebin.py SF_DIR [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit("usage: bench_scale_rebin.py SF_DIR [reps]")
    sf_dir = sys.argv[1].rstrip("/")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.quality.checks import (
        hist_edges,
        hist_state,
        pinned_edges,
        rebin_hist_state,
        stitched_psi,
    )
    from facolos_data_pipelines_spark.session import build_spark

    spark = build_spark(app_name="scale-rebin")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_rows = events.count()

    old_edges = pinned_edges(
        hist_edges(
            events.filter(F.to_date("ts") <= F.lit("2024-01-15")), "value", 10
        ),
        "bench_rebin",
    )
    new_edges = pinned_edges(
        hist_edges(
            events.filter(F.to_date("ts").between("2024-01-16", "2024-01-19")),
            "value", 8,
        ),
        "bench_rebin",
    )
    # the accumulated store: days x bins rows, persisted once (the
    # transition reads it for the mass check and the stitched old side)
    old_state = hist_state(events, "ts", "value", old_edges).persist()
    old_state.count()

    legs = {}
    # late seam (4-day rescan) .. early seam (26-day rescan)
    for seam in ("2024-01-27", "2024-01-21", "2024-01-05"):
        baseline = f"{seam[:8]}{int(seam[8:]) - 1:02d}"
        rescan_rows = events.filter(
            F.to_date("ts") >= F.lit(baseline)
        ).count()
        rebin_times, stitch_times = [], []
        n_series = None
        for _ in range(reps):
            t0 = time.monotonic()
            rebinned = rebin_hist_state(
                events, "ts", "value", new_edges, seam, old_state=old_state
            ).persist()
            rebinned.count()
            rebin_times.append(round(time.monotonic() - t0, 3))
            t0 = time.monotonic()
            series = stitched_psi(
                old_state, rebinned, seam,
                old_edges=old_edges, new_edges=new_edges,
            ).collect()
            stitch_times.append(round(time.monotonic() - t0, 3))
            n_series = len(series)
            rebinned.unpersist()
        legs[seam] = {
            "rescan_rows": rescan_rows,
            "rescan_frac": round(rescan_rows / n_rows, 3),
            "rebin_median": statistics.median(rebin_times),
            "rebin_times": rebin_times,
            "stitch_median": statistics.median(stitch_times),
            "stitch_times": stitch_times,
            "series_days": n_series,
        }

    # the no-transition alternative: re-bin ALL history under the new
    # family (what the operator would have to run without the seam)
    full_times = []
    for _ in range(reps):
        t0 = time.monotonic()
        hist_state(events, "ts", "value", new_edges).count()
        full_times.append(round(time.monotonic() - t0, 3))

    print(json.dumps({
        "op": "rebin_transition_cost",
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "reps": reps,
        "legs": legs,
        "full_rebin_median": statistics.median(full_times),
        "full_rebin_times": full_times,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
