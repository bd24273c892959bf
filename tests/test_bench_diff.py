"""Unit tests for scripts/bench_diff.py's pending-regression adjudication.

The round-7 design refused to persist REGRESSION-labeled isolated
medians anywhere (correct: a confirmed regression must not ratchet into
the baseline and self-clear) — but throwing the measurement away left
the next round with no like-for-like reference, so the flag stayed
formally open forever. Round 8 adds the 'pending' bucket: a flagged
query with no baseline records its isolated median as pending; every
subsequent --remeasure run re-measures pending names (flagged or not),
compares like-for-like, and PROMOTES to baseline only on a noise
verdict. These tests drive the mechanism end-to-end with a stubbed
remeasure (no Spark involved)."""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench_diff",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "bench_diff.py"),
)
bench_diff = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_diff)


def _write(path, queries, value=None, sf=0.1):
    payload = {"queries": queries, "value": value or sum(queries.values())}
    if sf is not None:
        payload["sf"] = sf
    with open(path, "w") as f:
        json.dump(payload, f)
    return str(path)


def _run(monkeypatch, tmp_path, old_q, new_q, iso_by_query, iso_file,
         new_sf=0.1, threshold=1.5):
    """Invoke bench_diff.main() with remeasure stubbed to iso_by_query."""
    old = _write(tmp_path / "old.json", old_q)
    new = _write(tmp_path / "new.json", new_q, sf=new_sf)
    monkeypatch.setattr(bench_diff, "ISOLATED_BASELINE", str(iso_file))
    measured = []

    def fake_remeasure(queries):
        measured.extend(queries)
        return {q: iso_by_query[q] for q in queries if q in iso_by_query}

    monkeypatch.setattr(bench_diff, "remeasure_isolated", fake_remeasure)
    monkeypatch.setattr(
        sys, "argv",
        ["bench_diff.py", old, new, str(threshold), "--remeasure",
         "--report", str(tmp_path / "report.md")],
    )
    rc = bench_diff.main()
    state = json.load(open(iso_file)) if os.path.isfile(iso_file) else {}
    return rc, state, measured


def test_first_flag_without_baseline_records_pending(monkeypatch, tmp_path):
    iso_file = tmp_path / "iso.json"
    # q regresses 2x contended; isolated 1.9 s > contended old 1.0 s ->
    # cannot be cleared -> confirmed AND recorded as pending
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},
        iso_by_query={"q": 1.9}, iso_file=iso_file,
    )
    assert rc == 1
    assert state["0.1"]["pending"] == {"q": 1.9}
    assert "q" not in state["0.1"].get("baseline", {})


def test_pending_is_remeasured_even_when_not_flagged(monkeypatch, tmp_path):
    """The convergence property: a pending name that does NOT flag this
    round is still remeasured; a stable isolated time is a noise verdict
    and promotes the smaller median to baseline, clearing pending."""
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"0.1": {"baseline": {}, "pending": {"q": 1.9}}}
    ))
    # contended ratio 1.0 this round (no flag), fresh isolated 1.85 s:
    # within 1.5x of pending 1.9 -> stable -> promote min(1.85, 1.9)
    rc, state, measured = _run(
        monkeypatch, tmp_path,
        old_q={"q": 2.0}, new_q={"q": 2.0},
        iso_by_query={"q": 1.85}, iso_file=iso_file,
    )
    assert measured == ["q"], "pending names must be remeasured"
    assert rc == 0
    assert state["0.1"]["baseline"] == {"q": 1.85}
    assert state["0.1"]["pending"] == {}


def test_pending_does_not_self_clear_while_still_flagged(monkeypatch, tmp_path):
    """Stability alone must not promote: a REAL committed regression has
    a stable isolated time too, but it keeps re-flagging against the
    still-fast committed basis. Flagged + pending + stable => stays a
    confirmed regression; only a cleared contended flag plus stability
    proves drift (code-review r8 finding)."""
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"0.1": {"baseline": {}, "pending": {"q": 1.9}}}
    ))
    # contended 2x (re-flagged) and isolated stable vs pending
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},
        iso_by_query={"q": 1.85}, iso_file=iso_file,
    )
    assert rc == 1, "stable-but-still-flagged must stay confirmed"
    assert state["0.1"]["baseline"] == {}
    assert state["0.1"]["pending"] == {"q": 1.85}  # smaller reference kept


def test_baselined_regression_never_pollutes_pending(monkeypatch, tmp_path):
    """A query WITH a baseline that regresses must not also enter the
    pending bucket — pending exists only for no-baseline flags
    (code-review r8 finding: double-bookkeeping forced perpetual
    remeasurement and double-counted the regression)."""
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"0.1": {"baseline": {"q": 1.0}, "pending": {}}}
    ))
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},
        iso_by_query={"q": 2.0}, iso_file=iso_file,
    )
    assert rc == 1
    assert state["0.1"]["pending"] == {}
    assert state["0.1"]["baseline"] == {"q": 1.0}  # regression not absorbed


def test_pending_still_regressing_stays_pending(monkeypatch, tmp_path):
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"0.1": {"baseline": {}, "pending": {"q": 1.0}}}
    ))
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 1.0},
        iso_by_query={"q": 2.0}, iso_file=iso_file,
    )
    assert rc == 1
    # the smaller reference is kept — a regression can't ratchet pending up
    assert state["0.1"]["pending"] == {"q": 1.0}
    assert state["0.1"]["baseline"] == {}


def test_baseline_noise_verdict_and_min_ratchet(monkeypatch, tmp_path):
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"0.1": {"baseline": {"q": 2.0}, "pending": {}}}
    ))
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},   # 2x contended -> flagged
        iso_by_query={"q": 1.8}, iso_file=iso_file,
    )
    assert rc == 0  # isolated 1.8 vs baseline 2.0: noise
    assert state["0.1"]["baseline"] == {"q": 1.8}  # min-ratchet


def test_legacy_flat_format_reads_as_baseline(monkeypatch, tmp_path):
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps({"0.1": {"q": 2.0}}))  # pre-round-8 shape
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},
        iso_by_query={"q": 1.9}, iso_file=iso_file,
    )
    assert rc == 0
    assert state["0.1"]["baseline"] == {"q": 1.9}
    assert state["0.1"]["pending"] == {}


def test_missing_sf_skips_persistence(monkeypatch, tmp_path, capsys):
    """ADVICE r7: a detail file without 'sf' must not store baselines
    under the literal key 'None' — persistence is skipped, loudly."""
    iso_file = tmp_path / "iso.json"
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},
        iso_by_query={"q": 0.5}, iso_file=iso_file,
        new_sf=None,
    )
    # isolated 0.5 beats contended old 1.0 -> noise verdict, exit 0 ...
    assert rc == 0
    # ... but nothing may be persisted for an unknown scale factor
    assert state == {}
    assert "skipping" in capsys.readouterr().err


def test_sf_keys_do_not_cross_contaminate(monkeypatch, tmp_path):
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"1": {"baseline": {"q": 0.1}, "pending": {}}}
    ))
    rc, state, _ = _run(
        monkeypatch, tmp_path,
        old_q={"q": 1.0}, new_q={"q": 2.0},
        iso_by_query={"q": 1.9}, iso_file=iso_file,
    )
    # sf0.1 run must not see the sf1 baseline (0.1 s would confirm it)
    assert rc == 1  # no 0.1-key record: conservative contended-bound rule
    assert state["1"]["baseline"] == {"q": 0.1}  # untouched
    assert state["0.1"]["pending"] == {"q": 1.9}


def test_dead_pending_rows_are_deleted(monkeypatch, tmp_path):
    """ADVICE r8: pending entries for queries later REMOVED from the bench
    were filtered out of remeasurement but never deleted — dead rows
    accumulated in BENCH_ISOLATED.json and would block bench_ratchet
    seeding for any future query reusing the name. A remeasure run must
    drop them (and only them) on save."""
    iso_file = tmp_path / "iso.json"
    iso_file.write_text(json.dumps(
        {"0.1": {"baseline": {"keep": 0.4},
                 "pending": {"gone": 3.0, "live": 1.9}}}
    ))
    rc, state, measured = _run(
        monkeypatch, tmp_path,
        old_q={"keep": 0.5, "live": 2.0}, new_q={"keep": 0.5, "live": 2.0},
        iso_by_query={"live": 1.85}, iso_file=iso_file,
    )
    # 'gone' is not in the new bench: never remeasured, deleted on save
    assert measured == ["live"]
    assert "gone" not in state["0.1"]["pending"]
    # the live pending name still went through normal adjudication
    assert state["0.1"]["baseline"] == {"keep": 0.4, "live": 1.85}
    assert state["0.1"]["pending"] == {}
    assert rc == 0
