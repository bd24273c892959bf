"""Property-based cast-parity: the engine's non-ANSI casts must agree
with DuckDB TRY_CAST (the oracle's semantics) on arbitrary inputs —
the T4/T5 'errors=coerce' contract, fuzzed instead of hand-picked.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from facolos_data_pipelines_spark.operators.conform import safe_cast

# Strings that plausibly reach a numeric/timestamp staging column:
# clean numbers, garbage, whitespace, signs, exponents, dates.
NUMERICISH = st.one_of(
    st.from_regex(r"-?[0-9]{1,12}", fullmatch=True),
    st.from_regex(r"-?[0-9]{1,6}\.[0-9]{1,6}", fullmatch=True),
    st.from_regex(r"-?[0-9]\.[0-9]{1,4}[eE][+-]?[0-9]{1,2}", fullmatch=True),
    st.sampled_from(["", " ", "abc", "NaN", "nan", "Infinity", "-Infinity",
                     "1,000", "12abc", "abc12", "+5", "  7  ", "0x1F", "1e", "."]),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(NUMERICISH, min_size=1, max_size=30))
def _collect_cases(acc, values):  # pragma: no cover - helper shape
    acc.extend(values)


def _gen_cases(n=300):
    cases = []
    NUMERICISH.example  # noqa: B018 — silence lint on strategy attr
    import random

    random.seed(42)
    from hypothesis import find

    # draw deterministic samples by fixed seeds
    @settings(max_examples=n, deadline=None, database=None, derandomize=True)
    @given(NUMERICISH)
    def draw(v):
        cases.append(v)

    draw()
    return cases


def _duckdb_only_int(s: str) -> bool:
    """Strings DuckDB coerces to int but the reference contract
    (_safe_int ≈ Python int()) nulls: fractional/exponent numbers
    (rounded by DuckDB) and hex literals."""
    t = s.strip()
    if t.lower().startswith(("0x", "-0x", "+0x")):
        return True
    try:
        float(t)
    except ValueError:
        return False
    return not (t.lstrip("+-").isdigit())


@pytest.mark.parametrize("target", ["int", "bigint", "double"])
def test_safe_cast_matches_duckdb_try_cast(spark, target):
    cases = sorted(set(_gen_cases()))
    df = spark.createDataFrame([(i, v) for i, v in enumerate(cases)], ["i", "v"])
    out = {r["i"]: r["v"] for r in safe_cast(df, {"v": target}).collect()}

    con = duckdb.connect()
    duck_target = {"int": "INTEGER", "bigint": "BIGINT", "double": "DOUBLE"}[target]
    mismatches = []
    for i, v in enumerate(cases):
        want = con.execute(f"SELECT TRY_CAST(? AS {duck_target})", [v]).fetchone()[0]
        got = out[i]
        if target in ("int", "bigint") and _duckdb_only_int(v):
            # Documented divergences: DuckDB TRY_CAST('3.5' AS INT) -> 4
            # and TRY_CAST('0x1F') -> 31; the engine nulls both, matching
            # the REFERENCE (_safe_int, tiktok_shop_transformer.py:188-195).
            # Oracle queries therefore never cast fractional strings to int.
            if got is not None:
                mismatches.append((v, got, "expected NULL (reference contract)"))
            continue
        same = (
            (got is None and want is None)
            or (
                got is not None
                and want is not None
                and (got == want or (got != got and want != want))  # NaN == NaN
            )
        )
        if not same:
            mismatches.append((v, got, want))
    # Exact agreement required everywhere else: these casts gate the oracle.
    assert not mismatches, mismatches[:10]
