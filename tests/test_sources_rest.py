"""REST-shaped ingest (S1-S5): pagination walks, auth helpers, retry,
and the distributed keyed detail fetch — deterministic fakes, no network."""

import base64
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from facolos_data_pipelines_spark.sources.rest import (
    TokenManager,
    fetch_details_distributed,
    hmac_sha256_signature,
    jwt_expiry_epoch,
    read_cursor_paginated,
    read_page_paginated,
    with_retry,
)

REC_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("val", T.StringType())]
)


def test_page_paginated_stops_on_short_page(spark):
    calls = []

    def fetch(page, page_size):
        calls.append(page)
        if page <= 2:
            return [{"id": page * 100 + i, "val": f"p{page}"} for i in range(page_size)]
        return [{"id": 999, "val": "last"}]  # short page -> stop

    df = read_page_paginated(spark, fetch, REC_SCHEMA, page_size=5)
    assert df.count() == 11
    assert calls == [1, 2, 3]


def test_page_paginated_respects_max_pages(spark):
    def fetch(page, page_size):
        return [{"id": page, "val": "x"} for _ in range(page_size)]

    df = read_page_paginated(spark, fetch, REC_SCHEMA, page_size=3, max_pages=2)
    assert df.count() == 6  # the MISA_MAX_PAGES_PER_CYCLE work limit


def test_cursor_paginated_walks_until_exhausted(spark):
    def fetch(cursor, page_size):
        nxt = {None: "c1", "c1": "c2", "c2": None}[cursor]
        return [{"id": hash(cursor) % 100, "val": str(cursor)}], nxt

    df = read_cursor_paginated(spark, fetch, REC_SCHEMA)
    assert df.count() == 3


def test_hmac_signature_deterministic_sorted_params():
    sig1 = hmac_sha256_signature("secret", "/orders", {"b": "2", "a": "1"})
    sig2 = hmac_sha256_signature("secret", "/orders", {"a": "1", "b": "2"})
    assert sig1 == sig2  # param order must not matter (sorted canonical form)
    assert sig1 != hmac_sha256_signature("other", "/orders", {"a": "1", "b": "2"})


def _fake_jwt(exp):
    payload = base64.urlsafe_b64encode(json.dumps({"exp": exp}).encode()).decode().rstrip("=")
    return f"h.{payload}.s"


def test_token_manager_refreshes_ahead_of_expiry():
    import time

    now = int(time.time())
    tokens = iter([_fake_jwt(now + 10), _fake_jwt(now + 9999)])
    calls = []

    def refresh():
        t = next(tokens)
        calls.append(t)
        return t

    tm = TokenManager(refresh, buffer_seconds=300)
    t1 = tm.token()          # fetches first token (exp within buffer)
    t2 = tm.token()          # expiring inside buffer -> refreshes again
    t3 = tm.token()          # fresh token -> no refresh
    assert len(calls) == 2 and t2 == t3


def test_jwt_expiry_epoch_handles_garbage():
    assert jwt_expiry_epoch(_fake_jwt(12345)) == 12345
    assert jwt_expiry_epoch("not-a-jwt") is None


def test_with_retry_recovers_then_raises():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("429")
        return "ok"

    assert with_retry(flaky, attempts=3) == "ok"
    with pytest.raises(RuntimeError):
        with_retry(lambda: (_ for _ in ()).throw(RuntimeError("down")), attempts=2)


def test_fetch_details_distributed(spark):
    ids = spark.range(0, 20).select(F.col("id").alias("order_id"))
    schema = T.StructType(
        [T.StructField("order_id", T.LongType()), T.StructField("detail", T.StringType())]
    )

    def fetch_batch(batch_ids):
        assert len(batch_ids) <= 5  # batch-size contract (reference: 50)
        return [{"order_id": i, "detail": f"d{i}"} for i in batch_ids]

    out = fetch_details_distributed(ids.repartition(4), "order_id", fetch_batch, schema, batch_size=5)
    rows = {r["order_id"]: r["detail"] for r in out.collect()}
    assert rows == {i: f"d{i}" for i in range(20)}
