"""Round-3 session-10 additions, each checked against an independent
brute-force oracle:

  - textstats.stack_quality (The Stack / StarCoder code-file filter,
    Kocetkov 2022 §II-B): max/avg line length + alphanumeric fraction
    → keep; crafted edge cases (empty file, 1000-char line boundary,
    binary-ish blob) plus synth-corpus parity
  - timeseries.counter_rate (ES TSDB rate over a counter field):
    per-series lag with reset detection (negative delta → post-reset
    value IS the increase), hourly calendar buckets; python brute
    force with planted resets + a plan audit that the window's series
    shuffle is REUSED by the superset-key groupBy (single Exchange)
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.textstats import stack_quality
from maestro_spark.operators.timeseries import counter_rate


# --------------------------------------------------- stack_quality


def _stack_brute(text: str):
    lines = text.split("\n")
    n = len(lines)
    mx = max(len(x) for x in lines)
    avg = sum(len(x) for x in lines) / n
    alnum = (sum(c.isascii() and c.isalnum() for c in text) / len(text)
             if text else 0.0)
    keep = mx <= 1000 and avg <= 100.0 and alnum >= 0.25
    return n, mx, round(avg, 6), round(alnum, 6), keep


CRAFTED = [
    (0, "def f(x):\n    return x + 1\n"),          # normal code: keep
    (1, ""),                                        # empty file: drop
    (2, "x = 1\n" + "a" * 1001 + "\ny = 2"),        # minified line: drop
    (3, "-" * 120),                                  # symbol blob: drop
    (4, "a" * 1000),                                 # exactly at max: avg fails
    (5, "ab\n" * 40 + "ab"),                         # short lines: keep
    (6, "\x00\x01\x02\x03 \x04\x05 " * 10 + "ab"),   # low alnum
]


def test_stack_quality_crafted(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [i for i, _ in CRAFTED],
                      "text": [t for _, t in CRAFTED]}))
    got = {r["doc_id"]: r for r in stack_quality(df).collect()}
    for i, t in CRAFTED:
        n, mx, avg, alnum, keep = _stack_brute(t)
        r = got[i]
        assert r["n_lines"] == n, (i, r)
        assert r["max_line_len"] == mx
        assert round(r["avg_line_len"], 6) == avg
        assert round(r["alnum_frac"], 6) == alnum
        assert r["keep"] == keep, (i, t[:30])
    # sanity on the planted cases
    assert got[0]["keep"] and got[5]["keep"]
    assert not any(got[i]["keep"] for i in (1, 2, 3, 4, 6))


def test_stack_quality_synth_parity(spark):
    from maestro_spark.sources.corpus import synth_docs_pandas
    pdf = synth_docs_pandas(120, seed=11).reset_index(names="doc_id")
    got = stack_quality(
        spark.createDataFrame(pdf), text_col="content").toPandas()
    got = got.set_index("doc_id").sort_index()
    for i, t in zip(pdf["doc_id"], pdf["content"]):
        n, mx, avg, alnum, keep = _stack_brute(t)
        r = got.loc[i]
        assert (int(r["n_lines"]), int(r["max_line_len"])) == (n, mx)
        assert round(float(r["avg_line_len"]), 6) == avg
        assert round(float(r["alnum_frac"]), 6) == alnum
        assert bool(r["keep"]) == keep


def test_stack_quality_plan_map_only(spark):
    from maestro_spark.sources.corpus import synth_docs_pandas
    pdf = synth_docs_pandas(20, seed=3).reset_index(names="doc_id")
    plan = stack_quality(spark.createDataFrame(pdf),
                         text_col="content")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan          # map-only, zero shuffle
    assert "BatchEvalPython" not in plan   # no per-row Python


# --------------------------------------------------- counter_rate


@pytest.fixture(scope="module")
def events_pdf():
    # 3 series, planted resets, a cross-hour boundary delta, ties on ts
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # series 1: monotone within hour 0, reset inside hour 1
        (0, t0 + dt.timedelta(minutes=1), 1, 10.0),
        (1, t0 + dt.timedelta(minutes=20), 1, 25.0),
        (2, t0 + dt.timedelta(minutes=65), 1, 40.0),   # +15 into hour 1
        (3, t0 + dt.timedelta(minutes=70), 1, 3.0),    # reset -> +3
        (4, t0 + dt.timedelta(minutes=80), 1, 9.0),    # +6
        # series 2: single event (contributes 0)
        (5, t0 + dt.timedelta(minutes=5), 2, 100.0),
        # series 3: tie on ts resolved by event_id, immediate reset
        (6, t0 + dt.timedelta(minutes=30), 3, 50.0),
        (7, t0 + dt.timedelta(minutes=30), 3, 2.0),    # reset -> +2
        (8, t0 + dt.timedelta(minutes=90), 3, 7.0),    # +5 into hour 1
    ]
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                       "value"])


def _rate_brute(pdf):
    out = {}
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        prev = None
        for _, r in g.iterrows():
            inc = (0.0 if prev is None
                   else (r.value - prev if r.value >= prev else r.value))
            b = r.ts.replace(minute=0, second=0).strftime(
                "%Y-%m-%d %H:%M:%S")
            k = (uid, b)
            n, s = out.get(k, (0, 0.0))
            out[k] = (n + 1, s + inc)
            prev = r.value
    return {k: (n, round(s, 6), round(s / 3600.0, 6))
            for k, (n, s) in out.items()}


def test_counter_rate_planted(spark, events_pdf):
    got = counter_rate(spark.createDataFrame(events_pdf)).collect()
    exp = _rate_brute(events_pdf)
    assert len(got) == len(exp)
    for r in got:
        n, inc, rate = exp[(r["series"], r["bucket"])]
        assert r["n_events"] == n
        assert round(r["increase"], 6) == inc
        assert round(r["rate_per_second"], 6) == rate
    # the reset rows contributed their post-reset value, not a negative
    s1h1 = next(r for r in got if r["series"] == 1
                and r["bucket"].endswith("01:00:00"))
    assert round(s1h1["increase"], 6) == 15.0 + 3.0 + 6.0


def test_counter_rate_single_shuffle(spark, events_pdf):
    # the groupBy keys (series, bucket) are a superset of the window's
    # partition key -> Spark reuses the hash distribution: exactly ONE
    # Exchange in the plan (the TSDB routing shuffle)
    plan = counter_rate(spark.createDataFrame(events_pdf)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_counter_rate_unit_guard(spark, events_pdf):
    with pytest.raises(ValueError):
        counter_rate(spark.createDataFrame(events_pdf), unit="week")
