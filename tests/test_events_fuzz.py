"""Differential fuzzing of the EVENTS-family oracle pairs on
adversarial timestamps — the third fuzz surface after text
(test_differential_fuzz.py) and vectors (test_embedding_fuzz.py).

A real event stream at crawl scale carries exactly the shapes engines
disagree on: epoch-0 and pre-1970 timestamps, microsecond-adjacent
ties, EXACT duplicate (user, ts) pairs (window tie-break dialect),
events parked precisely on hour / session-gap / range-frame
boundaries (inclusive-vs-exclusive dialect), far-future dates,
negative and zero values, empty/NULL/malformed JSON props, and
event types no query's CASE arms expect. Any engine disagreement is
a real portability bug (frame semantics, tie order, JSON laxness) —
the class the text pass found six of and the vector pass one of.

NULL timestamps / NULL user_ids are exercised in a dedicated pin
test rather than the corpus: several queries' semantics legitimately
differ on NULL keys (SQL GROUP BY NULL groups, window partitions),
and the pin makes today's cross-engine behavior explicit instead of
averaging it into every query's hash."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

import __spark_entry__ as entry_mod
from test_entry_contract import _value_multiset

FUZZ_QUERIES = [
    "events_hourly",
    "events_anomaly_hours",
    "latest_per_key",
    "join_asof_latest",
    "events_sessionized",
    "json_props_agg",
    "events_running_totals",
    "window_ntile",
    "events_time_profile",
    "scd2_intervals",
    "events_rolling_range",
    "funnel_conversion",
    "cohort_retention",
    "markov_stationary",
    "ks_drift",
    "zorder_cells",
    "graph_components",
    "triangle_counts",
    "kcore_peel",
    "degree_assortativity",
    "pagerank_hosts",
    "pagerank_personalized",
]


def _adversarial_events():
    """(event_id, ts, user_id, event_type, value, props) rows."""
    T = dt.datetime
    us = dt.timedelta(microseconds=1)
    base = T(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # epoch 0 and pre-1970 (negative unix micros)
    add(T(1970, 1, 1, 0, 0, 0), 1, "view", 1.0, '{"k": 1}')
    add(T(1969, 12, 31, 23, 59, 59, 999999), 1, "click", 2.0, '{"k": 2}')
    add(T(1969, 7, 20, 20, 17, 40), 2, "view", 3.0, '{"k": 3}')
    # far future
    add(T(2100, 12, 31, 23, 59, 59), 2, "buy", 4.0, '{"k": 4}')
    # EXACT duplicate (user, ts) — window tie-break dialect
    add(base, 3, "view", 5.0, '{"k": 5}')
    add(base, 3, "click", 6.0, '{"k": 6}')
    add(base, 3, "buy", 7.0, '{"k": 7}')
    # microsecond-adjacent events
    add(base + us, 3, "view", 8.0, '{"k": 8}')
    add(base + 2 * us, 3, "error", 9.0, '{"k": 9}')
    # exactly on the hour boundary (date_trunc ties)
    add(T(2024, 1, 1, 1, 0, 0), 4, "view", 10.0, '{"k": 10}')
    add(T(2024, 1, 1, 1, 0, 0, 1), 4, "click", 11.0, '{"k": 11}')
    add(T(2024, 1, 1, 2, 0, 0), 4, "view", -12.0, '{"k": 12}')
    # exactly a 30-minute gap (session boundary inclusivity)
    add(T(2024, 1, 2, 0, 0, 0), 5, "view", 13.0, '{"k": 13}')
    add(T(2024, 1, 2, 0, 30, 0), 5, "click", 14.0, '{"k": 14}')
    add(T(2024, 1, 2, 1, 0, 0, 1), 5, "buy", 15.0, '{"k": 15}')
    # values: zero, negative zero, huge, tiny, exact rounding edge
    add(T(2024, 1, 3), 6, "view", 0.0, '{"k": 16}')
    add(T(2024, 1, 3, 0, 1), 6, "click", -0.0, '{"k": 17}')
    add(T(2024, 1, 3, 0, 2), 6, "buy", 1e15, '{"k": 18}')
    add(T(2024, 1, 3, 0, 3), 6, "view", 1e-15, '{"k": 19}')
    add(T(2024, 1, 3, 0, 4), 6, "view", 0.0000005, '{"k": 20}')
    # props: empty obj, missing key, nested, unicode key, malformed,
    # empty string, huge int value
    add(T(2024, 1, 4), 7, "view", 21.0, "{}")
    add(T(2024, 1, 4, 0, 1), 7, "view", 22.0, '{"other": 1}')
    add(T(2024, 1, 4, 0, 2), 7, "click", 23.0, '{"k": {"nested": 2}}')
    add(T(2024, 1, 4, 0, 3), 7, "view", 24.0, '{"ключ": 3, "k": 25}')
    add(T(2024, 1, 4, 0, 4), 7, "buy", 25.0, "not json at all")
    add(T(2024, 1, 4, 0, 5), 7, "view", 26.0, "")
    add(T(2024, 1, 4, 0, 6), 7, "view", 27.0, '{"k": 99999999999999}')
    # event types outside every CASE arm + empty + unicode
    add(T(2024, 1, 5), 8, "UNSEEN_TYPE", 28.0, '{"k": 28}')
    add(T(2024, 1, 5, 0, 1), 8, "", 29.0, '{"k": 29}')
    add(T(2024, 1, 5, 0, 2), 8, "пример", 30.0, '{"k": 30}')
    # user ids: 0, negative, huge (graph/shard-key edges)
    add(T(2024, 1, 6), 0, "view", 31.0, '{"k": 31}')
    add(T(2024, 1, 6, 0, 1), -5, "click", 32.0, '{"k": 32}')
    add(T(2024, 1, 6, 0, 2), 2**40, "view", 33.0, '{"k": 33}')
    # a normal-ish tail so funnel/cohort/markov produce rows: three
    # users completing view->click->buy across two weeks
    for u in (10, 11, 12):
        for w, et in enumerate(("view", "click", "buy")):
            add(
                T(2024, 1, 8) + dt.timedelta(days=7 * w, hours=u),
                u,
                et,
                float(u + w),
                f'{{"k": {u + w}}}',
            )
            add(
                T(2024, 1, 8) + dt.timedelta(days=7 * w, hours=u, minutes=5),
                u,
                "view",
                float(w),
                f'{{"k": {w}}}',
            )
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("evfuzz")
    spark.createDataFrame(
        _adversarial_events(),
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fuzz_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_events_fuzz_oracle_match(spark, fuzz_duck, fuzz_dir, name):
    spark_pdf = entry_mod.queries()[name](spark, fuzz_dir).toPandas()
    duck_pdf = fuzz_duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: columns"
    ms, md = _value_multiset(spark_pdf), _value_multiset(duck_pdf)
    if ms != md:
        only_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
        only_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
        pytest.fail(
            f"{name}: value mismatch on adversarial events\n"
            f" spark-only: {only_s}\n duck-only: {only_d}"
        )
