"""Conversation-structure analytics vs literal scalar definitions."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from peakmatch_xcorr_spark.operators.transcripts import (
    behavior_entropy,
    ordered_turns,
    response_gaps,
    response_latency_stats,
    role_ngrams,
    role_transitions,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, conv, role, seconds-offset)."""
    data = [
        (eid, T0 + dt.timedelta(seconds=s), conv, role)
        for eid, conv, role, s in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )


@pytest.fixture(scope="module")
def turns(spark):
    # conv 1: u a u a u   (alternating, 10s gaps)
    # conv 2: u u a       (double-text then answer)
    # conv 3: a           (monologue)
    rows = [
        (1, 1, "u", 0), (2, 1, "a", 10), (3, 1, "u", 20),
        (4, 1, "a", 30), (5, 1, "u", 40),
        (6, 2, "u", 0), (7, 2, "u", 5), (8, 2, "a", 25),
        (9, 3, "a", 0),
    ]
    return ordered_turns(_events(spark, rows)).cache()


def test_ordered_turns_stable_order(spark):
    # identical ts -> event_id breaks the tie, deterministically
    rows = [(20, 9, "b", 0), (10, 9, "a", 0)]
    out = ordered_turns(_events(spark, rows)).collect()
    by_idx = {r["turn_idx"]: r["role"] for r in out}
    assert by_idx == {1: "a", 2: "b"}


def test_role_transitions_counts_and_probs(turns):
    got = {
        (r["from_role"], r["to_role"]): (r["n"], r["prob"])
        for r in role_transitions(turns).collect()
    }
    # conv1: u>a, a>u, u>a, a>u ; conv2: u>u, u>a ; conv3: none
    assert got[("u", "a")][0] == 3
    assert got[("a", "u")][0] == 2
    assert got[("u", "u")][0] == 1
    assert got[("u", "a")][1] == pytest.approx(0.75)
    assert got[("u", "u")][1] == pytest.approx(0.25)
    assert got[("a", "u")][1] == pytest.approx(1.0)
    assert sum(n for n, _ in got.values()) == 6


def test_response_gaps_exact_micros(turns):
    got = sorted(
        (r["conv_id"], r["gap_us"])
        for r in response_gaps(turns, "u", "a").collect()
    )
    # u->a adjacencies: conv1 at +10s twice, conv2 at +20s (after the
    # SECOND u, the adjacent one)
    assert got == [(1, 10_000_000), (1, 10_000_000), (2, 20_000_000)]


def test_latency_stats_discrete_quantiles(spark):
    # one conv, gaps 1..7 s: p50 = rank ceil(3.5)=4 -> 4 s,
    # p95 = rank ceil(6.65)=7 -> 7 s, avg = 4 s
    rows, eid, s = [], 0, 0
    for gap in range(1, 8):
        rows.append((eid, 5, "u", s)); eid += 1
        s += gap
        rows.append((eid, 5, "a", s)); eid += 1
        s += 1000  # a->u spacing, not a u->a gap
    out = response_latency_stats(
        ordered_turns(_events(spark, rows)), "u", "a", bucket="365 days"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 7
    assert r["avg_s"] == pytest.approx(4.0)
    assert r["p50_s"] == pytest.approx(4.0)
    assert r["p95_s"] == pytest.approx(7.0)


def test_behavior_entropy_matches_formula(turns):
    got = {
        r["conv_id"]: (r["n_turns"], r["entropy_bits"])
        for r in behavior_entropy(turns).collect()
    }
    def h(*counts):
        n = sum(counts)
        return round(
            -sum(c / n * math.log2(c / n) for c in counts) + 1e-9, 6
        )
    assert got[1] == (5, h(3, 2))       # 3 u, 2 a
    assert got[2] == (3, h(2, 1))
    assert got[3] == (1, 0.0)           # monologue: -0*log stays 0


def test_role_ngrams_bigrams_equal_transitions(turns):
    bi = {
        tuple(r["ngram"].split(">")): r["n"]
        for r in role_ngrams(turns, n=2).collect()
    }
    tr = {
        (r["from_role"], r["to_role"]): r["n"]
        for r in role_transitions(turns).collect()
    }
    assert bi == tr


def test_role_trigrams_counts(turns):
    got = {
        r["ngram"]: r["n"] for r in role_ngrams(turns, n=3).collect()
    }
    # conv1: uau, aua, uau ; conv2: uua
    assert got == {"u>a>u": 2, "a>u>a": 1, "u>u>a": 1}


def test_ngram_n_validation(turns):
    with pytest.raises(ValueError):
        role_ngrams(turns, n=1)


def test_plan_reuses_conv_exchange(spark):
    """The whole family must plan exactly ONE full-turn-stream
    shuffle: ordered_turns aliases conv_id BEFORE its window so every
    downstream conv-partitioned lead/lag window reuses the exchange.
    A second Exchange is allowed only on already-reduced rows
    (per-bucket, per-alphabet aggregates), so gate the count at the
    measured plan shapes."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    t = ordered_turns(ev)
    for df, cap in [
        (response_latency_stats(t, "view", "click"), 2),
        (role_transitions(t), 3),
        (behavior_entropy(t), 2),
        (role_ngrams(t, 3), 2),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= cap, plan


def test_conversation_text_is_order_stable(spark):
    from peakmatch_xcorr_spark.operators.transcripts import (
        conversation_text,
        ordered_turns,
    )

    rows = [(3, 7, "c", 20), (1, 7, "a", 0), (2, 7, "b", 10),
            (4, 8, "x", 5)]
    txt = conversation_text(
        ordered_turns(_events(spark, rows))
    )
    got = {r["conv_id"]: (r["text"], r["n_turns"]) for r in txt.collect()}
    assert got[7] == ("a>b>c", 3)
    assert got[8] == ("x", 1)
    # partition-order independence: the classic bare-collect_list bug
    many = [(i, 9, f"r{i:03d}", i) for i in range(200)]
    df = _events(spark, many).repartition(32)
    out = conversation_text(ordered_turns(df)).collect()[0]["text"]
    assert out == ">".join(f"r{i:03d}" for i in range(200))
