"""Conversation-structure analytics over ordered turn streams.

The input-table shape this engine targets is a turn stream
``(conv_id, turn_idx, role, text, tool, ts)``; everything upstream
(rollup, dedup, xcorr) treats a conversation as a COUNT curve and
throws the structure away.  This module analyses the structure
itself — who speaks after whom, how fast one role answers another,
how predictable a conversation's role mix is — the transcript
analogue of the reference's per-event summary statistics
(DominantFreqProcessor.java:90-96 mean/stddev rollups), lifted from
one event's samples to a conversation's turn sequence.

All operators are plain window + hash-aggregate compositions (zero
UDFs, zero joins):

- ``ordered_turns`` assigns the canonical turn order ONCE — a single
  ``row_number`` window partitioned by conversation with a total
  (ts, tiebreak) sort, i.e. the "stable turn ordering" of the
  per-row invariant.  Every downstream operator is expressed over
  lead/lag in that same (conv, order) window, so Spark plans ONE
  hash exchange on conv_id and reuses the sorted run for the whole
  family — the window sort is the only per-turn cost.
- the aggregations that follow reduce |turns| rows to |roles|²,
  |convs|, or |alphabet|ⁿ rows with map-side partial aggregation;
  at 10^12 turns the second exchange moves rows proportional to the
  CARDINALITY OF THE ANSWER, not the corpus.

Numeric determinism (the oracle-hash contract): gaps are exact int64
microsecond differences; probabilities are single divisions of exact
counts; entropy is the only multi-term float sum and is rounded at
6 dp with the repo's +1e-9 nudge (terms are O(1) and ≤ alphabet-size
many, so cross-engine accumulation-order drift is ~1e-16, far below
the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_turns(
    events: DataFrame,
    conv_col: str = "user_id",
    role_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Canonical turn view of any event stream: ``(conv_id, turn_idx,
    role, ts)`` with ``turn_idx`` the 1-based position under the
    stable (ts, tiebreak) total order within each conversation.

    The input_hint transcripts table already carries ``turn_idx`` —
    this view exists so the SAME operators run over raw event streams
    (user_id ≡ conv_id, event_type ≡ role) and over native
    transcripts, and so the ordering is total even when timestamps
    tie (ts alone is not a key; without the tiebreak two engines may
    disagree on lead/lag pairs and every downstream count drifts).

    Columns are renamed BEFORE the window so the window partitions on
    the ``conv_id`` attribute itself: every downstream lead/lag
    window here partitions by conv_id, and Catalyst only reuses an
    exchange when the partitioning attribute is identical — window
    over the pre-alias column costs one avoidable full re-shuffle of
    the turn stream per operator (observed: 2 exchanges instead of 1
    at 10^12 turns the second is the plan's dominant cost)."""
    base = events.select(
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("role"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak).alias("__tb"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "__tb")
    return base.select(
        "conv_id",
        F.row_number().over(w).alias("turn_idx"),
        "role",
        "ts",
    )


def role_transitions(turns: DataFrame) -> DataFrame:
    """First-order role-transition matrix: for every adjacent turn
    pair within a conversation, count (role → next_role) and the
    transition probability P(next | from) = n / Σ_next n.

    The Markov view of conversational flow — uniform rows mean
    role-agnostic traffic, a heavy diagonal means monologues/retries,
    an off-diagonal spike (user→assistant) is the expected dialogue
    alternation.  Two exchanges total: the conv window (shared with
    every operator here) and one hash aggregate whose output is
    |alphabet|² rows regardless of corpus size; the per-from total is
    a second tiny aggregate joined back by broadcast-sized key, but
    expressed as a window over the |alphabet|²-row result so it costs
    nothing at scale."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = turns.select(
        "conv_id",
        F.col("role").alias("from_role"),
        F.lead("role").over(w).alias("to_role"),
    ).filter(F.col("to_role").isNotNull())
    counts = pairs.groupBy("from_role", "to_role").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_role")
    return counts.select(
        "from_role",
        "to_role",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(tot) + 1e-9, 6
        ).alias("prob"),
    )


def response_gaps(
    turns: DataFrame, from_role: str, to_role: str
) -> DataFrame:
    """Per qualifying turn pair, the response gap: rows where a
    ``to_role`` turn immediately follows a ``from_role`` turn in the
    same conversation, with the gap as exact whole microseconds
    (int64 — float seconds would already be lossy here) plus the
    responding turn's timestamp for downstream bucketing."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        turns.select(
            "conv_id",
            "role",
            "ts",
            F.lag("role").over(w).alias("prev_role"),
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .filter(
            (F.col("role") == to_role) & (F.col("prev_role") == from_role)
        )
        .select(
            "conv_id",
            "ts",
            (
                # .cast("timestamp"): parquet reads ts as NTZ and
                # unix_micros rejects it; the UTC session tz makes
                # the cast a no-op relabel
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
    )


def response_latency_stats(
    turns: DataFrame,
    from_role: str,
    to_role: str,
    bucket: str = "1 day",
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Response-latency rollup: per time bucket of the RESPONDING
    turn, count / mean / discrete quantiles of the
    ``from_role``→``to_role`` gap in seconds.

    The operational question for an assistant serving conversations —
    "how fast does the assistant answer, and is the tail degrading
    today" — as one window + one aggregate on the SAME bucket key
    (the groupBy reuses the window's hash partitioning, so one
    exchange total after the conv window).

    Quantiles are DISCRETE by construction — the smallest gap whose
    rank reaches ⌈q·n⌉ — picked via row_number, not interpolated:
    the two engines' continuous-percentile kernels compute
    ``(1-f)·lo + f·hi`` vs ``lo + f·(hi-lo)``, algebraically equal
    but last-ulp different on ~1e11-µs int64 gaps, which is exactly
    the drift the oracle-hash contract cannot absorb.  A rank pick
    is integer-exact in any engine, and at 10¹² turns it is also the
    cheaper plan: the per-bucket sort already exists for the window,
    and no second pass over values is needed.  The mean is
    Σgap/n/1e6 — int64-exact sums (< 2⁵³) divided in a fixed order."""
    gaps = response_gaps(turns, from_role, to_role)
    g = gaps.select(
        F.window("ts", bucket).start.alias("bucket"), "gap_us"
    )
    wb = Window.partitionBy("bucket").orderBy("gap_us")
    wc = Window.partitionBy("bucket")
    r = g.select(
        "bucket",
        "gap_us",
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    qcols = [
        F.round(
            F.min(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                    F.col("gap_us"),
                )
            )
            / 1e6
            + 1e-9,
            6,
        ).alias(f"p{int(q * 100)}_s")
        for q in quantiles
    ]
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("gap_us") / F.count(F.lit(1)) / 1e6 + 1e-9, 6
        ).alias("avg_s"),
        *qcols,
    )


def behavior_entropy(turns: DataFrame) -> DataFrame:
    """Per-conversation Shannon entropy (bits) of the role
    distribution, plus the turn count: 0 for a monologue, log2(k)
    for a uniform k-role mix — the one-number summary of how
    role-diverse a conversation is (junk/bot conversations cluster at
    the extremes; see textstats.quality_score for the text-side
    twin).

    Two hash aggregates, both map-side combinable: turns →
    (conv, role) counts, then counts → per-conv entropy via
    -Σ p·log2 p with p = c/n an exact-count division."""
    counts = turns.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_conv = Window.partitionBy("conv_id")
    p = F.col("c") / F.sum("c").over(per_conv)
    terms = counts.select(
        "conv_id",
        F.sum("c").over(per_conv).alias("n_turns"),
        (-p * F.log2(p)).alias("term"),
    )
    return terms.groupBy("conv_id").agg(
        F.first("n_turns").alias("n_turns"),
        F.round(F.sum("term") + 1e-9, 6).alias("entropy_bits"),
    )


def role_ngrams(turns: DataFrame, n: int = 3) -> DataFrame:
    """Frequency of length-``n`` role sequences over adjacent turns —
    behavioural n-gram mining (which interaction motifs dominate:
    view>click>purchase vs error>error>error retry storms).

    ``n-1`` lead() columns over the shared conv window (one sort, one
    exchange), rows truncated at conversation end dropped, then a hash
    aggregate whose output is ≤ |alphabet|ⁿ rows.  The n-gram is also
    emitted as one ``>``-joined string so downstream consumers
    (frequent_tokens, topn_with_rest) can treat it as a vocabulary
    token."""
    if n < 2:
        raise ValueError(f"role_ngrams needs n >= 2, got {n}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cols = [F.col("role").alias("r0")] + [
        F.lead("role", i).over(w).alias(f"r{i}") for i in range(1, n)
    ]
    grams = turns.select("conv_id", *cols).filter(
        F.col(f"r{n - 1}").isNotNull()
    )
    names = [f"r{i}" for i in range(n)]
    return (
        grams.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat_ws(">", *names).alias("ngram"),
            "n",
        )
    )


def conversation_text(
    turns: DataFrame,
    text_col: str = "role",
    sep: str = ">",
) -> DataFrame:
    """Assemble each conversation's turn sequence into ONE string
    under the stable turn order — the bridge from the turn-stream
    schema to every document-level operator (fingerprint groups,
    minhash/simhash dedup, tf-idf) without re-implementing them for
    conversations.

    One hash-aggregate exchange: collect_list(struct(turn_idx, v))
    per conversation, array_sort (struct ordering starts at the
    first field, so turn_idx drives), then a transform+concat_ws —
    all codegen, no window, no UDF.  collect_list's arrival order is
    partition-dependent; the explicit sort is what makes the result
    deterministic (a bare collect_list here is the classic
    nondeterminism bug)."""
    return (
        turns.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", F.col(text_col).alias("v")))
            ).alias("seq")
        )
        .select(
            "conv_id",
            F.concat_ws(
                sep, F.transform("seq", lambda s: s["v"])
            ).alias("text"),
            F.size("seq").alias("n_turns"),
        )
    )
