"""JSONL ingest: per-row corruption rescue, typed parse, quarantine."""

from __future__ import annotations

import json

from peakmatch_xcorr_spark.sources.jsonl import read_turns_jsonl, split_corrupt


def _write(tmp_path, lines):
    p = tmp_path / "turns.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_corrupt_split(spark, tmp_path):
    good = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hi", "tool": None, "ts": "2024-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "hello", "tool": None, "ts": "2024-01-01T00:00:05"},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, '{"conv_id": "c2", "turn_idx": ')  # truncated write
    lines.append("not json at all")
    path = _write(tmp_path, lines)
    clean, bad = split_corrupt(read_turns_jsonl(spark, path))
    crows = clean.orderBy("turn_idx").collect()
    assert [r["role"] for r in crows] == ["user", "assistant"]
    assert crows[0]["ts"].isoformat().startswith("2024-01-01T00:00:00")
    brows = [r["raw_line"] for r in bad.collect()]
    assert "not json at all" in brows
    assert any(b.startswith('{"conv_id": "c2"') for b in brows)
    assert len(brows) == 2


def test_type_mismatch_is_rescued_not_fatal(spark, tmp_path):
    # turn_idx as string: the whole LINE is quarantined, job survives
    lines = [
        '{"conv_id": "c", "turn_idx": "zero", "role": "user", '
        '"text": "x", "tool": null, "ts": "2024-01-01T00:00:00"}',
        '{"conv_id": "c", "turn_idx": 1, "role": "user", '
        '"text": "y", "tool": null, "ts": "2024-01-01T00:00:01"}',
    ]
    path = _write(tmp_path, lines)
    clean, bad = split_corrupt(read_turns_jsonl(spark, path))
    assert clean.count() == 1
    assert bad.count() == 1


def test_clean_feeds_the_engine(spark, tmp_path):
    """The parsed frame drops straight into the turn-stream family."""
    from peakmatch_xcorr_spark.operators.transcripts import (
        ordered_turns,
        role_transitions,
    )

    lines = [
        json.dumps({"conv_id": "c", "turn_idx": i, "role": r,
                    "text": "t", "tool": None,
                    "ts": f"2024-01-01T00:00:{i:02d}"})
        for i, r in enumerate(["user", "assistant", "user"])
    ]
    clean, _ = split_corrupt(read_turns_jsonl(spark, _write(tmp_path, lines)))
    turns = ordered_turns(
        clean, conv_col="conv_id", role_col="role", tiebreak="turn_idx"
    )
    got = {
        (r["from_role"], r["to_role"]): r["n"]
        for r in role_transitions(turns).collect()
    }
    assert got == {("user", "assistant"): 1, ("assistant", "user"): 1}
