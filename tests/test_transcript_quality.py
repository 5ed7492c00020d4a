"""Conversation-level transcript curation: per-rule authored cases
(each integrity rule flipped in isolation), a python-reference
differential over the synthetic transcript corpus and randomized
hostile corpora, and the one-exchange plan-shape golden."""

import random
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.transcript_quality import (
    conversation_flags,
)


def _ts(s: int):
    return datetime.fromtimestamp(1_600_000_000 + s, tz=timezone.utc).replace(
        tzinfo=None
    )


def _conv(spark, rows):
    """rows: [(conv_id, turn_idx, role, text, epoch_s), ...]"""
    return spark.createDataFrame(
        [(c, i, r, t, _ts(e)) for (c, i, r, t, e) in rows],
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
    )


def _flags(spark, rows, **kw):
    out = conversation_flags(_conv(spark, rows), **kw)
    return {r["conv_id"]: r.asDict() for r in out.collect()}


def test_valid_conversation_passes(spark):
    rows = [
        ("c", 0, "user", "hello there", 0),
        ("c", 1, "assistant", "hi, calling a tool", 60),
        ("c", 2, "tool", "result", 61),
        ("c", 3, "tool", "second parallel result", 61),
        ("c", 4, "assistant", "done", 120),
    ]
    r = _flags(spark, rows)["c"]
    assert r["conv_ok"]
    assert r["n_turns"] == 5
    assert (r["n_user"], r["n_assistant"], r["n_tool"]) == (1, 2, 2)
    assert r["role_violations"] == 0
    assert r["starts_with_user"]
    assert r["idx_contiguous"] and r["ts_monotonic"]
    assert r["duration_s"] == 120


@pytest.mark.parametrize(
    "mutation, field",
    [
        # same speaker twice (non-tool)
        ([("c", 0, "user", "a", 0), ("c", 1, "user", "b", 1),
          ("c", 2, "assistant", "c", 2)], "role_violations"),
        # tool result not after assistant/tool
        ([("c", 0, "user", "a", 0), ("c", 1, "tool", "r", 1),
          ("c", 2, "assistant", "c", 2)], "role_violations"),
        # NULL role
        ([("c", 0, "user", "a", 0), ("c", 1, None, "x", 1)],
         "role_violations"),
        # turn_idx gap
        ([("c", 0, "user", "a", 0), ("c", 2, "assistant", "b", 1)],
         "idx_contiguous"),
        # duplicate turn_idx
        ([("c", 0, "user", "a", 0), ("c", 1, "assistant", "b", 1),
          ("c", 1, "assistant", "b2", 2)], "idx_contiguous"),
        # does not start at 0
        ([("c", 1, "user", "a", 0), ("c", 2, "assistant", "b", 1)],
         "idx_contiguous"),
        # backwards timestamp
        ([("c", 0, "user", "a", 100), ("c", 1, "assistant", "b", 40)],
         "ts_monotonic"),
    ],
)
def test_each_integrity_rule_fails_alone(spark, mutation, field):
    r = _flags(spark, mutation)["c"]
    assert not r["conv_ok"], r
    if field == "role_violations":
        assert r["role_violations"] > 0
    else:
        assert not r[field], r


def test_user_start_rule_toggle(spark):
    rows = [("c", 0, "assistant", "greeting first", 0),
            ("c", 1, "user", "reply", 1)]
    assert not _flags(spark, rows)["c"]["conv_ok"]
    r = _flags(spark, rows, require_user_start=False)["c"]
    assert r["conv_ok"] and not r["starts_with_user"]


def test_empty_turn_bp_edge(spark):
    # 1 empty of 5 turns = 2000 bp: <= passes at the default 2000,
    # fails one notch below (integer cross-multiplication, no floats)
    rows = [
        ("c", 0, "user", "a", 0),
        ("c", 1, "assistant", " \t ", 1),
        ("c", 2, "user", "b", 2),
        ("c", 3, "assistant", "c", 3),
        ("c", 4, "user", "d", 4),
    ]
    assert _flags(spark, rows)["c"]["conv_ok"]
    assert not _flags(spark, rows, max_empty_turn_bp=1999)["c"]["conv_ok"]
    assert _flags(spark, rows)["c"]["n_empty_turns"] == 1


def test_tool_char_bp_and_null_text(spark):
    rows = [
        ("c", 0, "user", "hi", 0),          # 2 chars
        ("c", 1, "assistant", "call", 1),   # 4 chars
        ("c", 2, "tool", "x" * 14, 2),      # 14 chars
        ("c", 3, "assistant", None, 3),     # NULL text -> empty, 0 chars
        ("c", 4, "user", "bye", 4),         # 3 chars (empty frac 1/5)
    ]
    r = _flags(spark, rows)["c"]
    assert r["total_chars"] == 23 and r["tool_chars"] == 14
    assert r["n_empty_turns"] == 1  # the NULL turn
    assert r["conv_ok"]  # 14/23 = 6086.9 bp <= default 8000
    assert not _flags(spark, rows, max_tool_char_bp=6086)["c"]["conv_ok"]


def test_min_max_turns_and_no_ts(spark):
    rows = [("c", 0, "user", "only turn", 0)]
    assert not _flags(spark, rows)["c"]["conv_ok"]  # min_turns=2
    r = _flags(spark, rows, min_turns=1)["c"]
    assert r["conv_ok"]
    # ts_col=None path: monotonic TRUE, duration 0
    df = _conv(spark, [("c", 0, "user", "a", 50), ("c", 1, "assistant", "b", 0)])
    r2 = {
        x["conv_id"]: x.asDict()
        for x in conversation_flags(df.drop("ts"), ts_col=None).collect()
    }["c"]
    assert r2["ts_monotonic"] and r2["duration_s"] == 0 and r2["conv_ok"]


def _reference(rows, min_turns=2, max_turns=10_000, require_user_start=True,
               max_role_violations=0, max_empty_turn_bp=2000,
               max_tool_char_bp=8000):
    """Independent python implementation of the module-doc rules over
    [(conv, idx, role, text, epoch)] rows."""
    import re

    ws = re.compile("[ \t\n\f\r]+")
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    out = {}
    for c, rs in by_conv.items():
        # engine tie-break: (idx, role) with NULL role as a first-
        # sorting sentinel
        rs = sorted(rs, key=lambda r: (r[1], r[2] if r[2] is not None else "\x00"))
        n = len(rs)
        texts = ["" if r[3] is None else r[3] for r in rs]
        roles = [r[2] for r in rs]
        viol = sum(1 for r in roles if r is None)
        for p, q in zip(roles, roles[1:]):
            if p is not None and q == p and p != "tool":
                viol += 1
            if q == "tool" and p not in ("assistant", "tool") and p is not None:
                viol += 1
            # NULL prev never makes the next turn an orphan (engine
            # counts the NULL itself, handled above)
        empty = sum(1 for t in texts if ws.sub("", t) == "")
        total = sum(len(t) for t in texts)
        tool_chars = sum(len(t) for t, r in zip(texts, roles) if r == "tool")
        idx_ok = [r[1] for r in rs] == list(range(n))
        eps = [r[4] for r in rs]
        ts_ok = all(a <= b for a, b in zip(eps, eps[1:]))
        dur = max(eps) - min(eps)
        start_user = roles[0] == "user"
        ok = (
            min_turns <= n <= max_turns
            and viol <= max_role_violations
            and idx_ok
            and ts_ok
            and empty * 10_000 <= max_empty_turn_bp * n
            and tool_chars * 10_000 <= max_tool_char_bp * max(total, 1)
        )
        if require_user_start:
            ok = ok and start_user
        out[c] = {
            "n_turns": n,
            "n_user": roles.count("user"),
            "n_assistant": roles.count("assistant"),
            "n_tool": roles.count("tool"),
            "n_empty_turns": empty,
            "total_chars": total,
            "tool_chars": tool_chars,
            "starts_with_user": start_user,
            "role_violations": viol,
            "idx_contiguous": idx_ok,
            "ts_monotonic": ts_ok,
            "duration_s": dur,
            "conv_ok": ok,
        }
    return out


def test_randomized_differential(spark):
    rng = random.Random("tq-diff-1")
    rows = []
    for c in range(40):
        n = 1 + rng.randrange(8)
        base = rng.randrange(10_000)
        off = 0
        for i in range(n):
            # occasional forward gap — never a DUPLICATE idx: adjacency
            # order on duplicated turn_idx is unspecified by contract
            # (idx_contiguous rejects the conversation), so the
            # differential only exercises well-ordered input
            if rng.random() < 0.07:
                off += 1
            idx = i + off
            role = rng.choice(
                ["user", "assistant", "tool", "user", "assistant", None]
            )
            text = rng.choice(
                ["hello world", "", "  \t ", "x" * rng.randrange(40), None]
            )
            ep = base + i * 30 + (-90 if rng.random() < 0.1 else 0)
            rows.append((f"c{c}", idx, role, text, ep))
    got = _flags(spark, rows)
    ref = _reference(rows)
    assert set(got) == set(ref)
    for c in ref:
        for k, v in ref[c].items():
            assert got[c][k] == v, (c, k, got[c][k], v)


def test_synthetic_corpus_differential(spark):
    from cl_readability_spark.pipeline.corpus import build_transcript_rows

    rows = build_transcript_rows(30, seed=9)
    df = spark.createDataFrame(
        [(c, i, r, t, tool, _ts(e - 1_600_000_000)) for (c, i, r, t, tool, e)
         in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r["conv_id"]: r.asDict()
        for r in conversation_flags(df, require_user_start=False).collect()
    }
    ref = _reference(
        [(c, i, r, t, e - 1_600_000_000) for (c, i, r, t, _tool, e) in rows],
        require_user_start=False,
    )
    assert set(got) == set(ref)
    for c in ref:
        for k, v in ref[c].items():
            assert got[c][k] == v, (c, k, got[c][k], v)


def test_conversation_flags_kwarg_guards(spark):
    df = _conv(spark, [("c", 0, "user", "a", 0)])
    with pytest.raises(ValueError, match="min_turns"):
        conversation_flags(df, min_turns=0)
    with pytest.raises(ValueError, match="max_turns"):
        conversation_flags(df, min_turns=5, max_turns=4)
    with pytest.raises(ValueError, match="max_role_violations"):
        conversation_flags(df, max_role_violations=-1)
    with pytest.raises(ValueError, match="bp"):
        conversation_flags(df, max_empty_turn_bp=-1)


def test_conversation_flags_plan_shape(spark):
    """One conv-keyed exchange serves both the adjacency window and the
    aggregation; no python stage."""
    import re as _re

    df = _conv(spark, [("c", 0, "user", "a", 0), ("c", 1, "assistant", "b", 1)])
    plan = (
        conversation_flags(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    exch = _re.findall(r"Exchange hashpartitioning\(([^)]+)\)", plan)
    assert len(exch) == 1 and "conv_id" in exch[0], exch
    wins = _re.findall(r"windowspecdefinition\(([^,)]+)", plan)
    assert wins and all("conv_id" in w for w in wins), wins
