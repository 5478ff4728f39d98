"""Chat-transcript normalization (llm/chatlog)."""

from __future__ import annotations

import json

import pytest

from verified_sources_spark.llm.chatlog import (
    ChatError,
    chat_turns,
    parse_conversation,
)


def test_three_dialects_normalize_identically():
    want = [{"role": "user", "text": "q"},
            {"role": "assistant", "text": "a"}]
    assert parse_conversation(
        '{"messages": [{"role": "user", "content": "q"}, '
        '{"role": "assistant", "content": "a"}]}') == want
    assert parse_conversation(
        '{"conversations": [{"from": "human", "value": "q"}, '
        '{"from": "gpt", "value": "a"}]}') == want
    assert parse_conversation(
        '{"prompt": "q", "completion": "a"}') == want
    assert parse_conversation(
        '{"prompt": "q", "response": "a", "system": "s"}') == [
        {"role": "system", "text": "s"}] + want


def test_multimodal_content_array_keeps_text_parts():
    rec = {"messages": [{"role": "user", "content": [
        {"type": "text", "text": "look at "},
        {"type": "image_url", "image_url": {"url": "http://x"}},
        {"type": "text", "text": "this"}]}]}
    assert parse_conversation(json.dumps(rec)) == [
        {"role": "user", "text": "look at this"}]


def test_tool_turns_excluded_and_refusals():
    rec = {"messages": [
        {"role": "user", "content": "q"},
        {"role": "tool", "content": "{\"result\": 1}"},
        {"role": "assistant", "content": "a"}]}
    assert [t["role"] for t in parse_conversation(json.dumps(rec))] == [
        "user", "assistant"]
    with pytest.raises(ChatError, match="not JSON"):
        parse_conversation("{nope")
    with pytest.raises(ChatError, match="unknown role"):
        parse_conversation('{"messages": [{"role": "narrator"}]}')
    with pytest.raises(ChatError, match="not a chat record"):
        parse_conversation('{"text": "plain doc"}')


def test_spark_operator_alternation_flag(spark):
    good = '{"conversations": [{"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]}'
    bad = '{"conversations": [{"from": "gpt", "value": "a"}, {"from": "human", "value": "q"}]}'
    rows = [(1, good), (2, bad), (3, "{broken")]
    df = spark.createDataFrame(rows, "doc_id long, line string")
    got: dict = {}
    for r in chat_turns(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert all(r["alternation_ok"] for r in got[1])
    assert not any(r["alternation_ok"] for r in got[2])
    (r3,) = got[3]
    assert r3["decoded_ok"] is False


def test_mid_dialog_system_turn_flags_alternation(spark):
    """Only a LEADING system turn is exempt from the pairing gate: a
    system message injected mid-conversation must flag
    alternation_ok=false; tool turns drop and do not count."""
    lead = json.dumps({"messages": [
        {"role": "system", "content": "s"},
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a"}]})
    mid = json.dumps({"messages": [
        {"role": "system", "content": "s"},
        {"role": "user", "content": "q"},
        {"role": "system", "content": "injected"},
        {"role": "assistant", "content": "a"}]})
    tool = json.dumps({"messages": [
        {"role": "user", "content": "q"},
        {"role": "tool", "content": "result"},
        {"role": "assistant", "content": "a"}]})
    df = spark.createDataFrame(
        [(1, lead), (2, mid), (3, tool)], "doc_id long, line string")
    got: dict = {}
    for r in chat_turns(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert all(r["alternation_ok"] for r in got[1])
    assert not any(r["alternation_ok"] for r in got[2])
    assert len(got[2]) == 4 and got[2][0]["n_turns"] == 4
    # tool turn dropped at parse: 2 turns, still alternation-clean
    assert len(got[3]) == 2 and got[3][0]["n_turns"] == 2
    assert all(r["alternation_ok"] for r in got[3])
