"""Inbox source: UID incremental, search criteria, attachments + MIME."""

from __future__ import annotations

import datetime as dt

from verified_sources_spark.operators.incremental import CursorStore
from verified_sources_spark.sources.inbox import (
    LocalMailbox,
    attachments_table,
    build_search_criteria,
    read_inbox,
)


def _mbx():
    return LocalMailbox(
        {
            1: dict(uid=1, message_id="m1", from_addr="a@x.com", to_addrs=["me@y.com"],
                    subject="s1", date="2024-01-01", body="hello",
                    attachments=[{"name": "inv.pdf", "content_type": "application/pdf", "payload": b"%PDF"}]),
            2: dict(uid=2, message_id="m2", from_addr="b@x.com", to_addrs=["me@y.com"],
                    subject="s2", date="2024-01-02", body="plain", attachments=[]),
            3: dict(uid=3, message_id="m3", from_addr="a@x.com", to_addrs=["me@y.com"],
                    subject="s3", date="2024-01-03", body="img",
                    attachments=[{"name": "pic.png", "content_type": "image/png", "payload": b"\x89PNG"}]),
        }
    )


def test_build_search_criteria():
    crit = build_search_criteria(dt.date(2024, 1, 5), ["a@x.com", "b@x.com"], ["me@y.com"])
    assert crit == "(SINCE 05-Jan-2024) (OR (FROM a@x.com) (FROM b@x.com)) (TO me@y.com)"
    assert build_search_criteria() == "(ALL)"


def test_uid_incremental(spark, tmp_path):
    store = CursorStore(str(tmp_path / "s.json"))
    df1 = read_inbox(spark, _mbx(), store)
    assert df1.count() == 3 and store.get("inbox") == 3
    df2 = read_inbox(spark, _mbx(), store)
    assert df2.count() == 0  # nothing new past UID 3


def test_from_filter_and_attachments(spark, tmp_path):
    store = CursorStore(str(tmp_path / "s.json"))
    crit = build_search_criteria(from_addrs=["a@x.com"])
    df = read_inbox(spark, _mbx(), store, criteria=crit)
    assert df.count() == 2  # only a@x.com messages
    atts = attachments_table(df, mime_filter=["application/pdf"])
    rows = atts.collect()
    assert len(rows) == 1 and rows[0]["name"] == "inv.pdf"
    assert bytes(rows[0]["payload"]) == b"%PDF"
