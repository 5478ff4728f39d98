"""Live IMAP mailbox behind the ``inbox.Mailbox`` interface.

Implements the real network client the inbox source was designed around
(reference sources/inbox/helpers.py:17-71 — imaplib connect / SELECT /
UID SEARCH / UID FETCH), using only the Python stdlib:

- ``imaplib`` speaks the wire protocol (UID-based commands so cursor
  semantics survive mailbox compaction — message sequence numbers don't),
- ``email`` parses RFC822 bytes into the typed envelope row
  (``inbox.MESSAGE_SCHEMA``): addresses, decoded subject, text body, and
  one struct per attachment with its MIME type and raw payload.

``read_inbox`` / ``attachments_table`` work unchanged on top — the same
UID > cursor incremental contract, now over a socket (exercised against
an in-process IMAP server in tests/test_imap_live.py).
"""

from __future__ import annotations

import email
import email.policy
from email.header import decode_header, make_header
from email.utils import getaddresses, parseaddr
from typing import Any

from verified_sources_spark.sources.inbox import Mailbox


def rfc822_to_row(uid: int, raw: bytes) -> dict[str, Any]:
    """RFC822 bytes → a MESSAGE_SCHEMA row dict."""
    msg = email.message_from_bytes(raw, policy=email.policy.default)
    body_parts: list[str] = []
    attachments: list[dict[str, Any]] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        filename = part.get_filename()
        if filename:
            attachments.append(
                {
                    "name": str(make_header(decode_header(filename))),
                    "content_type": part.get_content_type(),
                    "payload": bytes(part.get_payload(decode=True) or b""),
                }
            )
        elif part.get_content_type() == "text/plain":
            payload = part.get_payload(decode=True) or b""
            charset = part.get_content_charset() or "utf-8"
            try:
                body_parts.append(
                    payload.decode(charset, errors="replace"))
            except (ValueError, LookupError):
                # errors="replace" does NOT guard the codec LOOKUP: a
                # hostile charset= with \x00 raises before it applies
                body_parts.append(
                    payload.decode("utf-8", errors="replace"))
    return {
        "uid": int(uid),
        "message_id": (msg.get("Message-ID") or "").strip(),
        "from_addr": parseaddr(msg.get("From") or "")[1],
        "to_addrs": [a for _, a in getaddresses(msg.get_all("To") or []) if a],
        "subject": str(make_header(decode_header(msg.get("Subject") or ""))),
        "date": (msg.get("Date") or "").strip(),
        "body": "\n".join(body_parts),
        "attachments": attachments,
    }


class ImapMailbox(Mailbox):
    """imaplib-backed Mailbox: one live connection, UID-based commands."""

    def __init__(
        self,
        host: str,
        port: int = 143,
        user: str | None = None,
        password: str | None = None,
        folder: str = "INBOX",
        ssl: bool = False,
        timeout: float = 30.0,
    ):
        import imaplib

        cls = imaplib.IMAP4_SSL if ssl else imaplib.IMAP4
        self._conn = cls(host, port, timeout=timeout)
        if user is not None:
            typ, _ = self._conn.login(user, password or "")
            if typ != "OK":
                raise ConnectionError(f"IMAP login failed: {typ}")
        typ, _ = self._conn.select(folder)
        if typ != "OK":
            raise ConnectionError(f"IMAP select {folder!r} failed: {typ}")

    def search_uids(self, criteria: str) -> list[int]:
        typ, data = self._conn.uid("SEARCH", criteria or "(ALL)")
        if typ != "OK":
            raise ConnectionError(f"UID SEARCH failed: {typ}")
        ids = (data[0] or b"").split()
        return sorted(int(u) for u in ids)

    def fetch(self, uid: int) -> dict[str, Any]:
        typ, data = self._conn.uid("FETCH", str(uid), "(RFC822)")
        if typ != "OK":
            raise ConnectionError(f"UID FETCH {uid} failed: {typ}")
        for item in data:
            if isinstance(item, tuple) and len(item) >= 2:
                return rfc822_to_row(uid, item[1])
        raise ValueError(f"no RFC822 literal in FETCH response for uid {uid}")

    def close(self) -> None:
        try:
            self._conn.logout()
        except Exception:
            pass
