"""Live IMAP transport against a REAL socket: a minimal in-process IMAP4
server (greeting, CAPABILITY, LOGIN, SELECT, UID SEARCH, UID FETCH with
literal framing, LOGOUT) drives the stdlib-imaplib ImapMailbox and the
inbox source's UID-cursor incremental on top of it."""

from __future__ import annotations

import socket
import socketserver
import threading
from email.message import EmailMessage

import pytest

from verified_sources_spark.operators.incremental import CursorStore
from verified_sources_spark.sources.imap_client import ImapMailbox
from verified_sources_spark.sources.inbox import (
    attachments_table,
    build_search_criteria,
    read_inbox,
)


def _mk_message(uid: int, frm: str, subject: str, body: str, attach: bytes | None = None):
    m = EmailMessage()
    m["Message-ID"] = f"<m{uid}@example.test>"
    m["From"] = f"Sender {uid} <{frm}>"
    m["To"] = "alice@example.test, Bob <bob@example.test>"
    m["Subject"] = subject
    m["Date"] = "Mon, 05 Aug 2024 10:00:00 +0000"
    m.set_content(body)
    if attach is not None:
        m.add_attachment(
            attach, maintype="application", subtype="pdf", filename=f"doc{uid}.pdf"
        )
    return m.as_bytes()


MESSAGES = {
    101: _mk_message(101, "news@corp.test", "hello", "first message"),
    102: _mk_message(102, "alerts@corp.test", "alert", "second message", b"%PDF-fake"),
    103: _mk_message(103, "news@corp.test", "world", "third message"),
}
CREDS = ("user@example.test", "s3cret")


class _ImapHandler(socketserver.StreamRequestHandler):
    def _send(self, line: str):
        self.wfile.write(line.encode() + b"\r\n")

    def handle(self):
        self._send("* OK MiniIMAP ready")
        while True:
            line = self.rfile.readline()
            if not line:
                return
            parts = line.decode().strip().split(" ")
            tag, cmd = parts[0], (parts[1].upper() if len(parts) > 1 else "")
            args = parts[2:]
            if cmd == "CAPABILITY":
                self._send("* CAPABILITY IMAP4rev1")
                self._send(f"{tag} OK CAPABILITY completed")
            elif cmd == "LOGIN":
                user = args[0].strip('"')
                pw = args[1].strip('"') if len(args) > 1 else ""
                if (user, pw) == CREDS:
                    self._send(f"{tag} OK LOGIN completed")
                else:
                    self._send(f"{tag} NO LOGIN failed")
            elif cmd == "SELECT":
                self._send(f"* {len(MESSAGES)} EXISTS")
                self._send(f"{tag} OK [READ-WRITE] SELECT completed")
            elif cmd == "UID" and args and args[0].upper() == "SEARCH":
                crit = " ".join(args[1:])
                uids = []
                for uid, raw in sorted(MESSAGES.items()):
                    if "FROM" in crit:
                        import email as _email

                        frm = _email.message_from_bytes(raw)["From"] or ""
                        terms = [t.strip("()") for t in crit.split("FROM")[1:]]
                        if not any(t.strip().split(")")[0].strip() in frm for t in terms):
                            continue
                    uids.append(uid)
                self._send("* SEARCH " + " ".join(str(u) for u in uids))
                self._send(f"{tag} OK SEARCH completed")
            elif cmd == "UID" and args and args[0].upper() == "FETCH":
                uid = int(args[1])
                raw = MESSAGES[uid]
                head = f"* 1 FETCH (UID {uid} RFC822 {{{len(raw)}}}".encode()
                self.wfile.write(head + b"\r\n" + raw + b")\r\n")
                self._send(f"{tag} OK FETCH completed")
            elif cmd == "LOGOUT":
                self._send("* BYE")
                self._send(f"{tag} OK LOGOUT completed")
                return
            else:
                self._send(f"{tag} BAD unknown command")


@pytest.fixture(scope="module")
def imap_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _ImapHandler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def test_imap_login_select_search_fetch_over_socket(imap_server):
    host, port = imap_server
    mb = ImapMailbox(host, port, user=CREDS[0], password=CREDS[1])
    assert mb.search_uids("(ALL)") == [101, 102, 103]
    row = mb.fetch(102)
    assert row["from_addr"] == "alerts@corp.test"
    assert row["to_addrs"] == ["alice@example.test", "bob@example.test"]
    assert row["subject"] == "alert"
    assert "second message" in row["body"]
    assert row["attachments"][0]["name"] == "doc102.pdf"
    assert row["attachments"][0]["content_type"] == "application/pdf"
    assert row["attachments"][0]["payload"] == b"%PDF-fake"
    mb.close()


def test_imap_bad_credentials_rejected(imap_server):
    host, port = imap_server
    with pytest.raises(Exception):
        ImapMailbox(host, port, user=CREDS[0], password="wrong")


def test_imap_server_side_from_criteria(imap_server):
    host, port = imap_server
    mb = ImapMailbox(host, port, user=CREDS[0], password=CREDS[1])
    crit = build_search_criteria(from_addrs=["news@corp.test"])
    assert mb.search_uids(crit) == [101, 103]  # filtered BY the server
    mb.close()


def test_read_inbox_uid_cursor_over_live_mailbox(spark, tmp_path, imap_server):
    host, port = imap_server
    mb = ImapMailbox(host, port, user=CREDS[0], password=CREDS[1])
    store = CursorStore(str(tmp_path / "cursors.json"))
    df = read_inbox(spark, mb, store)
    assert df.count() == 3
    atts = attachments_table(df, mime_filter=["application/pdf"]).collect()
    assert [(r["uid"], r["name"]) for r in atts] == [(102, "doc102.pdf")]
    # cursor advanced: a second run over the same mailbox loads nothing
    df2 = read_inbox(spark, mb, store)
    assert df2.count() == 0
    assert store.get("inbox") == 103
    mb.close()
