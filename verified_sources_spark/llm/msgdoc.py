"""Pure-stdlib Outlook .msg (MS-OXMSG) email extraction + fixture
encoder — the at-rest Outlook flavor of the email surface
(llm/email_ingest handles EML/mbox; the reference's inbox source is
the live-IMAP half).

The format: a CFB container (llm/cfb) where each MAPI property is its
own stream named ``__substg1.0_TTTTYYYY`` — TTTT the property id,
YYYY the type (001F = UTF-16LE string, 001E = 8-bit string, 0102 =
binary).  Extraction reads the properties the email surface already
exposes: PidTagSubject (0037), PidTagSenderEmailAddress (0C1F, name
0C1A as fallback), PidTagDisplayTo (0E04), PidTagBody (1000) with
PidTagHtml (1013, bytes) as the fallback routed through the SAME
``extract_text`` the WARC and EML paths use — so Outlook-borne HTML
lands in the one canonical text shape.  Attachment count comes from
``__attach_version1.0_#NNNNNNNN`` storages.

``parse_msg`` returns the same dict shape as
llm/email_ingest.parse_eml, and email_extract dispatches CFB payloads
here — a mail archive mixing .eml, mbox and .msg lands on identical
rows.  ``encode_msg`` writes real fixtures in both string widths.
"""

from __future__ import annotations

__all__ = ["MsgError", "parse_msg", "encode_msg"]


class MsgError(ValueError):
    """Named refusal: not a .msg this extractor can serve honestly."""


def _prop(streams: dict[str, bytes], tag: str) -> str | None:
    """A string property by 4-hex-digit tag: prefer the UTF-16 (001F)
    stream, fall back to the 8-bit (001E) one."""
    v = streams.get(f"__substg1.0_{tag}001F")
    if v is not None:
        return v.decode("utf-16-le", errors="replace")
    v = streams.get(f"__substg1.0_{tag}001E")
    if v is not None:
        return v.decode("cp1252", errors="replace")
    return None


def parse_msg(data: bytes) -> dict:
    """One Outlook message → the ``parse_eml`` dict shape."""
    from verified_sources_spark.llm.cfb import CfbError, list_streams

    try:
        streams = list_streams(data)
    except CfbError as e:
        raise MsgError(f"not an OLE2 container: {e}") from None
    if not any(k.startswith("__substg1.0_") or k.startswith("__properties")
               for k in streams):
        raise MsgError(
            "OLE2 container has no MAPI property streams — not a .msg")
    subject = _prop(streams, "0037")
    from_addr = _prop(streams, "0C1F") or _prop(streams, "0C1A")
    to_addr = _prop(streams, "0E04")
    if subject is None and from_addr is None:
        raise MsgError("no Subject/Sender properties — not an email")
    body = _prop(streams, "1000")
    html = streams.get("__substg1.0_10130102")
    attachments = {k.split("/", 1)[0] for k in streams
                   if k.startswith("__attach_version1.0_")}
    n_parts = 1 + len(attachments)
    if body is not None:
        body_source, text = "plain", body
    elif html is not None:
        from verified_sources_spark.llm.warc import extract_text

        _, text = extract_text(html.decode("utf-8", errors="replace"),
                               collapse=True)
        body_source = "html"
    else:
        body_source, text = None, None
    return {
        "subject": subject,
        "from_addr": from_addr,
        "to_addr": to_addr,
        "date": None,
        "n_parts": n_parts,
        "body_source": body_source,
        "text": text,
    }


def encode_msg(subject: str, from_addr: str, body: str,
               to_addr: str = "", unicode_props: bool = True,
               html: bytes | None = None,
               attachments: int | list[tuple[str, bytes]] = 0) -> bytes:
    """Real .msg fixture: one ``__substg1.0_`` stream per property in
    the chosen string width, optional PidTagHtml bytes and attachment
    storages.  ``attachments`` is either a count (opaque payloads, the
    legacy fixture shape) or (filename, payload) pairs — named via
    PidTagAttachLongFilename, data via PidTagAttachDataBinary."""
    from verified_sources_spark.llm.cfb import encode_cfb

    def enc(s: str) -> tuple[str, bytes]:
        if unicode_props:
            return "001F", s.encode("utf-16-le")
        return "001E", s.encode("cp1252")

    streams: dict[str, bytes] = {}
    for tag, val in [("0037", subject), ("0C1F", from_addr),
                     ("0E04", to_addr)]:
        typ, raw = enc(val)
        streams[f"__substg1.0_{tag}{typ}"] = raw
    if html is None:
        typ, raw = enc(body)
        streams[f"__substg1.0_1000{typ}"] = raw
    else:
        streams["__substg1.0_10130102"] = html
    streams["__properties_version1.0"] = b"\x00" * 32
    if isinstance(attachments, int):
        attachments = [(f"att{i}.bin", b"attachment payload %d" % i)
                       for i in range(attachments)]
        named = False
    else:
        named = True
    for i, (name, payload) in enumerate(attachments):
        pre = f"__attach_version1.0_#{i:08X}"
        streams[f"{pre}/__substg1.0_37010102"] = payload
        if named:
            typ, raw = enc(name)
            streams[f"{pre}/__substg1.0_3707{typ}"] = raw
    return encode_cfb(streams)
