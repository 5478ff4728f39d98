"""iCalendar (RFC 5545) and vCard (RFC 6350) — the calendar-invite /
contact-card share of every mail archive.

Both formats are the same content-line grammar: CRLF-separated
``NAME;PARAM=V:VALUE`` lines, FOLDED at ~75 octets (continuation =
leading space/tab), values escaped (``\\n`` ``\\,`` ``\\;``),
components delimited by BEGIN:/END: with nesting (VCALENDAR holds
VEVENTs; VTIMEZONE blocks are skipped whole).  The parsers implement
that grammar from the RFC text; the fixture encoders fold and escape
independently, so reader and writer cross-check the grammar
(tests/test_ics_vcf.py round-trips folding, escaping, nesting and
both date forms).

Surfaces: ``parse_ics`` → per-VEVENT dicts (uid, summary,
description, location, organizer, dtstart/dtend raw + UTC epoch ms
for the ``...Z`` and VALUE=DATE forms — TZID-localized times keep
their raw string and a null epoch rather than guessing a tz
database); ``parse_vcf`` → per-card dicts (fn, org, title, emails,
tels).  Spark ops ``ics_events`` / ``vcf_cards`` explode payloads
Arrow-batched with the usual decoded_ok isolation, and the document
router routes ``BEGIN:VCALENDAR`` / ``BEGIN:VCARD`` payloads here so
invite/contact attachments land as structured rows, not prose garble.
Charset rides llm/text_fix.decode_bare_text (legacy-encoded exports
decode exactly).
"""

from __future__ import annotations

__all__ = [
    "IcsVcfError", "unfold_lines", "parse_ics", "parse_vcf",
    "encode_ics", "encode_vcf", "ics_events", "vcf_cards",
    "ICS_EVENTS_SCHEMA", "VCF_CARDS_SCHEMA",
]


class IcsVcfError(ValueError):
    """Named refusal: not a well-formed iCalendar / vCard payload."""


def _decode(data: bytes) -> str:
    from verified_sources_spark.llm.text_fix import decode_bare_text

    out = decode_bare_text(data)
    if out is None or not out[2]:
        raise IcsVcfError("payload is not decodable text")
    return out[0]


def unfold_lines(text: str) -> list[str]:
    """RFC 5545 §3.1 unfolding: CRLF (or bare LF, which real exports
    emit) followed by one space/tab continues the previous line."""
    out: list[str] = []
    for raw in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if raw[:1] in (" ", "\t") and out:
            out[-1] += raw[1:]
        elif raw:
            out.append(raw)
    return out


def _unescape(v: str) -> str:
    out, i, n = [], 0, len(v)
    while i < n:
        c = v[i]
        if c == "\\" and i + 1 < n:
            nxt = v[i + 1]
            if nxt in ("n", "N"):
                out.append("\n")
            elif nxt in (",", ";", "\\"):
                out.append(nxt)
            else:
                out.append(nxt)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _parse_content_line(line: str) -> tuple[str, dict, str]:
    """``NAME;P1=V1;P2=V2:value`` → (NAME, params, raw value).  The
    colon search must skip quoted parameter values (RFC 5545 §3.2)."""
    i, n, in_q = 0, len(line), False
    while i < n:
        c = line[i]
        if c == '"':
            in_q = not in_q
        elif c == ":" and not in_q:
            break
        i += 1
    if i >= n:
        raise IcsVcfError(f"content line without ':' — {line[:40]!r}")
    head, value = line[:i], line[i + 1:]
    parts = []
    j, start, in_q = 0, 0, False
    for j, c in enumerate(head):
        if c == '"':
            in_q = not in_q
        elif c == ";" and not in_q:
            parts.append(head[start:j])
            start = j + 1
    parts.append(head[start:])
    name = parts[0].upper()
    params = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.upper()] = v.strip('"')
    if not name:
        raise IcsVcfError("content line with empty property name")
    return name, params, value


def _dt_ms(value: str, params: dict) -> int | None:
    """UTC epoch ms for the unambiguous forms: ``...Z`` (UTC) and
    VALUE=DATE (midnight UTC by convention); TZID-localized values
    return None — inventing a tz database would be silent garble."""
    import datetime as dt

    v = value.strip()
    try:
        if params.get("VALUE") == "DATE" or (len(v) == 8 and
                                             v.isdigit()):
            d = dt.datetime(int(v[:4]), int(v[4:6]), int(v[6:8]),
                            tzinfo=dt.timezone.utc)
            return int(d.timestamp() * 1000)
        if v.endswith("Z") and len(v) == 16 and v[8] == "T":
            d = dt.datetime(int(v[:4]), int(v[4:6]), int(v[6:8]),
                            int(v[9:11]), int(v[11:13]), int(v[13:15]),
                            tzinfo=dt.timezone.utc)
            return int(d.timestamp() * 1000)
    except ValueError as e:
        raise IcsVcfError(f"bad date-time {v!r}: {e}") from None
    return None


_EVENT_PROPS = ("UID", "SUMMARY", "DESCRIPTION", "LOCATION",
                "ORGANIZER", "STATUS")


def parse_ics(data: bytes) -> dict:
    """One iCalendar payload → ``{"events": [...], "n_components"}``;
    VEVENTs carry the prose properties unescaped plus dtstart/dtend
    raw strings and UTC epochs where unambiguous."""
    lines = unfold_lines(_decode(data))
    if not lines or lines[0].strip().upper() != "BEGIN:VCALENDAR":
        raise IcsVcfError("payload does not open with BEGIN:VCALENDAR")
    events: list[dict] = []
    stack: list[str] = []
    cur: dict | None = None
    n_components = 0
    for line in lines:
        name, params, value = _parse_content_line(line)
        if name == "BEGIN":
            comp = value.strip().upper()
            stack.append(comp)
            if comp != "VCALENDAR":
                n_components += 1
            if comp == "VEVENT":
                if cur is not None:
                    raise IcsVcfError("nested VEVENT")
                cur = {"uid": None, "summary": None,
                       "description": None, "location": None,
                       "organizer": None, "status": None,
                       "dtstart": None, "dtend": None,
                       "start_ms": None, "end_ms": None}
            continue
        if name == "END":
            comp = value.strip().upper()
            if not stack or stack[-1] != comp:
                raise IcsVcfError(
                    f"END:{comp} does not match open component")
            stack.pop()
            if comp == "VEVENT":
                events.append(cur)
                cur = None
            continue
        if cur is not None and len(stack) and stack[-1] == "VEVENT":
            if name in _EVENT_PROPS:
                cur[name.lower()] = _unescape(value)
            elif name == "DTSTART":
                cur["dtstart"] = value.strip()
                cur["start_ms"] = _dt_ms(value, params)
            elif name == "DTEND":
                cur["dtend"] = value.strip()
                cur["end_ms"] = _dt_ms(value, params)
    if stack:
        raise IcsVcfError(f"unclosed component {stack[-1]}")
    return {"events": events, "n_components": n_components}


def parse_vcf(data: bytes) -> dict:
    """One vCard payload (possibly many concatenated cards) →
    ``{"cards": [{fn, org, title, emails, tels}]}``."""
    lines = unfold_lines(_decode(data))
    if not lines or not lines[0].upper().startswith("BEGIN:VCARD"):
        raise IcsVcfError("payload does not open with BEGIN:VCARD")
    cards: list[dict] = []
    cur: dict | None = None
    for line in lines:
        name, _params, value = _parse_content_line(line)
        if name == "BEGIN" and value.strip().upper() == "VCARD":
            if cur is not None:
                raise IcsVcfError("nested VCARD")
            cur = {"fn": None, "org": None, "title": None,
                   "emails": [], "tels": []}
            continue
        if name == "END" and value.strip().upper() == "VCARD":
            if cur is None:
                raise IcsVcfError("END:VCARD without BEGIN")
            cards.append(cur)
            cur = None
            continue
        if cur is None:
            raise IcsVcfError(f"property {name} outside VCARD")
        if name == "FN":
            cur["fn"] = _unescape(value)
        elif name == "ORG":
            # ORG is compound (org;unit;unit) — split on the first
            # UNESCAPED semicolon only ("\\;" is a literal semicolon)
            i, n = 0, len(value)
            while i < n:
                if value[i] == "\\":
                    i += 2
                    continue
                if value[i] == ";":
                    break
                i += 1
            cur["org"] = _unescape(value[:i])
        elif name == "TITLE":
            cur["title"] = _unescape(value)
        elif name == "EMAIL":
            cur["emails"].append(value.strip())
        elif name == "TEL":
            cur["tels"].append(value.strip())
    if cur is not None:
        raise IcsVcfError("unterminated VCARD")
    if not cards:
        raise IcsVcfError("no VCARD components")
    return {"cards": cards}


# ------------------------------------------------------------ writers

def _escape(v: str) -> str:
    return (v.replace("\\", "\\\\").replace(",", "\\,")
            .replace(";", "\\;").replace("\n", "\\n"))


def _fold(line: str, limit: int = 75) -> str:
    out, cur = [], line
    while len(cur.encode("utf-8")) > limit:
        # cut at a char boundary under the octet limit
        cut = limit
        while cut > 1 and len(cur[:cut].encode("utf-8")) > limit:
            cut -= 1
        out.append(cur[:cut])
        cur = " " + cur[cut:]
    out.append(cur)
    return "\r\n".join(out)


def encode_ics(events: list[dict]) -> bytes:
    """Fixture writer: RFC 5545 layout with folding + escaping,
    independent of the parser."""
    lines = ["BEGIN:VCALENDAR", "VERSION:2.0",
             "PRODID:-//verified-sources//EN"]
    for ev in events:
        lines.append("BEGIN:VEVENT")
        for key in ("uid", "summary", "description", "location",
                    "organizer", "status"):
            if ev.get(key) is not None:
                lines.append(_fold(
                    f"{key.upper()}:{_escape(ev[key])}"))
        if ev.get("dtstart"):
            lines.append(f"DTSTART:{ev['dtstart']}")
        if ev.get("dtend"):
            lines.append(f"DTEND:{ev['dtend']}")
        lines.append("END:VEVENT")
    lines.append("END:VCALENDAR")
    return ("\r\n".join(lines) + "\r\n").encode()


def encode_vcf(cards: list[dict]) -> bytes:
    lines = []
    for c in cards:
        lines += ["BEGIN:VCARD", "VERSION:4.0"]
        if c.get("fn") is not None:
            lines.append(_fold(f"FN:{_escape(c['fn'])}"))
        if c.get("org") is not None:
            lines.append(_fold(f"ORG:{_escape(c['org'])}"))
        if c.get("title") is not None:
            lines.append(_fold(f"TITLE:{_escape(c['title'])}"))
        for e in c.get("emails", ()):
            lines.append(f"EMAIL:{e}")
        for t in c.get("tels", ()):
            lines.append(f"TEL;TYPE=work:{t}")
        lines.append("END:VCARD")
    return ("\r\n".join(lines) + "\r\n").encode()


# ---------------------------------------------------------- Spark ops

ICS_EVENTS_SCHEMA = (
    "doc_id long, decoded_ok boolean, event_idx int, n_events int, "
    "uid string, summary string, description string, location string, "
    "organizer string, status string, dtstart string, dtend string, "
    "start_ms long, end_ms long"
)


def ics_events(df, id_col: str = "doc_id", asset_col: str = "asset"):
    """Arrow-batched VEVENT explosion: one row per event; malformed
    calendars isolate as ``decoded_ok=false`` rows."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[asset_col]):
                _id = int(_id)
                try:
                    out = parse_ics(bytes(payload))
                    evs = out["events"]
                    if not evs:
                        raise IcsVcfError("calendar with no VEVENTs")
                    for i, ev in enumerate(evs):
                        rows.append({
                            "doc_id": _id, "decoded_ok": True,
                            "event_idx": i, "n_events": len(evs),
                            **ev})
                except IcsVcfError:
                    rows.append({
                        "doc_id": _id, "decoded_ok": False,
                        "event_idx": None, "n_events": None,
                        "uid": None, "summary": None,
                        "description": None, "location": None,
                        "organizer": None, "status": None,
                        "dtstart": None, "dtend": None,
                        "start_ms": None, "end_ms": None})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "decoded_ok", "event_idx", "n_events",
                "uid", "summary", "description", "location",
                "organizer", "status", "dtstart", "dtend",
                "start_ms", "end_ms"])

    from pyspark.sql import functions as F

    out = df.select(F.col(id_col), F.col(asset_col)).mapInPandas(
        run, ICS_EVENTS_SCHEMA)
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out


VCF_CARDS_SCHEMA = (
    "doc_id long, decoded_ok boolean, card_idx int, n_cards int, "
    "fn string, org string, title string, emails string, tels string"
)


def vcf_cards(df, id_col: str = "doc_id", asset_col: str = "asset"):
    """Arrow-batched vCard explosion: one row per card, emails/tels
    semicolon-joined in file order."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[asset_col]):
                _id = int(_id)
                try:
                    cards = parse_vcf(bytes(payload))["cards"]
                    for i, c in enumerate(cards):
                        rows.append({
                            "doc_id": _id, "decoded_ok": True,
                            "card_idx": i, "n_cards": len(cards),
                            "fn": c["fn"], "org": c["org"],
                            "title": c["title"],
                            "emails": ";".join(c["emails"]),
                            "tels": ";".join(c["tels"])})
                except IcsVcfError:
                    rows.append({
                        "doc_id": _id, "decoded_ok": False,
                        "card_idx": None, "n_cards": None,
                        "fn": None, "org": None, "title": None,
                        "emails": None, "tels": None})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "decoded_ok", "card_idx", "n_cards",
                "fn", "org", "title", "emails", "tels"])

    from pyspark.sql import functions as F

    out = df.select(F.col(id_col), F.col(asset_col)).mapInPandas(
        run, VCF_CARDS_SCHEMA)
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out
