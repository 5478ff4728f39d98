"""iCalendar / vCard (llm/ics_vcf): RFC 5545/6350 content-line
grammar — folding, escaping, component nesting, the two unambiguous
date forms — round-tripped against the independent fixture writers,
plus router dispatch and legacy-charset payloads."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.ics_vcf import (
    IcsVcfError,
    encode_ics,
    encode_vcf,
    parse_ics,
    parse_vcf,
    unfold_lines,
)


def test_unfolding_and_escaping_round_trip():
    evs = [{"uid": "e1@x",
            "summary": "Team sync, weekly; important",
            "description": ("Line one\nLine two with a long tail "
                            + "x" * 150),
            "location": "Room 5", "organizer": "mailto:a@e.com",
            "status": "CONFIRMED",
            "dtstart": "20240301T100000Z",
            "dtend": "20240301T110000Z"}]
    blob = encode_ics(evs)
    # the writer really folded (some line over 75 octets continues)
    assert b"\r\n " in blob
    (ev,) = parse_ics(blob)["events"]
    for k, v in evs[0].items():
        assert ev[k] == v, k
    assert ev["start_ms"] == 1709287200000
    assert ev["end_ms"] == 1709290800000


def test_date_forms():
    evs = [{"uid": "d@x", "summary": "all day",
            "dtstart": "20240302", "dtend": "20240303"}]
    (ev,) = parse_ics(encode_ics(evs))["events"]
    assert ev["start_ms"] == 1709337600000
    # TZID-localized: raw kept, epoch honestly null (no tz database)
    tz = (b"BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nUID:u\r\n"
          b"DTSTART;TZID=America/New_York:20240301T100000\r\n"
          b"END:VEVENT\r\nEND:VCALENDAR\r\n")
    (ev,) = parse_ics(tz)["events"]
    assert ev["dtstart"] == "20240301T100000"
    assert ev["start_ms"] is None


def test_incomplete_vtimezone_tolerated_and_quoted_params():
    # the STANDARD block below lacks TZOFFSETFROM/TO — the TZID is
    # marked unresolvable but the calendar still parses
    blob = (b"BEGIN:VCALENDAR\r\n"
            b"BEGIN:VTIMEZONE\r\nTZID:X\r\nBEGIN:STANDARD\r\n"
            b"DTSTART:19700101T000000\r\nEND:STANDARD\r\n"
            b"END:VTIMEZONE\r\n"
            b"BEGIN:VEVENT\r\nUID:q@x\r\n"
            b'ORGANIZER;CN="Doe; John":mailto:j@e.com\r\n'
            b"SUMMARY:ok\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n")
    out = parse_ics(blob)
    assert out["n_components"] == 3  # vtimezone + standard + vevent
    assert out["events"][0]["organizer"] == "mailto:j@e.com"


def test_vcf_compound_org_and_multi_values():
    cards = [{"fn": "Ada Lovelace", "org": "Analytical; Engines",
              "title": "Countess",
              "emails": ["ada@example.com", "al@e.com"],
              "tels": ["+44 1 234"]},
             {"fn": "Grace Hopper", "emails": [], "tels": []}]
    got = parse_vcf(encode_vcf(cards))["cards"]
    assert got[0]["org"] == "Analytical; Engines"
    assert got[0]["emails"] == ["ada@example.com", "al@e.com"]
    assert got[1]["fn"] == "Grace Hopper" and got[1]["org"] is None
    # plain compound ORG: first component only
    raw = (b"BEGIN:VCARD\r\nFN:X\r\nORG:Acme;R&D;West\r\n"
           b"END:VCARD\r\n")
    assert parse_vcf(raw)["cards"][0]["org"] == "Acme"


def test_legacy_charset_payloads():
    blob = encode_ics([{"uid": "u", "summary": "Réunion café",
                        "dtstart": "20240301T100000Z"}])
    legacy = blob.decode().encode("cp1252")
    assert parse_ics(legacy)["events"][0]["summary"] == "Réunion café"


def test_refusals_by_name():
    for bad in (b"", b"not a calendar",
                b"BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n",  # unclosed
                b"BEGIN:VCALENDAR\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n"):
        with pytest.raises(IcsVcfError):
            parse_ics(bad)
    with pytest.raises(IcsVcfError):
        parse_vcf(b"BEGIN:VCARD\r\nFN:x\r\n")  # unterminated
    with pytest.raises(IcsVcfError, match="outside"):
        parse_vcf(b"BEGIN:VCARD\r\nEND:VCARD\r\nFN:stray\r\n"
                  b"BEGIN:VCARD\r\nEND:VCARD\r\n")


def test_router_dispatch():
    from verified_sources_spark.llm.docrouter import (
        extract_document, sniff_document,
    )

    ics = encode_ics([{"uid": "u", "summary": "Standup",
                       "location": "Room 1",
                       "dtstart": "20240301T100000Z"}])
    assert sniff_document(ics) == "ics"
    assert extract_document(ics)["text"] == "Standup — Room 1"
    vcf = encode_vcf([{"fn": "Ada", "org": "Engines",
                       "emails": [], "tels": []}])
    assert sniff_document(vcf) == "vcard"
    assert extract_document(vcf)["text"] == "Ada — Engines"


def test_unfold_lines_variants():
    assert unfold_lines("A:1\r\n B2\nC:3\n\tD4\n") == ["A:1B2", "C:3D4"]


_BERLINISH = {"tzid": "City", "observances": [
    {"kind": "DAYLIGHT", "dtstart": "19700329T020000",
     "from": "+0100", "to": "+0200",
     "rrule": "FREQ=YEARLY;BYMONTH=3;BYDAY=-1SU"},
    {"kind": "STANDARD", "dtstart": "19701025T030000",
     "from": "+0200", "to": "+0100",
     "rrule": "FREQ=YEARLY;BYMONTH=10;BYDAY=-1SU"},
]}


def _utc_ms(y, mo, d, h, m):
    import datetime as dt

    return int(dt.datetime(
        y, mo, d, h, m, tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_tzid_resolution_both_dst_sides():
    """TZID epochs through the embedded VTIMEZONE: standard side,
    daylight side, an event spanning the spring transition, and the
    exact last-Sunday RRULE arithmetic."""
    evs = [{"uid": "a", "dtstart": "20240331T013000",
            "dtstart_tzid": "City",
            "dtend": "20240331T033000", "dtend_tzid": "City"},
           {"uid": "b", "dtstart": "20240715T120000",
            "dtstart_tzid": "City"},
           {"uid": "c", "dtstart": "20240115T120000",
            "dtstart_tzid": "City"}]
    out = parse_ics(encode_ics(evs, timezones=[_BERLINISH]))["events"]
    assert out[0]["start_ms"] == _utc_ms(2024, 3, 31, 0, 30)  # +01
    assert out[0]["end_ms"] == _utc_ms(2024, 3, 31, 1, 30)    # +02
    assert out[1]["start_ms"] == _utc_ms(2024, 7, 15, 10, 0)  # summer
    assert out[2]["start_ms"] == _utc_ms(2024, 1, 15, 11, 0)  # winter


def test_tzid_gap_fold_and_refusals():
    """Spring-forward local times that never existed pin null;
    fall-back ambiguity deterministically takes the pre-transition
    (daylight) offset — zoneinfo's fold=0; a TZID with no embedded
    VTIMEZONE pins null; an RRULE beyond the yearly BYMONTH+BYDAY
    form poisons only its own TZID."""
    evs = [{"uid": "gap", "dtstart": "20240331T023000",
            "dtstart_tzid": "City"},
           {"uid": "fold", "dtstart": "20241027T023000",
            "dtstart_tzid": "City"},
           {"uid": "lost", "dtstart": "20240601T120000",
            "dtstart_tzid": "Atlantis"}]
    out = parse_ics(encode_ics(evs, timezones=[_BERLINISH]))["events"]
    assert out[0]["start_ms"] is None                         # gap
    assert out[1]["start_ms"] == _utc_ms(2024, 10, 27, 0, 30)  # fold=0
    assert out[1]["dtstart"] == "20241027T023000"             # raw kept
    assert out[2]["start_ms"] is None                         # no vtz
    weird = {"tzid": "W", "observances": [
        {"kind": "STANDARD", "dtstart": "19700101T000000",
         "from": "+0100", "to": "+0100",
         "rrule": "FREQ=MONTHLY;BYMONTHDAY=1"}]}
    out2 = parse_ics(encode_ics(
        [{"uid": "w", "dtstart": "20240601T120000",
          "dtstart_tzid": "W"}], timezones=[weird]))["events"]
    assert out2[0]["start_ms"] is None


def test_tzid_fixed_offset_zone():
    """One STANDARD block dated 1970 with no RRULE = a fixed-offset
    zone; it must cover present-day times (the one-shot onset is a
    single historical transition, not a 1970-only rule)."""
    tz = {"tzid": "F", "observances": [
        {"kind": "STANDARD", "dtstart": "19700101T000000",
         "from": "+0530", "to": "+0530"}]}
    out = parse_ics(encode_ics(
        [{"uid": "f", "dtstart": "20240601T120000",
          "dtstart_tzid": "F"}], timezones=[tz]))["events"]
    assert out[0]["start_ms"] == _utc_ms(2024, 6, 1, 6, 30)


def test_tzid_extreme_dates_resolve_to_null_not_crash():
    """Year-0001 observance dates and near-day offsets overflow
    datetime arithmetic inside the resolver — they must surface as
    unresolvable (null epochs), never as a task-killing
    OverflowError (found by self-review repro)."""
    tz = {"tzid": "X", "observances": [
        {"kind": "STANDARD", "dtstart": "00010101T000000",
         "from": "+0100", "to": "+0100"}]}
    out = parse_ics(encode_ics(
        [{"uid": "a", "dtstart": "20240601T120000",
          "dtstart_tzid": "X"}], timezones=[tz]))["events"]
    assert out[0]["start_ms"] is None
    # a >=24h offset refuses at parse time and poisons only its TZID
    tz2 = {"tzid": "Y", "observances": [
        {"kind": "STANDARD", "dtstart": "19700101T000000",
         "from": "-990000", "to": "+0100"}]}
    out2 = parse_ics(encode_ics(
        [{"uid": "b", "dtstart": "20240601T120000",
          "dtstart_tzid": "Y"}], timezones=[tz2]))["events"]
    assert out2[0]["start_ms"] is None


def test_tzid_rdate_exdate_transitions():
    """RDATE adds enumerated one-off transitions (historical offset
    changes real exports carry); EXDATE disclaims an onset.  Both in
    the observance's local clock; a MALFORMED period (no '/') still
    poisons the TZID."""
    blob = (
        "BEGIN:VCALENDAR\r\nBEGIN:VTIMEZONE\r\nTZID:H\r\n"
        "BEGIN:STANDARD\r\nDTSTART:19700101T000000\r\n"
        "TZOFFSETFROM:+0200\r\nTZOFFSETTO:+0200\r\nEND:STANDARD\r\n"
        "BEGIN:STANDARD\r\nDTSTART:20200101T000000\r\n"
        "TZOFFSETFROM:+0200\r\nTZOFFSETTO:+0300\r\n"
        "RDATE:20220101T000000\r\nEXDATE:20200101T000000\r\n"
        "END:STANDARD\r\nEND:VTIMEZONE\r\n"
        "BEGIN:VEVENT\r\nUID:a\r\n"
        "DTSTART;TZID=H:20210601T120000\r\nEND:VEVENT\r\n"
        "BEGIN:VEVENT\r\nUID:b\r\n"
        "DTSTART;TZID=H:20240601T120000\r\nEND:VEVENT\r\n"
        "END:VCALENDAR\r\n").encode()
    out = parse_ics(blob)["events"]
    # EXDATE removed the 2020 onset: mid-2021 is still +0200; the
    # RDATE 2022 one-off flips to +0300 for 2024
    assert out[0]["start_ms"] == _utc_ms(2021, 6, 1, 10, 0)
    assert out[1]["start_ms"] == _utc_ms(2024, 6, 1, 9, 0)
    # PERIOD-valued RDATE poisons the TZID (null), parse survives
    bad = blob.replace(b"RDATE:", b"RDATE;VALUE=PERIOD:")
    out2 = parse_ics(bad)["events"]
    assert out2[0]["start_ms"] is None


def test_tzid_period_rdate_transitions():
    """r15: RDATE;VALUE=PERIOD is honored — the period START is the
    onset.  A local start behaves exactly like a DATE-TIME RDATE; a
    Z-suffixed start is a UTC instant shifted by TZOFFSETFROM; the
    duration/end half is validated but otherwise irrelevant; a
    malformed end half poisons the TZID."""
    head = (
        "BEGIN:VCALENDAR\r\nBEGIN:VTIMEZONE\r\nTZID:P\r\n"
        "BEGIN:STANDARD\r\nDTSTART:19700101T000000\r\n"
        "TZOFFSETFROM:+0200\r\nTZOFFSETTO:+0200\r\nEND:STANDARD\r\n"
        "BEGIN:STANDARD\r\nDTSTART:20200101T000000\r\n"
        "TZOFFSETFROM:+0200\r\nTZOFFSETTO:+0300\r\n"
        "EXDATE:20200101T000000\r\n{rdate}\r\n"
        "END:STANDARD\r\nEND:VTIMEZONE\r\n"
        "BEGIN:VEVENT\r\nUID:a\r\n"
        "DTSTART;TZID=P:20240601T120000\r\nEND:VEVENT\r\n"
        "END:VCALENDAR\r\n")

    def run(rdate):
        return parse_ics(head.format(rdate=rdate).encode())["events"]

    # local start + duration: onset 2022-01-01 local — +0300 by 2024
    out = run("RDATE;VALUE=PERIOD:20220101T000000/PT1H")
    assert out[0]["start_ms"] == _utc_ms(2024, 6, 1, 9, 0)
    # local start + end datetime
    out = run("RDATE;VALUE=PERIOD:20220101T000000/20220101T020000")
    assert out[0]["start_ms"] == _utc_ms(2024, 6, 1, 9, 0)
    # Z start: 2021-12-31T22:00Z + TZOFFSETFROM(+0200) = local
    # 2022-01-01T00:00 — same onset as above
    out = run("RDATE;VALUE=PERIOD:20211231T220000Z/PT1H")
    assert out[0]["start_ms"] == _utc_ms(2024, 6, 1, 9, 0)
    # week-form duration
    out = run("RDATE;VALUE=PERIOD:20220101T000000/P2W")
    assert out[0]["start_ms"] == _utc_ms(2024, 6, 1, 9, 0)
    # no PERIOD rdate at all: the 2020 onset is EXDATE-disclaimed,
    # so the event stays +0200 — proves the onsets above came from
    # the period starts
    out = run("RDATE:20300101T000000")
    assert out[0]["start_ms"] == _utc_ms(2024, 6, 1, 10, 0)
    # malformed end halves poison the TZID, parse survives —
    # including the RFC-forbidden dangling-T duration and a
    # multi-Z date-time
    for bad in ("RDATE;VALUE=PERIOD:20220101T000000/P",
                "RDATE;VALUE=PERIOD:20220101T000000/P1DT",
                "RDATE;VALUE=PERIOD:20220101T000000/20220101T020000zz",
                "RDATE;VALUE=PERIOD:20220101T000000/garble",
                "RDATE;VALUE=PERIOD:20220101T000000"):
        out = run(bad)
        assert out[0]["start_ms"] is None, bad


def test_tzid_rrule_until_utc_exact():
    """r15: a Z-suffixed UNTIL is compared against the onset's UTC
    instant (onset - TZOFFSETFROM), not the local clock.  Pinned on
    the boundary case where the two disagree: local onset 03:00
    under TZOFFSETFROM +0200 is 01:00Z == UNTIL — included by the
    UTC compare, excluded by the naive one."""
    blob = (
        "BEGIN:VCALENDAR\r\nBEGIN:VTIMEZONE\r\nTZID:U\r\n"
        "BEGIN:STANDARD\r\nDTSTART:19700101T000000\r\n"
        "TZOFFSETFROM:+0200\r\nTZOFFSETTO:+0200\r\nEND:STANDARD\r\n"
        "BEGIN:DAYLIGHT\r\nDTSTART:20190331T030000\r\n"
        "TZOFFSETFROM:+0200\r\nTZOFFSETTO:+0300\r\n"
        "RRULE:FREQ=YEARLY;BYMONTH=3;BYDAY=-1SU;"
        "UNTIL=20200329T010000Z\r\n"
        "END:DAYLIGHT\r\nEND:VTIMEZONE\r\n"
        "BEGIN:VEVENT\r\nUID:a\r\n"
        "DTSTART;TZID=U:20200601T120000\r\nEND:VEVENT\r\n"
        "BEGIN:VEVENT\r\nUID:b\r\n"
        "DTSTART;TZID=U:20210601T120000\r\nEND:VEVENT\r\n"
        "END:VCALENDAR\r\n").encode()
    out = parse_ics(blob)["events"]
    # 2020-03-29 (last Sunday of March 2020) onset INCLUDED: summer
    # 2020 is +0300
    assert out[0]["start_ms"] == _utc_ms(2020, 6, 1, 9, 0)
    # 2021 onset is past UNTIL: the observance never fires again,
    # but the 2020 segment's offset (+0300) persists forward — pin
    # only that the rule expansion stopped producing NEW onsets via
    # the 2020 inclusion above; 2021 stays on the last segment
    assert out[1]["start_ms"] is not None
