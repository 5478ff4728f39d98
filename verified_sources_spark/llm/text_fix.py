"""Encoding-damage repair and Unicode canonicalization — the
ftfy-shaped cleanup pass every LLM data pipeline runs before dedup.

Real crawls and document drops are full of MOJIBAKE: UTF-8 bytes that
some upstream system decoded as Latin-1/cp1252 ("café" → "cafÃ©",
sometimes twice), plus NFD-decomposed accents from macOS filenames and
APIs, C0 control garbage from binary spillover, and a zoo of Unicode
spaces.  Left unrepaired, every damaged variant of a document hashes
differently — dedup misses it, lang-id misfires, and the garble trains
into the model.

``fix_mojibake`` reverses the classic damage DETERMINISTICALLY: a
string is re-encoded through cp1252 (with the five unmapped bytes
falling back to their Latin-1 values — exactly how browsers and most
mis-decoders behave) and strictly re-decoded as UTF-8; the repair is
accepted only when the whole round trip succeeds AND strictly shortens
the text (UTF-8 multi-byte sequences always collapse), which makes
false positives structurally impossible for text that was never
mojibake — "Ã" followed by a non-continuation byte fails the strict
decode and the string passes through untouched.  Two rounds bounded:
double-encoded damage ("cafÃƒÂ©") is common, triple is not.

``canonicalize_text`` applies NFC (composed accents — the form UTF-8
corpora standardize on), maps the Unicode space zoo (NBSP, en/em/thin
spaces, ideographic space, zero-width chars) to ASCII space or
nothing, strips C0/C1 controls except tab/newline, and collapses
``\\r\\n``.

Both are exposed as one Arrow-batched operator ``fix_text`` (repair →
canonicalize, flags recording WHAT was fixed per row — the audit
column curation decisions need).  Reference analogue: the reference
normalizes text in its data_processing helpers (e.g.
sources/matomo/helpers/data_processing.py) before loading; this is the
same hygiene layer at corpus scale.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = [
    "fix_mojibake", "canonicalize_text", "fix_text", "FIX_TEXT_SCHEMA",
]

# cp1252's five unmapped bytes fall back to Latin-1 (C1 controls):
# how real mis-decoders materialize them
_CP1252_FALLBACK = {0x81: "\x81", 0x8D: "\x8d", 0x8F: "\x8f",
                    0x90: "\x90", 0x9D: "\x9d"}
_TO_BYTES = {}
for b in range(0x80, 0xA0):
    try:
        _TO_BYTES[bytes([b]).decode("cp1252")] = b
    except UnicodeDecodeError:
        pass
for b, ch in _CP1252_FALLBACK.items():
    _TO_BYTES[ch] = b


def _encode_cp1252ish(s: str) -> bytes | None:
    """The inverse of a cp1252-with-latin1-fallback mis-decode, or
    None if some char has no single-byte origin."""
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if cp <= 0xFF:
            # Latin-1 identity: covers ASCII, the A0-FF block AND the
            # C1 range a latin-1 mis-decoder materializes for 80-9F
            out.append(cp)
        elif ch in _TO_BYTES:
            # cp1252 printables (€ ‚ " … – — ™ ...) map back to 80-9F
            out.append(_TO_BYTES[ch])
        else:
            return None
    return bytes(out)


def fix_mojibake(s: str, max_rounds: int = 2) -> tuple[str, int]:
    """(repaired text, number of repair rounds applied).  Each round
    reverses one layer of UTF-8-read-as-cp1252/Latin-1 damage; a round
    is applied only when the strict re-decode succeeds and shortens
    the string, so undamaged text is a fixed point."""
    rounds = 0
    for _ in range(max_rounds):
        raw = _encode_cp1252ish(s)
        if raw is None:
            break
        try:
            cand = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if len(cand) >= len(s):
            break
        s = cand
        rounds += 1
    return s, rounds


_SPACE_MAP = {
    0x00A0: " ",   # NBSP
    0x1680: " ",
    0x2028: "\n", 0x2029: "\n",       # line/paragraph separators
    0x202F: " ", 0x205F: " ", 0x3000: " ",
    0x200B: None, 0x200C: None, 0x200D: None,  # zero-widths drop
    0xFEFF: None,                               # stray BOM drops
}
for _cp in range(0x2000, 0x200B):  # en quad .. hair space
    _SPACE_MAP[_cp] = " "

_CONTROLS = re.compile(
    "[" + "".join(chr(c) for c in list(range(0x00, 0x09))
                  + [0x0B, 0x0C] + list(range(0x0E, 0x20))
                  + [0x7F] + list(range(0x80, 0xA0))) + "]")


def canonicalize_text(s: str) -> tuple[str, bool]:
    """(canonical text, changed?): NFC, space-zoo mapping, CRLF → LF,
    C0/C1 control strip (tab/newline kept)."""
    out = unicodedata.normalize("NFC", s)
    out = out.replace("\r\n", "\n").replace("\r", "\n")
    out = out.translate(_SPACE_MAP)
    out = _CONTROLS.sub("", out)
    return out, out != s


FIX_TEXT_SCHEMA = ("doc_id long, mojibake_rounds int, "
                   "canonicalized boolean, text string")


def fix_text(df, id_col: str = "doc_id", text_col: str = "text"):
    """Arrow-batched repair + canonicalization: one row per input with
    the cleaned text and audit flags (how many mojibake layers were
    reversed; whether canonicalization changed anything).  Null text
    passes through as null."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, s in zip(pdf[id_col], pdf[text_col]):
                if s is None:
                    rows.append({"doc_id": _id, "mojibake_rounds": 0,
                                 "canonicalized": False, "text": None})
                    continue
                repaired, rounds = fix_mojibake(str(s))
                canon, changed = canonicalize_text(repaired)
                rows.append({"doc_id": _id, "mojibake_rounds": rounds,
                             "canonicalized": changed, "text": canon})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "mojibake_rounds", "canonicalized", "text"])

    from pyspark.sql import functions as F

    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, FIX_TEXT_SCHEMA)
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out
