"""SVG probe + text extraction — stdlib xml.etree.

SVG is the web's vector format: logos, figures, charts — a scraped
image column always contains them, and they are XML, so the honest
posture differs from raster codecs: no pixel decode (rasterization is
a renderer, not a parser), but REAL facts — canvas dimensions — and
REAL text (``<text>``/``<tspan>`` runs, ``<title>``/``<desc>``
accessibility strings) that belongs in the text corpus next to HTML.

- ``probe``: {width, height, n_elements, has_scripts}.  Dimensions
  resolve from ``width``/``height`` attributes (px/pt/unitless) with
  ``viewBox`` fallback; a non-pixel unit (%, em) falls back to
  viewBox too.  ``has_scripts`` flags <script> content — an SVG is an
  active document and a 100 TB pipeline wants that bit for free.
- ``extract_text``: title/desc/text runs in document order, the same
  whitespace-collapsed shape the HTML extractor emits.
- XML bombs: the parser is fed through a hard size gate and entity
  definitions REFUSE (billion-laughs is an SVG-shaped attack).

``encode_svg`` writes real fixtures (namespaced, nested tspans,
viewBox-only variants).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["SvgError", "sniff_svg", "probe", "extract_text",
           "encode_svg"]

_SVG_NS = "http://www.w3.org/2000/svg"


class SvgError(ValueError):
    """Named refusal: not an SVG this parser can serve honestly."""


def sniff_svg(payload: bytes) -> bool:
    """True when the payload is SVG-shaped: optional BOM/XML decl/
    comments/doctype, then an <svg root within the first 1 KiB."""
    head = payload[:1024].lstrip(b"\xef\xbb\xbf \t\r\n")
    # strip XML decl / comments / doctype conservatively
    for _ in range(8):
        if head.startswith(b"<?"):
            e = head.find(b"?>")
            if e < 0:
                return False
            head = head[e + 2:].lstrip()
        elif head.startswith(b"<!--"):
            e = head.find(b"-->")
            if e < 0:
                return False
            head = head[e + 3:].lstrip()
        elif head.startswith(b"<!"):
            # a DOCTYPE may carry an internal subset: <!DOCTYPE svg [
            # ... ]> — skip to the matching ]> so entity declarations
            # (the billion-laughs shape) still sniff as SVG and hit
            # the parser's named refusal
            lb = head.find(b"[")
            gt = head.find(b">")
            if lb != -1 and lb < gt:
                e = head.find(b"]>")
                if e < 0:
                    return False
                head = head[e + 2:].lstrip()
            else:
                if gt < 0:
                    return False
                head = head[gt + 1:].lstrip()
        else:
            break
    return head.startswith(b"<svg")


def _parse(payload: bytes, max_bytes: int = 32 << 20) -> ET.Element:
    if len(payload) > max_bytes:
        raise SvgError(f"SVG over size gate ({len(payload)} bytes)")
    if not sniff_svg(payload):
        raise SvgError("not an SVG payload (no <svg root)")
    if re.search(rb"<!ENTITY", payload[:65536]):
        raise SvgError(
            "SVG with entity definitions (XML-bomb shape) "
            "— refusing by name")
    try:
        root = ET.fromstring(payload)
    except (ET.ParseError, LookupError, ValueError) as e:
        raise SvgError(f"malformed SVG XML: {e}") from None
    tag = root.tag.rsplit("}", 1)[-1]
    if tag != "svg":
        raise SvgError(f"root element <{tag}> is not <svg>")
    return root


_LEN = re.compile(r"^\s*([0-9.]+)\s*(px|pt)?\s*$")


def _px(value: str | None) -> float | None:
    if not value:
        return None
    m = _LEN.match(value)
    if not m:
        return None  # %, em, etc: resolve via viewBox instead
    v = float(m.group(1))
    return v * 96 / 72 if m.group(2) == "pt" else v


def probe(payload: bytes) -> dict:
    """{width, height, n_elements, has_scripts} — dims as integer
    pixels (attributes first, viewBox fallback)."""
    root = _parse(payload)
    w = _px(root.get("width"))
    h = _px(root.get("height"))
    if w is None or h is None:
        vb = root.get("viewBox")
        if vb:
            parts = re.split(r"[\s,]+", vb.strip())
            if len(parts) == 4:
                try:
                    w = w if w is not None else float(parts[2])
                    h = h if h is not None else float(parts[3])
                except ValueError:
                    pass
    if w is None or h is None:
        raise SvgError("SVG without resolvable dimensions "
                       "(no width/height or viewBox)")
    n = sum(1 for _ in root.iter())
    scripts = any(el.tag.rsplit("}", 1)[-1] == "script"
                  for el in root.iter())
    return {"format": "svg", "width": int(round(w)),
            "height": int(round(h)), "n_elements": n,
            "has_scripts": scripts}


def extract_text(payload: bytes) -> list[str]:
    """title/desc/text runs in document order, whitespace-collapsed —
    one entry per element (nested tspans fold into their parent
    <text>)."""
    root = _parse(payload)
    out: list[str] = []

    def collapse(s: str) -> str:
        return re.sub(r"\s+", " ", s).strip()

    def all_text(el) -> str:
        return collapse("".join(el.itertext()))

    def walk(el, inside_text: bool):
        tag = el.tag.rsplit("}", 1)[-1]
        if tag in ("title", "desc") and not inside_text:
            t = all_text(el)
            if t:
                out.append(t)
            return
        if tag == "text":
            t = all_text(el)
            if t:
                out.append(t)
            return
        for child in el:
            walk(child, inside_text)

    walk(root, False)
    return out


def encode_svg(width: int, height: int, texts: list[str],
               title: str | None = None,
               viewbox_only: bool = False) -> bytes:
    """Real fixture: namespaced root, optional title, one <text> per
    entry (every second one split into nested tspans)."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    dims = (f'viewBox="0 0 {width} {height}"' if viewbox_only
            else f'width="{width}" height="{height}"')
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n'
             f'<svg xmlns="{_SVG_NS}" {dims}>']
    if title is not None:
        parts.append(f"<title>{esc(title)}</title>")
    parts.append(f'<rect x="0" y="0" width="{width}" '
                 f'height="{height}" fill="#eee"/>')
    for i, t in enumerate(texts):
        if i % 2 == 1 and len(t) > 2:
            cut = len(t) // 2
            parts.append(
                f'<text x="4" y="{16 * (i + 1)}">'
                f"<tspan>{esc(t[:cut])}</tspan>"
                f"<tspan>{esc(t[cut:])}</tspan></text>")
        else:
            parts.append(f'<text x="4" y="{16 * (i + 1)}">{esc(t)}</text>')
    parts.append("</svg>")
    return "\n".join(parts).encode()
