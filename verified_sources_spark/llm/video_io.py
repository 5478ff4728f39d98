"""Format-sniffing video access: ONE entry point over the stdlib
containers.

``probe_video`` dispatches on magic bytes — RIFF/AVI → llm/avi_codec
(BI_RGB or MJPG frames), GIF87a/89a → llm/gif_codec (animated GIFs ARE
video: web corpora are full of them) — and returns a normalized header
dict.  ``sample_frames`` implements time-based sampling over either
container: AVI seeks straight to each kept frame (frame offsets are in
the header); GIF decodes sequentially up to the last kept frame
(frames are deltas — inherent to the format) but still materializes
ONLY the kept canvases.

Everything video-shaped in the engine (fingerprint, shots, scene pairs,
the media-ingest ledger) goes through this seam, so the SAME clip
stored as an AVI and as an animated GIF lands within a few pooled-hash
bits and dedups across containers.
"""

from __future__ import annotations

__all__ = ["sniff_video_format", "probe_video", "sample_frames"]


def sniff_video_format(payload: bytes) -> str | None:
    """'avi' / 'gif' / None — magic bytes only, no decode."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def probe_video(payload: bytes) -> dict:
    """Normalized header metadata for either container: container,
    width, height, n_frames, fps (GIF: average over variable delays),
    duration_ms, codec ('BI_RGB'/'MJPG'/'GIF') plus the raw
    container-specific probe under ``raw``.  Header-only."""
    fmt = sniff_video_format(payload)
    if fmt == "avi":
        from verified_sources_spark.llm.avi_codec import probe

        m = probe(payload)
        return {
            "container": "avi",
            "width": m["width"],
            "height": m["height"],
            "n_frames": m["n_frames"],
            "fps": m["fps"],
            "duration_ms": m["duration_ms"],
            "codec": m["codec"],
            "raw": m,
        }
    if fmt == "gif":
        from verified_sources_spark.llm.gif_codec import probe

        m = probe(payload)
        return {
            "container": "gif",
            "width": m["width"],
            "height": m["height"],
            "n_frames": m["n_frames"],
            "fps": m["fps"],
            "duration_ms": m["duration_ms"],
            "codec": "GIF",
            "raw": m,
        }
    raise ValueError("unrecognized video payload (not AVI or GIF)")


def sample_frames(
    payload: bytes, meta: dict, every_ms: int
) -> list[tuple[int, int, bytes]]:
    """(frame_idx, ts_ms, top-down RGB bytes) for one frame per
    ``every_ms`` wall-clock window — the frame VISIBLE at each tick, so
    two encodes of the same content at different frame rates (or as
    AVI vs GIF) sample the same instants."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    if meta["container"] == "avi":
        from verified_sources_spark.llm.avi_codec import (
            decode_frame,
            frame_indices_every_ms,
        )

        return [
            (idx, ts, decode_frame(payload, meta["raw"], idx))
            for idx, ts in frame_indices_every_ms(meta["raw"], every_ms)
        ]
    if meta["container"] == "gif":
        from verified_sources_spark.llm.gif_codec import decode_frames

        stamps = meta["raw"]["timestamps_ms"]
        if not stamps:
            return []
        picks: list[tuple[int, int]] = []
        seen = set()
        t = 0
        dur = meta["duration_ms"]
        while t <= dur:
            # the frame visible at instant t: last start <= t
            idx = 0
            for k, s in enumerate(stamps):
                if s <= t:
                    idx = k
                else:
                    break
            if idx not in seen:
                seen.add(idx)
                picks.append((idx, t))
            t += every_ms
        want = {idx for idx, _ in picks}
        frames = {}
        for k, (_ts, rgb) in enumerate(decode_frames(payload)):
            if k in want:
                frames[k] = rgb
            if k >= max(want):
                break
        return [(idx, ts, frames[idx]) for idx, ts in picks]
    raise ValueError(f"unknown container {meta['container']!r}")
