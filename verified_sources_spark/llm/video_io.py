"""Format-sniffing video access: ONE entry point over the stdlib
containers.

``probe_video`` dispatches on magic bytes — RIFF/AVI → llm/avi_codec
(BI_RGB or MJPG frames), GIF87a/89a → llm/gif_codec (animated GIFs ARE
video: web corpora are full of them), ftyp → llm/mp4_codec and EBML →
llm/webm_codec (the two containers that together carry essentially all
scraped web video; header-only tree walks) — and returns a
normalized header dict.  ``sample_frames`` implements time-based
sampling: AVI seeks straight to each kept frame (frame offsets are in
the header); GIF decodes sequentially up to the last kept frame
(frames are deltas — inherent to the format) but still materializes
ONLY the kept canvases; MP4 pixel decode is out of pure-stdlib reach
(H.264/H.265 entropy coding), so it refuses WITH THE CODEC NAMED
unless a real decoder is plugged in through the ``decoder=`` seam —
mirroring llm/multimodal's ``decoder="pil"`` (register a
PyAV/ffmpeg-backed callable with ``register_mp4_decoder`` once, per
process, and every sample_frames caller lights up).

Everything video-shaped in the engine (fingerprint, shots, scene pairs,
the media-ingest ledger) goes through this seam, so the SAME clip
stored as an AVI and as an animated GIF lands within a few pooled-hash
bits and dedups across containers — and MP4s degrade gracefully to
exact-dedup-only with full probed manifests.
"""

from __future__ import annotations

from collections.abc import Callable

__all__ = [
    "sniff_video_format",
    "probe_video",
    "sample_frames",
    "register_mp4_decoder",
    "VideoDecodeRefusal",
]


class VideoDecodeRefusal(NotImplementedError):
    """Pixel decode is not available for this codec in this
    environment — the payload is NOT broken (the probe succeeded);
    the message names the codec so operators can route/triage."""


# name -> callable(payload, meta, every_ms) -> list[(idx, ts_ms, rgb)]
# Process-global so executors registering a PyAV/ffmpeg decoder in a
# worker-init hook light up every sample_frames call in that worker.
_MP4_DECODERS: dict[str, Callable] = {}


def register_mp4_decoder(name: str, fn: Callable) -> None:
    """Plug a real MP4 pixel decoder (e.g. PyAV-backed) into the seam.
    ``fn(payload, meta, every_ms)`` must return the same
    ``[(frame_idx, ts_ms, top-down RGB bytes)]`` shape the stdlib
    containers produce."""
    _MP4_DECODERS[name] = fn


def sniff_video_format(payload: bytes) -> str | None:
    """'avi' / 'gif' / 'mp4' / 'webm' / None — magic bytes only."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return "webm"
    return None


def probe_video(payload: bytes) -> dict:
    """Normalized header metadata for any container: container,
    width, height, n_frames, fps (GIF: average over variable delays),
    duration_ms, codec ('BI_RGB'/'MJPG'/'GIF'/'avc1'/…) plus the raw
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
    if fmt == "mp4":
        from verified_sources_spark.llm.mp4_codec import probe

        m = probe(payload)
        return {
            "container": "mp4",
            "width": m["width"],
            "height": m["height"],
            "n_frames": m["n_frames"],
            "fps": m["fps"],
            "duration_ms": m["duration_ms"],
            "codec": m["codec"],
            "raw": m,
        }
    if fmt == "webm":
        from verified_sources_spark.llm.webm_codec import probe

        m = probe(payload)
        return {
            "container": "webm",
            "width": m["width"],
            "height": m["height"],
            "n_frames": m["n_frames"],
            "fps": m["fps"],
            "duration_ms": m["duration_ms"],
            "codec": m["codec"],
            "raw": m,
        }
    raise ValueError("unrecognized video payload (not AVI, GIF, MP4 or WebM)")


def sample_frames(
    payload: bytes, meta: dict, every_ms: int, decoder: str | None = None
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
    if meta["container"] in ("mp4", "webm"):
        if decoder is not None:
            if decoder not in _MP4_DECODERS:
                raise ValueError(
                    f"no compressed-video decoder registered under "
                    f"{decoder!r} (register_mp4_decoder first); known: "
                    f"{sorted(_MP4_DECODERS)}"
                )
            return _MP4_DECODERS[decoder](payload, meta, every_ms)
        raise VideoDecodeRefusal(
            f"pixel decode of {meta['container']} codec {meta['codec']!r} "
            f"is not available in pure stdlib (entropy coding + motion "
            f"compensation); the container probe succeeded — register a "
            f"PyAV/ffmpeg-backed decoder via register_mp4_decoder and "
            f"pass decoder= to light up sampling"
        )
    raise ValueError(f"unknown container {meta['container']!r}")
