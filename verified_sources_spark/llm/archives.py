"""Archive ingestion: zip / tar / tar.{gz,xz,bz2} member extraction.

Curated text corpora ship as archives-of-files (a zip of .txt/.json
documents, a tar.gz dump per domain); the ingestion front door must
explode them into per-member rows before any text operator can run.
This module wraps the stdlib's battle-tested ``zipfile``/``tarfile``
(no reason to hand-roll these — unlike the media codecs, the parsers
ship with Python) behind the same sniff/iterate/refuse contract as the
media seams:

- ``sniff_archive_format``: 'zip' / 'tar' / 'tgz' / 'txz' / 'tbz2' by
  magic bytes (tar sniffed by the ustar magic at offset 257).
- ``iter_members``: yield (name, payload bytes) per REGULAR member,
  skipping directories/links; a truncated or corrupt archive raises
  ``ArchiveError`` with the format named.  Zip-bomb guard: a member
  whose declared size exceeds ``max_member_bytes`` refuses loudly
  (at 100 TB someone WILL feed the pipeline a 10 PB-expanding bomb).
- ``archive_members``: the Spark operator — Arrow-batched explosion of
  binary archive payloads into (id, member_name, n_bytes, text) rows;
  corrupt archives isolate as ``decoded_ok=false`` rows.

Reference analogue: the filesystem source's read_location + fsspec
globbing (/root/reference/sources/filesystem/__init__.py) — this is
the same exploding step when the "filesystem" arrives as one archive
blob per row.
"""

from __future__ import annotations

import io
import tarfile
import zipfile

__all__ = [
    "ArchiveError",
    "sniff_archive_format",
    "iter_members",
    "archive_members",
    "encode_zip",
    "encode_tar",
]

_DEFAULT_MAX_MEMBER = 1 << 30  # 1 GiB per member: the zip-bomb gate


class ArchiveError(ValueError):
    pass


def sniff_archive_format(payload: bytes) -> str | None:
    """'zip' / 'tgz' / 'txz' / 'tbz2' / 'tar' / None — magic bytes
    only (compressed sniffs name the stream; whether a tar lives
    inside is decided on open)."""
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip"
    if payload[:2] == b"\x1f\x8b":
        return "tgz"
    if payload[:6] == b"\xfd7zXZ\x00":
        return "txz"
    if payload[:3] == b"BZh" and len(payload) > 3 and 0x31 <= payload[3] <= 0x39:
        return "tbz2"
    if len(payload) > 262 and payload[257:262] == b"ustar":
        return "tar"
    return None


def iter_members(
    payload: bytes, max_member_bytes: int = _DEFAULT_MAX_MEMBER
):
    """Yield (member_name, bytes) for every regular file in the
    archive, in archive order.  Directories and links are skipped;
    oversized members and corrupt archives raise ``ArchiveError``."""
    fmt = sniff_archive_format(payload)
    if fmt == "zip":
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    if info.file_size > max_member_bytes:
                        raise ArchiveError(
                            f"zip member {info.filename!r} declares "
                            f"{info.file_size} bytes > cap {max_member_bytes}"
                        )
                    yield info.filename, zf.read(info)
        except (zipfile.BadZipFile, EOFError, OSError) as e:
            raise ArchiveError(f"corrupt zip archive: {e}") from None
        return
    if fmt in ("tar", "tgz", "txz", "tbz2"):
        mode = {"tgz": "r:gz", "txz": "r:xz", "tbz2": "r:bz2"}.get(fmt, "r:")
        try:
            with tarfile.open(fileobj=io.BytesIO(payload), mode=mode) as tf:
                for info in tf:
                    if not info.isreg():
                        continue
                    if info.size > max_member_bytes:
                        raise ArchiveError(
                            f"tar member {info.name!r} declares "
                            f"{info.size} bytes > cap {max_member_bytes}"
                        )
                    f = tf.extractfile(info)
                    data = f.read() if f else b""
                    if len(data) != info.size:
                        raise ArchiveError(
                            f"truncated tar member {info.name!r}: "
                            f"{len(data)} bytes < {info.size}"
                        )
                    yield info.name, data
        except (tarfile.TarError, EOFError, OSError) as e:
            raise ArchiveError(f"corrupt {fmt} archive: {e}") from None
        return
    raise ArchiveError(
        "unrecognized archive payload (not zip/tar/tar.{gz,xz,bz2})"
    )


ARCHIVE_MEMBERS_SCHEMA = (
    "doc_id long, decoded_ok boolean, archive_format string, "
    "member_name string, n_bytes long, text string"
)


def archive_members(df, id_col: str = "doc_id", asset_col: str = "asset"):
    """Arrow-batched archive explosion: one output row per regular
    member (utf-8 text decoded with replacement — binary members still
    land with their true byte counts).  A corrupt archive yields one
    ``decoded_ok=false`` row instead of failing the task."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[asset_col]):
                payload = bytes(payload)
                fmt = sniff_archive_format(payload)
                try:
                    n_before = len(rows)
                    for name, data in iter_members(payload):
                        rows.append(
                            {"doc_id": _id, "decoded_ok": True,
                             "archive_format": fmt, "member_name": name,
                             "n_bytes": len(data),
                             "text": data.decode("utf-8", errors="replace")}
                        )
                    if len(rows) == n_before:  # valid but empty archive
                        rows.append(
                            {"doc_id": _id, "decoded_ok": True,
                             "archive_format": fmt, "member_name": None,
                             "n_bytes": 0, "text": None})
                except ArchiveError:
                    rows.append(
                        {"doc_id": _id, "decoded_ok": False,
                         "archive_format": None, "member_name": None,
                         "n_bytes": None, "text": None})
            yield pd.DataFrame(
                rows, columns=["doc_id", "decoded_ok", "archive_format",
                               "member_name", "n_bytes", "text"])

    from pyspark.sql import functions as F

    out = df.select(F.col(id_col), F.col(asset_col)).mapInPandas(
        run, ARCHIVE_MEMBERS_SCHEMA
    )
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out


# --------------------------------------------------------------- fixtures
def encode_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def encode_tar(
    members: dict[str, bytes], gz: bool = False, compression: str | None = None
) -> bytes:
    """Fixture tar; ``compression`` in (None, 'gz', 'xz', 'bz2') —
    ``gz=True`` is the legacy spelling of compression='gz'."""
    comp = compression or ("gz" if gz else None)
    if comp not in (None, "gz", "xz", "bz2"):
        raise ArchiveError(f"unsupported tar compression {comp!r}")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=f"w:{comp}" if comp else "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()
