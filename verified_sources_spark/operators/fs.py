"""Filesystem abstraction for the sink commit protocols.

``ParquetSink`` and ``ManifestTable`` used to commit with ``os.replace`` /
``shutil`` — correct on a driver-local POSIX disk, non-executable against
the object store where a 100 TB table actually lives.  Every metadata /
commit file operation now goes through this interface:

- ``LocalFS`` — plain ``os``/``shutil``; exact previous behavior.
- ``HadoopFS`` — delegates to the JVM's ``org.apache.hadoop.fs.FileSystem``
  resolved per-path, so the SAME sink code runs against ``file://``,
  ``hdfs://``, ``s3a://``, ``abfs://`` … wherever Spark itself can read.
  (Public Hadoop FileSystem API via py4j; no extra dependency — the class
  is already on Spark's classpath.)

Only driver-side METADATA traffic flows through here (manifest commits,
partition-directory swaps, staging renames); bulk data bytes are written
by Spark executors as before.  Atomicity notes:

- ``rename`` requires the destination not to exist (callers delete first)
  — that is the portable subset of Hadoop vs POSIX rename semantics.
- ``create_exclusive`` is atomic on POSIX (O_EXCL) and HDFS
  (``create(path, overwrite=false)`` is namenode-arbitrated); on S3-like
  stores it degrades to check-then-create — NOT atomic.

The commit atom itself is therefore pluggable (``CommitBackend``): the
table log needs exactly one primitive — put-if-absent on the next
manifest path — and each storage class has a different correct
implementation:

- ``FSCommitBackend``        POSIX / HDFS (exclusive create; the default);
- ``ConditionalPutCommitBackend``  object stores with conditional write
  (S3 ``If-None-Match: *`` PUT, GCS ``ifGenerationMatch=0``, Azure Blob
  ``If-None-Match: *``) — the store arbitrates the race;
- ``LockTableCommitBackend``  object stores WITHOUT conditional write:
  an external CAS coordinator (DynamoDB-conditional-put-shaped) elects
  the single writer of each manifest path first, then only the winner
  writes the file.
"""

from __future__ import annotations

import os
import posixpath
import shutil
import threading
import time
from collections.abc import Iterator
from urllib.parse import urlparse


def _is_local_uri(path: str) -> bool:
    scheme = urlparse(path).scheme
    # windows drive letters parse as single-char schemes; treat as local
    return scheme in ("", "file") or len(scheme) == 1


class FS:
    """Minimal driver-side filesystem surface the sinks need."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def size(self, path: str) -> int:
        """File length in bytes."""
        raise NotImplementedError

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Move a file or directory. The destination must not exist."""
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> None:
        """Create *path* with *text*; raise FileExistsError if present."""
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        """Create or overwrite *path* with *text* (no exclusivity — used
        only by commit backends that arbitrate exclusivity elsewhere)."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        """Create or overwrite *path* with binary *data* (Avro manifests,
        checkpoint payloads — anything not line-oriented)."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def walk(self, path: str) -> Iterator[tuple[str, list[str], list[str]]]:
        """os.walk-alike over (dirpath, dirnames, filenames), top-down."""
        raise NotImplementedError


class LocalFS(FS):
    """POSIX implementation — byte-for-byte the sinks' historical behavior."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        shutil.rmtree(path, ignore_errors=ignore_errors)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def create_exclusive(self, path: str, text: str) -> None:
        with open(path, "x") as f:
            f.write(text)

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def walk(self, path: str):
        yield from os.walk(path)


class HadoopFS(FS):
    """Hadoop FileSystem implementation resolved per-path from the active
    Spark session's Hadoop configuration. Runs against any scheme Spark
    can, including object stores — the 100 TB commit path."""

    def __init__(self, spark):
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _jfs(self, path: str):
        return self._jpath(path).getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        return bool(self._jfs(path).exists(self._jpath(path)))

    def isdir(self, path: str) -> bool:
        fs, p = self._jfs(path), self._jpath(path)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        fs, p = self._jfs(path), self._jpath(path)
        return [s.getPath().getName() for s in fs.listStatus(p)]

    def makedirs(self, path: str) -> None:
        self._jfs(path).mkdirs(self._jpath(path))

    def remove(self, path: str) -> None:
        self._jfs(path).delete(self._jpath(path), False)

    def size(self, path: str) -> int:
        return int(self._jfs(path).getFileStatus(self._jpath(path)).getLen())

    def rmtree(self, path: str, ignore_errors: bool = False) -> None:
        try:
            self._jfs(path).delete(self._jpath(path), True)
        except Exception:
            if not ignore_errors:
                raise

    def rename(self, src: str, dst: str) -> None:
        ok = self._jfs(src).rename(self._jpath(src), self._jpath(dst))
        if not ok:
            raise OSError(f"rename failed: {src} -> {dst}")

    def create_exclusive(self, path: str, text: str) -> None:
        if _is_local_uri(path):
            # Hadoop's RawLocalFileSystem create(overwrite=false) is a
            # check-then-create; POSIX O_EXCL is the real atomic primitive
            local = urlparse(path).path if path.startswith("file:") else path
            with open(local, "x") as f:
                f.write(text)
            return
        try:
            out = self._jfs(path).create(self._jpath(path), False)
        except Exception as e:  # Py4JJavaError wrapping FileAlreadyExists
            if "AlreadyExists" in str(e):
                raise FileExistsError(path) from e
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._jfs(path).create(self._jpath(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._jfs(path).create(self._jpath(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, path: str) -> bytes:
        stream = self._jfs(path).open(self._jpath(path))
        try:
            return bytes(self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()

    def walk(self, path: str):
        fs, p = self._jfs(path), self._jpath(path)
        if not fs.exists(p):
            return
        dirs, files = [], []
        for s in fs.listStatus(p):
            (dirs if s.isDirectory() else files).append(s.getPath().getName())
        yield path, dirs, files
        for d in dirs:
            yield from self.walk(posixpath.join(path, d))


# --------------------------------------------------------------------------
# Commit backends: the pluggable put-if-absent atom of the table log.
# --------------------------------------------------------------------------


class CommitBackend:
    """Put-if-absent on a manifest path — ManifestTable's ONE commit atom.

    Contract: ``put_if_absent(path, text)`` either durably creates *path*
    with *text* such that any subsequent reader sees it, or raises
    ``FileExistsError`` — and under N concurrent callers for the same
    path, EXACTLY one succeeds.  Everything else in the table format
    (snapshot isolation, idempotent streaming batches, time travel) is
    built on this single guarantee.
    """

    def put_if_absent(self, path: str, text: str) -> None:
        raise NotImplementedError


class FSCommitBackend(CommitBackend):
    """Exclusive create on the filesystem — the default backend.

    Truly atomic on POSIX (``O_EXCL``) and HDFS (``create(path,
    overwrite=false)`` is arbitrated by the namenode).  On S3A this
    degrades to check-then-create: use ``ConditionalPutCommitBackend`` or
    ``LockTableCommitBackend`` there instead.
    """

    def __init__(self, fs: FS):
        self.fs = fs

    def put_if_absent(self, path: str, text: str) -> None:
        self.fs.create_exclusive(path, text)


class ConditionalPutCommitBackend(CommitBackend):
    """Conditional-write object stores: the store arbitrates the race.

    ``store`` is any client exposing ``put_if_none_match(path, data:
    bytes) -> bool`` — True iff the object was created because no object
    existed (S3 ``PutObject`` with ``If-None-Match: *``, GCS insert with
    ``ifGenerationMatch=0``, Azure Blob ``Put Blob`` with ``If-None-Match:
    *``).  All current major object stores support one of these, which
    makes this the preferred 100 TB backend; the HTTP client itself is
    environment-specific and injected, not vendored here.
    """

    def __init__(self, store):
        self.store = store

    def put_if_absent(self, path: str, text: str) -> None:
        if not self.store.put_if_none_match(path, text.encode("utf-8")):
            raise FileExistsError(path)


class Coordinator:
    """External CAS service electing the single writer of a key.

    ``try_claim(key, owner)`` returns True iff *owner* now holds the
    claim: first-claimer wins, re-claims by the SAME owner stay True
    (idempotent retry), and a claim whose age exceeds the coordinator's
    TTL may be stolen — the crashed-winner escape hatch.  Production
    shape: a DynamoDB/Spanner row per key written with a conditional put
    of ``attribute_not_exists(key) OR expiry < now``.
    """

    def try_claim(self, key: str, owner: str) -> bool:
        raise NotImplementedError


class InProcessCoordinator(Coordinator):
    """Reference Coordinator for single-process multi-writer drivers and
    for tests; claim table under one mutex, monotonic-clock TTL."""

    def __init__(self, ttl_s: float = 300.0, clock=time.monotonic):
        self.ttl_s = ttl_s
        self._clock = clock
        self._lock = threading.Lock()
        self._claims: dict[str, tuple[str, float]] = {}

    def try_claim(self, key: str, owner: str) -> bool:
        with self._lock:
            now = self._clock()
            cur = self._claims.get(key)
            if cur is not None and cur[0] != owner and (now - cur[1]) < self.ttl_s:
                return False
            self._claims[key] = (owner, now)
            return True


class LockTableCommitBackend(CommitBackend):
    """CAS-coordinator fallback for stores WITHOUT conditional write.

    Two-step commit: (1) win the claim on the manifest path in the
    external ``Coordinator``; (2) only the winner writes the file — a
    plain overwrite is safe because exclusivity was already arbitrated.
    A pre-claim existence check makes an already-committed path fail
    fast without burning a claim.

    The TTL caveat is fundamental to lock-with-expiry (no fencing
    tokens): the coordinator TTL must exceed the worst-case manifest
    write time, or a stalled winner and its thief can both write.
    Manifest writes are one small JSON object, so a TTL in minutes
    leaves orders of magnitude of headroom.
    """

    def __init__(self, coordinator: Coordinator, fs: FS, owner: str | None = None):
        self.coordinator = coordinator
        self.fs = fs
        self.owner = owner or f"{os.getpid()}-{id(self):x}"

    def put_if_absent(self, path: str, text: str) -> None:
        if self.fs.exists(path):
            raise FileExistsError(path)
        if not self.coordinator.try_claim(path, self.owner):
            raise FileExistsError(path)
        # claim won but the file may have landed between check and claim
        # (a prior winner's write racing our check): re-check before the
        # non-exclusive write.
        if self.fs.exists(path):
            raise FileExistsError(path)
        self.fs.write_text(path, text)
