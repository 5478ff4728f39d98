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
- ``create_exclusive`` is the commit atom for ManifestTable.  It is truly
  atomic on POSIX (O_EXCL) and HDFS (``create(path, overwrite=false)``);
  on S3-like stores it is best-effort exactly as a Delta commit is without
  a coordinating LogStore service — pair with an external lock there.
"""

from __future__ import annotations

import os
import posixpath
import shutil
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

    def read_text(self, path: str) -> str:
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

    def read_text(self, path: str) -> str:
        with open(path) as f:
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

    def read_text(self, path: str) -> str:
        stream = self._jfs(path).open(self._jpath(path))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
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
