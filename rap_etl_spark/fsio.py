"""Filesystem seam for the table layer (round-2 VERDICT item 6).

``ManifestParquetTable``'s driver-side metadata/commit/maintenance I/O goes
through this interface ONLY — never bare ``open``/``os.replace``/``flock``
— so the POSIX-only constraint of the sandbox implementation is an
explicit, swappable policy instead of an assumption smeared across
``lake.py``. Executor-side data I/O (the parquet write/scan itself) already
goes through Spark's Hadoop FileSystem layer and needs no seam.

Deployment matrix (also in README):

==========  ====================  =========================================
backend     class                 commit CAS primitive
==========  ====================  =========================================
local/NFS   ``PosixFS`` (here)    ``fcntl.flock`` + atomic ``os.replace``
HDFS        (plug in)             atomic ``rename`` + create-exclusive lock
                                  file (Hadoop FS API guarantees both)
S3/GCS      (plug in)             conditional PUT (``If-Match`` on the
                                  pointer object's ETag / generation
                                  precondition) — no lock file at all;
                                  ``CommitConflictError`` on precondition
                                  failure replaces the flock critical
                                  section
==========  ====================  =========================================

Only ``PosixFS`` ships in this repo: no HDFS/S3 endpoint exists in the
sandbox, and shipping an unexercisable client would be dead code. The
interface is sized so that each remote impl is a page of code: every
method is whole-file/whole-listing (no seeks, no partial writes), the only
atomic primitive required is "publish pointer iff unchanged", and
content-addressed bucket pages never need overwrite semantics.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager
from typing import Protocol, runtime_checkable


@runtime_checkable
class TableFS(Protocol):
    """The seam contract. Whole-file operations only; the single atomic
    primitive a backend must provide is "publish pointer iff unchanged"
    (commit_lock scoping read→CAS-check→swap, or a conditional PUT that
    raises CommitConflictError)."""

    def read_text(self, path: str) -> str: ...
    def open_binary(self, path: str): ...
    def exists(self, path: str) -> bool: ...
    def listdir(self, path: str) -> list[str]: ...
    def getmtime(self, path: str) -> float: ...
    def getsize(self, path: str) -> int: ...
    def write_text(self, path: str, data: str) -> None: ...
    def write_text_atomic(self, path: str, data: str) -> None: ...
    def makedirs(self, path: str) -> None: ...
    def remove(self, path: str) -> None: ...
    def rmtree(self, path: str) -> None: ...
    def rename(self, src: str, dst: str) -> None: ...
    def link_or_copy(self, src: str, dst: str) -> None: ...
    def copy(self, src: str, dst: str) -> None: ...
    def utime(self, path: str, times: tuple[float, float]) -> None: ...
    def commit_lock(self, path: str): ...


class PosixFS:
    """Local-filesystem implementation. Atomicity comes from same-directory
    ``os.replace``; mutual exclusion for the commit critical section from
    ``fcntl.flock`` (advisory, works across processes on one host — the
    honest limit of this backend: cross-HOST writers need the HDFS/S3
    impls above)."""

    # ---- reads ----
    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def open_binary(self, path: str):
        """File-like for driver-local binary reads (parquet footers)."""
        return open(path, "rb")

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    # ---- writes ----
    def write_text(self, path: str, data: str) -> None:
        """Write an IMMUTABLE file (content-addressed pages, snapshot
        roots): still staged + renamed so a concurrent reader never sees a
        torn file, but no overwrite semantics are required of the
        backend."""
        self.write_text_atomic(path, data)

    def write_text_atomic(self, path: str, data: str) -> None:
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def link_or_copy(self, src: str, dst: str) -> None:
        try:
            os.link(src, dst)
        except OSError:  # cross-device / fs refuses links
            shutil.copy2(src, dst)

    def copy(self, src: str, dst: str) -> None:
        shutil.copy2(src, dst)

    def utime(self, path: str, times: tuple[float, float]) -> None:
        os.utime(path, times)

    # ---- commit critical section ----
    @contextmanager
    def commit_lock(self, path: str):
        """Exclusive lock scoping the read-pointer → CAS-check → swap
        sequence. An object-store impl replaces this whole section with a
        conditional PUT and yields without locking."""
        import fcntl

        with open(path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)


POSIX_FS = PosixFS()
