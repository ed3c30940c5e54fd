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

Two implementations ship: ``PosixFS`` (local/NFS) and ``ObjectStoreFS``
— the S3/GCS CONTRACT (whole-object PUT, copy+delete rename, conditional
create-exclusive lock object, no flock, no atomic rename) exercised
in-sandbox against local disk, with each method documenting its one-call
boto3 mapping. No real S3 endpoint exists here, so the network client
itself would be unexercisable dead code; the semantics the engine must
survive are what ``ObjectStoreFS`` pins (tests/test_objectstore_fs.py
runs the full table lifecycle and a genuine concurrent-writer race over
it). The interface is sized so that each remote impl is a page of code:
every method is whole-file/whole-listing (no seeks, no partial writes),
the only atomic primitive required is "publish pointer iff unchanged",
and content-addressed bucket pages never need overwrite semantics.
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
    def write_bytes(self, path: str, data: bytes) -> None: ...
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
        self.write_bytes(path, data.encode("utf-8"))

    def write_bytes(self, path: str, data: bytes) -> None:
        """THE staged-write primitive (text writes delegate here):
        scratch file + same-directory os.replace, so readers never see a
        torn file. Also used directly for immutable binary sidecars
        (bloom blobs)."""
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
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


class ObjectStoreFS:
    """Object-store-semantics backend (S3/GCS contract), exercised
    in-sandbox against local disk.

    The engine-visible contract is exactly what S3 gives you — and
    deliberately NOT what POSIX gives you:

    - **No atomic rename.** ``rename`` is server-side COPY + DELETE, two
      separate non-atomic operations (S3 has no rename). The table layer
      tolerates this because every published filename is snapshot-unique
      and a manifest references a file only after its copy completed.
    - **No flock.** The commit critical section is a create-exclusive
      LOCK OBJECT — S3 conditional write ``PUT If-None-Match: *`` — with
      a TTL lease so a crashed committer cannot wedge the table (the next
      committer takes the stale lock over).
    - **Whole-object PUT is the only write primitive.** A PUT is atomic
      and last-writer-wins; there are no partial writes to observe.

    Per-method mapping to the real client is one boto3 call each
    (docstrings below); swapping the primitives makes this the production
    S3 client, which is why the simulation is worth its ~60 lines.

    Local-simulation note: S3 guarantees a PUT becomes visible atomically
    (readers see the old object or the new one, never a torn write).
    ``_put`` reproduces that *guarantee* with a scratch-file write + one
    same-directory rename. That rename is simulation plumbing for S3's
    own atomicity — the engine above this seam never performs or assumes
    a rename (see ``rename`` below, which is copy+delete).
    """

    #: lease on the commit lock object; a lock older than this is stale
    #: (committer crashed mid-commit) and may be taken over
    LOCK_TTL_SEC = 30.0

    def __init__(self, lock_ttl_sec: float | None = None):
        if lock_ttl_sec is not None:
            self.LOCK_TTL_SEC = lock_ttl_sec

    # ---- reads (GET / HEAD / LIST) ----
    def read_text(self, path: str) -> str:
        """GetObject."""
        with open(path) as f:
            return f.read()

    def open_binary(self, path: str):
        """GetObject (streaming body) for driver-local parquet footers."""
        return open(path, "rb")

    def exists(self, path: str) -> bool:
        """HeadObject / ListObjectsV2 prefix probe."""
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        """ListObjectsV2 with delimiter (one page; table dirs are small —
        data-file listings come from the manifest, never from LIST)."""
        return os.listdir(path)

    def getmtime(self, path: str) -> float:
        """HeadObject Last-Modified."""
        return os.path.getmtime(path)

    def getsize(self, path: str) -> int:
        """HeadObject Content-Length."""
        return os.path.getsize(path)

    # ---- writes (PUT / COPY / DELETE) ----
    def _put(self, path: str, data: bytes) -> None:
        # simulation of S3's atomic whole-object PUT visibility — see
        # class docstring; not an engine-visible primitive
        import uuid

        tmp = f"{path}.put-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def write_text(self, path: str, data: str) -> None:
        """PutObject (immutable content-addressed pages, snapshot roots)."""
        self._put(path, data.encode("utf-8"))

    def write_text_atomic(self, path: str, data: str) -> None:
        """PutObject — a PUT is atomic and last-writer-wins by contract;
        called only inside ``commit_lock``'s critical section, which is
        what makes the read→check→swap sequence safe."""
        self._put(path, data.encode("utf-8"))

    def write_bytes(self, path: str, data: bytes) -> None:
        """PutObject (immutable binary sidecar, e.g. bloom blobs)."""
        self._put(path, data)

    def makedirs(self, path: str) -> None:
        """No-op concept on a key-value store (prefixes need no creation);
        materialized locally so the simulation can host scratch files."""
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        """DeleteObject."""
        os.remove(path)

    def rmtree(self, path: str) -> None:
        """ListObjectsV2 + DeleteObjects batch on the prefix."""
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        """CopyObject + DeleteObject — NON-atomic two-step, exactly S3's
        contract (there is no rename). Safe above the seam: destination
        names are snapshot-unique, so a crash between the two steps
        leaves either an unreferenced copy (orphan GC sweeps it) or the
        source intact (the commit never published)."""
        shutil.copy2(src, dst)
        os.remove(src)

    def link_or_copy(self, src: str, dst: str) -> None:
        """CopyObject — object stores have no hard links; clone() degrades
        to server-side copy, which S3 performs without data movement
        through the client."""
        shutil.copy2(src, dst)

    def copy(self, src: str, dst: str) -> None:
        """CopyObject."""
        shutil.copy2(src, dst)

    def utime(self, path: str, times: tuple[float, float]) -> None:
        """No direct S3 analogue (Last-Modified is server-set); used only
        by tests to age files past grace windows, kept for seam parity."""
        os.utime(path, times)

    # ---- commit critical section ----
    @contextmanager
    def commit_lock(self, path: str):
        """Create-exclusive lock object: ``PUT If-None-Match: *`` (S3
        conditional writes, GA 2024-08) — succeeds only if no live lock
        object exists. A lock older than LOCK_TTL_SEC is a crashed
        committer's lease and is deleted + retaken. GCS equivalent:
        ``x-goog-if-generation-match: 0``."""
        import json as _json
        import time
        import uuid

        lock_obj = path + ".obj"
        me = uuid.uuid4().hex

        def _owner_of() -> str | None:
            try:
                with open(lock_obj) as f:
                    return _json.loads(f.read()).get("owner")
            except (OSError, ValueError):
                return None

        deadline = time.monotonic() + max(self.LOCK_TTL_SEC * 4, 60.0)
        while True:
            try:
                fd = os.open(lock_obj, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(_json.dumps({"owner": me, "ts": time.time()}))
                break
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock_obj)
                    if age > self.LOCK_TTL_SEC:
                        # stale lease takeover — CONDITIONAL delete (the
                        # S3 DeleteObject If-Match analogue): read the
                        # lease we observed as stale, re-verify age, and
                        # only then sweep. A second waiter that lost this
                        # race sees a FRESH lock (different owner / young
                        # mtime) and must NOT delete it — unconditional
                        # remove here let two waiters leapfrog each other's
                        # new leases and collapse mutual exclusion.
                        stale = _owner_of()
                        if (
                            stale is not None
                            and time.time() - os.path.getmtime(lock_obj)
                            > self.LOCK_TTL_SEC
                        ):
                            os.remove(lock_obj)
                        continue
                except OSError:
                    continue  # holder released between probe and stat
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock {lock_obj} held past deadline"
                    ) from None
                time.sleep(0.01)
        try:
            yield
        finally:
            # release ONLY our own lease: if we stalled past the TTL a
            # waiter legitimately took over, and deleting the lock now
            # would hand a third committer entry while the taker-over is
            # still inside the critical section
            if _owner_of() == me:
                try:
                    os.remove(lock_obj)
                except OSError:
                    pass  # TTL takeover swept it between check and remove


POSIX_FS = PosixFS()
