"""Commit-store seam for table-format metadata: the tiny key/value substrate
the snapshot table (io/snapshot_table.py) and streaming fanout markers
(streaming/jobs.py) commit through.

The reference dispatches all IO through a storage abstraction
(src/bears/reader/Reader.py:81-116, writer/dataframe/DataFrameWriter.py:99-307)
so the same code runs on local disk or S3. This seam plays that role for the
COMMIT PROTOCOL only — bulk data files are written by Spark itself, which
already speaks every Hadoop filesystem; what needs a portability seam is the
handful of small, atomic metadata operations a table format is built from:

* ``put_if_absent`` — compare-and-swap on key existence. This is the commit
  primitive: two writers racing to publish manifest v(N+1) both call
  put_if_absent; exactly one wins, the loser re-reads the new parent and
  retries. Object stores provide it natively (S3 ``If-None-Match:*``, GCS
  ``ifGenerationMatch=0``, Azure ``If-None-Match``); the local-fs
  implementation uses hard-link publication (write tmp, ``os.link`` — link
  fails atomically if the target exists, and the target only ever appears
  with its full contents).
* ``replace`` — last-writer-wins atomic overwrite, for advisory pointers.
* ``read`` / ``list_prefix`` / ``delete`` / ``exists`` — the rest of what a
  manifest log needs.

Keys are plain paths (slash-separated); values are small byte strings
(manifests, markers, pointers) — never bulk data.
"""

from __future__ import annotations

import os
import threading
import uuid
from abc import ABC, abstractmethod


class CommitConflictError(RuntimeError):
    """put_if_absent lost the race: the key already exists (another committer
    published this version first). Re-read the parent and retry."""


class CommitStore(ABC):
    @abstractmethod
    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` with ``data``. True if this call created
        it; False if the key already existed (contents untouched)."""

    @abstractmethod
    def replace(self, key: str, data: bytes) -> None:
        """Atomically overwrite ``key`` (create if absent), last writer wins.
        Readers never observe a partial value."""

    @abstractmethod
    def read(self, key: str) -> bytes:
        """Return the full value of ``key``; raise FileNotFoundError if absent."""

    @abstractmethod
    def list_prefix(self, prefix: str) -> list[str]:
        """All keys under ``prefix`` (a directory-like namespace), sorted."""

    @abstractmethod
    def delete(self, key: str) -> None:
        """Remove ``key``; absent keys are a no-op."""

    def exists(self, key: str) -> bool:
        try:
            self.read(key)
            return True
        except FileNotFoundError:
            return False


class LocalCommitStore(CommitStore):
    """Default store over a driver-visible filesystem (local disk, NFS, fuse).

    put_if_absent publishes via hard link: the value is written to a private
    tmp file, then ``os.link(tmp, key)`` — POSIX guarantees link() fails with
    EEXIST if the target exists and otherwise makes the COMPLETE file visible
    in one metadata operation, so concurrent committers serialize correctly
    and readers never see a torn manifest."""

    def _tmp(self, key: str) -> str:
        return f"{key}.{uuid.uuid4().hex}.tmp"

    def put_if_absent(self, key: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = self._tmp(key)
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, key)
            return True
        except FileExistsError:
            return False
        except OSError:
            # filesystem without hard links (some fuse/SMB mounts):
            # O_CREAT|O_EXCL is still an atomic existence claim; the value
            # lands right after, so a concurrent reader can briefly see a
            # short file — acceptable for the fallback tier (readers of
            # manifests retry on JSON parse failure at a higher level;
            # object stores use conditional put and never hit this path)
            try:
                fd = os.open(key, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
            return True
        finally:
            os.unlink(tmp)

    def replace(self, key: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = self._tmp(key)
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)

    def read(self, key: str) -> bytes:
        with open(key, "rb") as f:
            return f.read()

    def list_prefix(self, prefix: str) -> list[str]:
        if not os.path.isdir(prefix):
            return []
        return sorted(
            os.path.join(prefix, n)
            for n in os.listdir(prefix)
            if not n.endswith(".tmp")
        )

    def delete(self, key: str) -> None:
        try:
            os.unlink(key)
        except FileNotFoundError:
            pass


class InMemoryCommitStore(CommitStore):
    """Mock object store for tests: a dict guarded by a lock, with the same
    CAS semantics as S3 conditional put. Lets multi-writer conflict behavior
    be asserted without a real object store (tests/test_snapshot_table.py)."""

    def __init__(self) -> None:
        self._data: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.cas_failures = 0  # observability for tests

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            if key in self._data:
                self.cas_failures += 1
                return False
            self._data[key] = data
            return True

    def replace(self, key: str, data: bytes) -> None:
        with self._lock:
            self._data[key] = data

    def read(self, key: str) -> bytes:
        with self._lock:
            if key not in self._data:
                raise FileNotFoundError(key)
            return self._data[key]

    def list_prefix(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        with self._lock:
            return sorted(k for k in self._data if k.startswith(p))

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)
