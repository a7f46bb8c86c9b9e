"""Commit / lineage / resume protocol for the chunk store.

Abstraction point for the table catalog (SURVEY §7.0): on a cluster with
``iceberg-spark-runtime`` on the classpath, the chunk and metadata tables
would live in an Iceberg catalog and commits would be Iceberg snapshot
appends. This sandbox bundles no Iceberg jar (verified), so the fallback —
same semantics — is a Parquet directory plus a JSON manifest with
atomic-rename commits:

    <out_dir>/
      _manifest/table.json            table-level meta (schema, params)
      _manifest/commit-<bucket>.json  per-bucket lineage + metrics record
      chunks/column=<name>/bucket-<id>.parquet

A bucket is the commit unit (the analog of the reference's per-log-type
writer flush, core/parquet.go:160-197, made idempotent): chunk files are
written to a temp name and atomically renamed, then the commit record lands.
Resume = the set difference of planned buckets minus committed buckets; a
re-run never re-encodes a committed bucket and, because every codec is
deterministic, produces a byte-identical final state.
"""

from __future__ import annotations

import json
import os
import re
import uuid

_COMMIT_RE = re.compile(r"^commit-(\d+)\.json$")


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")

    # --- table meta ---------------------------------------------------------

    def write_table_meta(self, meta: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        self._atomic_write(os.path.join(self.dir, "table.json"), json.dumps(meta))

    def read_table_meta(self) -> dict:
        with open(os.path.join(self.dir, "table.json")) as f:
            return json.load(f)

    # --- bucket commits -------------------------------------------------------

    def committed_buckets(self) -> set[int]:
        if not os.path.isdir(self.dir):
            return set()
        out = set()
        for name in os.listdir(self.dir):
            m = _COMMIT_RE.match(name)
            if m:
                out.add(int(m.group(1)))
        return out

    def commit_bucket(self, bucket: int, record: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(self.dir, f"commit-{bucket}.json")
        self._atomic_write(path, json.dumps(record))

    def read_commits(self) -> list[dict]:
        out = []
        for b in sorted(self.committed_buckets()):
            with open(os.path.join(self.dir, f"commit-{b}.json")) as f:
                out.append(json.load(f))
        return out

    # --- chunk files ----------------------------------------------------------

    def chunk_path(self, column: str, bucket: int) -> str:
        return os.path.join(self.out_dir, "chunks", f"column={column}",
                            f"bucket-{bucket:06d}.parquet")

    @staticmethod
    def _atomic_write(path: str, content: str) -> None:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)

    @staticmethod
    def atomic_rename(tmp: str, final: str) -> None:
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(tmp, final)
