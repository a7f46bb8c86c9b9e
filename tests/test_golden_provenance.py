"""Golden oracles carry verifiable provenance (ADVICE r02): each file
records the --sf-dir it was generated from plus a content fingerprint of
its source parquet, and the live testdata must still match."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from tools.make_golden import source_fingerprint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness SF

_SOURCE_TABLE = {
    "minhash_lsh": "documents",
    "simhash_near_dups": "documents",
    "doc_fingerprint": "documents",
    "ann_lsh_topk": "embeddings",
    "ann_ivf_topk": "embeddings",
    "cosine_lsh_pairs": "embeddings",
    "multimodal_features": None,  # synthetic generation spec, no sf source
    "multimodal_real_features": None,
    "multimodal_frame_sample": None,
}


def _goldens() -> list[str]:
    return sorted(glob.glob(os.path.join(GOLDEN_DIR, "*_sf001.parquet")))


def test_goldens_exist():
    names = {os.path.basename(p)[: -len("_sf001.parquet")] for p in _goldens()}
    assert names == set(_SOURCE_TABLE)


@pytest.mark.parametrize("path", _goldens(),
                         ids=lambda p: os.path.basename(p))
def test_golden_provenance_matches_live_testdata(path):
    name = os.path.basename(path)[: -len("_sf001.parquet")]
    meta = pq.read_schema(path).metadata or {}
    sf_dir = meta.get(b"flowforge_source_sf_dir", b"").decode()
    fp = meta.get(b"flowforge_source_fp", b"").decode()
    assert sf_dir and fp, f"{name}: missing provenance metadata"
    table = _SOURCE_TABLE[name]
    if table is None:
        assert sf_dir.startswith("synthetic")
        return
    assert sf_dir == ORACLE_SF_DIR, (
        f"{name} was generated from {sf_dir}, the driver oracles at "
        f"{ORACLE_SF_DIR} — regenerate via tools/make_golden.py"
    )
    live = source_fingerprint(os.path.join(sf_dir, f"{table}.parquet"))
    assert live == fp, f"{name}: source {table}.parquet changed since generation"
