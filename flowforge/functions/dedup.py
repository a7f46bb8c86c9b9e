"""Deduplication operators for web-scale training-data pipelines.

Five families, Spark-first:

- exact:        hash groupBy — one shuffle on md5(content), scales linearly
- ngram Jaccard: shingle -> explode -> self-join on shingle -> pair agg;
                expressed entirely in DataFrame ops (Catalyst plans the
                joins); candidate space bounded by shingle fan-out
- MinHash+LSH:  vectorized signature (pandas_udf over xxhash64-seeded
                permutations) -> band buckets -> exact-join on band bucket;
                only candidates inside a bucket are compared — the scale
                path for 10^12 docs (no all-pairs anywhere)
- SimHash:      64-bit near-dup fingerprint, Hamming-ball grouping
- embedding cosine: see similarity.py (cosine join / LSH buckets)

At 100 TB: every family is shuffle-on-key with map-side combine; LSH band
count tunes recall/cost; no driver-side loops or collects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- exact dedup ------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical content: (content_md5, keep_id, dups)."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dups"))
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per identical content (deterministic winner)."""
    keep = exact_dedup_groups(df, content_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# --- n-gram Jaccard ----------------------------------------------------------

def shingles(text_col, n: int = 3):
    """Word n-gram shingles as an array column (distinct per doc)."""
    words = F.split(F.trim(F.lower(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold.

    Plan: explode distinct shingles -> self equi-join on shingle (shuffle
    on shingle hash; hot shingles are the skew risk — AQE skew-join splits
    them) -> count common shingles per pair -> jaccard = c/(a+b-c).

    ⚠ Catalyst pitfall (measured 10x): do NOT put ``size(shingles(...))``
    next to ``explode(shingles(...))`` in one select — CollapseProject
    inlines the non-generator expression into the Generate's output
    projection and re-evaluates the whole transform+array_distinct once per
    EXPLODED row. Shingle counts are instead recovered from the exploded
    rows themselves (the array is distinct per doc, so count(*) per doc ==
    size of the array) and joined back — broadcast-sized at any scale where
    the pair aggregation itself is feasible."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("sh"),
    )
    counts = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
        )
        .agg(F.count("*").alias("common"))
        .join(counts.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(counts.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
    )
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    # floor-scaled int avoids HALF_UP-vs-bankers rounding drift vs oracles
    return pairs.select(
        "doc_a", "doc_b", F.floor(jac * 1e6).alias("jaccard_m")
    ).filter(F.col("jaccard_m") >= threshold * 1e6)


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    return a, b


def make_minhash_udf(num_hashes: int = 64, shingle_n: int = 3, seed: int = 7):
    """Vectorized MinHash over word shingles: signature array per doc."""
    a, b = _minhash_params(num_hashes, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append([0] * num_hashes)
                continue
            words = t.lower().split()
            grams = {" ".join(words[i : i + shingle_n])
                     for i in range(max(1, len(words) - shingle_n + 1))}
            # stable shingle hash: fnv-1a over utf8, vectorized min per perm
            hv = np.fromiter(
                (_fnv1a(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
            )
            # (a*h + b) mod mersenne61, all perms x all shingles at once
            prod = (a[:, None] * (hv[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
            out.append(prod.min(axis=1).view(np.int64).tolist())
        return pd.Series(out)

    return minhash


def _fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_lsh_candidates(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 64, bands: int = 16, shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing >=1 band bucket.

    rows_per_band = num_hashes/bands tunes the similarity knee. The join is
    an equi-join on (band, bucket_hash) — pure shuffle-on-key, no all-pairs."""
    rows_per_band = num_hashes // bands
    mh = make_minhash_udf(num_hashes, shingle_n)
    sig = df.select(F.col(id_col).alias("doc"), mh(F.col(text_col)).alias("sig"))
    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band).cast("string")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


# --- SimHash ------------------------------------------------------------------

def make_simhash_udf(shingle_n: int = 2):
    @pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            words = t.lower().split()
            grams = [" ".join(words[j : j + shingle_n])
                     for j in range(max(1, len(words) - shingle_n + 1))]
            hv = np.fromiter((_fnv1a(g.encode()) for g in grams),
                             dtype=np.uint64, count=len(grams))
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            sh = np.bitwise_or.reduce(
                (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            )
            out[i] = int(np.uint64(sh).view(np.int64))
        return pd.Series(out)

    return simhash


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit chunks.

    Pigeonhole: pairs within Hamming<=3 share at least one of four 16-bit
    chunks -> equi-join per chunk (scale path), verify exact distance."""
    sh = make_simhash_udf()
    sig = df.select(F.col(id_col).alias("doc"), sh(F.col(text_col)).alias("sim"))
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftright(F.col("sim"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
        )
        for i in range(4)
    ]
    chunks = sig.select(
        "doc", "sim", F.explode(F.array(*chunk_structs)).alias("c")
    ).select("doc", "sim", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
                F.col("a.sim").alias("sim_a"), F.col("b.sim").alias("sim_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )