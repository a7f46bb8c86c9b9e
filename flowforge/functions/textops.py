"""Text-analysis operators for a training-data pipeline, Spark-first.

All hot-path operators are pure Column expressions (JVM-side, codegen'd);
the only Python is the vectorized rolling-hash fingerprint (pandas_udf,
Arrow-batched). Designed for the `documents`/web-text tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# per-language characteristic n-grams (mirrors datagen vocab syllables —
# a deliberately simple, deterministic n-gram language-ID heuristic)
LANG_NGRAMS: dict[str, list[str]] = {
    "en": ["the", "ing", "tion", "er", "an"],
    "de": ["der", "die", "und", "sch", "ich"],
    "fr": ["le", "la", "ment", "que", "des"],
    "es": ["el", "que", "cion", "los", "una"],
    "zh": ["zhong", "guo", "ren", "sheng", "gong"],
    "ru": ["pro", "nost", "stvo", "eni", "ova"],
    "ja": ["shi", "ka", "no", "ta", "wo"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word pieces + digits + punctuation runs.

    A regex approximation of subword tokenization: sequences of up to 4
    letters, digit runs, and single punctuation marks each count as one
    token (a common heuristic ~4 chars/token)."""
    pieces = F.regexp_extract_all(text, F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces).cast("int")


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    return (punct / F.greatest(F.length(text), F.lit(1))).cast("double")


def stopword_ratio(text: Column) -> Column:
    words = F.split(F.trim(F.lower(text)), r"\s+")
    stops = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    return (stops / F.greatest(F.size(words), F.lit(1))).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: length band + punctuation
    sanity + mean word length band (the usual web-text pre-filters)."""
    n = F.length(text)
    toks = token_count(text)
    mean_word = n / F.greatest(toks, F.lit(1))
    len_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.0)
    word_ok = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.1, 1.0).otherwise(0.0)
    return ((len_ok + word_ok + punct_ok) / F.lit(3.0)).cast("double")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language n-gram hit counts (the evidence for :func:`lang_id`)."""
    out = {}
    for lang, grams in LANG_NGRAMS.items():
        score = None
        for g in grams:
            c = F.size(F.regexp_extract_all(text, F.lit(g), 0))
            score = c if score is None else score + c
        out[lang] = score.cast("int")
    return out


def lang_id(text: Column) -> Column:
    """N-gram heuristic language ID: argmax of per-language hit counts,
    ties broken by language code order, 'other' when no evidence."""
    scores = lang_scores(text)
    pairs = [F.struct(v.alias("s"), F.lit(k).alias("l")) for k, v in sorted(scores.items())]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("other"))


@pandas_udf(T.LongType())
def xor_checksum(values: pd.Series) -> int:
    """UDAF (pandas grouped-agg): order-insensitive XOR fold of int64 row
    hashes — a per-group content checksum that is stable under shuffling
    and repartitioning (XOR commutes), which Spark has no builtin
    aggregate for. Used to audit group/partition content equality between
    pipeline stages without sorting anything."""
    arr = values.to_numpy(dtype=np.int64)
    if arr.size == 0:
        return 0
    return int(np.bitwise_xor.reduce(arr))


@pandas_udf(T.LongType())
def _pd_count(values: pd.Series) -> int:
    # grouped-agg pandas UDFs cannot mix with builtin aggregates in one
    # agg(), so the row count rides as a second pandas UDAF
    return len(values)


def group_checksum(df, group_cols: list[str], content_col: str):
    """Per-group order-insensitive content digest: md5 the content, take a
    60-bit integer prefix, XOR-fold per group (the UDAF above).

    NULL content coalesces to 0 — the XOR identity — so it contributes
    nothing, matching DuckDB bit_xor's NULL-skipping. The coalesce also
    keeps the hash series int64 end-to-end: any null would make pandas
    surface the whole series as float64, rounding 60-bit hashes at the
    53-bit mantissa."""
    row_h = F.coalesce(
        F.conv(F.substring(F.md5(content_col), 1, 15), 16, 10).cast("long"),
        F.lit(0),
    )
    return df.groupBy(*group_cols).agg(
        xor_checksum(row_h).alias("checksum"),
        _pd_count(row_h).alias("cnt"),
    )


_FP_C1 = np.uint64(0x9E3779B97F4A7C15)
_FP_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _fingerprint_bytes(b: bytes) -> int:
    """64-bit order-sensitive document fingerprint of one blob.

    Pad to 8-byte words, mix each word with its position, multiply-rotate,
    XOR-reduce (uint64 wraparound is the modulus). Deterministic across
    runs/platforms; position mixing makes it order-sensitive. Kept as the
    single-doc reference; the UDF computes the identical value batch-wide
    (pinned against tools/make_golden.py's pure-Python derivation)."""
    if not b:
        return 0
    pad = (-len(b)) % 8
    arr = np.frombuffer(b + b"\x00" * pad, dtype="<u8")
    idx = np.arange(arr.size, dtype=np.uint64)
    h = (arr ^ (idx * _FP_C2)) * _FP_C1
    rot = (idx & np.uint64(63))
    h = (h << rot) | (h >> (np.uint64(64) - rot) % np.uint64(64))
    with np.errstate(over="ignore"):  # uint64 wraparound is the modulus
        out = np.uint64(len(b)) * _FP_C2
    out = out ^ np.bitwise_xor.reduce(h)
    return int(out.view(np.int64))


@pandas_udf(T.LongType())
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Batch-wide 64-bit rolling document fingerprint (Arrow-batched).

    One concatenated 8-aligned buffer for the whole batch: every doc is
    scatter-copied to an aligned offset, all words are mixed/rotated in one
    vectorized pass with PER-DOC word indices, and per-doc XOR reduction is
    ``np.bitwise_xor.reduceat`` — no per-row Python anywhere (same pattern
    as dedup._fnv1a_batch)."""
    arr = pa.Array.from_pandas(texts, type=pa.large_string()).cast(pa.large_binary())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=len(arr) + 1, offset=arr.offset * 8)
    data_buf = arr.buffers()[2]
    flat = (np.frombuffer(data_buf, dtype=np.uint8, count=int(offsets[-1]))
            if data_buf is not None and offsets[-1] > offsets[0]
            else np.zeros(0, dtype=np.uint8))
    lens = np.diff(offsets)
    null_mask = ~np.asarray(arr.is_valid(), dtype=bool) if arr.null_count else None

    padded_lens = ((lens + 7) // 8) * 8
    dst_offsets = np.concatenate(([0], np.cumsum(padded_lens)))
    buf = np.zeros(int(dst_offsets[-1]), dtype=np.uint8)
    n0 = int(offsets[0])  # sliced arrays carry absolute offsets
    total = int(offsets[-1]) - n0
    if total:
        src = flat[n0: n0 + total]
        # scatter-copy each doc to its 8-aligned start: one fancy-index store
        shift = np.repeat(dst_offsets[:-1] - (offsets[:-1] - n0), lens)
        buf[np.arange(total, dtype=np.int64) + shift] = src
    words = buf.view("<u8")
    word_starts = (dst_offsets[:-1] // 8).astype(np.int64)
    words_per_doc = (padded_lens // 8).astype(np.int64)

    idx = np.arange(words.size, dtype=np.uint64)
    idx -= np.repeat(word_starts.astype(np.uint64), words_per_doc)
    h = (words ^ (idx * _FP_C2)) * _FP_C1
    rot = idx & np.uint64(63)
    h = (h << rot) | (h >> (np.uint64(64) - rot) % np.uint64(64))

    out = np.zeros(len(texts), dtype=np.uint64)
    nonempty = words_per_doc > 0
    if nonempty.any():
        red = np.bitwise_xor.reduceat(h, word_starts[nonempty])
        with np.errstate(over="ignore"):
            out[nonempty] = (lens[nonempty].astype(np.uint64) * _FP_C2) ^ red
    if null_mask is not None:
        out[null_mask] = 0
    return pd.Series(out.view(np.int64))
