"""Deterministic synthetic Common-Crawl-style web-pages table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url:string  warc_ts:timestamp  html:binary  text:string  lang:string

Properties engineered to exercise the engine:
- url: Zipf(1.2) host distribution -> host-level skew the salting must defuse
- warc_ts: near-sorted (+-300 s jitter) -> small frame-of-reference deltas
- html: repetitive tag soup with long runs, 2% null, 0.5% non-UTF8 bytes
- text: seeded corpus slices, 50-2000 chars, language-consistent with lang
- lang: 8-way categorical, en-heavy -> dictionary codec winner

Everything is keyed off one integer seed; byte-stable across runs and
machines (no dict-iteration or hash-seed nondeterminism).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in unix micros

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "other"]
LANG_P = [0.55, 0.10, 0.08, 0.08, 0.07, 0.05, 0.04, 0.03]

_PATH_TOKENS = [
    "news", "article", "2026", "sports", "tech", "index", "page", "world",
    "local", "blog", "post", "item", "view", "cat", "tag", "archive",
]

_HTML_TEMPLATES = [
    (f'<div class="c{i}"><span>item {i}</span><p>lorem ipsum dolor sit amet '
     f'consectetur adipiscing elit {i}</p></div>').encode()
    for i in range(32)
]


def _vocab(lang: str, rng: np.random.Generator) -> list[str]:
    """500-word deterministic per-language vocabulary."""
    syllables = {
        "en": ["the", "ing", "tion", "er", "an", "re", "on", "at", "en", "ed"],
        "de": ["der", "die", "und", "ung", "sch", "ein", "ich", "ber", "gen", "zu"],
        "fr": ["le", "la", "de", "ment", "tion", "que", "des", "une", "eur", "ais"],
        "es": ["el", "la", "de", "que", "cion", "los", "una", "por", "con", "ado"],
        "zh": ["zhong", "guo", "ren", "min", "da", "xue", "sheng", "huo", "gong", "zuo"],
        "ru": ["pro", "nost", "stvo", "eni", "ova", "pri", "raz", "pod", "nie", "kov"],
        "ja": ["shi", "ka", "no", "ta", "ni", "wo", "ga", "de", "to", "mo"],
        "other": ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st"],
    }[lang]
    syl = np.array(syllables)
    parts = rng.integers(0, len(syl), size=(500, 3))
    return ["".join(syl[row]) for row in parts]


def _corpus(lang: str, rng: np.random.Generator, words: int = 60_000) -> str:
    vocab = np.array(_vocab(lang, rng))
    idx = rng.integers(0, vocab.size, size=words)
    return " ".join(vocab[idx])


def make_webpages(rows: int, seed: int = SEED, id_offset: int = 0) -> pa.Table:
    """``id_offset`` shifts the row-id space (url ``?id=`` suffix and the
    timestamp ramp) so independently generated drops — e.g. streaming
    appends — have disjoint urls, like successive WARC segments."""
    rng = np.random.default_rng(seed)

    # --- lang ---
    lang_idx = rng.choice(len(LANGS), size=rows, p=LANG_P)
    lang = pa.array(np.array(LANGS)[lang_idx])

    # --- url: Zipf(1.2) hosts (skew!) + token path, unique per row ---
    n_hosts = max(50, rows // 200)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks ** -1.2
    p /= p.sum()
    host_idx = rng.choice(n_hosts, size=rows, p=p)
    tok = np.array(_PATH_TOKENS)
    seg_idx = rng.integers(0, len(tok), size=(rows, 4))
    n_segs = rng.integers(1, 5, size=rows)
    row_ids = np.arange(rows) + id_offset
    urls = [
        f"https://host{h}.example.com/" + "/".join(tok[seg_idx[i, : n_segs[i]]]) + f"?id={i + id_offset}"
        for i, h in enumerate(host_idx)
    ]
    url = pa.array(urls, type=pa.string())

    # --- warc_ts: near-sorted, +-300 s jitter ---
    offsets_s = row_ids * 5 + rng.integers(-300, 301, size=rows)
    ts_us = BASE_TS_US + offsets_s * 1_000_000
    warc_ts = pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us"))

    # --- html: repetitive template runs, 2% null, 0.5% non-UTF8 ---
    tmpl_idx = rng.integers(0, len(_HTML_TEMPLATES), size=rows)
    repeats = rng.integers(1, 20, size=rows)
    null_mask = rng.random(rows) < 0.02
    junk_mask = rng.random(rows) < 0.005
    html_vals: list[bytes | None] = []
    for i in range(rows):
        if null_mask[i]:
            html_vals.append(None)
            continue
        v = b"<html><body>" + _HTML_TEMPLATES[tmpl_idx[i]] * int(repeats[i]) + b"</body></html>"
        if junk_mask[i]:
            v += bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
        html_vals.append(v)
    html = pa.array(html_vals, type=pa.binary())

    # --- text: per-lang corpus slices, 50-2000 chars ---
    corpora = {lg: _corpus(lg, np.random.default_rng(seed + 1000 + k))
               for k, lg in enumerate(LANGS)}
    text_lens = rng.integers(50, 2001, size=rows)
    starts = rng.integers(0, 100_000, size=rows)
    texts = []
    for i in range(rows):
        c = corpora[LANGS[lang_idx[i]]]
        s = int(starts[i]) % max(1, len(c) - int(text_lens[i]))
        texts.append(c[s : s + int(text_lens[i])])
    text = pa.array(texts, type=pa.string())

    return pa.table({"url": url, "warc_ts": warc_ts, "html": html,
                     "text": text, "lang": lang})


def write_webpages(path: str, rows: int, seed: int = SEED,
                   row_group_size: int = 8192, id_offset: int = 0) -> str:
    """Small row groups keep the direct-mode planner's task granularity fine
    (real 100 TB inputs have many files/row groups; one synthetic file
    needs the same property)."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "webpages.parquet")
    pq.write_table(make_webpages(rows, seed, id_offset=id_offset), out,
                   row_group_size=row_group_size)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=SEED)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    print(write_webpages(args.out, args.rows, args.seed))
