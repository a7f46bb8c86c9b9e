"""Bytes/string codecs: plain, dictionary, RLE, FSST-style, RLE+sub hybrid.

Value domain: a null-free sequence of byte strings, represented as
``(lengths: np.int64 array, data: bytes)`` — the flattened Arrow layout.
Strings enter as their UTF-8 bytes (Spark strings are UTF-8; the round trip
is byte-identical). Interface::

    encode(lengths, data) -> (payload: bytes, meta: dict)
    decode(payload, meta, n) -> (lengths, data)

The reference collapses arrays to JSON strings and writes snappy Parquet
(core/parquet.go:466-478, :254-270); here every codec is a reversible
lightweight scheme picked per column-chunk by the selector.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack, intcodecs
from .framing import pack_sections, unpack_sections

_I64 = np.int64
_U64 = np.uint64


# --- arrow bridge ---------------------------------------------------------

def parts_to_arrow(lengths: np.ndarray, data: bytes) -> pa.Array:
    """(lengths, data) -> null-free large_binary array (zero-copy-ish)."""
    offsets = np.empty(lengths.size + 1, dtype=_I64)
    offsets[0] = 0
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        lengths.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )


def arrow_to_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """Null-free binary-ish array -> (lengths, data).

    ``data`` is a ZERO-COPY memoryview over the Arrow data buffer (the
    selector trial-encodes each chunk with several codecs, and a bytes()
    materialization here cost one full-blob copy — with this sandbox's
    contended page faults, a large slice of encode CPU — per trial). Every
    codec consumes it via the buffer protocol (np.frombuffer, py_buffer,
    join); only the FSST family, which needs bytes.replace, materializes
    real bytes, and does so itself exactly when it runs."""
    arr = arr.cast(pa.large_binary())
    # offset-aware read: the offsets buffer holds absolute positions into the
    # data buffer, valid for sliced arrays too
    offsets = np.frombuffer(arr.buffers()[1], dtype=_I64, count=len(arr) + 1, offset=arr.offset * 8)
    data_buf = arr.buffers()[2]
    data = (memoryview(data_buf).cast("B")[offsets[0]: offsets[-1]]
            if data_buf is not None else b"")
    lengths = np.diff(offsets).astype(_I64)
    return lengths, data


def _encode_lengths(lengths: np.ndarray):
    return intcodecs.forbp_encode(lengths)


def _decode_lengths(payload: bytes, meta: dict, n: int) -> np.ndarray:
    return intcodecs.forbp_decode(payload, meta, n)


# --- plain ----------------------------------------------------------------

def plain_encode(lengths: np.ndarray, data: bytes):
    lp, lm = _encode_lengths(lengths)
    return pack_sections([lp, data]), {"lens": lm}


def plain_decode(payload: bytes, meta: dict, n: int):
    lp, data = unpack_sections(payload)
    return _decode_lengths(lp, meta["lens"], n), data


# --- dictionary -----------------------------------------------------------

def dict_encode(lengths: np.ndarray, data: bytes, sub: str = "plain",
                sort: bool = True):
    """Unique dictionary + bit-packed codes (Arrow-vectorized).

    ``sub`` compresses the dictionary value store itself — ``fsst`` pays off
    when the distinct values are individually repetitive (html template
    runs): near-dict speed (the FSST pass only sees the small dictionary)
    with near-FSST ratio.

    ``sort=True`` stores the dictionary value-ordered (prefix locality for
    the sub-codec). ``sort=False`` keeps Arrow's first-occurrence order —
    equally deterministic, and skips a code-stream-sized rank gather, which
    matters when codes outnumber distinct values 100:1 (worddict)."""
    arr = parts_to_arrow(lengths, data)
    enc = pc.dictionary_encode(arr)
    # keep Arrow's int32 indices zero-copy: pack() takes narrow dtypes and
    # widens per cache-sized column, never as one code-stream-sized temp
    dictionary, codes = enc.dictionary, np.asarray(enc.indices)
    if sort:
        sort_idx = np.asarray(pc.sort_indices(dictionary), dtype=np.intp)
        rank = np.empty(sort_idx.size, dtype=np.int32)
        rank[sort_idx] = np.arange(sort_idx.size, dtype=np.int32)
        codes = rank[codes]
        dictionary = dictionary.take(pa.array(sort_idx))
    d_lens, d_data = arrow_to_parts(dictionary)
    if sub == "fsst":
        # dictionary stores get a wider sim than in-chunk blobs: their gains
        # concentrate in template runs spread across the store (html), where
        # a too-narrow sim mis-ranks. Round-4 used the full _SAMPLE width
        # (measured 29 KB vs 56 KB on a single-round table); with round-5's
        # deeper round compounding the realized gap at half width is +4%
        # store size for ~40% less selection wall (encode-wall item), so
        # stores take 2x the chunk sim, not 4x
        dict_payload, dict_meta = fsst_encode(d_lens, d_data,
                                              sim_bytes=2 * _SIM_CHUNK)
    else:
        sub_enc, _ = BYTES_CODECS[sub]
        dict_payload, dict_meta = sub_enc(d_lens, d_data)
    width = bitpack.bit_width(codes)
    sections = [dict_payload, bitpack.pack(codes, width)]
    meta = {"ndv": int(len(dictionary)), "width": width, "dict": dict_meta, "sub": sub}
    return pack_sections(sections), meta


def dictfsst_encode(lengths: np.ndarray, data: bytes):
    return dict_encode(lengths, data, sub="fsst")


def dict_decode(payload: bytes, meta: dict, n: int):
    dict_payload, code_payload = unpack_sections(payload)
    ndv = int(meta["ndv"])
    _, sub_dec = BYTES_CODECS[meta.get("sub", "plain")]
    d_lens, d_data = sub_dec(dict_payload, meta["dict"], ndv)
    # zero-copy narrow codes: Arrow take() accepts any integer index width
    codes = bitpack.unpack_narrow(code_payload, int(meta["width"]), n)
    dictionary = parts_to_arrow(d_lens, d_data)
    out = dictionary.take(pa.array(codes))
    return arrow_to_parts(out)


# --- run-length -----------------------------------------------------------

def _runs_bytes(lengths: np.ndarray, data: bytes):
    """Run starts for adjacent-equal byte values (Arrow-vectorized)."""
    n = lengths.size
    if n == 0:
        return np.zeros(0, dtype=_I64), np.zeros(0, dtype=_I64)
    arr = parts_to_arrow(lengths, data)
    neq = np.ones(n, dtype=bool)
    if n > 1:
        eq = pc.equal(arr.slice(1), arr.slice(0, n - 1))
        neq[1:] = ~np.asarray(eq, dtype=bool)
    starts = np.flatnonzero(neq)
    run_lens = np.diff(np.append(starts, n)).astype(_I64)
    return starts.astype(_I64), run_lens


def rle_encode(lengths: np.ndarray, data: bytes, sub: str = "plain"):
    starts, run_lens = _runs_bytes(lengths, data)
    arr = parts_to_arrow(lengths, data)
    run_vals = arr.take(pa.array(starts)) if starts.size else arr.slice(0, 0)
    v_lens, v_data = arrow_to_parts(run_vals)
    if sub == "fsst":
        # run-value stores are dictionary-like: template gains spread across
        # the store, so keep the wider sim (same tradeoff as dictfsst)
        val_payload, val_meta = fsst_encode(v_lens, v_data,
                                            sim_bytes=2 * _SIM_CHUNK)
    else:
        sub_enc, _ = BYTES_CODECS[sub]
        val_payload, val_meta = sub_enc(v_lens, v_data)
    len_u = run_lens.astype(_U64) - _U64(1)
    len_width = bitpack.bit_width(len_u)
    sections = [val_payload, bitpack.pack(len_u, len_width)]
    meta = {"n_runs": int(starts.size), "len_width": len_width, "sub": sub, "vals": val_meta}
    return pack_sections(sections), meta


def rle_decode(payload: bytes, meta: dict, n: int):
    val_payload, len_payload = unpack_sections(payload)
    n_runs = int(meta["n_runs"])
    _, sub_dec = BYTES_CODECS[meta.get("sub", "plain")]
    v_lens, v_data = sub_dec(val_payload, meta["vals"], n_runs)
    run_lens = bitpack.unpack(len_payload, int(meta["len_width"]), n_runs).astype(_I64) + 1
    run_vals = parts_to_arrow(v_lens, v_data)
    idx = np.repeat(np.arange(n_runs, dtype=np.intp), run_lens)
    out = run_vals.take(pa.array(idx))
    return arrow_to_parts(out)


# --- tokenizing word dictionary ---------------------------------------------

# candidate token separators, preference-ordered (space for prose, '/' for
# URL-ish paths, newline for line-structured logs)
_WORDDICT_SEPS = (0x20, 0x2F, 0x0A)


def _pick_sep(data: bytes) -> int:
    sample = np.frombuffer(data[: 1 << 16], dtype=np.uint8)
    best_sep, best_cnt = _WORDDICT_SEPS[0], -1
    for s in _WORDDICT_SEPS:
        cnt = int((sample == s).sum())
        if cnt > best_cnt:  # strict: earlier candidate wins ties (determinism)
            best_sep, best_cnt = s, cnt
    return best_sep


def worddict_encode(lengths: np.ndarray, data: bytes, sep: int | None = None):
    """Tokenizing dictionary: cut the blob at separator->non-separator
    transitions (token = separator run + following word), then dictionary-
    encode the tokens — :func:`dict_encode` on a different length-
    partitioning of the SAME blob, so the whole path is Arrow/numpy
    vectorized. On word-structured text this wins on BOTH axes vs FSST
    (measured on the bench corpus: 102 MB/s/core vs 4.4, ratio 0.22 vs
    0.37) because the natural-language token vocabulary is small while
    byte-level symbol tables top out at 8-byte substrings.

    Tokens may span row boundaries (rows are sliced back by the lengths
    array, concatenation is exact) and the token partition covers every
    byte, so the round trip is bit-identical for arbitrary binary input.
    """
    if sep is None:
        sep = _pick_sep(data)
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size:
        # sep positions first (small vs blob), then keep only run-enders:
        # fewer blob-sized temporaries than a transitions mask — page-fault
        # traffic on fresh temps is the dominant cost under many workers
        sep_pos = np.flatnonzero(b == sep)
        if sep_pos.size and sep_pos[-1] == b.size - 1:
            sep_pos = sep_pos[:-1]
        run_end = sep_pos[b[sep_pos + 1] != sep] + 1
        # adjacent differences with virtual 0/b.size endpoints, without
        # np.diff's two token-count-sized concatenations (prepend/append
        # each copy the index array; measured on 17 MB text chunks)
        tok_lens = np.empty(run_end.size + 1, dtype=_I64)
        if run_end.size:
            tok_lens[0] = run_end[0]
            np.subtract(run_end[1:], run_end[:-1],
                        out=tok_lens[1:run_end.size])
            tok_lens[run_end.size] = b.size - run_end[-1]
        else:
            tok_lens[0] = b.size
    else:
        tok_lens = np.zeros(0, dtype=_I64)
    lp, lm = _encode_lengths(lengths)
    dict_payload, dict_meta = dict_encode(tok_lens, data, sort=False)
    payload = pack_sections([lp, dict_payload])
    meta = {"lens": lm, "n_tokens": int(tok_lens.size), "dict": dict_meta,
            "sep": int(sep)}
    return payload, meta


def worddict_decode(payload: bytes, meta: dict, n: int):
    lp, dict_payload = unpack_sections(payload)
    lengths = _decode_lengths(lp, meta["lens"], n)
    _, tok_data = dict_decode(dict_payload, meta["dict"], int(meta["n_tokens"]))
    return lengths, tok_data


def hybrid_encode(lengths: np.ndarray, data: bytes):
    """RLE over values with an FSST-compressed run-value store.

    Targets repetitive binary html runs (BASELINE.json north_star)."""
    return rle_encode(lengths, data, sub="fsst")


def hybrid_decode(payload: bytes, meta: dict, n: int):
    return rle_decode(payload, meta, n)


# --- FSST-style symbol-table compression -----------------------------------
#
# A from-scratch, deterministic, escape-based symbol-table scheme inspired by
# FSST (Boncz, Neumann, Leis: "FSST: Fast Random Access String Compression",
# VLDB 2020): frequent substrings (2..8 bytes) of the corpus are replaced by
# single code bytes. Code bytes are drawn from the *least frequent* byte
# values of this chunk; original occurrences of code-space bytes are escaped
# first, so every replacement pass is exactly invertible (see
# tests/test_codecs.py round-trip properties). All heavy passes are C-speed
# (numpy histogram, bytes.replace).

_MAX_SYMS = 48
_SAMPLE = 1 << 16
_SYM_LENGTHS = (8, 6, 4, 3, 2)
_SYM_LENGTHS_LATER = (8, 4, 2)  # rounds >= 1 (see fsst_encode)


def _byte_histogram(data: bytes) -> np.ndarray:
    """Exact byte histogram (one vectorized pass, ~GB/s).

    Exactness matters: a code-space byte with count 0 needs NO escape pass
    over the blob, which eliminates most of the escape traffic — code bytes
    are picked as the least frequent, so nearly all are absent entirely.
    """
    if not data:
        return np.zeros(256, dtype=_I64)
    # pc.value_counts: single C++ hash pass with no widened temp array —
    # measured ~5x faster than bincount-over-astype (the astype allocates an
    # 8x blob-sized temp whose page faults dominate), and this runs once per
    # round per chunk
    vc = pc.value_counts(pa.array(np.frombuffer(data, dtype=np.uint8)))
    hist = np.zeros(256, dtype=_I64)
    hist[np.asarray(vc.field("values"), dtype=np.int64)] = np.asarray(
        vc.field("counts"), dtype=np.int64
    )
    return hist


def _choose_code_space(hist: np.ndarray, k: int) -> list[int]:
    """k+1 least-frequent byte values (escape first), stable order."""
    order = np.lexsort((np.arange(256), hist))
    return [int(b) for b in order[: k + 1]]


def _escape(data: bytes, escape: int, present: list[int], g: dict[int, int]) -> bytes:
    # escape byte first, then the rest — introduced escape prefixes must not
    # be re-escaped (mirror of _unescape ordering). `present` holds only the
    # code-space bytes that actually occur (exact histogram) — absent bytes
    # need no pass over the blob.
    e = bytes([escape])
    if escape in present:
        data = data.replace(e, e + bytes([g[escape]]))
    for c in present:
        if c == escape:
            continue
        data = data.replace(bytes([c]), e + bytes([g[c]]))
    return data


def _unescape(data: bytes, escape: int, present: list[int], g: dict[int, int]) -> bytes:
    e = bytes([escape])
    for c in present:
        if c == escape:
            continue
        data = data.replace(e + bytes([g[c]]), bytes([c]))
    if escape in present:
        data = data.replace(e + bytes([g[escape]]), e)
    return data


def _escape_map(code_space: list[int]) -> dict[int, int]:
    in_space = set(code_space)
    free = [b for b in range(256) if b not in in_space]
    return {c: free[i] for i, c in enumerate(code_space)}


def _window_counts(sample: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct L-byte windows + counts, via u64 packing (fully vectorized)."""
    n = sample.size - L + 1
    if n <= 0:
        return np.zeros(0, dtype=_U64), np.zeros(0, dtype=_I64)
    padded = np.concatenate([sample, np.zeros(8, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, 8)[:n]
    packed = win.copy().view(_U64).ravel()  # little-endian 8-byte load
    if L < 8:
        packed = packed & _U64((1 << (8 * L)) - 1)
    uniq, counts = np.unique(packed, return_counts=True)
    return uniq, counts.astype(_I64)


def _pick_symbols(sample: bytes, max_syms: int, codes: list[int],
                  min_gain: int | None = None,
                  sim_bytes: int | None = None,
                  lengths: tuple[int, ...] = _SYM_LENGTHS
                  ) -> tuple[list[bytes], float]:
    """Greedy symbol selection with overlap-aware simulation on the sample.

    Returns ``(symbols, sim_ratio)`` where ``sim_ratio`` is the realized
    shrink of the simulation slice — a deterministic projection of what the
    full-blob replace passes would achieve, used to skip rounds that
    clearly will not pay (see :func:`_fsst_round_encode`).

    Candidate n-grams are ranked by standalone gain (counted vectorized on
    the FULL sample), then accepted only if they still pay on a bounded
    simulation slice *after* earlier replacements — overlapping candidates
    (periodic text) die off naturally, as in FSST's iterative symbol-table
    generations. ``sim_bytes`` bounds the slice the per-candidate
    count/replace simulation runs on: that loop is the selector's dominant
    wall cost (hundreds of candidates x a bytes.count each), and a prefix
    slice with a proportionally scaled acceptance bar keeps the choice
    nearly identical on chunk-local data while cutting the scanning 4x.
    Dictionary stores pass the full width — their gains concentrate in
    template runs spread across the store, where the narrow sim mis-ranks.
    """
    sarr = np.frombuffer(sample, dtype=np.uint8)
    if min_gain is None:
        min_gain = max(8, len(sample) >> 10)
    # one 8-byte packing pass serves every symbol length (mask down for
    # L<8) — the per-L sliding-window copy was the selector's hottest
    # numpy cost at 5 lengths per round
    n8 = sarr.size
    cands: list[tuple[int, bytes]] = []  # (-gain, symbol)
    if n8 > 0:
        padded = np.concatenate([sarr, np.zeros(8, dtype=np.uint8)])
        win = np.lib.stride_tricks.sliding_window_view(padded, 8)[:n8]
        packed8 = win.copy().view(_U64).ravel()
        for L in lengths:
            m = n8 - L + 1
            if m <= 0:
                continue
            packed = packed8[:m]
            if L < 8:
                packed = packed & _U64((1 << (8 * L)) - 1)
            uniq, counts = np.unique(packed, return_counts=True)
            gains = counts * (L - 1)
            # standalone gain below the acceptance bar can never pass the
            # sim check (replacements only shrink counts), so prefilter at
            # min_gain, not a fixed floor
            keep = gains >= min_gain
            if not keep.any():
                continue
            # 2x oversampling per length: the tail of weak standalone-gain
            # candidates essentially never survives the sim check, but each
            # one costs a sim bytes.count (round-5 wall measurement)
            order = np.argsort(gains[keep], kind="stable")[::-1][: max_syms * 2]
            u, g = uniq[keep][order], gains[keep][order]
            raw = u.astype("<u8").tobytes()
            for i in range(u.size):
                cands.append((-int(g[i]), raw[i * 8 : i * 8 + L]))
    cands.sort()
    sim = sample if not sim_bytes else sample[:sim_bytes]
    sim0 = max(1, len(sim))
    scale = len(sample) / max(1, len(sim))
    sim_gain = min_gain if scale <= 1.0 else max(4, int(min_gain / scale))
    out: list[bytes] = []
    seen = set()
    for neg_gain, s in cands:
        if len(out) >= max_syms:
            break
        if -neg_gain < min_gain:
            break  # sorted: every later standalone gain is smaller still
        if s in seen:
            continue
        seen.add(s)
        cnt = sim.count(s)
        if cnt * (len(s) - 1) < sim_gain:
            continue
        sim = sim.replace(s, bytes([codes[len(out)]]))
        out.append(s)
    return out, len(sim) / sim0


def _fsst_round_encode(data: bytes, sim_bytes: int | None = None,
                       reject_at: float | None = None,
                       lengths: tuple[int, ...] = _SYM_LENGTHS
                       ) -> tuple[bytes, bytes, bytes, list[bytes]]:
    """One symbol-table round: (blob, code_space_bytes, present_bytes, symbols).

    ``reject_at``: if the sample simulation projects a shrink ratio at or
    above this value, the full-blob replace passes are skipped and the
    round returns the input blob with an empty symbol list (the caller
    treats that as "round refused"). The projection is data-derived and
    deterministic; the margin the caller adds keeps borderline rounds on
    the exact path. Measured: the terminal refused round previously cost a
    full ~30 ms attempt per chunk (url/html) just to be discarded by the
    caller's exact size check.
    """
    hist = _byte_histogram(data)
    code_space = _choose_code_space(hist, _MAX_SYMS)
    escape = code_space[0]
    g = _escape_map(code_space)
    present = [c for c in code_space if hist[c] > 0]
    escaped = _escape(data, escape, present, g)
    sample = escaped[: _SAMPLE]
    # every accepted symbol costs one full-blob replace pass, so the gain
    # bar (measured on the sample) scales with blob size: big blobs only
    # take symbols that pay for their pass, small blobs keep cheap ones —
    # measured: text (17 MB) gets faster AND slightly smaller, url (<1 MB)
    # keeps its deep symbol table
    min_gain = max(8, len(sample) >> (9 if len(data) > (4 << 20) else 10))
    symbols, sim_ratio = _pick_symbols(sample, _MAX_SYMS, code_space[1:],
                                       min_gain, sim_bytes, lengths)
    if reject_at is not None and sim_ratio >= reject_at:
        return data, bytes(code_space), bytes(present), []
    blob = escaped
    for i, sym in enumerate(symbols):
        blob = blob.replace(sym, bytes([code_space[1 + i]]))
    return blob, bytes(code_space), bytes(present), symbols


def _fsst_round_decode(blob: bytes, space_b: bytes, present_b: bytes,
                       symbols: list[bytes]) -> bytes:
    code_space = list(space_b)
    escape = code_space[0]
    g = _escape_map(code_space)
    for i in range(len(symbols) - 1, -1, -1):
        blob = blob.replace(bytes([code_space[1 + i]]), symbols[i])
    return _unescape(blob, escape, list(present_b), g)


_FSST_MAX_ROUNDS = 4
# diminishing-returns stop (round 5, encode-wall work): when an accepted
# round left more than _ROUND_STOP_SHRINK of a still-large blob, the next
# round's full-blob replace passes cost more wall than the bytes they save
# (measured on the bench url column: rounds shrink 0.33 / 0.68 / 0.80 and
# round 3 is always refused — stopping after the 0.68 round saves ~40% of
# the column's encode wall for +0.004 on the total size-vs-snappy ratio).
# Small blobs are exempt: their rounds cost single-digit ms and compound
# deeply (the html dictionary store shrinks 0.22 -> 0.38 -> 0.52 -> 0.45).
_ROUND_STOP_SHRINK = 0.65
_ROUND_STOP_BYTES = 128 << 10
# per-candidate sim slice for in-chunk blobs; dictionary stores use the full
# _SAMPLE width (see _pick_symbols docstring for the measured tradeoff)
_SIM_CHUNK = 1 << 14
# sample-projection safety margin: a round is early-refused only when its
# sim projects >= threshold + margin. Measured projection error on the web
# corpus is within +-0.02 of the realized full-blob shrink; 0.01 trades a
# rare borderline round (bounded size cost: one <=10%-shrink round on one
# column) for skipping the otherwise-always-wasted terminal round attempt
_PROJ_MARGIN = 0.01


def fsst_encode(lengths: np.ndarray, data: bytes, sim_bytes: int = _SIM_CHUNK):
    """Recursive FSST-style encoding: repeat symbol-table rounds while each
    round still shrinks the blob meaningfully. Round k's codes become
    ordinary bytes for round k+1, so effective symbol length compounds
    (Re-Pair-like) — this is what catches the long repeats that single-round
    8-byte symbols cannot."""
    if not isinstance(data, bytes):
        data = bytes(data)  # bytes.replace needs real bytes (see arrow_to_parts)
    lp, lm = _encode_lengths(lengths)
    rounds: list[tuple[bytes, bytes, list[bytes]]] = []
    blob = data
    last_shrink = 0.0
    while data and len(rounds) < _FSST_MAX_ROUNDS:
        # first round must pay >3%; later rounds must pay >10% — each extra
        # round is a full memory pass, so marginal gains aren't worth the
        # bandwidth at scale. The round's own sample simulation projects the
        # shrink first: a round that clearly misses the bar (projection
        # above threshold + margin) skips its full-blob replace passes
        # entirely — the terminal refused round is otherwise pure waste.
        if (rounds and len(blob) > _ROUND_STOP_BYTES
                and last_shrink > _ROUND_STOP_SHRINK):
            break  # diminishing returns on a still-large blob (see above)
        threshold = 0.97 if not rounds else 0.90
        # later rounds scan 3 window lengths instead of 5: round k+1's
        # symbols compound on round k's codes anyway, and the per-length
        # unique/sort passes are the round's dominant FIXED cost once the
        # blob has shrunk (round-5 encode-wall measurement)
        lengths = _SYM_LENGTHS if not rounds else _SYM_LENGTHS_LATER
        new_blob, space_b, present_b, symbols = _fsst_round_encode(
            blob, sim_bytes, reject_at=threshold + _PROJ_MARGIN,
            lengths=lengths)
        table_cost = len(space_b) + sum(len(s) + 8 for s in symbols) + 16
        if not symbols or len(new_blob) + table_cost >= len(blob) * threshold:
            break
        last_shrink = len(new_blob) / max(1, len(blob))
        rounds.append((space_b, present_b, symbols))
        blob = new_blob
    sections = [lp]
    for space_b, present_b, symbols in rounds:
        sections.extend([space_b, present_b, pack_sections(symbols)])
    sections.append(blob)
    meta = {"lens": lm, "rounds": len(rounds)}
    return pack_sections(sections), meta


def fsst_decode(payload: bytes, meta: dict, n: int):
    sections = unpack_sections(payload)
    lengths = _decode_lengths(sections[0], meta["lens"], n)
    n_rounds = int(meta.get("rounds", 0))
    blob = sections[-1]
    for r in range(n_rounds - 1, -1, -1):
        space_b = sections[1 + 3 * r]
        present_b = sections[2 + 3 * r]
        symbols = unpack_sections(sections[3 + 3 * r])
        blob = _fsst_round_decode(blob, space_b, present_b, symbols)
    return lengths, blob


BYTES_CODECS = {
    "plain": (plain_encode, plain_decode),
    "dict": (dict_encode, dict_decode),
    "dictfsst": (dictfsst_encode, dict_decode),
    "rle": (rle_encode, rle_decode),
    "fsst": (fsst_encode, fsst_decode),
    "hybrid": (hybrid_encode, hybrid_decode),
    "worddict": (worddict_encode, worddict_decode),
}
