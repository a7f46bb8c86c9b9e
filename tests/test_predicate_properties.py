"""Property tests for the decode-predicate primitives (hypothesis).

The invariants that make pushdown SAFE, checked on adversarial data
(random bytes incl. >0x7F, values longer than the 24-byte zone prefix,
nulls, empty strings):

1. zone-map soundness: if `_chunk_survives` says prune, NO row matches;
2. dict short-circuit soundness: `dict_may_contain(...) is False` =>
   no row matches (and None only for non-dict codecs);
3. mask exactness: `_chunk_mask` equals the obvious per-row reference
   for eq/in/prefix/range, with SQL null semantics (null never matches).
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from flowforge import engine
from flowforge.codecs import chunk as chunklib

# values stress the ZONE_PREFIX=24 truncation boundary and byte ordering
_value = st.one_of(
    st.none(),
    st.binary(min_size=0, max_size=40),
    st.just(b"\xff" * 30),
    st.just(b"\x00"),
)
_values = st.lists(_value, min_size=1, max_size=60)
_probe = st.binary(min_size=0, max_size=30)
_codec = st.sampled_from(["plain", "dict", "dictfsst", "rle", "fsst", "worddict"])


def _matches(v: bytes | None, spec: tuple) -> bool:
    if v is None:
        return False
    kind = spec[0]
    if kind == "in":
        return v in spec[1]
    if kind == "prefix":
        return any(v.startswith(p) for p in spec[1])
    if kind == "contains":
        return any(p in v for p in spec[1])
    if kind == "suffix":
        return any(v.endswith(p) for p in spec[1])
    raise AssertionError(kind)


@settings(max_examples=200, deadline=None)
@given(values=_values, probes=st.lists(_probe, min_size=1, max_size=3),
       kind=st.sampled_from(["in", "prefix", "contains", "suffix"]),
       codec=_codec)
def test_zone_dict_and_mask_soundness(values, probes, kind, codec):
    arr = pa.array(values, type=pa.large_binary())
    payload, meta = chunklib.encode_array(arr, codec)
    spec = (kind, probes, probes)

    expect = [_matches(v, spec) for v in values]
    any_match = any(expect)

    # 1. zone map never prunes a matching chunk
    if not engine._chunk_survives(meta, spec):
        assert not any_match, (values, probes, kind, meta)

    # 2. dict short-circuit never skips a matching chunk
    may = chunklib.dict_may_contain(payload, meta, probes, mode=kind)
    if may is None:
        assert meta["codec"] not in ("dict", "dictfsst")
    elif may is False:
        assert not any_match, (values, probes, kind)

    # 3. exact row mask == reference (decode then mask)
    decoded = chunklib.decode_array(payload, meta, len(values))
    mask = engine._chunk_mask({"c": decoded}, {"c": spec})
    got = [bool(m) if m is not None else False for m in mask.to_pylist()]
    assert got == expect, (values, probes, kind)


@settings(max_examples=200, deadline=None)
@given(values=st.lists(st.one_of(st.none(), st.integers(-2**40, 2**40)),
                       min_size=1, max_size=60),
       lo=st.integers(-2**40, 2**40), hi=st.integers(-2**40, 2**40),
       codec=st.sampled_from(["plain", "forbp", "deltazz", "rle", "dict"]))
def test_int_range_zone_and_mask_soundness(values, lo, hi, codec):
    arr = pa.array(values, type=pa.int64())
    payload, meta = chunklib.encode_array(arr, codec)
    spec = ("range", min(lo, hi), max(lo, hi))
    expect = [v is not None and spec[1] <= v <= spec[2] for v in values]
    if not engine._chunk_survives(meta, spec):
        assert not any(expect)
    decoded = chunklib.decode_array(payload, meta, len(values))
    mask = engine._chunk_mask({"c": decoded}, {"c": spec})
    got = [bool(m) if m is not None else False for m in mask.to_pylist()]
    assert got == expect


@settings(max_examples=300, deadline=None)
@given(probe=_probe, values=_values)
def test_prefix_upper_bound_property(probe, values):
    """next(prefix) really is an upper bound: every string with the
    prefix sorts strictly below it (when it exists)."""
    nxt = chunklib._prefix_upper(probe)
    for v in values:
        if v is not None and v.startswith(probe):
            if nxt is not None:
                assert v < nxt
            assert v >= probe


@settings(max_examples=200, deadline=None)
@given(values=st.lists(st.one_of(st.none(), st.integers(-2**40, 2**40)),
                       min_size=1, max_size=60),
       probes=st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=4),
       codec=st.sampled_from(["plain", "forbp", "deltazz", "rle", "dict"]))
def test_int_in_zone_and_mask_soundness(values, probes, codec):
    arr = pa.array(values, type=pa.int64())
    payload, meta = chunklib.encode_array(arr, codec)
    spec = ("intin", sorted(probes), sorted(probes))
    expect = [v is not None and v in probes for v in values]
    if not engine._chunk_survives(meta, spec):
        assert not any(expect)
    decoded = chunklib.decode_array(payload, meta, len(values))
    mask = engine._chunk_mask({"c": decoded}, {"c": spec})
    got = [bool(m) if m is not None else False for m in mask.to_pylist()]
    assert got == expect


# --- round 5: isnull / notnull / or specs ----------------------------------

def _ref_match(v, spec) -> bool:
    """Two-valued reference semantics (Kleene nulls collapse to False,
    exactly what filter() / fill_null(False) do downstream)."""
    kind = spec[0]
    if kind == "isnull":
        return v is None
    if kind == "notnull":
        return v is not None
    if kind == "or":
        return any(_ref_match(v, s) for s in spec[1])
    if v is None:
        return False
    if kind == "range":
        return spec[1] <= v <= spec[2]
    if kind == "intin":
        return v in spec[1]
    if kind == "in":
        return v in spec[1]
    if kind == "prefix":
        return any(v.startswith(p) for p in spec[1])
    if kind == "contains":
        return any(p in v for p in spec[1])
    if kind == "suffix":
        return any(v.endswith(p) for p in spec[1])
    raise AssertionError(kind)


def _int_leaf():
    rng = st.tuples(st.integers(-2**40, 2**40), st.integers(-2**40, 2**40)).map(
        lambda t: ("range", min(t), max(t)))
    intin = st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=3).map(
        lambda p: ("intin", sorted(p), sorted(p)))
    return st.one_of(rng, intin, st.just(("isnull",)), st.just(("notnull",)))


_int_spec = st.one_of(
    _int_leaf(),
    st.lists(_int_leaf(), min_size=1, max_size=3).map(lambda s: ("or", s)),
)

_bytes_leaf = st.one_of(
    st.lists(_probe, min_size=1, max_size=3).map(lambda p: ("in", p, p)),
    st.lists(_probe, min_size=1, max_size=2).map(lambda p: ("prefix", p, p)),
    st.lists(_probe, min_size=1, max_size=2).map(
        lambda p: ("contains", p, p)),
    st.lists(_probe, min_size=1, max_size=2).map(lambda p: ("suffix", p, p)),
    st.just(("isnull",)),
    st.just(("notnull",)),
)
_bytes_spec = st.one_of(
    _bytes_leaf,
    st.lists(_bytes_leaf, min_size=1, max_size=3).map(lambda s: ("or", s)),
)


@settings(max_examples=300, deadline=None)
@given(values=st.lists(st.one_of(st.none(), st.integers(-2**40, 2**40)),
                       min_size=1, max_size=60),
       spec=_int_spec,
       codec=st.sampled_from(["plain", "forbp", "deltazz", "rle", "dict"]))
def test_null_or_int_soundness(values, spec, codec):
    arr = pa.array(values, type=pa.int64())
    payload, meta = chunklib.encode_array(arr, codec)
    expect = [_ref_match(v, spec) for v in values]
    # zone prune is sound
    if not engine._chunk_survives(meta, spec, len(values)):
        assert not any(expect), (values, spec, meta)
    # all-match proof is sound
    if engine._zone_all_match(meta, spec, len(values)):
        assert all(expect), (values, spec, meta)
    # exact mask == reference
    decoded = chunklib.decode_array(payload, meta, len(values))
    mask = engine._chunk_mask({"c": decoded}, {"c": spec})
    got = [bool(m) if m is not None else False for m in mask.to_pylist()]
    assert got == expect, (values, spec)


@settings(max_examples=300, deadline=None)
@given(values=_values, spec=_bytes_spec,
       codec=st.sampled_from(["plain", "dict", "dictfsst", "rle", "fsst",
                              "worddict"]))
def test_null_or_bytes_soundness(values, spec, codec):
    arr = pa.array(values, type=pa.large_binary())
    payload, meta = chunklib.encode_array(arr, codec)
    expect = [_ref_match(v, spec) for v in values]
    if not engine._chunk_survives(meta, spec, len(values)):
        assert not any(expect), (values, spec, meta)
    if engine._zone_all_match(meta, spec, len(values)):
        assert all(expect), (values, spec, meta)
    decoded = chunklib.decode_array(payload, meta, len(values))
    mask = engine._chunk_mask({"c": decoded}, {"c": spec})
    got = [bool(m) if m is not None else False for m in mask.to_pylist()]
    assert got == expect, (values, spec)


# ---------------------------------------------------------------------------
# Derived time-key transforms (round 5): apply_group_transform vs an
# INDEPENDENT pure-Python calendar derivation — no arrow temporal kernels
# on the reference side, so a floor_temporal/cast bug cannot self-confirm.
# Covers 1900-2100 (pre-1970 negatives included), microsecond payloads,
# nulls, every trunc unit and calendar part.

import datetime as _dt

_dts = st.one_of(
    st.none(),
    st.datetimes(min_value=_dt.datetime(1900, 1, 1),
                 max_value=_dt.datetime(2100, 12, 31, 23, 59, 59)),
)
_TRUNC = ["year", "quarter", "month", "week", "day",
          "hour", "minute", "second", "millisecond", "microsecond"]
_PARTS = ["year", "quarter", "month", "day", "hour", "minute", "second"]


def _py_trunc(d: _dt.datetime, unit: str) -> _dt.datetime:
    if unit == "year":
        return d.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if unit == "quarter":
        return d.replace(month=(d.month - 1) // 3 * 3 + 1, day=1, hour=0,
                         minute=0, second=0, microsecond=0)
    if unit == "month":
        return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "week":  # Monday
        return (d - _dt.timedelta(days=d.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return d.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return d.replace(second=0, microsecond=0)
    if unit == "second":
        return d.replace(microsecond=0)
    if unit == "millisecond":
        return d.replace(microsecond=d.microsecond // 1000 * 1000)
    return d  # microsecond


def _py_part(d: _dt.datetime, part: str) -> int:
    if part == "quarter":
        return (d.month - 1) // 3 + 1
    return getattr(d, part)


@given(vals=st.lists(_dts, min_size=1, max_size=40),
       unit=st.sampled_from(_TRUNC), tz_aware=st.booleans())
@settings(max_examples=150, deadline=None)
def test_transform_trunc_matches_calendar(vals, unit, tz_aware):
    t = pa.timestamp("us", tz="UTC") if tz_aware else pa.timestamp("us")
    arr = pa.array(vals, type=t)
    out = chunklib.apply_group_transform(arr, ("trunc", unit, "UTC"))
    assert str(out.type) == "timestamp[us, tz=UTC]"
    got = out.cast(pa.timestamp("us")).to_pylist()
    want = [None if v is None else _py_trunc(v, unit) for v in vals]
    assert got == want


@given(vals=st.lists(_dts, min_size=1, max_size=40), tz_aware=st.booleans())
@settings(max_examples=100, deadline=None)
def test_transform_date_matches_calendar(vals, tz_aware):
    t = pa.timestamp("us", tz="UTC") if tz_aware else pa.timestamp("us")
    arr = pa.array(vals, type=t)
    out = chunklib.apply_group_transform(arr, ("date",))
    assert out.type == pa.date32()
    got = out.to_pylist()
    want = [None if v is None else v.date() for v in vals]
    assert got == want


@given(vals=st.lists(_dts, min_size=1, max_size=40),
       part=st.sampled_from(_PARTS), tz_aware=st.booleans())
@settings(max_examples=150, deadline=None)
def test_transform_part_matches_calendar(vals, part, tz_aware):
    t = pa.timestamp("us", tz="UTC") if tz_aware else pa.timestamp("us")
    arr = pa.array(vals, type=t)
    out = chunklib.apply_group_transform(arr, ("part", part))
    assert out.type == pa.int32()
    got = out.to_pylist()
    want = [None if v is None else _py_part(v, part) for v in vals]
    assert got == want


# ---------------------------------------------------------------------------
# Derived-predicate bound algebra (round 5): the date/year/trunc WHERE
# rewrites in sqlagg rest on exact identities over calendar flooring.
# Check them for random values/literals with pure-Python evaluation —
# these are the facts the rewrite is allowed to assume, independent of
# both Spark and arrow.

from flowforge import sqlagg as _sqlagg

_US_RANGE = st.integers(
    min_value=-2_208_988_800_000_000,   # 1900-01-01
    max_value=4_102_444_800_000_000)    # 2100-01-01
_UNITS = ["year", "quarter", "month", "week", "day",
          "hour", "minute", "second", "millisecond", "microsecond"]


@given(v=_US_RANGE, t=_US_RANGE, unit=st.sampled_from(_UNITS))
@settings(max_examples=400, deadline=None)
def test_trunc_bound_algebra(v, t, unit):
    floor = _sqlagg._floor_unit_us
    nxt = _sqlagg._next_boundary_us
    fv, ft = floor(v, unit), floor(t, unit)
    # flooring is a calendar floor: fv <= v < next(fv), and idempotent
    assert fv <= v < nxt(fv, unit)
    assert floor(fv, unit) == fv
    ceil = t if ft == t else nxt(ft, unit)
    nxt_after = nxt(ft, unit)
    # the rewrite identities used for trunc comparisons
    assert (fv >= t) == (v >= ceil)
    assert (fv > t) == (v >= nxt_after)
    assert (fv < t) == (v <= ceil - 1)
    assert (fv <= t) == (v <= nxt_after - 1)
    if ft == t:  # aligned equality -> half-open interval
        assert (fv == t) == (t <= v <= nxt_after - 1)


@given(v=_US_RANGE, d=st.integers(min_value=-25567, max_value=47482))
@settings(max_examples=300, deadline=None)
def test_date_bound_algebra(v, d):
    import datetime as _dt

    day = _sqlagg._DAY_US
    vd = (_dt.datetime(1970, 1, 1)
          + _dt.timedelta(microseconds=v)).date()
    dd = _dt.date(1970, 1, 1) + _dt.timedelta(days=d)
    assert (vd == dd) == (d * day <= v <= (d + 1) * day - 1)
    assert (vd > dd) == (v >= (d + 1) * day)
    assert (vd >= dd) == (v >= d * day)
    assert (vd < dd) == (v <= d * day - 1)
    assert (vd <= dd) == (v <= (d + 1) * day - 1)


@given(v=_US_RANGE, y=st.integers(min_value=1850, max_value=2149))
@settings(max_examples=300, deadline=None)
def test_year_bound_algebra(v, y):
    import datetime as _dt

    vy = (_dt.datetime(1970, 1, 1)
          + _dt.timedelta(microseconds=v)).year
    start = _sqlagg._year_start_us
    assert (vy == y) == (start(y) <= v <= start(y + 1) - 1)
    assert (vy > y) == (v >= start(y + 1))
    assert (vy >= y) == (v >= start(y))
    assert (vy < y) == (v <= start(y) - 1)
    assert (vy <= y) == (v <= start(y + 1) - 1)
