"""SQL surface for the chunk store: a PySpark Python Data Source with
filter pushdown (round-3 verdict, missing #1).

``store_view`` registered the decode job as a temp view, but predicates had
to be passed at registration time — a user typing ``spark.sql("SELECT ...
FROM store WHERE lang = 'en'")`` got a full decode followed by a post-
filter, with the entire zone-map/dictionary pruning machinery sitting out.
This module closes that gap with the Spark 4.1 Python Data Source API
(`pushFilters`): Catalyst hands the scan its conjunctive filters, the
reader translates the translatable ones into the engine's decode predicate
specs, and the SAME three-layer pruning path used by
:func:`flowforge.engine.decode_table` runs — driver-side bucket zone maps
in :meth:`partitions`, then chunk zone maps / dictionary short-circuit /
exact row masks inside the shared decode kernel in :meth:`read`.

Reference contract: partition pruning is automatic on the reference's hive
``year=/month=/day=/hour=`` output layout (core/parquet.go:207-214); here it
is automatic on any registered store view, for any int/timestamp/date/
float/string predicate the zone maps cover.

Exactness: a filter is only CONSUMED (removed from Spark's post-scan
Filter) when the kernel's row mask evaluates it exactly with SQL
semantics — null comparisons never match, strict bounds are closed by ±1
in the int domain, float bounds follow Spark's total order (NaN greatest).
IS [NOT] NULL is consumed too (round 5): the commit records and chunk
metas carry per-column null counts, so null predicates prune buckets and
chunks metadata-only, and ``IS NULL AND <value constraint>`` short-
circuits to an empty scan. Anything else (Not, second prefix on a
column, strict float bounds, ...) is yielded back for Spark to evaluate.

Usage::

    from flowforge import datasource
    # one-shot query with full pushdown (the recommended SQL entry):
    df = datasource.store_sql(
        spark, "SELECT doc_id FROM docs WHERE lang = 'en'",
        stores={"docs": store_dir},
        columns={"docs": ["doc_id", "lang"]})
    # long-lived view (always correct; plans a full decode):
    datasource.store_sql_view(spark, store_dir, "docs")

⚠ Why pushdown is opt-in per relation (``.option("pushdown", "true")``)
and :func:`store_sql` builds a FRESH relation per call: Spark 4.1.2
caches the planned read (read function + partitions) in the shared
``PythonDataSourceV2.readInfo`` field of the relation's table provider,
and ``PythonScanBuilder.pushFilters`` OVERWRITES that cache with the
filter-specific plan (verified against the shipped bytecode; pinned in
tests/test_datasource.py). A later query on the SAME relation whose
filters are not convertible (full scan, OR-only predicates, ...) skips
the pushdown worker and reuses the stale, already-pruned plan — silently
missing rows. A pushdown plan is therefore only safe on a relation used
for exactly one query; ``store_sql`` guarantees that by construction,
while views default to a filter-INDEPENDENT reader whose cached plan is
the full decode (correct for every query, no pruning).

The Python DS API has no column pruning yet, so the ``columns`` option is
the projection knob (the reader otherwise decodes every stored column; the
kernel's late materialization still skips non-predicate columns for pruned
chunks).
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Iterator

import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from . import engine
from .catalog import Manifest, StorePlanError

_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1
_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_DATE = _dt.date(1970, 1, 1)

PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"


def register(spark: SparkSession) -> None:
    """Register the ``flowforge`` format and enable Python-DS filter
    pushdown (a runtime-settable SQL conf; without it Spark refuses any
    reader that implements pushFilters)."""
    spark.conf.set(PUSHDOWN_CONF, "true")
    spark.dataSource.register(ChunkStoreDataSource)


def _load(spark: SparkSession, out_dir: str, columns: list[str] | None,
          pushdown: bool):
    reader = (spark.read.format("flowforge").option("path", out_dir)
              .option("pushdown", "true" if pushdown else "false"))
    if columns:
        reader = reader.option("columns", ",".join(columns))
    return reader.load()


def max_store_refs(analyzed) -> int:
    """Max number of references to any single chunk-store path in an
    ANALYZED plan. A statement referencing one pushdown view twice with
    different filters (self-union, self-join) is unsafe: Spark 4.1.2's
    python-data-source execution reuses one reader state for identical
    relations, so one branch silently reads the other's pruned rows —
    callers re-register pushdown-free views when this returns > 1.
    Subquery expressions don't appear in children(); a conservative
    string probe over the plan text covers them (a false positive only
    costs pushdown, never correctness). The probe runs FIRST — one py4j
    call — so the common single-reference statement skips the
    node-by-node plan walk entirely."""
    total = str(analyzed.toString()).count(f" {ChunkStoreDataSource.name()}")
    if total < 2:
        return total  # at most one store reference anywhere in the plan
    counts: dict[str, int] = {}

    def walk(n):
        if n.getClass().getSimpleName() == "DataSourceV2Relation":
            try:
                if str(n.table().name()) == ChunkStoreDataSource.name():
                    p = str(n.options().get("path"))
                    counts[p] = counts.get(p, 0) + 1
            except Exception:  # pragma: no cover - defensive py4j surface
                pass
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(analyzed)
    m = max(counts.values(), default=0)
    if total > sum(counts.values()):
        # references hiding in subquery expressions — be conservative
        m = max(m, 2)
    return m


def store_sql(spark: SparkSession, sql: str, stores: dict[str, str],
              columns: dict[str, list[str]] | None = None):
    """Run one SQL statement over chunk stores with FULL filter pushdown.

    Registers a fresh pushdown relation per store (fresh provider -> fresh
    plan cache, see module docstring), binds it to the given view name,
    and returns the statement's DataFrame. WHERE clauses on int/timestamp/
    date/float/string columns prune buckets driver-side and chunks
    task-side through the decode zone maps before any payload decoding —
    the SQL-surface equivalent of decode_table(predicates=...).

    ``stores``: view name -> store dir. ``columns``: optional per-view
    projection (the Python DS API has no column pruning; project here so
    non-predicate columns aren't decoded at all)."""
    register(spark)
    for name, out_dir in stores.items():
        cols = (columns or {}).get(name)
        _load(spark, out_dir, cols, pushdown=True).createOrReplaceTempView(name)
    df = spark.sql(sql)
    if max_store_refs(df._jdf.queryExecution().analyzed()) > 1:
        # self-union / self-join over one store: pushdown reader state
        # would be shared across the scans (see max_store_refs) — fall
        # back to the always-correct full-decode relations
        for name, out_dir in stores.items():
            cols = (columns or {}).get(name)
            _load(spark, out_dir, cols,
                  pushdown=False).createOrReplaceTempView(name)
        return spark.sql(sql)
    return df


def store_sql_view(spark: SparkSession, out_dir: str, name: str,
                   columns: list[str] | None = None,
                   pushdown: bool = False) -> None:
    """Register a chunk store as a long-lived temp view.

    Default (``pushdown=False``) is ALWAYS correct for any sequence of
    queries: the relation's cached plan is the full decode and Spark
    applies every filter itself. ``pushdown=True`` turns on filter
    pushdown for the view — correct for queries carrying convertible
    filters, but a later filterless/unconvertible query on the same
    registration reuses the previous query's pruned plan (Spark 4.1.2
    readInfo caching, module docstring) — only enable it for views that
    are queried once or always with the same filter shape; prefer
    :func:`store_sql` otherwise."""
    register(spark)
    _load(spark, out_dir, columns, pushdown).createOrReplaceTempView(name)


def _read_meta(out_dir: str) -> dict:
    meta = Manifest(out_dir).read_table_meta()
    fmt = int(meta.get("format", 1))
    if fmt != engine.FORMAT_VERSION:
        raise ValueError(
            f"chunk store at {out_dir} has format v{fmt}; this build reads "
            f"v{engine.FORMAT_VERSION} — re-encode the store")
    return meta


class ChunkStoreDataSource(DataSource):
    """``spark.read.format("flowforge").option("path", store_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "flowforge"

    def _out_dir(self) -> str:
        out_dir = self.options.get("path")
        if not out_dir:
            raise ValueError(
                "flowforge data source needs .option('path', <store dir>) "
                "or .load(<store dir>)")
        return out_dir

    def schema(self) -> T.StructType:
        meta = _read_meta(self._out_dir())
        spark_schema = T.StructType.fromJson(meta["spark_schema"])
        cols_opt = self.options.get("columns")
        if not cols_opt:
            return spark_schema
        columns = [c.strip() for c in cols_opt.split(",") if c.strip()]
        by_name = {f.name: f for f in spark_schema.fields}
        unknown = [c for c in columns if c not in by_name]
        if unknown:
            raise ValueError(
                f"unknown columns {unknown}; store has {list(by_name)}")
        return T.StructType([by_name[c] for c in columns])

    def reader(self, schema: T.StructType) -> "ChunkStoreReader":
        return ChunkStoreReader(self._out_dir(), schema, self.options)


class ChunkStoreReader(DataSourceReader):
    def __init__(self, out_dir: str, schema: T.StructType, options) -> None:
        self.out_dir = out_dir
        self.columns = [f.name for f in schema.fields]
        self.require_complete = (
            str(options.get("require_complete", "true")).lower() != "false")
        # filter consumption is OPT-IN (module docstring: Spark 4.1.2 caches
        # the planned read per relation and pushFilters overwrites it, so a
        # pushdown plan is only safe on a single-query relation). Default
        # off: yield every filter back -> the cached plan is the full
        # decode, correct for any query sequence over the same view.
        self.pushdown = str(options.get("pushdown", "false")).lower() == "true"
        meta = _read_meta(out_dir)
        full = T.StructType.fromJson(meta["spark_schema"])
        self.by_name = {f.name: f.dataType.simpleString() for f in full.fields}
        # normalized predicate specs keyed by column (engine-internal form),
        # filled by pushFilters; empty_result short-circuits a provably
        # unsatisfiable conjunction (e.g. lang='en' AND lang='de')
        self.predicates: dict[str, tuple] = {}
        self.empty_result = False

    # --- filter translation --------------------------------------------------

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Translate Catalyst filters into decode predicate specs.

        Consumed filters are evaluated EXACTLY by the kernel row mask (and
        additionally prune buckets/chunks via zone maps); everything the
        engine cannot evaluate exactly is yielded back to Spark. With
        ``pushdown`` off (the default) every filter is yielded back, so the
        relation's cached plan stays the full decode (pinned in
        tests/test_datasource.py::test_view_default_is_correct_across_queries)."""
        if not self.pushdown:
            yield from filters
            return
        # accumulate per-column: AND of IN-sets intersects; range bounds
        # tighten; one prefix per column
        vals: dict[str, set] = {}
        los: dict[str, object] = {}
        his: dict[str, object] = {}
        prefixes: dict[str, str] = {}
        contains_: dict[str, str] = {}
        suffixes: dict[str, str] = {}
        nulls: dict[str, set] = {}  # col -> {"isnull", "notnull"}
        plans: list[tuple] = []  # (spec kind, col, original filter)
        remaining = []
        for f in filters:
            plan = self._translate(f, prefixes, contains_, suffixes)
            if plan is None:
                remaining.append(f)
                continue
            kind, col, payload = plan
            plans.append((kind, col, f))
            if kind == "in":
                vals[col] = vals[col] & payload if col in vals else set(payload)
            elif kind == "prefix":
                prefixes[col] = payload
            elif kind == "contains":
                contains_[col] = payload
            elif kind == "suffix":
                suffixes[col] = payload
            elif kind == "lo":
                los[col] = payload if col not in los else max(los[col], payload)
            elif kind == "hi":
                his[col] = payload if col not in his else min(his[col], payload)
            else:  # "null"
                nulls.setdefault(col, set()).add(payload)

        # one spec per column, priority in > prefix > contains > suffix >
        # range; filters whose kind lost the priority race are re-yielded
        # so Spark evaluates them
        consumed_kind: dict[str, str] = {}
        for col in {c for _, c, _ in plans}:
            t = self.by_name[col]
            if col not in vals and col not in prefixes \
                    and col not in contains_ and col not in suffixes \
                    and col not in los and col not in his:
                continue  # null-only column: resolved in the null pass below
            if col in vals:
                consumed_kind[col] = "in"
                if not vals[col]:
                    self.empty_result = True
                    continue
                svals = sorted(vals[col])
                self.predicates[col] = (
                    ("in", svals) if len(svals) > 1 else ("eq", svals[0]))
            elif col in prefixes:
                consumed_kind[col] = "prefix"
                self.predicates[col] = ("prefix", prefixes[col])
            elif col in contains_:
                consumed_kind[col] = "contains"
                self.predicates[col] = ("contains", contains_[col])
            elif col in suffixes:
                consumed_kind[col] = "suffix"
                self.predicates[col] = ("suffix", suffixes[col])
            else:
                consumed_kind[col] = "range"
                lo, hi = los.get(col), his.get(col)
                if t in ("float", "double"):
                    self.predicates[col] = (lo, hi)  # frange: None = unbounded
                else:
                    self.predicates[col] = (
                        _I64_MIN if lo is None else lo,
                        _I64_MAX if hi is None else hi,
                    )
        # null resolution: a consumed value spec never matches nulls, so
        # IS NOT NULL alongside one is implied (consumed for free) and
        # IS NULL alongside one (or IS NOT NULL) is a provable contradiction
        for col, kinds in nulls.items():
            has_value = col in consumed_kind
            if "isnull" in kinds and ("notnull" in kinds or has_value):
                self.empty_result = True
            elif "isnull" in kinds:
                self.predicates[col] = "isnull"
            elif not has_value:
                self.predicates[col] = "notnull"
        for kind, col, f in plans:
            if kind == "null":
                continue  # always consumed exactly (see null resolution)
            k = (kind if kind in ("in", "prefix", "contains", "suffix")
                 else "range")
            if consumed_kind.get(col) != k:
                remaining.append(f)
        yield from remaining

    def _translate(self, f, prefixes_seen: dict, contains_seen: dict,
                   suffixes_seen: dict) -> tuple | None:
        """One Catalyst filter -> ("in"|"prefix"|"contains"|"suffix"|
        "lo"|"hi", col, payload), or None when it cannot be evaluated
        exactly by the kernel."""
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            return None
        col = attr[0]
        t = self.by_name.get(col)
        if t is None:
            return None
        is_int = engine._is_predicate_type(t)
        is_str = t in ("string", "binary")
        is_float = t in ("float", "double")
        if isinstance(f, (IsNull, IsNotNull)):
            # any column type: the mask is pc.is_null/is_valid and pruning
            # uses the null counts every chunk meta / commit record carries
            return ("null", col, "isnull" if isinstance(f, IsNull) else "notnull")
        if isinstance(f, (EqualTo, In)):
            raw = f.value if isinstance(f, In) else [f.value]
            if any(v is None for v in raw):
                return None
            if is_str and all(isinstance(v, str) for v in raw):
                return ("in", col, set(raw))
            if is_int:
                conv = [self._to_epoch(v, t) for v in raw]
                if all(c is not None for c in conv):
                    return ("in", col, set(conv))
            return None
        if isinstance(f, StringStartsWith):
            # the engine spec takes ONE prefix set per column (OR list);
            # a second ANDed prefix cannot be merged — leave it to Spark
            if is_str and isinstance(f.value, str) and col not in prefixes_seen:
                return ("prefix", col, f.value)
            return None
        if isinstance(f, (StringContains, StringEndsWith)):
            # LIKE '%x%' / '%x' (round 5): no zone-map pruning, but the
            # kernel's exact byte-level mask decodes only the predicate
            # column (dict chunks test just the value store). One spec
            # per column per kind; empty probes stay Spark-side.
            seen = (contains_seen if isinstance(f, StringContains)
                    else suffixes_seen)
            kind = "contains" if isinstance(f, StringContains) else "suffix"
            if is_str and isinstance(f.value, str) and f.value \
                    and col not in seen:
                return (kind, col, f.value)
            return None
        if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
            v = f.value
            if is_float and isinstance(v, (int, float)) and not isinstance(v, bool):
                if isinstance(f, GreaterThanOrEqual):
                    return ("lo", col, float(v))
                if isinstance(f, LessThanOrEqual):
                    return ("hi", col, float(v))
                # strict float bound -> inclusive via nextafter (round 5,
                # see sqlagg._leaf_to_constraint: exact for double AND
                # promoted float32; NaN parity via the kernel's range
                # legs). +-inf literals stay Spark-side: x > inf must
                # keep NaN but drop +inf, inexpressible as one bound.
                fv = float(v)
                if math.isinf(fv):
                    return None
                if isinstance(f, GreaterThan):
                    return ("lo", col, math.nextafter(fv, math.inf))
                return ("hi", col, math.nextafter(fv, -math.inf))
            if not is_int:
                return None
            ep = self._to_epoch(v, t)
            if ep is None:
                return None
            if isinstance(f, GreaterThanOrEqual):
                return ("lo", col, ep)
            if isinstance(f, GreaterThan):
                return ("lo", col, ep + 1) if ep < _I64_MAX else None
            if isinstance(f, LessThanOrEqual):
                return ("hi", col, ep)
            return ("hi", col, ep - 1) if ep > _I64_MIN else None
        return None

    @staticmethod
    def _to_epoch(v, simple_type: str) -> int | None:
        """Filter literal -> int in the column's epoch unit (micros for
        timestamps — Spark's internal unit, hence the stored arrow unit;
        days for dates; identity for ints). None = not translatable."""
        if simple_type.startswith("timestamp"):
            if isinstance(v, _dt.datetime):
                if v.tzinfo is None:
                    # session-tz-naive value: converting needs the session
                    # zone, which the planning worker doesn't know — punt
                    return None
                d = v - _EPOCH
                return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            return None
        if simple_type == "date":
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                return (v - _EPOCH_DATE).days
            return None
        if isinstance(v, int) and not isinstance(v, bool):
            return int(v)
        return None

    # --- planning + execution -------------------------------------------------

    def partitions(self):
        """One input partition per surviving bucket — bucket-level zone-map
        pruning runs here, at plan time, exactly as in decode_table."""
        if self.empty_result:
            return []
        manifest = Manifest(self.out_dir)
        meta = _read_meta(self.out_dir)
        plan, phash = meta["plan"], meta["plan_hash"]
        foreign = manifest.commit_hashes() - {phash}
        if foreign:
            raise StorePlanError(
                f"chunk store at {self.out_dir} holds commits from foreign "
                f"bucket plan(s) {sorted(foreign)} — wipe and re-encode")
        committed_set = manifest.committed_buckets(phash)
        if self.require_complete and plan.get("mode") != "streaming":
            missing = set(range(int(plan["buckets"]))) - committed_set
            if missing:
                raise ValueError(
                    f"chunk store at {self.out_dir} is incomplete: "
                    f"{len(missing)} of {plan['buckets']} buckets "
                    f"uncommitted (resume via flowforge.engine.run_encode, "
                    f"or .option('require_complete', 'false'))")
        nonempty = [r for r in manifest.read_commits(phash)
                    if int(r["bucket"]) in committed_set and int(r["n_rows"]) > 0]
        if self.predicates:
            normalized = engine._normalize_predicates(self.predicates, self.by_name)
            buckets = engine._prune_buckets(nonempty, normalized)
        else:
            buckets = sorted(int(r["bucket"]) for r in nonempty)
        return [InputPartition(int(b)) for b in buckets]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        """Decode one bucket through the SHARED decode kernel — chunk zone
        maps, dictionary short-circuit, exact row masks, and late
        materialization are byte-for-byte the decode_table path."""
        if partition is None:
            # Spark encodes an empty partitions() list (everything pruned)
            # as a single None partition
            return
        predicates = (engine._normalize_predicates(self.predicates, self.by_name)
                      if self.predicates else None)
        kernel = engine._make_decode_kernel(self.out_dir, list(self.columns),
                                            predicates)
        feed = pa.record_batch({"bucket": pa.array([partition.value], pa.int64())})
        yield from kernel(iter([feed]))
