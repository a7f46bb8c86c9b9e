"""Reference-parity normalization expressions (SURVEY §2 P1-P4, F1).

Re-expresses /root/reference/core/normalize.go as declarative DataFrame
transforms driven by a rules dict — the Spark analog of
config/normalization.json + the Normalize() switch (normalize.go:66-156).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class NormalizationRule:
    """One log type's rule: promotions, statics, enrich flags.

    Mirrors core/normalize.go:50-55 (Promote / StaticFields / Enrich)."""

    promote: dict[str, str] = field(default_factory=dict)  # raw field -> canonical
    static_fields: dict[str, str] = field(default_factory=dict)
    enrich_time: bool = True
    enrich_network: bool = True


def ts_seconds_to_ms(ts_sec: Column) -> Column:
    """P2: Zeek float-seconds -> int64 epoch ms (normalize.go:115-119)."""
    return (ts_sec * 1000).cast("long")


def promote(df: DataFrame, rule: NormalizationRule) -> DataFrame:
    """P1: copy raw fields to canonical names; promoted replace raw
    (normalize.go:100-153). Dotted raw names must be pre-flattened
    (generate_schema.go:284-287)."""
    out = df
    for raw, canon in rule.promote.items():
        if raw not in df.columns:
            continue
        col = F.col(raw)
        if canon == "event_time":
            col = ts_seconds_to_ms(col)
        elif canon in ("src_port", "dst_port"):
            col = col.cast("int")
        out = out.withColumn(canon, col)
        if raw != canon and raw in out.columns:
            out = out.drop(raw)
    return out


def inject_statics(df: DataFrame, rule: NormalizationRule) -> DataFrame:
    """P3: static literal injection (normalize.go:91-97)."""
    out = df
    for name, value in rule.static_fields.items():
        out = out.withColumn(name, F.lit(value))
    return out


def filter_known_types(df: DataFrame, type_col: str, known: list[str]) -> DataFrame:
    """F1: silently drop unknown log types (normalize.go:67-70,
    main.go:246-249) — a broadcast-semi-join-shaped isin filter."""
    return df.filter(F.col(type_col).isin(known))


def normalize(df: DataFrame, rule: NormalizationRule, type_col: str | None = None,
              known: list[str] | None = None) -> DataFrame:
    """Full P1-P4+F1 pipeline for one log type."""
    out = df
    if type_col and known:
        out = filter_known_types(out, type_col, known)
    out = promote(out, rule)
    out = inject_statics(out, rule)
    # P4: ingest timestamp — once per batch for determinism (SURVEY §2 P4)
    return out.withColumn("ingest_time", F.unix_millis(F.current_timestamp()))
