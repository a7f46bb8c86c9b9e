"""Reference-parity enrichment expressions (SURVEY §2 E1-E5).

Re-expresses /root/reference/core/enrich.go as pure Spark Column
expressions — JVM-side, whole-stage-codegen'd, no Python in the hot path:

- E1 time parts (enrich.go:44-51) — note Go Weekday() is Sunday=0 while
  Spark dayofweek is Sunday=1, so we subtract 1 (SURVEY §7.3 caveat)
- E2 RFC1918 private-IP predicate (enrich.go:82-103) — IPv4 octet
  arithmetic; invalid/IPv6/empty -> false, like net.ParseIP failure
- E3 direction derivation (enrich.go:106-117)
- E4 port->service (enrich.go:120-143) and protocol->service (:146-157)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# port -> service, per core/enrich.go:121-138 (a 15-entry static config map)
SERVICE_MAP: dict[int, str] = {
    53: "dns", 80: "http", 443: "https", 22: "ssh", 25: "smtp",
    587: "smtp", 993: "imaps", 995: "pop3s", 1433: "mssql",
    3306: "mysql", 5432: "postgresql", 3389: "rdp", 5900: "vnc",
    8080: "http-proxy", 8443: "https-alt",
}

# protocol -> service, per core/enrich.go:147-151 (identity for known,
# pass-through otherwise -> the whole function is identity; kept for parity)
PROTOCOL_MAP: dict[str, str] = {"tcp": "tcp", "udp": "udp", "icmp": "icmp"}

_IPV4_RE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def time_parts(event_time_ms: Column) -> dict[str, Column]:
    """E1: year/month/day/hour/weekday from epoch-ms (enrich.go:44-51).

    Weekday is Sunday=0 (Go time.Weekday), hence dayofweek-1.
    """
    ts = F.timestamp_millis(event_time_ms.cast("long"))
    return {
        "event_year": F.year(ts).cast("int"),
        "event_month": F.month(ts).cast("int"),
        "event_day": F.dayofmonth(ts).cast("int"),
        "event_hour": F.hour(ts).cast("int"),
        "event_weekday": (F.dayofweek(ts) - F.lit(1)).cast("int"),
    }


def _octet(ip: Column, i: int) -> Column:
    return F.regexp_extract(ip, _IPV4_RE, i).cast("int")


def is_private_ip(ip: Column) -> Column:
    """E2: RFC1918 membership (enrich.go:82-103). Non-IPv4 -> false."""
    valid = ip.rlike(_IPV4_RE)
    o = [_octet(ip, i) for i in (1, 2, 3, 4)]
    in_range = (o[0] <= 255) & (o[1] <= 255) & (o[2] <= 255) & (o[3] <= 255)
    private = (
        (o[0] == 10)
        | ((o[0] == 172) & (o[1] >= 16) & (o[1] <= 31))
        | ((o[0] == 192) & (o[1] == 168))
    )
    return F.when(valid & in_range & private, F.lit(True)).otherwise(F.lit(False))


def direction(src_private: Column, dst_private: Column) -> Column:
    """E3: outbound/inbound/internal/external (enrich.go:106-117)."""
    return (
        F.when(src_private & ~dst_private, F.lit("outbound"))
        .when(~src_private & dst_private, F.lit("inbound"))
        .when(src_private & dst_private, F.lit("internal"))
        .otherwise(F.lit("external"))
    )


def port_to_service(port: Column) -> Column:
    """E4: 15-entry port map, default "unknown" (enrich.go:120-143)."""
    pairs = []
    for p, s in SERVICE_MAP.items():
        pairs.extend([F.lit(p), F.lit(s)])
    m = F.create_map(*pairs)
    return F.coalesce(m[port.cast("int")], F.lit("unknown"))


def protocol_to_service(protocol: Column) -> Column:
    """E4b: protocol map with pass-through default (enrich.go:146-157)."""
    pairs = []
    for p, s in PROTOCOL_MAP.items():
        pairs.extend([F.lit(p), F.lit(s)])
    m = F.create_map(*pairs)
    return F.coalesce(m[protocol], protocol)


def service(dst_port: Column, protocol: Column, raw_service: Column | None = None) -> Column:
    """E5 composition: port first, else protocol (enrich.go:70-76); the Kafka
    sink overrides with the raw service field when present
    (kafka_producer.go:72-78) -> coalesce(raw, enriched)."""
    enriched = F.when(dst_port > 0, port_to_service(dst_port)).otherwise(
        protocol_to_service(protocol)
    )
    if raw_service is not None:
        return F.coalesce(raw_service, enriched)
    return enriched
