"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: encode the sf0.001 ``documents`` table through
the full engine (salted repartition -> mapInArrow codec kernels -> chunk
store), decode it back, and return the per-column compression report with a
bit-identity verdict.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; DuckDB runs the oracle on the same parquet views. Round-trip
queries aggregate the DECODED table, so a hash match against the source
proves lossless encode/decode.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowforge import engine
from flowforge import queries as Q
from flowforge.functions.enrich import SERVICE_MAP


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="flowforge_entry_")
    try:
        engine.run_encode(spark, src, out, salt_col="doc_id", buckets=8)
        decoded = engine.decode_table(spark, out)
        diffs = decoded.exceptAll(src).count() + src.exceptAll(decoded).count()
        report = engine.compression_report(spark, out)
        out_df = report.withColumn("bit_identical", F.lit(diffs == 0)).select(
            "column", "bytes_in", "bytes_out", "ratio", "codecs", "bit_identical"
        )
        # pin the (5-row, already-aggregated) report eagerly: since r4,
        # compression_report is LAZY over the store's commit logs, and the
        # finally below deletes the store before the driver collects
        return spark.createDataFrame(out_df.collect(), out_df.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # engine round-trip (lossless encode->decode proven vs source oracle)
        "roundtrip_doc_text_md5": Q.q_roundtrip_doc_text_md5,
        "roundtrip_events_fingerprint": Q.q_roundtrip_events_fingerprint,
        "roundtrip_pruned_scan": Q.q_roundtrip_pruned_scan,
        "decode_source_prefix": Q.q_decode_source_prefix,
        "roundtrip_clustered_prune": Q.q_roundtrip_clustered_prune,
        "decode_value_range": Q.q_decode_value_range,
        "store_sql_filter": Q.q_store_sql_filter,
        "store_group_daily": Q.q_store_group_daily,
        "store_agg_window": Q.q_store_agg_window,
        "store_group_sums": Q.q_store_group_sums,
        "store_sqlagg_route": Q.q_store_sqlagg_route,
        "store_topk_latest": Q.q_store_topk_latest,
        "store_sqlagg_grouped_where": Q.q_store_sqlagg_grouped_where,
        # round 5: composite GROUP BY + HAVING, filtered top-k, OR/IS NULL
        "store_sqlagg_grouped2": Q.q_store_sqlagg_grouped2,
        "store_topk_filtered": Q.q_store_topk_filtered,
        "store_null_or": Q.q_store_null_or,
        # reference-parity normalize/enrich (SURVEY §2 S2, P1-P4, E1-E5, F1, R1)
        "json_parse_demux": Q.q_json_parse_demux,
        "normalize_promote": Q.q_normalize_promote,
        "enrich_network": Q.q_enrich_network,
        "enrich_service": Q.q_enrich_service,
        "filter_known_types": Q.q_filter_known_types,
        "route_buckets": Q.q_route_buckets,
        # config-driven multi-log-type registry (C1/S2/K4/E5 end-to-end)
        "multitype_normalize": Q.q_multitype_normalize,
        # relational operators (SURVEY §2.2 categories, DuckDB-oracled)
        "window_running": Q.q_window_running,
        # joined-statement aggregate routing (late round 5): store JOIN dim
        # answers off kernel partials + a broadcast dim join — the CUBE
        # grouping-sets shape this slot held moved into
        # store_sqlagg_grouped2's ROLLUP (same lattice machinery)
        "store_sqlagg_join": Q.q_store_sqlagg_join,
        "anti_customers_no_orders": Q.q_anti_customers_no_orders,
        "semi_parts_shipped": Q.q_semi_parts_shipped,
        "range_join_late_lines": Q.q_range_join_late_lines,
        "asof_prev_view": Q.q_asof_prev_view,
        "tpch_pricing": Q.q_tpch_pricing,
        "tpch_shipping": Q.q_tpch_shipping,
        "tpch_region_volume": Q.q_tpch_region_volume,
        "except_doc_slices": Q.q_except_doc_slices,
        # training-data pipeline: text analysis
        "token_counts": Q.q_token_counts,
        "group_checksum": Q.q_group_checksum,
        "text_quality": Q.q_text_quality,
        "lang_id": Q.q_lang_id,
        "doc_fingerprint": Q.q_doc_fingerprint,        # golden oracle
        # training-data pipeline: deduplication
        "dedup_exact": Q.q_dedup_exact,
        "ngram_jaccard": Q.q_ngram_jaccard,
        "minhash_lsh": Q.q_minhash_lsh,                # golden oracle
        "simhash_near_dups": Q.q_simhash_near_dups,    # golden oracle
        # training-data pipeline: similarity search
        "ann_cosine_scores": Q.q_ann_cosine_scores,
        "cosine_lsh_pairs": Q.q_cosine_lsh_pairs,      # golden oracle
        "ann_lsh_topk": Q.q_ann_lsh_topk,              # golden oracle
        "ann_ivf_topk": Q.q_ann_ivf_topk,              # golden oracle
        # multimodal: real lib-free decode (P6/WAV) + batch plumbing
        "multimodal_real_features": Q.q_multimodal_real_features,  # golden
        "multimodal_frame_sample": Q.q_multimodal_frame_sample,  # golden
        # reference sink/metrics analogs (SURVEY §2 K5, M1)
        "kafka_output_shape": Q.q_kafka_output_shape,    # structurally oracled
        "metrics_lineage": Q.q_metrics_lineage,          # value-oracled lineage
    }


def oracle_sql() -> dict[str, str]:
    src_ip = Q.SRC_IP_SQL.replace(" AS STRING", " AS VARCHAR")
    dst_ip = Q.DST_IP_SQL.replace(" AS STRING", " AS VARCHAR")
    dst_port = Q.DST_PORT_SQL_DUCK
    private = lambda ip: (  # noqa: E731 — RFC1918 on a synthesized IPv4 expr
        f"(string_split({ip}, '.')[1]::INT = 10 "
        f"OR (string_split({ip}, '.')[1]::INT = 172 AND string_split({ip}, '.')[2]::INT BETWEEN 16 AND 31) "
        f"OR (string_split({ip}, '.')[1]::INT = 192 AND string_split({ip}, '.')[2]::INT = 168))"
    )
    service_case = " ".join(
        f"WHEN dst_port = {p} THEN '{s}'" for p, s in SERVICE_MAP.items()
    )
    return {
        "roundtrip_doc_text_md5": (
            "SELECT doc_id, md5(text) AS text_md5 FROM documents"
        ),
        "roundtrip_events_fingerprint": (
            "SELECT event_id, epoch_ms(ts) AS ts_ms, "
            "CAST(floor(value * 100) AS BIGINT) AS value_c, "
            "md5(event_type || '|' || props) AS row_md5 FROM events"
        ),
        # zone-map pushdown: engine decodes only the predicate range from a
        # direct-mode store; the oracle filters the source directly
        "roundtrip_pruned_scan": (
            "SELECT event_id, epoch_ms(ts) AS ts_ms, "
            "CAST(floor(value * 100) AS BIGINT) AS value_c FROM events "
            f"WHERE epoch_us(ts) BETWEEN {1_704_067_200_000_000 + 3 * 86_400_000_000} "
            f"AND {1_704_067_200_000_000 + 13 * 86_400_000_000}"
        ),
        # string-prefix pushdown: byte-range zone maps + dictionary prefix
        # short-circuit; oracle LIKE-filters the source
        "decode_source_prefix": (
            "SELECT doc_id, source, n_chars FROM documents "
            "WHERE source LIKE 'src1%'"
        ),
        # float-range pushdown: order-preserving-key zone maps (format v5)
        # prune value chunks; the oracle filters the source
        "decode_value_range": (
            "SELECT event_id, value FROM events "
            "WHERE value >= 10.0 AND value <= 25.0"
        ),
        # SQL-surface pushdown: spark.sql WHERE over a registered store
        # relation reaches the decode zone maps via DataSource pushFilters;
        # the oracle filters the source
        "store_sql_filter": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE lang = 'en' AND source LIKE 'src1%'"
        ),
        # derived time-key GROUP BY (round 5): calendar keys computed inside
        # the grouped kernel before code assignment; oracle GROUP BYs the
        # source (CASTs: DuckDB year/month/day return BIGINT, sum HUGEINT)
        "store_group_daily": (
            "SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m, "
            "CAST(day(ts) AS INT) AS d, count(*) AS cnt, "
            "CAST(sum(user_id) AS BIGINT) AS sum_uid, "
            "count(value) AS nn_value, min(event_id) AS min_id "
            "FROM events GROUP BY year(ts), month(ts), day(ts)"
        ),
        # SUM/MIN/MAX pushdown (format v7): interior window buckets answered
        # from commit-record exact sums; oracle aggregates the filtered
        # source (CASTs: DuckDB sum(BIGINT) returns HUGEINT)
        "store_agg_window": (
            "SELECT count(*) AS cnt, min(event_id) AS min_id, "
            "max(event_id) AS max_id, CAST(sum(user_id) AS BIGINT) AS sum_uid, "
            "epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us "
            "FROM events "
            f"WHERE epoch_us(ts) BETWEEN {1_704_067_200_000_000 + 5 * 86_400_000_000} "
            f"AND {1_704_067_200_000_000 + 20 * 86_400_000_000}"
        ),
        # grouped SUM at the codec layer: dict code streams aggregate
        # without materializing group values; oracle GROUP BYs the source.
        # share/rank exercise the late-round-5 window-over-aggregate route
        # (both engines divide the same exactly-representable longs in
        # double, so the shares hash identically)
        "store_group_sums": (
            "SELECT lang, count(*) AS cnt, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(count(*) AS DOUBLE) / "
            "CAST(sum(count(*)) OVER () AS DOUBLE) AS share, "
            "CAST(rank() OVER (ORDER BY count(*) DESC, lang) "
            "AS INTEGER) AS rnk "
            "FROM documents GROUP BY lang"
        ),
        # SQL-text aggregate routing (flowforge/sqlagg.py): same semantics
        # the user's statement has, oracled against the source table
        # text LIKE '%window%' exercises the late-round-5 CONTAINS route
        # (mask-only, no zone pruning); the CASE WHEN over count(*) the
        # branch-expression-over-aggregates route
        "store_sqlagg_route": (
            "SELECT count(*) AS cnt, count(text) AS nn_text, "
            "CAST(count(DISTINCT source) AS BIGINT) AS nsrc, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "min(n_chars) AS min_chars, max(n_chars) AS max_chars, "
            "CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars, "
            "CASE WHEN count(*) > 100 THEN 'many' ELSE 'few' END AS vol "
            "FROM documents WHERE (lang IN ('en', 'de') OR n_chars > 4500) "
            "AND source LIKE 'src1%' AND text LIKE '%window%'"
        ),
        # round-5 oracle path: WHERE pushdown + DERIVED SCALAR group key
        # (upper — kernels group raw lang codes, Spark evaluates the
        # rebuilt expression over ndv-bounded partials, re-group merges)
        # + ARITHMETIC OVER AGGREGATES (sum/count via hidden outputs);
        # DuckDB evaluates the plain SQL per row
        "store_sqlagg_grouped_where": (
            "SELECT upper(lang) AS lang_u, count(*) AS cnt, "
            "CAST(count(DISTINCT source) AS BIGINT) AS nsrc, "
            "count(n_chars) AS nn_chars, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(sum(n_chars) AS DOUBLE) / count(*) AS chars_per_doc "
            "FROM documents "
            "WHERE source LIKE 'src1%' AND n_chars BETWEEN 100 AND 4000 "
            "GROUP BY upper(lang)"
        ),
        # composite GROUP BY + HAVING (round 5): routed to the
        # combined-code-stream kernel; HAVING post-filters routed partials
        "store_sqlagg_grouped2": (
            # DuckDB spells Spark's no-arg grouping_id() as
            # GROUPING_ID(keys...) — same leftmost-key-is-MSB bit layout
            "SELECT lang, source, "
            "CAST(GROUPING_ID(lang, source) AS BIGINT) AS gid, "
            "CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "min(n_chars) AS min_chars, max(n_chars) AS max_chars, "
            "CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS avg_chars, "
            "min(doc_id) AS min_id "
            "FROM documents WHERE n_chars BETWEEN 50 AND 5000 "
            "GROUP BY ROLLUP(lang, source) HAVING count(*) >= 2 "
            "ORDER BY cnt DESC, gid, lang NULLS FIRST, source NULLS FIRST "
            "LIMIT 40"
        ),
        # filtered top-k (round 5): WHERE reaches the topk kernel masks;
        # tie column keeps the 25-row set deterministic
        "store_topk_filtered": (
            "SELECT event_id, epoch_ms(ts) AS ts_ms, user_id FROM events "
            "WHERE event_type = 'click' ORDER BY ts DESC, event_id LIMIT 25"
        ),
        # OR + IS NULL pushdown (round 5) over a null-bearing derived store;
        # the oracle derives the same null pattern inline. median exercises
        # the late-round-5 combo-row percentile route (both engines
        # interpolate adjacent order stats in double; the 6-decimal
        # canonical compare absorbs formula-order ulps)
        "store_null_or": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS cnt, "
            "median(n_chars) AS med_chars FROM "
            "(SELECT NULLIF(lang, 'en') AS lang, n_chars FROM documents) "
            "WHERE lang = 'de' OR lang IS NULL GROUP BY lang"
        ),
        # ORDER BY/LIMIT pushdown: the tie-break column makes the 25-row
        # set deterministic, so the order-insensitive compare is exact
        "store_topk_latest": (
            "SELECT event_id, epoch_ms(ts) AS ts_ms, user_id FROM events "
            "ORDER BY ts DESC, event_id LIMIT 25"
        ),
        # time-clustered store: engine decodes a 2-day window with >90% of
        # buckets pruned off commit zone maps; oracle filters the source
        "roundtrip_clustered_prune": (
            "SELECT event_id, epoch_ms(ts) AS ts_ms, user_id FROM events "
            f"WHERE epoch_us(ts) BETWEEN {1_704_067_200_000_000 + 10 * 86_400_000_000} "
            f"AND {1_704_067_200_000_000 + 12 * 86_400_000_000}"
        ),
        "json_parse_demux": (
            "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k, "
            "COALESCE(CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END, "
            "'_path') AS log_type FROM events"
        ),
        "normalize_promote": (
            "SELECT event_id AS flow_id, epoch_ms(ts) AS event_time, "
            "event_type AS protocol, 'events' AS event_class, "
            "CAST(user_id AS INT) AS src_port FROM events"
        ),
        "enrich_network": (
            f"WITH ips AS (SELECT event_id, {src_ip} AS src_ip, {dst_ip} AS dst_ip FROM events) "
            f"SELECT event_id, src_ip, dst_ip, "
            f"{private('src_ip')} AS src_ip_is_private, "
            f"{private('dst_ip')} AS dst_ip_is_private, "
            f"CASE WHEN {private('src_ip')} AND NOT {private('dst_ip')} THEN 'outbound' "
            f"WHEN NOT {private('src_ip')} AND {private('dst_ip')} THEN 'inbound' "
            f"WHEN {private('src_ip')} AND {private('dst_ip')} THEN 'internal' "
            f"ELSE 'external' END AS direction FROM ips"
        ),
        "enrich_service": (
            f"WITH p AS (SELECT event_id, "
            f"CASE WHEN event_id % 7 = 0 THEN 0 ELSE {dst_port} END AS dst_port, "
            f"event_type FROM events) "
            f"SELECT event_id, CAST(dst_port AS INT) AS dst_port, "
            f"CASE WHEN dst_port > 0 THEN (CASE {service_case} ELSE 'unknown' END) "
            f"ELSE event_type END AS service FROM p"
        ),
        "filter_known_types": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c "
            "FROM events WHERE event_type IN ('click','view','purchase') "
            "GROUP BY event_type"
        ),
        "route_buckets": (
            "SELECT event_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS users "
            "FROM events GROUP BY event_id % 8"
        ),
        # the registry pipeline computed directly (no JSON round trip):
        # equivalent semantics per type — promotion targets, statics,
        # flag-gated time parts (http: enrich.time=false -> NULLs), F1 drop
        "multitype_normalize": (
            f"WITH base AS (SELECT event_id, user_id, event_type AS et, ts, "
            f"CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'conn' WHEN 1 THEN 'dns' "
            f"WHEN 2 THEN 'http' ELSE 'smb' END AS log_type, "
            f"{src_ip} AS sip, {dst_ip} AS dip, {dst_port} AS dport FROM events) "
            f"SELECT log_type, dip AS dst_ip, "
            f"CASE WHEN log_type IN ('conn','http') THEN CAST(dport AS INT) END AS dst_port, "
            f"CASE log_type WHEN 'conn' THEN 'network' WHEN 'dns' THEN 'dns' ELSE 'web' END AS event_class, "
            f"CASE WHEN log_type <> 'http' THEN CAST(day(ts) AS INT) END AS event_day, "
            f"CASE WHEN log_type <> 'http' THEN CAST(hour(ts) AS INT) END AS event_hour, "
            f"CASE WHEN log_type <> 'http' THEN CAST(month(ts) AS INT) END AS event_month, "
            f"CAST(floor(epoch_us(ts)/1000000) AS BIGINT) * 1000 AS event_time, "
            f"CASE log_type WHEN 'conn' THEN 'network_connection' WHEN 'dns' THEN 'dns' ELSE 'http' END AS event_type, "
            f"CASE WHEN log_type <> 'http' THEN CAST(date_part('dow', ts) AS INT) END AS event_weekday, "
            f"CASE WHEN log_type <> 'http' THEN CAST(year(ts) AS INT) END AS event_year, "
            f"'C' || CAST(event_id AS VARCHAR) AS flow_id, "
            f"CASE WHEN log_type IN ('conn','dns') THEN et END AS protocol, "
            f"CAST(NULL AS VARCHAR) AS service, "
            f"sip AS src_ip, "
            f"CASE WHEN log_type = 'conn' THEN CAST(user_id % 60000 AS INT) END AS src_port "
            f"FROM base WHERE log_type IN ('conn','dns','http')"
        ),
        "window_running": (
            "SELECT event_id, "
            "CAST(row_number() OVER w AS INT) AS seq, "
            "lag(event_id) OVER w AS prev_event_id, "
            # outer CAST matters: DuckDB's window sum(BIGINT) returns
            # HUGEINT, which stringifies as a float and breaks the hash
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_value_c "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        # joined-statement routing (late round 5): kernel partials on the
        # store join key, broadcast inner join vs the VALUES dim, re-merge
        "store_sqlagg_join": (
            "SELECT d.region AS region, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(s.n_chars) AS BIGINT) AS sum_chars, "
            "min(s.doc_id) AS min_id, max(s.n_chars) AS max_chars, "
            "count(s.text) AS nn_text, "
            "sum(d.w) AS sum_w, avg(d.w) AS avg_w "
            "FROM documents s JOIN (VALUES "
            "('en', 'west', CAST(1.5 AS DOUBLE)), "
            "('de', 'east', CAST(2.25 AS DOUBLE)), "
            "('fr', 'west', CAST(0.5 AS DOUBLE)), "
            "('it', 'north', CAST(0.25 AS DOUBLE))) "
            "AS d(lang, region, w) ON s.lang = d.lang "
            "WHERE s.n_chars > 100 AND d.w >= 0.5 "
            "GROUP BY d.region ORDER BY region"
        ),
        "anti_customers_no_orders": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS no_order_customers "
            "FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
            "GROUP BY c_mktsegment"
        ),
        "semi_parts_shipped": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS shipped_parts "
            "FROM part p WHERE EXISTS "
            "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey) "
            "GROUP BY p_brand"
        ),
        "range_join_late_lines": (
            "SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, "
            "CAST(count(*) AS BIGINT) AS late_lines, "
            "CAST(sum(floor(l_extendedprice)) AS BIGINT) AS sum_price_fl "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE date_diff('day', o_orderdate, l_shipdate) BETWEEN 60 AND 120 "
            "GROUP BY strftime(l_shipdate, '%Y-%m')"
        ),
        "asof_prev_view": (
            "WITH e AS (SELECT event_id, user_id, event_type, "
            "epoch_ms(ts) * 1000000 + event_id AS k FROM events), "
            "p AS (SELECT * FROM e WHERE event_type = 'purchase'), "
            "v AS (SELECT event_id, user_id, k FROM e WHERE event_type = 'view') "
            "SELECT p.event_id, p.user_id, v.event_id AS prev_view_id, "
            "v.k AS prev_view_k "
            "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.k <= p.k"
        ),
        # TPC-H-shaped queries (Q1/Q3/Q5 analogs): money measures are
        # floor-scaled cents BIGINTs so fp accumulation order can't skew
        # the comparison; Q3's ordering key set is total so LIMIT is
        # deterministic
        "tpch_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_shipping": (
            "SELECT l_orderkey, epoch_ms(o_orderdate) AS o_date_ms, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
            "AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00' "
            "GROUP BY l_orderkey, o_date_ms "
            "ORDER BY revenue_c DESC, o_date_ms ASC, l_orderkey ASC LIMIT 10"
        ),
        "tpch_region_volume": (
            "SELECT n_name, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c, "
            "count(*) AS n_lines "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
            "GROUP BY n_name"
        ),
        "except_doc_slices": (
            "SELECT lang, source FROM documents WHERE doc_id % 2 = 0 "
            "EXCEPT ALL "
            "SELECT lang, source FROM documents WHERE lang = 'en'"
        ),
        "token_counts": (
            r"SELECT doc_id, "
            r"CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(string_split_regex(trim(text), '\s+')) END AS INT) AS tokens, "
            r"CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens "
            r"FROM documents"
        ),
        "group_checksum": (
            "SELECT lang, "
            "bit_xor(CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT)) AS checksum, "
            "CAST(count(*) AS BIGINT) AS cnt "
            "FROM documents GROUP BY lang"
        ),
        "text_quality": _text_quality_oracle(),
        "lang_id": _lang_id_oracle(),
        "dedup_exact": (
            "SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, "
            "CAST(count(*) AS BIGINT) AS dups FROM documents GROUP BY md5(text)"
        ),
        "ngram_jaccard": _ngram_jaccard_oracle(),
        # cosine oracles use an explicit double fold (list_transform+list_sum)
        # mirroring Spark's sequential aggregate — DuckDB's builtin
        # list_cosine_similarity accumulates in float32 (1e-7 drift, flips
        # floor boundaries); the explicit form agrees to 6e-17 (verified)
        "ann_cosine_scores": (
            f"SELECT vec_id, CAST(floor({_cos_sql('embedding', _query_vec_sql())} * 1e5) AS BIGINT) "
            f"AS cos_m FROM embeddings"
        ),
        # seeded/non-SQL operators: golden parquet produced by INDEPENDENT
        # pure-Python reimplementations (tools/make_golden.py) — a value
        # match checks the vectorized kernels against a second derivation
        # K5 structural oracle: the Spark side extracts these fields back
        # out of its serialized 3-layer message; the oracle computes the
        # expected values directly
        "kafka_output_shape": (
            "SELECT event_type AS key, 'flowforge' AS msg_source, "
            "event_type AS msg_log_type, event_id AS flow_id, "
            "epoch_ms(ts) AS event_time, CAST(year(ts) AS INT) AS event_year, "
            "props AS raw_log FROM events"
        ),
        # M1 lineage: rows must equal the table count per column; bytes_in
        # re-derives the codec's logical-input definition (value bytes +
        # 8/row for strings, 8/row for the int64 domain) from the source
        "metrics_lineage": (
            "SELECT \"column\", CAST(rows AS BIGINT) AS rows, "
            "CAST(bytes_in AS BIGINT) AS bytes_in FROM ("
            "SELECT 'doc_id' AS \"column\", count(*) AS rows, "
            "8 * count(*) AS bytes_in FROM documents "
            "UNION ALL SELECT 'lang', count(*), "
            "coalesce(sum(strlen(lang)), 0) + 8 * count(*) FROM documents "
            "UNION ALL SELECT 'n_chars', count(*), 8 * count(*) FROM documents "
            "UNION ALL SELECT 'source', count(*), "
            "coalesce(sum(strlen(source)), 0) + 8 * count(*) FROM documents "
            "UNION ALL SELECT 'text', count(*), "
            "coalesce(sum(strlen(text)), 0) + 8 * count(*) FROM documents)"
        ),
        "minhash_lsh": _golden("minhash_lsh"),
        "simhash_near_dups": _golden("simhash_near_dups"),
        "ann_lsh_topk": _golden("ann_lsh_topk"),
        "ann_ivf_topk": _golden("ann_ivf_topk"),
        "cosine_lsh_pairs": _golden("cosine_lsh_pairs"),
        "doc_fingerprint": _golden("doc_fingerprint"),
        "multimodal_real_features": _golden("multimodal_real_features"),
        "multimodal_frame_sample": _golden("multimodal_frame_sample"),
    }


def _golden(name: str) -> str:
    """Serve a golden oracle, validating its recorded provenance first: a
    golden built from different source data fails loudly here instead of
    surfacing as a confusing value-hash mismatch (ADVICE r02)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "golden", f"{name}_sf001.parquet")
    meta = pq.read_schema(path).metadata or {}
    sf_dir = meta.get(b"flowforge_source_sf_dir", b"").decode()
    fp = meta.get(b"flowforge_source_fp", b"").decode()
    if sf_dir.startswith("/"):
        from tools.make_golden import source_fingerprint

        src = "embeddings" if ("ann_" in name or "cosine" in name) else "documents"
        live = source_fingerprint(os.path.join(sf_dir, f"{src}.parquet"))
        if live != fp:
            raise RuntimeError(
                f"golden oracle {name} was generated from {sf_dir}/{src}.parquet "
                f"with content fp {fp}, but that file now has fp {live} — "
                f"regenerate with: python tools/make_golden.py --sf-dir {sf_dir}"
            )
    return f"SELECT * FROM read_parquet('{path}')"


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    """Cosine in explicit double arithmetic (matches Spark's fold order)."""
    def dot(x, y):
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> CAST(({x})[i] AS DOUBLE) * CAST(({y})[i] AS DOUBLE)))")
    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _query_vec_sql() -> str:
    return "[" + ", ".join(f"{v}" for v in Q._query_vector(Q.QUERY_VEC_DIM)) + "]"


def _text_quality_oracle() -> str:
    tokens = (
        r"CASE WHEN length(trim(text)) = 0 THEN 0 "
        r"ELSE len(string_split_regex(trim(text), '\s+')) END"
    )
    punct = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
    pr = f"({punct} / greatest(length(text), 1))"
    mean_word = f"(length(text) / greatest({tokens}, 1))"
    len_ok = "CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END"
    word_ok = f"CASE WHEN {mean_word} >= 3 AND {mean_word} <= 12 THEN 1.0 ELSE 0.0 END"
    punct_ok = f"CASE WHEN {pr} < 0.1 THEN 1.0 ELSE 0.0 END"
    return (
        f"SELECT doc_id, CAST(floor({pr} * 1e6) AS BIGINT) AS punct_ratio_m, "
        f"CAST(floor((({len_ok}) + ({word_ok}) + ({punct_ok})) / 3.0 * 1e6) AS BIGINT) AS quality_m "
        f"FROM documents"
    )


def _lang_id_oracle() -> str:
    from flowforge.functions.textops import LANG_NGRAMS

    score_exprs = {
        lang: " + ".join(f"len(regexp_extract_all(text, '{g}'))" for g in grams)
        for lang, grams in LANG_NGRAMS.items()
    }
    scores_sql = ", ".join(f"({e}) AS s_{lang}" for lang, e in score_exprs.items())
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_NGRAMS) + ")"
    # tie-break mirrors Spark greatest(struct(score, lang)): lex-largest lang
    chain = " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in sorted(LANG_NGRAMS, reverse=True)
    )
    return (
        f"WITH s AS (SELECT doc_id, {scores_sql} FROM documents), "
        f"mm AS (SELECT doc_id, {m} AS m, * FROM s) "
        f"SELECT doc_id, CASE WHEN m > 0 THEN (CASE {chain} END) ELSE 'other' END AS lang_pred "
        f"FROM mm"
    )


def _ngram_jaccard_oracle(n: int = 2, threshold: float = 0.05) -> str:
    return rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words FROM documents WHERE doc_id < 500
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(words) - {n - 1}, 1) + 1),
                       i -> words[i] || ' ' || words[i + 1])) AS grams
  FROM w
), e AS (
  SELECT doc_id, len(grams) AS n_sh, unnest(grams) AS g FROM sh
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         count(*) AS common
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(floor(common / (n_a + n_b - common) * 1e6) AS BIGINT) AS jaccard_m
FROM pairs
WHERE floor(common / (n_a + n_b - common) * 1e6) >= {threshold} * 1e6
"""
