"""SQL aggregate routing (flowforge/sqlagg.py): route + fallback parity.

Every statement runs THREE ways — store_agg_sql (routed when possible),
plain spark.sql over the same registered view (Spark executes), and, for
the routable set, the route dry-run — and must agree on rows AND schema,
so a user can swap store_agg_sql in for spark.sql with no visible change
except cost.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flowforge import engine, sqlagg

ROWS = 3000


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    rows = [
        (
            int(i),
            ["en", "de", "fr", None][int(rng.integers(0, 4))],
            f"src{int(rng.integers(0, 20))}/item{i}",
            int(rng.integers(0, 5000)),
            float(rng.standard_normal()),
        )
        for i in range(ROWS)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long, "
              "score double")
    out = str(tmp_path_factory.mktemp("sqlagg")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="source")
    return out


ROUTABLE = [
    "SELECT count(*) AS cnt FROM docs",
    "SELECT count(*) AS cnt, sum(n_chars) AS s, min(n_chars) AS mn, "
    "max(n_chars) AS mx, avg(n_chars) AS av FROM docs WHERE lang = 'en'",
    "SELECT count(*) AS cnt FROM docs WHERE source LIKE 'src1%' "
    "AND lang IN ('en', 'de') AND n_chars BETWEEN 100 AND 2000",
    "SELECT count(*) AS cnt, sum(n_chars) AS s FROM docs WHERE n_chars > 500",
    "SELECT count(*) AS cnt FROM docs WHERE 4000 <= n_chars",
    "SELECT lang, count(*) AS cnt FROM docs GROUP BY lang",
    "SELECT lang AS l, count(*) AS cnt, sum(n_chars) AS s "
    "FROM docs GROUP BY lang",
    "SELECT sum(n_chars) AS only_sum FROM docs GROUP BY lang",
    # round 5: same-column OR / IS [NOT] NULL route
    "SELECT count(*) AS c FROM docs WHERE lang = 'en' OR lang = 'de'",
    "SELECT count(*) AS c FROM docs WHERE lang IS NOT NULL",
    # round 5: multi-column GROUP BY + HAVING + ORDER BY
    "SELECT lang, source, count(*) AS cnt, sum(n_chars) AS s "
    "FROM docs GROUP BY lang, source",
    "SELECT lang, count(*) AS cnt FROM docs GROUP BY lang "
    "HAVING count(*) > 100 AND sum(n_chars) > 0",
    # round-5 final stretch: HAVING BETWEEN (inline Cast(between(...))
    # with TempResolvedColumn operands) routes — by output alias, by
    # repeated aggregate, negated, and mixed with other conjuncts
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "HAVING count(*) BETWEEN 50 AND 100",
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "HAVING c BETWEEN 50 AND 100",
    "SELECT lang, sum(n_chars) AS s FROM docs GROUP BY lang "
    "HAVING sum(n_chars) NOT BETWEEN 100000 AND 200000",
    "SELECT lang, max(n_chars) AS m FROM docs GROUP BY lang "
    "HAVING max(n_chars) BETWEEN 4000 AND 5000 AND count(*) > 10",
    "SELECT lang, avg(n_chars) AS a FROM docs GROUP BY lang "
    "HAVING avg(n_chars) BETWEEN 2000 AND 3000",
    "SELECT lang, source, count(*) AS cnt FROM docs WHERE n_chars > 500 "
    "GROUP BY lang, source HAVING cnt >= 10 ORDER BY lang, source",
    # round 5: COUNT(DISTINCT) via the composite group kernel
    "SELECT count(DISTINCT lang) AS d FROM docs",
    "SELECT count(DISTINCT source) AS d, count(*) AS c FROM docs "
    "WHERE n_chars > 500",
    "SELECT lang, count(DISTINCT source) AS d, count(*) AS c, "
    "sum(n_chars) AS s FROM docs GROUP BY lang",
    # round 5: grouped AVG (exact-sum / non-null-count off the kernel's
    # nn column), alone, mixed, and in HAVING
    "SELECT lang, avg(n_chars) AS a FROM docs GROUP BY lang",
    "SELECT lang, count(*) AS c, sum(n_chars) AS s, avg(n_chars) AS a "
    "FROM docs WHERE source LIKE 'src1%' GROUP BY lang",
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "HAVING avg(n_chars) > 2000",
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "HAVING count(*) > avg(n_chars)",  # agg-vs-agg HAVING comparison
    # round 5: grouped MIN/MAX off the kernel's mn/mx partials, incl.
    # composite keys — the whole grouped family now routes
    "SELECT lang, max(n_chars) AS m FROM docs GROUP BY lang",
    "SELECT lang, source, min(n_chars) AS mn, max(n_chars) AS mx, "
    "avg(n_chars) AS a FROM docs GROUP BY lang, source",
    # round 5: ORDER BY + LIMIT over a routed aggregate — the "top
    # languages" report shape (sort keys chosen tie-free: lang/source are
    # unique per group, so routed-vs-fallback parity is deterministic)
    "SELECT lang, count(*) AS cnt FROM docs GROUP BY lang "
    "ORDER BY cnt DESC, lang LIMIT 3",
    "SELECT lang, source, count(*) AS c, avg(n_chars) AS a FROM docs "
    "WHERE n_chars > 100 GROUP BY lang, source "
    "HAVING c >= 5 ORDER BY c DESC, lang, source LIMIT 10",
    # round 5: COUNT(col) = non-null count — routes for ANY stored type
    # (null totals are commit/chunk metadata; count-only shapes never
    # decode the counted column's values)
    "SELECT count(n_chars) AS c FROM docs",
    "SELECT count(lang) AS cl, count(*) AS c FROM docs",
    "SELECT count(lang) AS cl, count(*) AS c FROM docs "
    "WHERE n_chars BETWEEN 100 AND 2000",
    "SELECT count(lang) AS cl, sum(n_chars) AS s, avg(n_chars) AS a "
    "FROM docs WHERE n_chars > 500",
    "SELECT source, count(lang) AS cl, count(*) AS c FROM docs "
    "GROUP BY source",
    "SELECT lang, count(source) AS cs FROM docs GROUP BY lang",
    "SELECT lang, count(n_chars) AS c, sum(n_chars) AS s FROM docs "
    "GROUP BY lang",
    "SELECT lang, source, count(score) AS cs FROM docs "
    "GROUP BY lang, source",
    "SELECT source, count(lang) AS cl FROM docs WHERE n_chars > 500 "
    "GROUP BY source HAVING count(lang) > 10",
    # round 5: SEVERAL agg source columns per grouped statement — one
    # group_multi_table pass carries per-column sum/nn/mn/mx partials
    # (the full corpus-audit SELECT), count-only columns validity-only
    "SELECT lang, count(*) AS c, sum(n_chars) AS s, min(doc_id) AS mn, "
    "max(doc_id) AS mx, avg(doc_id) AS a FROM docs GROUP BY lang",
    "SELECT lang, count(source) AS c, sum(n_chars) AS s FROM docs "
    "GROUP BY lang",
    "SELECT lang, min(doc_id) AS a, max(n_chars) AS b "
    "FROM docs GROUP BY lang",
    "SELECT lang, avg(n_chars) AS a, sum(doc_id) AS s2 FROM docs "
    "GROUP BY lang",
    "SELECT lang, source, count(score) AS c, sum(n_chars) AS s, "
    "min(doc_id) AS mn FROM docs GROUP BY lang, source",
    "SELECT source, count(lang) AS cl, count(score) AS cs, "
    "max(doc_id) AS m FROM docs WHERE n_chars > 500 GROUP BY source "
    "HAVING count(*) > 5",
    "SELECT lang, sum(n_chars) AS s, sum(doc_id) AS s2, "
    "count(score) AS ct FROM docs GROUP BY lang "
    "ORDER BY s DESC, lang LIMIT 3",
    # round 5: strict float bounds route via nextafter (doubles are
    # discrete; NaN parity through the kernel's range legs)
    "SELECT count(*) AS c FROM docs WHERE score > 0.5",
    "SELECT count(*) AS c FROM docs WHERE score < -0.25 AND score > -2.0",
    "SELECT lang, count(*) AS c FROM docs WHERE score > 0.0 "
    "GROUP BY lang",
    # round 5: ungrouped cross-column OR routes via inclusion-exclusion
    # (three conjunctive passes: A, B, A AND B)
    "SELECT count(*) AS c FROM docs WHERE lang = 'en' OR source = 'src2'",
    "SELECT count(*) AS c, sum(n_chars) AS s, min(n_chars) AS mn, "
    "max(n_chars) AS mx, avg(n_chars) AS av, count(lang) AS cl "
    "FROM docs WHERE lang = 'en' OR n_chars > 4000",
    # a multi-leaf branch (AND inside one OR arm) and an outer AND
    "SELECT count(*) AS c, sum(n_chars) AS s FROM docs "
    "WHERE (lang = 'en' AND n_chars > 1000) OR source LIKE 'src7%'",
    "SELECT count(*) AS c FROM docs WHERE n_chars BETWEEN 100 AND 3000 "
    "AND (lang = 'de' OR source LIKE 'src3%')",
    # empty / both-empty branches: counts 0, sum/min/max/avg NULL
    "SELECT count(*) AS c, sum(n_chars) AS s, min(n_chars) AS mn "
    "FROM docs WHERE lang = 'en' OR n_chars > 99999",
    "SELECT count(*) AS c, sum(n_chars) AS s, avg(n_chars) AS av, "
    "max(n_chars) AS mx FROM docs WHERE lang = 'xx' OR n_chars > 99999",
    # GROUPED cross-column OR: per-group null-safe outer-join composition
    # (the NULL lang group is a real SQL group and must compose once)
    "SELECT lang, count(*) AS c FROM docs "
    "WHERE lang = 'en' OR source = 'src2' GROUP BY lang",
    "SELECT lang, count(*) AS c, sum(n_chars) AS s, min(n_chars) AS mn, "
    "max(n_chars) AS mx, avg(doc_id) AS av, count(score) AS cs FROM docs "
    "WHERE source LIKE 'src1%' OR n_chars > 4000 GROUP BY lang",
    "SELECT lang, source, count(*) AS c, sum(n_chars) AS s FROM docs "
    "WHERE lang = 'de' OR n_chars < 500 GROUP BY lang, source",
    # min/max-only shapes need no overlap pass (two passes, grouped and
    # ungrouped); DISTINCT composes as the union of the branch passes
    "SELECT source, min(n_chars) AS mn, max(doc_id) AS mx FROM docs "
    "WHERE lang = 'fr' OR n_chars > 4500 GROUP BY source",
    "SELECT min(n_chars) AS mn, max(doc_id) AS mx FROM docs "
    "WHERE lang = 'fr' OR n_chars > 4500",
    "SELECT DISTINCT source FROM docs WHERE lang = 'en' OR n_chars > 4900",
    # HAVING / ORDER BY / LIMIT re-apply over the composed result
    "SELECT lang, count(*) AS c FROM docs "
    "WHERE lang = 'en' OR source = 'src1/item7' GROUP BY lang "
    "HAVING count(*) > 10 ORDER BY c DESC, lang LIMIT 3",
    # COUNT(DISTINCT) under cross-column OR: the composite kernel's
    # (group, value) combo rows union across the branch passes (a value
    # seen under A and under B is one value); counts/sums compose
    # sign-weighted through the overlap pass
    "SELECT count(DISTINCT lang) AS d FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000",
    "SELECT count(DISTINCT source) AS d, count(*) AS c, "
    "sum(n_chars) AS s FROM docs WHERE lang = 'de' OR n_chars > 4500",
    "SELECT lang, count(DISTINCT source) AS d, count(*) AS c FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 GROUP BY lang",
    # a strict float bound as one OR branch (nextafter + NaN-keeping
    # lower leg, composed through the inclusion-exclusion passes)
    "SELECT count(*) AS c FROM docs WHERE lang = 'en' OR score > 0.5",
    # ORDER BY a HIDDEN aggregate ("top groups without the counts"):
    # Catalyst adds the sort key to the Aggregate outputs and wraps
    # Project(Sort(...)) to drop it — the routed sort/limit run BEFORE
    # the final projection (tie keys keep parity deterministic)
    "SELECT lang FROM docs GROUP BY lang "
    "ORDER BY count(*) DESC, lang LIMIT 3",
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "ORDER BY sum(n_chars) DESC, lang LIMIT 2",
    "SELECT source FROM docs WHERE n_chars > 500 GROUP BY source "
    "ORDER BY max(n_chars) DESC, source",
    "SELECT lang FROM docs WHERE lang = 'en' OR n_chars > 4000 "
    "GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 3",
    # arithmetic over aggregates (round 5): embedded aggregates become
    # hidden routed outputs; the expression rebuilds over them with the
    # analyzer's own casts, so types and values match the fallback
    "SELECT sum(n_chars)/count(*) AS r FROM docs",
    "SELECT lang, sum(n_chars)/count(*) AS r FROM docs GROUP BY lang",
    "SELECT count(*)*2 AS c2 FROM docs WHERE lang = 'en'",
    "SELECT sum(n_chars)+sum(doc_id) AS t FROM docs",
    "SELECT lang, max(n_chars)-min(n_chars) AS spread FROM docs "
    "GROUP BY lang",
    "SELECT count(*)*0.5 AS h FROM docs",  # decimal-literal math
    "SELECT -sum(n_chars) AS neg FROM docs",
    "SELECT lang, sum(n_chars) % 1000 AS m FROM docs GROUP BY lang "
    "ORDER BY m DESC, lang LIMIT 3",
    # expression over count(distinct) rides the composite kernel
    "SELECT lang, count(distinct source)+count(*) AS x FROM docs "
    "GROUP BY lang",
    "SELECT count(distinct source)+count(*) AS x FROM docs",
    # expression composed through the cross-column-OR passes
    "SELECT 100*count(*)/sum(n_chars) AS pct FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000",
    # HAVING arithmetic over hoisted aggregate outputs
    "SELECT lang FROM docs GROUP BY lang "
    "HAVING sum(n_chars)/count(*) > 2400",
    # derived scalar group keys (round 5): the kernels group the RAW
    # source columns; Spark evaluates the rebuilt expression over the
    # ndv-bounded partials and a re-group merges raw groups — exact
    # Spark semantics at O(observed raw groups) expression evaluations
    "SELECT upper(lang) AS L, count(*) AS c FROM docs GROUP BY upper(lang)",
    "SELECT substring(source, 1, 4) AS s4, count(*) AS c, "
    "sum(n_chars) AS t FROM docs GROUP BY substring(source, 1, 4) "
    "ORDER BY c DESC, s4 LIMIT 5",
    # raw src doubles as a plain key: one kernel dimension backs both
    "SELECT upper(lang) AS L, lang, count(*) AS c FROM docs "
    "GROUP BY upper(lang), lang",
    # multi-source derived key rides the composite kernel
    "SELECT concat(lang, '-', substring(source, 1, 4)) AS k, count(*) AS c "
    "FROM docs GROUP BY concat(lang, '-', substring(source, 1, 4))",
    # count(distinct) / cross-column OR / min-max-avg + HAVING compose
    "SELECT upper(lang) AS L, count(distinct source) AS d, count(*) AS c "
    "FROM docs GROUP BY upper(lang)",
    "SELECT upper(lang) AS L, count(*) AS c FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 GROUP BY upper(lang)",
    "SELECT upper(lang) AS L, min(n_chars) AS mn, max(n_chars) AS mx, "
    "avg(n_chars) AS av FROM docs GROUP BY upper(lang) "
    "HAVING count(*) > 100",
    "SELECT length(lang) AS n, count(*) AS c FROM docs GROUP BY "
    "length(lang)",
    "SELECT CAST(n_chars AS STRING) AS s, count(*) AS c FROM docs "
    "WHERE n_chars < 30 GROUP BY CAST(n_chars AS STRING)",
    "SELECT regexp_extract(source, '^([a-z]+[0-9]+)', 1) AS host, "
    "count(*) AS c FROM docs "
    "GROUP BY regexp_extract(source, '^([a-z]+[0-9]+)', 1)",
    "SELECT coalesce(lang, 'none') AS L, count(*) AS c FROM docs "
    "GROUP BY coalesce(lang, 'none')",
    # arithmetic-over-aggregates output beside a derived key
    "SELECT upper(lang) AS L, sum(n_chars)/count(*) AS r FROM docs "
    "GROUP BY upper(lang)",
    # ORDER BY a hidden aggregate the projection drops, derived key
    "SELECT upper(lang) AS L FROM docs GROUP BY upper(lang) "
    "ORDER BY count(*) DESC, L LIMIT 2",
    # widened whitelist: split_part host extraction (THE audit shape),
    # integer bucketing via DIV, arithmetic composition, lpad/initcap,
    # left-prefix
    "SELECT split_part(source, '/', 1) AS host, count(*) AS c, "
    "sum(n_chars) AS s FROM docs GROUP BY split_part(source, '/', 1)",
    "SELECT n_chars DIV 1000 AS kb, count(*) AS c FROM docs "
    "GROUP BY n_chars DIV 1000",
    "SELECT abs(n_chars - 2500) DIV 500 AS band, count(*) AS c FROM docs "
    "GROUP BY abs(n_chars - 2500) DIV 500",
    "SELECT initcap(lang) AS L, lpad(lang, 5, '_') AS P, count(*) AS c "
    "FROM docs GROUP BY initcap(lang), lpad(lang, 5, '_')",
    "SELECT left(source, 4) AS s4, count(*) AS c FROM docs "
    "GROUP BY left(source, 4)",
    # HAVING over the derived key itself (by alias, by repeated
    # expression, mixed with aggregate conditions, with ORDER BY)
    "SELECT upper(lang) AS L, count(*) AS c FROM docs "
    "GROUP BY upper(lang) HAVING L = 'EN'",
    "SELECT upper(lang) AS L, count(*) AS c FROM docs "
    "GROUP BY upper(lang) HAVING upper(lang) = 'EN'",
    "SELECT upper(lang) AS L, count(*) AS c FROM docs "
    "GROUP BY upper(lang) HAVING count(*) > 100 AND L <> 'DE'",
    "SELECT split_part(source, '/', 1) AS h, count(*) AS c FROM docs "
    "GROUP BY split_part(source, '/', 1) HAVING c >= 100 ORDER BY h",
    # CASE WHEN / IF bucketing labels as derived keys (searched and
    # simple CASE, no-else NULL group, IN/AND/OR/IS NULL/LIKE predicates)
    "SELECT CASE WHEN n_chars > 2500 THEN 'long' WHEN n_chars > 500 "
    "THEN 'mid' ELSE 'short' END AS b, count(*) AS c, avg(doc_id) AS a "
    "FROM docs GROUP BY CASE WHEN n_chars > 2500 THEN 'long' "
    "WHEN n_chars > 500 THEN 'mid' ELSE 'short' END",
    "SELECT if(lang = 'en', 'EN', 'other') AS b, count(*) AS c FROM docs "
    "GROUP BY if(lang = 'en', 'EN', 'other')",
    "SELECT CASE WHEN lang IN ('en', 'de') AND n_chars >= 1000 "
    "OR lang IS NULL THEN 'hit' END AS b, count(*) AS c FROM docs "
    "GROUP BY CASE WHEN lang IN ('en', 'de') AND n_chars >= 1000 "
    "OR lang IS NULL THEN 'hit' END",
    "SELECT CASE WHEN source LIKE 'src1%' THEN 'one' ELSE 'rest' END "
    "AS b, count(*) AS c FROM docs GROUP BY "
    "CASE WHEN source LIKE 'src1%' THEN 'one' ELSE 'rest' END",
    "SELECT CASE lang WHEN 'en' THEN 1 ELSE 0 END AS b, count(*) AS c "
    "FROM docs GROUP BY CASE lang WHEN 'en' THEN 1 ELSE 0 END",
    # COUNT(DISTINCT <derived expr>) — "distinct hosts": the raw sources
    # join the kernel dimensions, count_distinct runs the rebuilt
    # expression over the combo rows; composes grouped, with a derived
    # key sharing the source, and under cross-column OR
    "SELECT count(distinct split_part(source, '/', 1)) AS hosts "
    "FROM docs",
    "SELECT lang, count(distinct split_part(source, '/', 1)) AS hosts, "
    "count(*) AS c FROM docs GROUP BY lang",
    "SELECT upper(lang) AS L, count(distinct lang) AS d FROM docs "
    "GROUP BY upper(lang)",
    "SELECT upper(lang) AS L, count(distinct left(source, 5)) AS d "
    "FROM docs WHERE n_chars > 500 GROUP BY upper(lang)",
    "SELECT count(distinct upper(lang)) AS d FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000",
    # SELECT DISTINCT over a derived key under a cross-column OR: the
    # composed orx frame has no partials — the re-group is a dedup
    "SELECT DISTINCT upper(lang) AS L FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000",
    # scalar expressions over GROUP KEYS in the SELECT ("gexpr"): the
    # key stays plain in the kernel, the expression evaluates over the
    # O(groups) finished rows — key optionally co-selected, multi-key
    # concat, beside aggregate arithmetic, over a derived key's subtree,
    # with ORDER BY/LIMIT, and beside COUNT(DISTINCT)
    "SELECT upper(lang) AS U, count(*) AS c FROM docs GROUP BY lang",
    "SELECT lang, length(lang) AS n, count(*) AS c FROM docs "
    "GROUP BY lang",
    "SELECT concat(lang, '/', source) AS k, count(*) AS c FROM docs "
    "GROUP BY lang, source",
    "SELECT upper(lang) AS U, sum(n_chars)/count(*) AS r FROM docs "
    "GROUP BY lang",
    "SELECT substring(source, 1, 4) AS s4, "
    "upper(substring(source, 1, 4)) AS su4, count(*) AS c FROM docs "
    "GROUP BY substring(source, 1, 4)",
    "SELECT upper(lang) AS U, count(*) AS c FROM docs GROUP BY lang "
    "ORDER BY c DESC, U LIMIT 3",
    "SELECT upper(lang) AS U, count(distinct source) AS d FROM docs "
    "GROUP BY lang",
    # grouping sets (ROLLUP / CUBE / GROUPING SETS): ONE kernel pass at
    # the finest (union-of-keys) grouping, per-set re-aggregation +
    # union with a literal grouping id; grouping()/grouping_id() read
    # that id; the fixture's real NULL langs pin the subtotal-null vs
    # data-null distinction (they differ only by grouping id)
    "SELECT lang, count(*) AS c FROM docs GROUP BY ROLLUP(lang)",
    "SELECT lang, source, count(*) AS c, sum(n_chars) AS s FROM docs "
    "GROUP BY ROLLUP(lang, source)",
    "SELECT lang, source, count(*) AS c FROM docs "
    "GROUP BY CUBE(lang, source)",
    "SELECT lang, source, count(*) AS c FROM docs "
    "GROUP BY GROUPING SETS ((lang), (source), ())",
    "SELECT lang, grouping(lang) AS gl, grouping_id() AS gid, "
    "count(*) AS c FROM docs GROUP BY ROLLUP(lang)",
    "SELECT lang, count(*) AS c FROM docs WHERE n_chars > 1000 "
    "GROUP BY ROLLUP(lang)",
    "SELECT lang, count(*) AS c, sum(n_chars) AS s, min(doc_id) AS mn, "
    "avg(n_chars) AS a FROM docs GROUP BY ROLLUP(lang)",
    "SELECT upper(lang) AS U, count(*) AS c FROM docs "
    "GROUP BY ROLLUP(upper(lang))",
    "SELECT lang, source, count(*) AS c FROM docs "
    "GROUP BY ROLLUP(lang, source) HAVING count(*) > 20 "
    "ORDER BY lang, source, c",
    "SELECT lang, grouping_id() AS g, count(*) AS c FROM docs "
    "GROUP BY ROLLUP(lang) HAVING grouping_id() = 0",
    "SELECT lang, count(*) AS c FROM docs GROUP BY ROLLUP(lang) "
    "ORDER BY grouping_id(), lang",
    # COUNT(DISTINCT) beside the FULL multi-column family (late round
    # 5): the combo rows carry the kernel's per-agg-column quad partials
    # and they re-aggregate across a group's combo rows (nn re-adds,
    # mn/mx re-min/max), so avg/min/max/count(col)/sum over any mix of
    # columns finish beside the distinct count — one kernel pass
    "SELECT lang, count(DISTINCT source) AS d, avg(n_chars) AS a "
    "FROM docs GROUP BY lang",
    "SELECT lang, count(DISTINCT source) AS d, min(n_chars) AS mn, "
    "max(n_chars) AS mx FROM docs GROUP BY lang",
    "SELECT count(DISTINCT lang) AS d, avg(n_chars) AS a FROM docs",
    "SELECT lang, count(DISTINCT source) AS d, count(n_chars) AS cn "
    "FROM docs GROUP BY lang",
    "SELECT lang, count(DISTINCT source) AS d, sum(n_chars) AS s, "
    "avg(n_chars) AS a, min(n_chars) AS mn FROM docs GROUP BY lang",
    "SELECT lang, count(DISTINCT source) AS d, count(*) AS c FROM docs "
    "WHERE n_chars > 1000 GROUP BY lang HAVING avg(n_chars) > 2000 "
    "ORDER BY lang",
    "SELECT upper(lang) AS U, count(DISTINCT source) AS d, "
    "max(n_chars) AS mx FROM docs GROUP BY upper(lang)",
    "SELECT count(DISTINCT lang) AS d, min(n_chars) AS m FROM docs",
    # ... and over MULTIPLE agg source columns (the agg_specs kernel)
    "SELECT lang, count(DISTINCT source) AS d, sum(n_chars) AS s, "
    "min(doc_id) AS m FROM docs GROUP BY lang",
    "SELECT lang, count(DISTINCT source) AS d, avg(n_chars) AS a, "
    "max(doc_id) AS mx, count(score) AS cn, count(*) AS c "
    "FROM docs GROUP BY lang ORDER BY lang",
    # ... and under a cross-column OR: cnt/sum/nn sign-compose across
    # the inclusion-exclusion passes, min/max and the distinct count
    # read the branch (sign-positive) passes only
    "SELECT count(DISTINCT source) AS d, avg(n_chars) AS a FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000",
    "SELECT lang, count(DISTINCT source) AS d, min(n_chars) AS mn, "
    "count(score) AS cn FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 GROUP BY lang",
    "SELECT lang, count(DISTINCT source) AS d, max(doc_id) AS mx "
    "FROM docs WHERE lang = 'de' OR lang = 'fr' GROUP BY lang",
    # MULTIPLE count(distinct) columns: one composite-kernel pass each
    # (the first carries the non-distinct partials), per-group results
    # joined null-safely on the group keys
    "SELECT count(DISTINCT lang) AS a, count(DISTINCT source) AS b "
    "FROM docs",
    "SELECT lang, count(DISTINCT source) AS a, "
    "count(DISTINCT n_chars) AS b, count(*) AS c FROM docs "
    "GROUP BY lang",
    "SELECT lang, count(DISTINCT source) AS a, "
    "count(DISTINCT doc_id) AS b, avg(n_chars) AS av FROM docs "
    "WHERE n_chars > 500 GROUP BY lang ORDER BY lang",
    "SELECT upper(lang) AS U, count(DISTINCT source) AS a, "
    "count(DISTINCT n_chars) AS b FROM docs GROUP BY upper(lang)",
    # count(distinct) under grouping sets: the finest-grouping combo
    # rows re-count distinct values at each set's grouping
    "SELECT lang, count(DISTINCT source) AS d FROM docs "
    "GROUP BY ROLLUP(lang)",
    "SELECT lang, source, count(DISTINCT doc_id) AS d, count(*) AS c "
    "FROM docs GROUP BY ROLLUP(lang, source) "
    "ORDER BY lang, source, d",
    "SELECT lang, grouping_id() AS g, count(DISTINCT source) AS d, "
    "avg(n_chars) AS a FROM docs WHERE n_chars > 500 "
    "GROUP BY ROLLUP(lang) HAVING grouping_id() = 0",
    "SELECT upper(lang) AS U, count(DISTINCT source) AS d FROM docs "
    "GROUP BY ROLLUP(upper(lang))",
    # HAVING grouping(col) routes (late round 5): the analyzed
    # shiftright/bitwise-and over the hidden gid output rebuilds as
    # Column arithmetic over the routed per-set id
    "SELECT lang, count(*) AS c FROM docs GROUP BY ROLLUP(lang) "
    "HAVING grouping(lang) = 0",
    "SELECT lang, source, count(*) AS c FROM docs "
    "GROUP BY ROLLUP(lang, source) "
    "HAVING grouping(source) = 1 AND count(*) > 5 "
    "ORDER BY lang, source",
    "SELECT lang, grouping(lang) AS gl, count(DISTINCT source) AS d "
    "FROM docs GROUP BY ROLLUP(lang) HAVING grouping(lang) = 0",
    # multiple count(distinct) under grouping sets (late round 5): each
    # extra pass re-aggregates per set and joins on (grouping id, keys)
    "SELECT lang, count(DISTINCT source) AS a, "
    "count(DISTINCT doc_id) AS b FROM docs GROUP BY ROLLUP(lang)",
    "SELECT lang, source, count(DISTINCT doc_id) AS a, "
    "count(DISTINCT n_chars) AS b, count(*) AS c FROM docs "
    "GROUP BY CUBE(lang, source) "
    "HAVING count(*) > 2 ORDER BY lang, source, a",
    "SELECT upper(lang) AS U, count(DISTINCT source) AS a, "
    "count(DISTINCT n_chars) AS b FROM docs "
    "WHERE n_chars > 500 GROUP BY ROLLUP(upper(lang))",
    "SELECT lang, count(DISTINCT source) AS a, "
    "count(DISTINCT n_chars) AS b, avg(doc_id) AS av FROM docs "
    "GROUP BY ROLLUP(lang) HAVING grouping_id() = 0",
    # whitelisted scalar functions over aggregate outputs (late round 5):
    # the executor re-emits the SAME Spark function over the routed
    # outputs, so rounding/IEEE/null semantics are Spark's own
    "SELECT abs(sum(n_chars)) AS a FROM docs",
    "SELECT lang, round(avg(n_chars), 1) AS r FROM docs GROUP BY lang",
    "SELECT bround(avg(n_chars), -1) AS b, floor(avg(n_chars)) AS f, "
    "ceil(avg(n_chars)) AS c FROM docs",
    "SELECT sqrt(sum(n_chars)) AS q, power(count(*), 2) AS p, "
    "log10(count(*)) AS lg, exp(ln(count(*))) AS e FROM docs",
    "SELECT coalesce(sum(n_chars), 0) AS s FROM docs WHERE lang = 'zz'",
    "SELECT greatest(max(n_chars), count(*)) AS g, "
    "least(min(doc_id), 5) AS l FROM docs",
    # ... composed with HAVING, grouped ORDER BY/LIMIT, count(distinct),
    # cross-column OR, and grouping sets
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "HAVING round(avg(n_chars), -2) >= 2500",
    "SELECT lang, abs(sum(doc_id) - 2*sum(n_chars)) AS d FROM docs "
    "GROUP BY lang ORDER BY d DESC, lang LIMIT 2",
    "SELECT lang, greatest(count(DISTINCT source), 10) AS g FROM docs "
    "GROUP BY lang",
    "SELECT lang, round(avg(n_chars), 2) AS r FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 GROUP BY lang",
    "SELECT round(avg(n_chars), 1) AS r FROM docs GROUP BY ROLLUP(lang)",
    "SELECT abs(count(*)) AS a FROM docs GROUP BY lang "
    "HAVING abs(sum(doc_id)) > greatest(count(*), 100)",
    # CASE WHEN / IF over aggregate outputs (late round 5): conditions
    # share the HAVING grammar, branch values the expression grammar;
    # the rebuild is F.when/otherwise — Spark's own CaseWhen
    "SELECT lang, CASE WHEN count(*) > 200 THEN 'hot' ELSE 'cold' END "
    "AS cls FROM docs GROUP BY lang",
    "SELECT lang, CASE WHEN avg(n_chars) > 2600 THEN 'long' "
    "WHEN avg(n_chars) > 2400 THEN 'mid' END AS cls, count(*) AS c "
    "FROM docs GROUP BY lang",  # no ELSE -> NULL
    "SELECT if(count(*) > 500, 'big', 'small') AS sz FROM docs",
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
    "HAVING CASE WHEN lang IS NULL THEN 0 ELSE count(*) END > 150",
    "SELECT CASE WHEN sum(n_chars) IS NULL THEN -1 "
    "ELSE round(sum(n_chars) / count(*), 0) END AS r FROM docs "
    "WHERE lang = 'zz'",  # empty input: null-sum branch exercised
    "SELECT lang, CASE WHEN count(*) BETWEEN 100 AND 250 THEN 'mid' "
    "ELSE 'edge' END AS b FROM docs GROUP BY ROLLUP(lang)",
    # count(DISTINCT) embedded inside expressions — incl. an IN whose
    # analyzer-cast items rebuild as the typed OR chain
    "SELECT if(count(DISTINCT source) > 25, 1, 0) AS wide FROM docs",
    "SELECT lang, count(DISTINCT source) * 2 AS d FROM docs "
    "GROUP BY lang",
    "SELECT lang, if(count(DISTINCT source) IN (18, 19, 20), 1, 0) "
    "AS full_cov FROM docs GROUP BY lang",
    # contains / suffix string predicates (late round 5): LIKE '%x%' /
    # '%x' / bare 'x' and the contains()/endswith() function forms route
    # — no zone-map pruning, but the kernel mask decodes ONLY the
    # predicate column (dict chunks test just the value store)
    "SELECT count(*) AS c FROM docs WHERE source LIKE '%item1%'",
    "SELECT lang, count(*) AS c, sum(n_chars) AS s FROM docs "
    "WHERE source LIKE '%7' GROUP BY lang",
    "SELECT count(*) AS c FROM docs WHERE source LIKE 'src1/item3'",
    "SELECT count(*) AS c FROM docs "
    "WHERE contains(source, 'item2') AND lang = 'en'",
    "SELECT count(*) AS c FROM docs "
    "WHERE endswith(source, '3') OR lang IS NULL",
    "SELECT lang, count(*) AS c FROM docs "
    "WHERE source LIKE '%item%' AND n_chars > 1000 GROUP BY lang",
    # THREE-branch cross-column OR (late round 5): n branch passes plus
    # every >=2 subset intersection with IE signs — 7 passes additive,
    # 3 passes for extremes/DISTINCT; same-column branches merge first,
    # so 'lang=en OR lang=de OR n>4000' is a clean 2-branch OR
    "SELECT count(*) AS c, sum(n_chars) AS s, avg(n_chars) AS a "
    "FROM docs WHERE lang = 'en' OR n_chars > 4000 "
    "OR source LIKE 'src1/%'",
    "SELECT lang, count(*) AS c, sum(n_chars) AS s FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 OR source LIKE 'src1/%' "
    "GROUP BY lang",
    "SELECT min(n_chars) AS mn, max(doc_id) AS mx FROM docs "
    "WHERE lang = 'de' OR n_chars > 4500 OR source LIKE '%item9%'",
    "SELECT lang, count(DISTINCT source) AS d, count(*) AS c, "
    "max(doc_id) AS mx FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 OR doc_id < 100 GROUP BY lang",
    "SELECT lang, count(*) AS c FROM docs "
    "WHERE lang = 'en' OR n_chars > 3500 OR doc_id < 200 "
    "GROUP BY lang HAVING count(*) > 5 ORDER BY c DESC, lang",
    "SELECT count(*) AS c, sum(doc_id) AS s FROM docs "
    "WHERE n_chars > 1000 OR n_chars > 2000 OR lang = 'fr'",
    "SELECT count(*) AS c FROM docs "
    "WHERE lang = 'en' OR lang = 'de' OR n_chars > 4000",
    "SELECT lang, count(*) AS c, avg(n_chars) AS a FROM docs "
    "WHERE lang = 'en' OR lang = 'fr' OR n_chars > 4500 OR doc_id < 40 "
    "GROUP BY lang",
    "SELECT count(*) AS c FROM docs WHERE source LIKE 'src1/%' "
    "OR source LIKE 'src2/%' OR n_chars > 4500",
    "SELECT count(*) AS c FROM docs WHERE lang = 'en' OR lang = 'de' "
    "OR (n_chars > 4000 AND doc_id < 600)",
]

FALLBACK = [
    # two distinct columns compose pass-per-column — but not under a
    # cross-column OR (the sign-weighted union carries ONE value dim)
    "SELECT count(DISTINCT lang) AS a, count(DISTINCT source) AS b "
    "FROM docs WHERE lang = 'en' OR n_chars > 4000",
    "SELECT sum(DISTINCT n_chars) AS s FROM docs",         # distinct sum
    "SELECT doc_id, n_chars FROM docs WHERE lang = 'en'",  # not an aggregate
    # cross-column OR stays a fallback beyond THREE branch columns
    # (2^4 - 1 = 15 inclusion-exclusion passes would not be a win)
    "SELECT count(*) AS c FROM docs WHERE lang = 'en' OR n_chars > 100 "
    "OR source = 'src2' OR doc_id < 5",
    "SELECT sum(score) AS s FROM docs",                    # float sum
    "SELECT count(*) AS c FROM docs WHERE lang = 'en' AND lang = 'de'",
    # a custom ESCAPE char changes what the wildcards mean — routing the
    # raw pattern as prefix/contains returned WRONG ROWS (live bug found
    # and fixed in round 5); must stay a fallback in WHERE too
    "SELECT count(*) AS c FROM docs WHERE source LIKE 'src1!%' ESCAPE '!'",
    # single-char wildcard: not expressible as prefix/contains/suffix
    "SELECT count(*) AS c FROM docs WHERE source LIKE '%it_m%'",
    "SELECT lang, count(lang) AS c FROM docs GROUP BY lang",  # agg==group
    "SELECT lang, count(lang) AS c, sum(n_chars) AS s FROM docs "
    "GROUP BY lang",          # agg==group inside a multi-agg statement
    "SELECT lang, sum(score) AS s, count(*) AS c, sum(n_chars) AS s2 "
    "FROM docs GROUP BY lang",     # float sum poisons the multi-agg pass
    # bare LIMIT (no ORDER BY) over an aggregate: which rows survive is
    # plan-dependent, so it must NOT route (LIMIT 10 > group count keeps
    # the parity assertion deterministic here)
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang LIMIT 10",
    # expression arithmetic routes, but a float-summed operand poisons it
    "SELECT sum(score)/count(*) AS r FROM docs",
    # a scalar function OUTSIDE the deterministic whitelist stays a
    # fallback even over routable aggregates
    "SELECT sha2(cast(sum(n_chars) AS string), 256) AS a FROM docs",
    # a derived scalar key must appear in the SELECT to carry a name
    "SELECT count(*) AS c FROM docs GROUP BY upper(lang)",
    # non-whitelisted string function (deterministic, but not listed)
    "SELECT soundex(lang) AS L, count(*) AS c FROM docs "
    "GROUP BY soundex(lang)",
    # derived key output aliased to a raw source name would shadow the
    # raw column for later-evaluated expressions
    "SELECT upper(source) AS source, substring(source, 1, 2) AS x, "
    "count(*) AS c FROM docs GROUP BY upper(source), substring(source, 1, 2)",
    # derived output named like a kernel partial column
    "SELECT upper(lang) AS cnt, count(*) AS c FROM docs "
    "GROUP BY upper(lang)",
    # LIKE with a custom escape char inside a CASE key: the rebuild
    # cannot carry the ESCAPE clause, so it must never route
    "SELECT CASE WHEN source LIKE 'src1!%' ESCAPE '!' THEN 1 ELSE 0 END "
    "AS b, count(*) AS c FROM docs GROUP BY "
    "CASE WHEN source LIKE 'src1!%' ESCAPE '!' THEN 1 ELSE 0 END",
    # value-aggregating the derived key's own raw source: the kernels
    # reject a group dimension doubling as the agg column, and the route
    # dry-run surfaces that refusal as a fallback (never a routed
    # report over a fallback execution)
    "SELECT CASE WHEN n_chars > 2500 THEN 'long' ELSE 'short' END AS b, "
    "avg(n_chars) AS a FROM docs GROUP BY "
    "CASE WHEN n_chars > 2500 THEN 'long' ELSE 'short' END",
    # mixing aggregates and group keys in ONE output expression
    "SELECT count(*) + length(lang) AS x FROM docs GROUP BY lang",
    "SELECT lang, CASE WHEN max(n_chars) > 4990 THEN concat(lang, '!') "
    "ELSE lang END AS tag FROM docs GROUP BY lang",
    # non-whitelisted function over a group key in the SELECT
    "SELECT soundex(lang) AS s, count(*) AS c FROM docs GROUP BY lang",
    # outputs differing only by case: Spark's name resolution is
    # case-insensitive, so the finishing rebinds would be ambiguous
    "SELECT substring(source, 1, 4) AS s4, "
    "upper(substring(source, 1, 4)) AS S4, count(*) AS c FROM docs "
    "GROUP BY substring(source, 1, 4)",
    # grouping sets: DUPLICATED sets with several count(distinct)
    # columns (the per-set join would square the duplicate rows) and
    # cross-column OR under grouping sets are declared fallbacks
    "SELECT lang, count(DISTINCT source) AS a, "
    "count(DISTINCT doc_id) AS b FROM docs "
    "GROUP BY GROUPING SETS ((lang), (lang))",
    "SELECT lang, count(*) AS c FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000 GROUP BY ROLLUP(lang)",
    # count(distinct) beside a non-routable aggregate
    "SELECT lang, count(DISTINCT source) AS d, sum(DISTINCT n_chars) "
    "AS s FROM docs GROUP BY lang",
]


def _both(spark, store, sql):
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = spark.sql(sql)  # view registered by the call above
    return fast, slow


@pytest.mark.parametrize("sql", ROUTABLE)
def test_routable_statements_match_spark(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is not None
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields]
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


@pytest.mark.parametrize("sql", FALLBACK)
def test_fallback_statements_still_correct(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


def test_route_description_shapes(spark, store):
    r = sqlagg.route_agg_sql(
        spark,
        "SELECT count(*) AS cnt, avg(n_chars) AS av FROM docs "
        "WHERE lang = 'en' AND n_chars BETWEEN 10 AND 99 "
        "AND source LIKE 'src1%'",
        {"docs": store})
    assert r["group_col"] is None
    assert r["aggs"] == {"cnt": ("count",), "av": ("avg", "n_chars")}
    assert r["predicates"] == {"lang": ("eq", "en"),
                               "n_chars": (10, 99),
                               "source": ("prefix", "src1")}
    # strict int bounds tighten into the inclusive range spec
    r = sqlagg.route_agg_sql(
        spark, "SELECT count(*) AS c FROM docs WHERE n_chars > 10 "
               "AND n_chars < 99", {"docs": store})
    assert r["predicates"] == {"n_chars": (11, 98)}


def test_gsets_route_shape(spark, store):
    # ROLLUP(lang, source): three grouping sets with rollup-ordered
    # masks and Spark's own grouping-id bit values (bit k set = key k
    # grouped OUT); the kernel pass groups at the finest (both keys)
    r = sqlagg.route_agg_sql(
        spark,
        "SELECT lang, source, count(*) AS c FROM docs "
        "GROUP BY ROLLUP(lang, source)", {"docs": store})
    assert r["gsets"] == [[[True, True], 0], [[True, False], 1],
                          [[False, False], 3]]
    assert r["group_cols"] == ["lang", "source"]
    assert r["group_col"] is None
    # GROUPING SETS with no finest set still runs ONE union-of-keys pass
    r = sqlagg.route_agg_sql(
        spark,
        "SELECT lang, source, count(*) AS c FROM docs "
        "GROUP BY GROUPING SETS ((lang), (source))", {"docs": store})
    assert r["gsets"] == [[[True, False], 1], [[False, True], 2]]
    # grouping_id() in the SELECT reads the per-set literal id column
    r = sqlagg.route_agg_sql(
        spark,
        "SELECT lang, grouping_id() AS g, count(*) AS c FROM docs "
        "GROUP BY ROLLUP(lang)", {"docs": store})
    assert ("g", "gexpr", "`__gid`") in r["out_cols"]


def test_routed_count_reads_no_chunk_bytes(spark, store):
    """The point of routing: an unfiltered COUNT comes from commit
    metadata, which decode-side instrumentation sees as zero decoded
    chunks (agg_table's driver row, no kernel dispatch)."""
    df = sqlagg.store_agg_sql(spark, "SELECT count(*) AS cnt FROM docs",
                              {"docs": store})
    # the routed one-row plan is a LocalRelation-backed DataFrame (driver
    # metadata), not a mapInArrow scan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInArrow" not in plan and "flowforge" not in plan
    assert df.collect()[0]["cnt"] == ROWS


def test_unknown_view_is_not_routed(spark, store):
    # a second, unregistered table in the statement -> fallback, and the
    # registered view still resolves
    sql = ("SELECT count(*) AS c FROM docs "
           "WHERE lang IN (SELECT 'en' AS lang)")
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None


def test_alias_shadowing_a_store_name_is_not_routed(spark, store):
    # ``FROM other AS docs``: SQL scope resolves ``docs`` to the ALIAS of
    # view ``other``, not to the registered store — the route must follow
    # the relation identity (the flowforge Data Source path), never the
    # alias text. The old top-alias name check routed this to the store
    # and returned the store's rows (live wrong-answer bug, late round 5).
    spark.createDataFrame([("zz", 1)], "lang string, n_chars long") \
        .createOrReplaceTempView("other")
    sql = "SELECT lang, count(*) AS c FROM other AS docs GROUP BY lang"
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    # re-register: _both's store_agg_sql re-bound view ``docs``; the
    # statement must still read ``other`` through the alias
    spark.createDataFrame([("zz", 1)], "lang string, n_chars long") \
        .createOrReplaceTempView("other")
    assert sorted(map(tuple, fast.collect())) == [("zz", 1)]
    assert sorted(map(tuple, slow.collect())) == [("zz", 1)]


def test_aliased_store_routes(spark, store):
    # ``FROM docs d`` previously fell back on the alias/view name
    # mismatch; the relation-identity resolution routes it
    sql = ("SELECT d.lang, count(*) AS c, sum(d.n_chars) AS s "
           "FROM docs d WHERE d.n_chars > 100 GROUP BY d.lang")
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is not None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


DISTINCT_ROUTED = [
    "SELECT DISTINCT lang FROM docs",
    "SELECT DISTINCT lang AS l FROM docs",
    "SELECT DISTINCT lang FROM docs WHERE n_chars > 10",  # masked counts
    "SELECT lang FROM docs GROUP BY lang",
    # multi-column DISTINCT rides the composite kernel (late round 5):
    # "which (lang, source) combinations exist" is one metadata pass
    "SELECT DISTINCT lang, source FROM docs",
    "SELECT DISTINCT lang, source FROM docs ORDER BY lang, source",
    "SELECT DISTINCT lang, upper(source) AS us FROM docs",
    "SELECT DISTINCT lang, source FROM docs "
    "WHERE lang = 'en' OR n_chars > 4000",
    "SELECT DISTINCT source, n_chars DIV 1000 AS kb FROM docs "
    "WHERE lang = 'en'",
]

DISTINCT_FALLBACK = [
    "SELECT DISTINCT lang, lang AS l2 FROM docs",    # duplicate key
]


@pytest.mark.parametrize("sql", DISTINCT_ROUTED)
def test_distinct_routes_to_value_counts(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is not None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


@pytest.mark.parametrize("sql", DISTINCT_FALLBACK)
def test_distinct_fallback_correct(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


FILTERED_GROUP_ROUTED = [
    "SELECT lang, count(*) AS cnt, sum(n_chars) AS s FROM docs "
    "WHERE n_chars BETWEEN 100 AND 2000 GROUP BY lang",
    "SELECT lang, sum(n_chars) AS s FROM docs "
    "WHERE source LIKE 'src1%' GROUP BY lang",
    "SELECT lang, count(*) AS cnt, sum(n_chars) AS s FROM docs "
    "WHERE lang IN ('en', 'de') GROUP BY lang",
]


@pytest.mark.parametrize("sql", FILTERED_GROUP_ROUTED)
def test_filtered_grouped_aggregates_route(spark, store, sql):
    """Round-4: WHERE + GROUP BY routes to the masked code-stream kernel
    (predicate columns decode only at boundary chunks)."""
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is not None
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields]
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


def test_route_dry_run_matches_execution_on_engine_precondition(spark, store):
    """Round-4 advice: route_agg_sql must not report a route that
    store_agg_sql's execution would refuse (e.g. ORDER BY ... LIMIT 0 makes
    topk_table raise) — both must agree on fallback."""
    sql = "SELECT doc_id, n_chars FROM docs ORDER BY n_chars DESC, doc_id LIMIT 0"
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    assert fast.collect() == slow.collect() == []


def test_grouped_count_only_with_where_routes(spark, store):
    """Round-4 late addition: value_counts_table takes predicates, so a
    grouped count-only WHERE routes to the masked code-stream counts."""
    sql = ("SELECT lang, count(*) AS c FROM docs WHERE n_chars > 10 "
           "GROUP BY lang")
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is not None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))


def test_route_pruning_stats(spark, store):
    """--explain pruning report (round 5): a routed WHERE shows how many
    buckets the plan reads vs the store total, off commit records only."""
    r = sqlagg.route_agg_sql(
        spark, "SELECT count(*) AS c FROM docs WHERE n_chars BETWEEN 100 "
        "AND 2000", {"docs": store})
    assert r is not None
    stats = sqlagg.route_pruning_stats(r)
    assert set(stats) == {"buckets_total", "buckets_read", "buckets_full",
                          "buckets_masked"}
    assert stats["buckets_total"] == 8
    assert stats["buckets_read"] \
        == stats["buckets_full"] + stats["buckets_masked"]
    assert 0 < stats["buckets_read"] <= stats["buckets_total"]
    # topk routes report through engine.topk_plan
    r2 = sqlagg.route_agg_sql(
        spark, "SELECT doc_id, n_chars FROM docs "
        "ORDER BY n_chars DESC, doc_id LIMIT 5", {"docs": store})
    assert r2 is not None and r2["kind"] == "topk"
    stats2 = sqlagg.route_pruning_stats(r2)
    assert stats2["buckets_total"] == 8
    assert 0 < stats2["buckets_read"] <= 8
    assert sqlagg.route_pruning_stats(None) is None


def test_time_minmax_cast_back_all_types(spark, tmp_path):
    """Routed MIN/MAX over timestamp, timestamp_ntz and date columns
    (grouped AND global) must reconstruct Spark-identical typed values
    from the kernels' epoch-int64 domain — micros for timestamps (a plain
    long->timestamp cast would misread them as seconds), days for dates,
    pure integer splitting for ntz (no session-tz arithmetic)."""
    import datetime as dt

    rows = [
        (
            i,
            ["x", "y", None][i % 3],
            None if i % 11 == 0
            else dt.date(2020, 1, 1) + dt.timedelta(days=i % 400),
            None if i % 13 == 0
            else dt.datetime(2021, 6, 1, 12, 0, 0)
            + dt.timedelta(minutes=7 * i, microseconds=i),
            dt.datetime(2021, 6, 1, 12, 0, 0) + dt.timedelta(seconds=13 * i),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id long, k string, d date, tn timestamp_ntz, tz timestamp")
    out = str(tmp_path) + "/store"
    engine.run_encode(spark, df, out, buckets=4, salt_col="id")
    stores = {"tt": out}
    for sql in [
        "SELECT k, min(d) AS mn, max(d) AS mx FROM tt GROUP BY k",
        "SELECT k, min(tn) AS mn, max(tn) AS mx FROM tt GROUP BY k",
        "SELECT k, count(*) AS c, min(tz) AS mn, max(tz) AS mx "
        "FROM tt GROUP BY k",
        "SELECT min(d) AS mn, max(d) AS mx FROM tt",
        "SELECT min(tn) AS mn, max(tn) AS mx FROM tt WHERE k = 'x'",
        "SELECT min(tz) AS mn, max(tz) AS mx, count(*) AS c FROM tt",
    ]:
        assert sqlagg.route_agg_sql(spark, sql, stores) is not None, sql
        fast = sqlagg.store_agg_sql(spark, sql, stores)
        slow = spark.sql(sql)
        assert [f.dataType for f in fast.schema.fields] \
            == [f.dataType for f in slow.schema.fields], sql
        assert sorted(map(repr, map(tuple, fast.collect()))) \
            == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.fixture(scope="module")
def cast_store(spark, tmp_path_factory):
    """Store whose column types are NARROWER than natural SQL literals:
    timestamp_ntz vs timestamp'...' (session-tz) literals, int vs bigint
    literals, float vs double literals — the analyzer wraps the COLUMN in
    a Cast for each, which the router must unwrap (value-preserving under
    a fixed-UTC session zone / exact widening) for the statement to
    route."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            base + dt.timedelta(hours=3 * i, microseconds=i),
            int(i % 997),
            float(np.float32(i) / np.float32(7)),
            ["a", "b", "c"][i % 3],
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, iv int, fv float, tag string")
    out = str(tmp_path_factory.mktemp("caststore")) + "/store"
    engine.run_encode(spark, df, out, buckets=4, salt_col="tag")
    return out


CAST_ROUTABLE = [
    # timestamp_ntz column vs session-tz timestamp literal (UTC session)
    "SELECT count(*) AS c FROM ev WHERE ts > timestamp'2024-03-01'",
    "SELECT count(*) AS c FROM ev WHERE timestamp'2024-03-01' <= ts",
    "SELECT count(*) AS c FROM ev WHERE timestamp'2024-06-01' > ts",
    "SELECT tag, count(*) AS c, min(ts) AS mn FROM ev "
    "WHERE ts BETWEEN timestamp'2024-02-01' AND timestamp'2024-06-01' "
    "GROUP BY tag",
    "SELECT count(*) AS c FROM ev "
    "WHERE ts IN (timestamp'2024-01-01', timestamp'2024-01-01 03:00:00')",
    # int column vs bigint literal (cast only appears past int32 range)
    "SELECT count(*) AS c FROM ev WHERE iv < 5000000000",
    "SELECT count(*) AS c FROM ev WHERE iv > CAST(500 AS BIGINT)",
    "SELECT tag, sum(iv) AS s FROM ev WHERE iv = CAST(13 AS BIGINT) "
    "GROUP BY tag",
    # in-list / bounds beyond the column's physical int32 range: the
    # kernels clamp to the dtype (never overflow pa.scalar)
    "SELECT count(*) AS c FROM ev WHERE iv IN (13, 5000000000)",
    "SELECT count(*) AS c FROM ev WHERE iv = 5000000000",
    "SELECT count(*) AS c FROM ev WHERE iv > CAST(500 AS BIGINT) "
    "AND iv < 6000000000",
    # float column vs double literal (exact widening; kernel compares
    # promoted)
    "SELECT count(*) AS c FROM ev WHERE fv > 100.5",
    "SELECT count(*) AS c FROM ev WHERE fv <= 10.25 AND fv >= 0.5",
]


@pytest.mark.parametrize("sql", CAST_ROUTABLE)
def test_cast_wrapped_columns_route(spark, cast_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": cast_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": cast_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_ntz_cast_falls_back_outside_fixed_utc(spark, cast_store):
    """Under a DST zone the wall-clock <-> instant map is non-monotone, so
    the ntz<->tz cast must NOT be unwrapped — the statement falls back
    (and is still correct via Spark's own execution)."""
    sql = "SELECT count(*) AS c FROM ev WHERE ts > timestamp'2024-03-01'"
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert sqlagg.route_agg_sql(spark, sql, {"ev": cast_store}) is None
        fast = sqlagg.store_agg_sql(spark, sql, {"ev": cast_store})
        slow = spark.sql(sql)
        assert fast.collect()[0]["c"] == slow.collect()[0]["c"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    # int widening is zone-independent: still routes under the DST zone
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert sqlagg.route_agg_sql(
            spark, "SELECT count(*) AS c FROM ev WHERE iv < 5000000000",
            {"ev": cast_store}) is not None
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_session_tz_fixed_utc_rules(spark):
    """The zone check consults the JVM's own rules: every fixed-zero-offset
    spelling passes, any DST or nonzero-offset zone fails."""
    for tz in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        assert sqlagg._session_tz_fixed_utc(tz), tz
    for tz in ("America/New_York", "Europe/Berlin", "Etc/GMT-1",
               "+01:00", "Asia/Kolkata", "not-a-zone"):
        assert not sqlagg._session_tz_fixed_utc(tz), tz


@pytest.fixture(scope="module")
def time_store(spark, tmp_path_factory):
    """Store with an instant timestamp, a wall-clock timestamp_ntz, a
    dict-able group column, and a nullable int — the derived-time-key
    routing surface (GROUP BY to_date/date_trunc/year/...). Includes
    pre-1970 rows: calendar flooring must not round toward zero."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            base + dt.timedelta(hours=5 * i, microseconds=i),
            base + dt.timedelta(hours=7 * i),
            ["en", "de", "fr"][i % 3],
            (i * 13) % 101 if i % 7 else None,
        )
        for i in range(2000)
    ]
    rows += [
        (
            dt.datetime(1965, 3, 14, 22, 30) + dt.timedelta(hours=9 * i),
            dt.datetime(1965, 3, 14) + dt.timedelta(hours=11 * i),
            "old",
            i,
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, tn timestamp_ntz, lang string, n int")
    out = str(tmp_path_factory.mktemp("timestore")) + "/store"
    engine.run_encode(spark, df, out, buckets=4, salt_col="lang")
    return out


DERIVED_ROUTABLE = [
    # CAST AS DATE / to_date over the instant column (UTC session)
    "SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM ev "
    "GROUP BY CAST(ts AS DATE)",
    "SELECT to_date(ts) AS day, sum(n) AS s, count(*) AS c FROM ev "
    "GROUP BY to_date(ts)",
    # date_trunc across unit vocabularies, instant and ntz inputs
    "SELECT date_trunc('week', ts) AS wk, count(*) AS c FROM ev "
    "GROUP BY date_trunc('week', ts)",
    "SELECT date_trunc('MM', ts) AS mo, count(*) AS c FROM ev "
    "GROUP BY date_trunc('MM', ts)",
    "SELECT date_trunc('month', tn) AS mo, avg(n) AS a FROM ev "
    "GROUP BY date_trunc('month', tn)",
    "SELECT date_trunc('quarter', ts) AS q, count(n) AS cn FROM ev "
    "GROUP BY date_trunc('quarter', ts)",
    # calendar parts (year/month over the injected CAST AS DATE; hour
    # directly over the timestamp)
    "SELECT year(ts) AS y, count(*) AS c FROM ev GROUP BY year(ts)",
    "SELECT month(tn) AS m, count(*) AS c FROM ev GROUP BY month(tn)",
    "SELECT hour(ts) AS h, min(n) AS mn, max(n) AS mx FROM ev "
    "GROUP BY hour(ts)",
    # derived + plain composite; WHERE/HAVING/ORDER BY/LIMIT compose;
    # count(distinct) rides the composite kernel; agg over the derived
    # key's own source column
    "SELECT to_date(ts) AS day, lang, count(*) AS c, sum(n) AS s FROM ev "
    "GROUP BY to_date(ts), lang",
    "SELECT to_date(ts) AS day, count(*) AS c FROM ev WHERE lang = 'en' "
    "GROUP BY to_date(ts)",
    "SELECT to_date(ts) AS day, count(*) AS c FROM ev GROUP BY to_date(ts) "
    "HAVING count(*) > 3 ORDER BY day LIMIT 10",
    "SELECT to_date(ts) AS day, count(DISTINCT lang) AS dl FROM ev "
    "GROUP BY to_date(ts)",
    "SELECT to_date(ts) AS day, min(ts) AS first_ts FROM ev "
    "GROUP BY to_date(ts)",
    # kernel-computed time key + Spark-evaluated scalar key in ONE shape
    "SELECT to_date(ts) AS day, upper(lang) AS L, count(*) AS c FROM ev "
    "GROUP BY to_date(ts), upper(lang)",
    # timestamp difference over routed extremes: the activity-span audit
    # (SubtractTimestamps rebuilds as Column `-` over the cast-back
    # outputs — day-time interval, value- and type-identical)
    "SELECT lang, max(ts) - min(ts) AS span FROM ev GROUP BY lang",
    "SELECT max(ts) - min(ts) AS span, count(*) AS c FROM ev",
    "SELECT to_date(ts) AS day, max(tn) - min(tn) AS span FROM ev "
    "GROUP BY to_date(ts) ORDER BY day LIMIT 7",
]


@pytest.mark.parametrize("sql", DERIVED_ROUTABLE)
def test_derived_time_keys_route(spark, time_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


DERIVED_FALLBACK = [
    # Spark yields NULL for an unknown trunc format — must never route
    "SELECT date_trunc('bogus', ts) AS b, count(*) AS c FROM ev "
    "GROUP BY date_trunc('bogus', ts)",
    # a derived key that never appears in the SELECT has no output name
    # to carry through the partials
    "SELECT count(*) AS c FROM ev GROUP BY to_date(ts)",
]


@pytest.mark.parametrize("sql", DERIVED_FALLBACK)
def test_derived_time_keys_fall_back(spark, time_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) is None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_derived_time_keys_zone_gate(spark, time_store):
    """Under a DST zone, wall-clock projections of the INSTANT column (and
    date_trunc over ntz, whose analyzed form casts ntz->timestamp) must
    fall back; pure wall-clock ntz keys are zone-independent and still
    route with matching values."""
    stores = {"ev": time_store}
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for sql in [
            "SELECT to_date(ts) AS d, count(*) AS c FROM ev "
            "GROUP BY to_date(ts)",
            "SELECT date_trunc('day', ts) AS d, count(*) AS c FROM ev "
            "GROUP BY date_trunc('day', ts)",
            "SELECT hour(ts) AS h, count(*) AS c FROM ev GROUP BY hour(ts)",
            "SELECT date_trunc('day', tn) AS d, count(*) AS c FROM ev "
            "GROUP BY date_trunc('day', tn)",
        ]:
            assert sqlagg.route_agg_sql(spark, sql, stores) is None, sql
            fast = sqlagg.store_agg_sql(spark, sql, stores)
            slow = spark.sql(sql)
            assert sorted(map(repr, map(tuple, fast.collect()))) \
                == sorted(map(repr, map(tuple, slow.collect()))), sql
        for sql in [
            "SELECT to_date(tn) AS d, count(*) AS c FROM ev "
            "GROUP BY to_date(tn)",
            "SELECT month(tn) AS m, count(*) AS c FROM ev "
            "GROUP BY month(tn)",
        ]:
            assert sqlagg.route_agg_sql(spark, sql, stores) is not None, sql
            fast = sqlagg.store_agg_sql(spark, sql, stores)
            slow = spark.sql(sql)
            assert [f.dataType for f in fast.schema.fields] \
                == [f.dataType for f in slow.schema.fields], sql
            assert sorted(map(repr, map(tuple, fast.collect()))) \
                == sorted(map(repr, map(tuple, slow.collect()))), sql
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_distinct_derived_time_key(spark, time_store):
    """SELECT DISTINCT over a derived time key ('which days have data')
    routes through the transform-capable kernel; plain DISTINCT and the
    WHERE-filtered variant stay intact."""
    stores = {"ev": time_store}
    for sql in [
        "SELECT DISTINCT to_date(ts) AS day FROM ev",
        "SELECT DISTINCT date_trunc('month', ts) AS mo FROM ev "
        "ORDER BY mo LIMIT 5",
        "SELECT DISTINCT year(ts) AS y FROM ev WHERE lang = 'en'",
        "SELECT DISTINCT lang FROM ev",
    ]:
        assert sqlagg.route_agg_sql(spark, sql, stores) is not None, sql
        fast = sqlagg.store_agg_sql(spark, sql, stores)
        slow = spark.sql(sql)
        assert [f.dataType for f in fast.schema.fields] \
            == [f.dataType for f in slow.schema.fields], sql
        assert sorted(map(repr, map(tuple, fast.collect()))) \
            == sorted(map(repr, map(tuple, slow.collect()))), sql


DATE_PRED_ROUTABLE = [
    "SELECT count(*) AS c FROM ev WHERE to_date(ts) = date'2024-01-05'",
    "SELECT count(*) AS c FROM ev WHERE CAST(ts AS DATE) > date'2024-02-01'",
    "SELECT count(*) AS c FROM ev WHERE date'2024-02-01' >= to_date(ts)",
    "SELECT count(*) AS c FROM ev WHERE to_date(ts) "
    "BETWEEN date'2024-01-10' AND date'2024-01-20'",
    "SELECT count(*) AS c FROM ev "
    "WHERE to_date(ts) IN (date'2024-01-05', date'2024-02-11')",
    # pre-1970: floor-division day math must hold for negative micros
    "SELECT lang, count(*) AS c FROM ev "
    "WHERE to_date(ts) = date'1965-03-20' GROUP BY lang",
    "SELECT count(*) AS c FROM ev WHERE to_date(tn) < date'1970-01-01'",
    "SELECT count(*) AS c FROM ev "
    "WHERE to_date(ts) = date'2024-01-05' AND lang = 'en'",
]


@pytest.mark.parametrize("sql", DATE_PRED_ROUTABLE)
def test_date_projection_predicates_route(spark, time_store, sql):
    """WHERE over a day projection (to_date / CAST AS DATE) rewrites to
    the exact epoch-micros range and routes — the predicate reaches the
    zone maps instead of forcing a fallback decode."""
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_date_projection_predicate_prunes(spark, tmp_path_factory):
    """On a ts-CLUSTERED store a single-day equality must read a strict
    subset of buckets (the rewrite reaches the bucket zone maps)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=30 * i), i % 97) for i in range(4000)]
    df = spark.createDataFrame(rows, "ts timestamp, n int")
    out = str(tmp_path_factory.mktemp("datepruned")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, cluster_col="ts")
    sql = "SELECT count(*) AS c FROM ev WHERE to_date(ts) = date'2024-01-20'"
    r = sqlagg.route_agg_sql(spark, sql, {"ev": out})
    assert r is not None
    stats = sqlagg.route_pruning_stats(r)
    assert stats["buckets_read"] < stats["buckets_total"], stats
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": out})
    assert fast.collect()[0]["c"] == spark.sql(sql).collect()[0]["c"]


def test_date_projection_predicate_zone_gate(spark, time_store):
    """Instant-column day projections fall back outside fixed-UTC (and
    stay correct); ntz day projections route under any zone."""
    stores = {"ev": time_store}
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sql = "SELECT count(*) AS c FROM ev WHERE to_date(ts) = date'2024-01-05'"
        assert sqlagg.route_agg_sql(spark, sql, stores) is None
        fast = sqlagg.store_agg_sql(spark, sql, stores)
        assert fast.collect()[0]["c"] == spark.sql(sql).collect()[0]["c"]
        sql = "SELECT count(*) AS c FROM ev WHERE to_date(tn) = date'2024-01-05'"
        assert sqlagg.route_agg_sql(spark, sql, stores) is not None
        fast = sqlagg.store_agg_sql(spark, sql, stores)
        assert fast.collect()[0]["c"] == spark.sql(sql).collect()[0]["c"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


HAVING_TIME_ROUTABLE = [
    # timestamp max/min vs timestamp literal (typed-literal rebuild)
    "SELECT lang, max(ts) AS mx FROM ev GROUP BY lang "
    "HAVING max(ts) > timestamp'2024-06-01'",
    "SELECT lang, min(ts) AS mn FROM ev GROUP BY lang "
    "HAVING min(ts) < timestamp'1970-01-01'",
    # ntz literal vs ntz min (zone-free make_timestamp_ntz rebuild),
    # including a pre-1970 (negative-epoch) literal
    "SELECT lang, min(tn) AS mn FROM ev GROUP BY lang "
    "HAVING min(tn) >= timestamp_ntz'1970-01-01'",
    "SELECT lang, min(tn) AS mn FROM ev GROUP BY lang "
    "HAVING min(tn) < timestamp_ntz'1965-06-01 07:30:00'",
    # derived DATE group key vs date literal
    "SELECT to_date(ts) AS day, count(*) AS c FROM ev "
    "GROUP BY to_date(ts) HAVING day > date'2024-06-01' AND count(*) > 1",
    # cross-type literal: Spark's own coercion re-applies in the rebuilt
    # filter (date literal vs timestamp column)
    "SELECT lang, max(ts) AS mx FROM ev GROUP BY lang "
    "HAVING max(ts) > date'2024-06-01'",
    # time-typed IN values (late round 5): non-plain IN items rebuild as
    # an OR chain of typed = comparisons — exactly IN's semantics over a
    # flat literal list
    "SELECT lang, max(ts) AS mx FROM ev GROUP BY lang "
    "HAVING max(ts) IN (timestamp'2024-06-01', timestamp'2024-06-02')",
]


@pytest.mark.parametrize("sql", HAVING_TIME_ROUTABLE)
def test_having_over_time_outputs_routes(spark, time_store, sql):
    """HAVING against time-typed min/max outputs and derived date keys
    routes: the executor rebuilds time literals TYPED (timestamp_micros /
    date_from_unix_date / make_timestamp_ntz), closing round-4's
    conservative 'HAVING over a time-typed min/max' fallback."""
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


HAVING_TIME_BETWEEN = [
    # HAVING x BETWEEN analyzes to an INLINE Cast(between(max(
    # TempResolvedColumn(...)))) — round-5 final stretch: the boolean
    # cast unwraps, the inline aggregate binds by engine spec to the
    # output computing it, and the between rewrites to >= AND <= with
    # TYPED time literals — so the last HAVING-over-time fallback routes
    "SELECT lang, max(ts) AS mx FROM ev GROUP BY lang "
    "HAVING max(ts) BETWEEN timestamp'2024-01-01' AND timestamp'2030-01-01'",
]


@pytest.mark.parametrize("sql", HAVING_TIME_BETWEEN)
def test_having_time_between_routes(spark, time_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


YEAR_PRED_ROUTABLE = [
    "SELECT count(*) AS c FROM ev WHERE year(ts) = 2024",
    "SELECT count(*) AS c FROM ev WHERE year(ts) < 1970",
    "SELECT count(*) AS c FROM ev WHERE year(tn) >= 2025",
    "SELECT count(*) AS c FROM ev WHERE year(ts) BETWEEN 1960 AND 1966",
    "SELECT count(*) AS c FROM ev WHERE year(ts) IN (1965, 2024)",
    "SELECT lang, count(*) AS c FROM ev WHERE 2024 <= year(ts) "
    "GROUP BY lang",
    "SELECT count(*) AS c FROM ev WHERE year(ts) = 2024 AND lang = 'en'",
]


@pytest.mark.parametrize("sql", YEAR_PRED_ROUTABLE)
def test_year_projection_predicates_route(spark, time_store, sql):
    """WHERE over year(ts) rewrites to the exact [Jan1(y), Jan1(y+1))
    micros range — the year projection is CONTIGUOUS in epoch time, so it
    prunes like any ts window (month/day-of-month are not and stay
    fallbacks)."""
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", [
    "SELECT count(*) AS c FROM ev WHERE month(ts) = 1",  # not contiguous
    "SELECT count(*) AS c FROM ev WHERE year(ts) > 9999",  # datetime range
])
def test_year_projection_fallbacks(spark, time_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) is None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


TRUNC_PRED_ROUTABLE = [
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('month', ts) = timestamp'2024-03-01'",
    # a Monday: week-aligned equality
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('week', ts) = timestamp'2024-02-05'",
    # unaligned BOUNDS are fine (only unaligned EQUALITY falls back)
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('hour', ts) >= timestamp'2024-06-01 05:30:00'",
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('day', ts) > timestamp'2024-06-01'",
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('quarter', ts) < timestamp'1970-01-01'",
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('day', tn) <= timestamp'2024-02-15 12:00:00'",
    "SELECT count(*) AS c FROM ev WHERE date_trunc('month', ts) "
    "BETWEEN timestamp'2024-02-01' AND timestamp'2024-04-15'",
    "SELECT lang, count(*) AS c FROM ev "
    "WHERE date_trunc('month', ts) = timestamp'1965-04-01' GROUP BY lang",
]


@pytest.mark.parametrize("sql", TRUNC_PRED_ROUTABLE)
def test_trunc_projection_predicates_route(spark, time_store, sql):
    """WHERE over date_trunc(unit, ts) rewrites via the monotone-trunc
    bound algebra (ceil/next-boundary in calendar micros) and routes."""
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", [
    # unaligned equality: Spark matches nothing; the engine has no
    # always-false spec — falls back row-identically
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('month', ts) = timestamp'2024-03-15'",
    "SELECT count(*) AS c FROM ev "
    "WHERE date_trunc('bogus', ts) = timestamp'2024-03-01'",
])
def test_trunc_projection_fallbacks(spark, time_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) is None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


MERGED_BOUND_ROUTABLE = [
    # day-projection equality intersected with a raw ts bound
    "SELECT count(*) AS c FROM ev WHERE to_date(ts) = date'2024-01-05' "
    "AND ts > timestamp'2024-01-05 12:00:00'",
    # three bounds on one column, two redundant
    "SELECT count(*) AS c FROM ev WHERE ts > timestamp'2024-02-01' "
    "AND ts < timestamp'2024-03-01' AND year(ts) = 2024",
    # IS NOT NULL is implied by any value constraint (both orders)
    "SELECT count(*) AS c FROM ev WHERE ts IS NOT NULL "
    "AND ts > timestamp'2024-06-01'",
    "SELECT count(*) AS c FROM ev WHERE n >= 50 AND n IS NOT NULL",
    # contradictory intersection = empty range, proven off zone maps
    "SELECT count(*) AS c FROM ev WHERE n > 10 AND n < 5",
    "SELECT count(*) AS c FROM ev WHERE n > 10 AND n > 40 AND n <= 60",
    # two different derived projections of the same column intersect
    "SELECT lang, count(*) AS c FROM ev "
    "WHERE date_trunc('month', ts) = timestamp'2024-02-01' "
    "AND to_date(ts) >= date'2024-02-10' GROUP BY lang",
]


@pytest.mark.parametrize("sql", MERGED_BOUND_ROUTABLE)
def test_anded_int_bounds_merge(spark, time_store, sql):
    """ANDed int-domain bounds on one column intersect (lo=max/hi=min)
    instead of falling back; IS NOT NULL alongside a value constraint is
    subsumed (SQL comparisons never match null, and the engine's specs
    share that semantics)."""
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) \
        is not None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", [
    "SELECT count(*) AS c FROM ev WHERE n = 5 AND n = 5",  # dup eq stays out
    "SELECT count(*) AS c FROM ev WHERE lang IS NULL AND lang = 'en'",
])
def test_non_mergeable_constraints_fall_back(spark, time_store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"ev": time_store}) is None, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"ev": time_store})
    slow = spark.sql(sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_route_reason_surfaces_fallback_cause(spark, time_store):
    """route_agg_sql_reason names the first unroutable shape, so
    jobs/query.py --explain can tell the user which clause to rephrase."""
    stores = {"ev": time_store}
    # four DISTINCT columns stay beyond the 3-branch inclusion-exclusion
    # cap (2^4 - 1 = 15 passes would not be a win); same-column branches
    # merge first, so 'lang=en OR lang=de OR n>5' is only 2 branches
    r, reason = sqlagg.route_agg_sql_reason(
        spark, "SELECT count(*) AS c FROM ev "
               "WHERE lang = 'en' OR n > 5 OR ts > timestamp'2024-06-01' "
               "OR tn < timestamp_ntz'2024-01-01'", stores)
    assert r is None and "beyond three branches" in reason
    r, reason = sqlagg.route_agg_sql_reason(
        spark, "SELECT count(*) AS c FROM ev GROUP BY to_date(ts)", stores)
    assert r is None and "not in SELECT" in reason
    r, reason = sqlagg.route_agg_sql_reason(
        spark, "SELECT lang, count(*) AS c FROM ev GROUP BY lang", stores)
    assert r is not None and reason is None


def test_cross_column_or_route_shape(spark, store):
    """Ungrouped cross-column OR routes as three inclusion-exclusion
    predicate sets (A, B, A AND B), each a plain engine predicate dict, so
    every pass keeps the full zone-map/bucket pruning stack; the pruning
    report unions the passes. A contradictory A-AND-B pass (conflicting
    specs on one column) stays a clean fallback."""
    stores = {"docs": store}
    r = sqlagg.route_agg_sql(
        spark, "SELECT count(*) AS c, sum(n_chars) AS s FROM docs "
               "WHERE lang = 'en' OR n_chars > 4000", stores)
    assert r is not None and len(r["orx"]) == 3
    preds_a, preds_b, preds_ab = r["orx"]
    assert preds_a == {"lang": ("eq", "en")}
    assert preds_b["n_chars"][0] == 4001  # strict bound, inclusive form
    assert preds_ab == {"lang": ("eq", "en"),
                        "n_chars": preds_b["n_chars"]}
    stats = sqlagg.route_pruning_stats(r)
    assert set(stats) == {"buckets_total", "passes", "buckets_read",
                          "buckets_full", "buckets_masked"}
    # reads SUM across the passes (a bucket decoded by two passes costs
    # two decodes) — honest cost, bounded by passes x total
    assert 0 < stats["buckets_read"] \
        <= stats["passes"] * stats["buckets_total"]
    assert stats["passes"] == 3

    # both branches provably empty: zero buckets read, SQL empty-input
    # aggregate semantics (count 0, sum NULL)
    r0 = sqlagg.route_agg_sql(
        spark, "SELECT count(*) AS c, sum(n_chars) AS s FROM docs "
               "WHERE n_chars > 99999 OR n_chars < -1", stores)
    # same-column OR takes the native single-pass spec instead
    assert r0 is not None and r0.get("orx") is None

    # conflicting eq constraints inside the A-AND-B pass -> fallback
    rc, reason = sqlagg.route_agg_sql_reason(
        spark, "SELECT count(*) AS c FROM docs "
               "WHERE lang = 'en' OR (lang = 'de' AND n_chars > 5)", stores)
    assert rc is None and "multiple constraints" in reason

    # pass-count economics: additive aggregates need the A-AND-B overlap
    # pass; extremes and DISTINCT membership do not
    r2 = sqlagg.route_agg_sql(
        spark, "SELECT min(n_chars) AS mn, max(doc_id) AS mx FROM docs "
               "WHERE lang = 'en' OR n_chars > 4000", stores)
    assert len(r2["orx"]) == 2
    r3 = sqlagg.route_agg_sql(
        spark, "SELECT DISTINCT source FROM docs "
               "WHERE lang = 'en' OR n_chars > 4000", stores)
    assert len(r3["orx"]) == 2
    r4 = sqlagg.route_agg_sql(
        spark, "SELECT lang, count(*) AS c, min(n_chars) AS mn FROM docs "
               "WHERE lang = 'en' OR n_chars > 4000 GROUP BY lang", stores)
    assert len(r4["orx"]) == 3

    # THREE branches (late round 5): additive IE = 3 singles + 3 pairs +
    # 1 triple = 7 signed passes; extremes/DISTINCT still 3 branch passes
    r5 = sqlagg.route_agg_sql(
        spark, "SELECT count(*) AS c FROM docs WHERE lang = 'en' "
               "OR n_chars > 4000 OR doc_id < 100", stores)
    assert len(r5["orx"]) == 7 and r5["orx_branches"] == 3
    assert r5["orx_signs"] == [1, 1, 1, -1, -1, -1, 1]
    r6 = sqlagg.route_agg_sql(
        spark, "SELECT min(n_chars) AS mn FROM docs WHERE lang = 'en' "
               "OR n_chars > 4000 OR doc_id < 100", stores)
    assert len(r6["orx"]) == 3 and r6["orx_signs"] == [1, 1, 1]
    # same-column branches merge into one ("or", col, forms) branch
    r7 = sqlagg.route_agg_sql(
        spark, "SELECT count(*) AS c FROM docs WHERE lang = 'en' "
               "OR lang = 'de' OR n_chars > 4000", stores)
    assert r7["orx_branches"] == 2 and len(r7["orx"]) == 3
    assert r7["orx"][0] == {"lang": ("or", [("eq", "en"), ("eq", "de")])}


def test_hidden_sort_aggregate_route_shape(spark, store):
    """ORDER BY an aggregate the SELECT drops routes with
    final_after_order set, so the composed sort/limit run before the
    outer projection (Spark's own evaluation order for
    Project(Sort(Aggregate)))."""
    stores = {"docs": store}
    r = sqlagg.route_agg_sql(
        spark, "SELECT lang FROM docs GROUP BY lang "
               "ORDER BY count(*) DESC, lang LIMIT 3", stores)
    assert r is not None and r["final_after_order"]
    assert r["limit"] == 3 and r["order"][0][1] is True  # DESC
    # the hidden count is a real Aggregate output the projection drops
    assert any(fn == "count" for fn, *_ in r["aggs"].values())
    assert [out for _, out in r["final"]] == ["lang"]
    # visible-output ORDER BY keeps the old projection-first order
    r2 = sqlagg.route_agg_sql(
        spark, "SELECT lang, count(*) AS c FROM docs GROUP BY lang "
               "ORDER BY c DESC, lang LIMIT 3", stores)
    assert r2 is not None and not r2["final_after_order"]


def test_expr_over_aggregates_route_shape(spark, store):
    """Arithmetic select items register their embedded aggregates as
    hidden routed outputs — reusing a visible output with an identical
    spec instead of computing it twice."""
    stores = {"docs": store}
    r = sqlagg.route_agg_sql(
        spark, "SELECT lang, sum(n_chars)/count(*) AS r FROM docs "
               "GROUP BY lang", stores)
    assert r is not None
    assert r["hidden"] == ["_hx0", "_hx1"]
    assert r["aggs"]["_hx0"] == ("sum", "n_chars")
    assert r["aggs"]["_hx1"] == ("count",)
    (name, kind, spec), = [e for e in r["out_cols"] if e[1] == "expr"]
    assert name == "r" and spec[0] == "bin" and spec[1] == "/"
    # a visible count(*) with the same spec is REUSED by the expression:
    # only the sum needs a hidden slot
    r2 = sqlagg.route_agg_sql(
        spark, "SELECT lang, count(*) AS c, sum(n_chars)/count(*) AS r "
               "FROM docs GROUP BY lang", stores)
    assert r2 is not None and r2["hidden"] == ["_hx0"]
    assert r2["aggs"]["_hx0"] == ("sum", "n_chars")
    refs = sqlagg._expr_refs(
        [e for e in r2["out_cols"] if e[1] == "expr"][0][2])
    assert refs == {"_hx0", "c"}
    # a user alias shaped like a hidden slot falls back cleanly
    r3, reason = sqlagg.route_agg_sql_reason(
        spark, "SELECT lang, count(*) AS _hx0, sum(n_chars)/count(*) AS r "
               "FROM docs GROUP BY lang", stores)
    assert r3 is None and "_hx0" in reason


def test_sqlexpr_group_key_route_shape(spark, store):
    """Derived scalar keys carry ("sqlexpr", sql, srcs) transforms: the
    kernel groups the RAW sources; the rebuilt SQL preserves the analyzed
    tree (bare backquoted columns, typed literals)."""
    stores = {"docs": store}
    r = sqlagg.route_agg_sql(
        spark, "SELECT upper(lang) AS L, count(*) AS c FROM docs "
               "GROUP BY upper(lang)", stores)
    assert r is not None and r["group_col"] is None
    assert r["group_cols"] == ["L"]
    ((src, tr, out),) = r["group_specs"]
    assert (src, out) == ("lang", "L")
    assert tr[0] == "sqlexpr" and tr[1] == "upper(`lang`)"
    assert list(tr[2]) == ["lang"]
    # multi-source key: every referenced column becomes a raw kernel dim
    r2 = sqlagg.route_agg_sql(
        spark, "SELECT concat(lang, '-', source) AS k, count(*) AS c "
               "FROM docs GROUP BY concat(lang, '-', source)", stores)
    assert r2 is not None
    ((_, tr2, _),) = r2["group_specs"]
    assert list(tr2[2]) == ["lang", "source"]
    assert tr2[1] == "concat(`lang`, '-', `source`)"
    # DISTINCT over a derived key routes through the same spec
    r3 = sqlagg.route_agg_sql(
        spark, "SELECT DISTINCT upper(lang) AS L FROM docs", stores)
    assert r3 is not None and r3["group_specs"][0][1][0] == "sqlexpr"


def test_sqlexpr_single_exchange_on_derived_key(spark, store):
    """The derived-scalar-key plan's ONLY grouped exchange is keyed on
    the DERIVED value: the kernels hand over pre-merge per-bucket
    partials (merge=False), the rebuilt expression is applied to them,
    and the single groupBy runs on the final key — so Spark's partial
    hash aggregation collapses the shuffle to O(partitions x derived
    ndv) even when the raw source is high-cardinality. A raw-keyed merge
    exchange appearing below would shuffle per-raw-group rows at scale."""
    import re as _re

    stores = {"docs": store}
    for sql in [
        "SELECT upper(lang) AS L, count(*) AS c FROM docs GROUP BY "
        "upper(lang)",
        "SELECT substring(source, 1, 4) AS s4, count(*) AS c, "
        "sum(n_chars) AS t FROM docs GROUP BY substring(source, 1, 4)",
        "SELECT upper(lang) AS L, count(*) AS c FROM docs "
        "WHERE n_chars > 500 GROUP BY upper(lang)",
    ]:
        assert sqlagg.route_agg_sql(spark, sql, stores) is not None, sql
        df = sqlagg.store_agg_sql(spark, sql, stores)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hashex = _re.findall(r"Exchange hashpartitioning\((\w+)", plan)
        assert len(hashex) == 1, (sql, plan)
        # keyed on the derived output, never the raw source column
        assert hashex[0] in ("L", "s4"), (sql, hashex)


def test_noninjective_derived_key_count_distinct(spark, tmp_path_factory):
    """REGRESSION: a derived group key that MERGES raw groups ('en' and
    'En' both upper to 'EN') sharing a distinct-column value must count
    that value once — the finishing must count distinct VALUES over the
    combo rows, never the combo rows themselves (which over-count after
    the derived re-group). The module store's langs are injective under
    upper, so only this mixed-case store exercises the merge."""
    rows = [(1, "en", "s1"), (2, "En", "s1"), (3, "en", "s2"),
            (4, "de", "s1"), (5, "de", "s1"), (6, None, "s3"),
            (7, "EN", "s1"), (8, "eN", "s4")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = str(tmp_path_factory.mktemp("mixedcase")) + "/store"
    engine.run_encode(spark, df, out, buckets=2, salt_col="doc_id")
    stores = {"docs": out}
    df.createOrReplaceTempView("docs")
    for sql in [
        "SELECT upper(lang) AS L, count(distinct source) AS d, "
        "count(*) AS c FROM docs GROUP BY upper(lang)",
        "SELECT upper(lang) AS L, count(distinct left(source, 2)) AS d "
        "FROM docs GROUP BY upper(lang)",
        "SELECT count(distinct upper(lang)) AS d FROM docs",
        "SELECT upper(lang) AS L, count(distinct source) AS d FROM docs "
        "WHERE doc_id < 5 OR source = 's4' GROUP BY upper(lang)",
    ]:
        assert sqlagg.route_agg_sql(spark, sql, stores) is not None, sql
        fast = sqlagg.store_agg_sql(spark, sql, stores)
        slow = spark.sql(sql)
        assert [f.dataType for f in fast.schema.fields] \
            == [f.dataType for f in slow.schema.fields], sql
        assert sorted(map(repr, map(tuple, fast.collect()))) \
            == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_time_key_alias_shadowing_raw_column(spark, tmp_path_factory):
    """REGRESSION: a time-derived key ALIASED to the name of a stored
    column ('to_date(ts) AS day' on a store that also has a raw 'day'
    string column) must fall back whenever another derived key or a
    COUNT(DISTINCT) expression reads that raw column — the kernel-dim
    dedup would otherwise skip the raw column and evaluate the
    expression over the derived DATE (silently wrong). Fallback parity
    is asserted against Spark."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(hours=7 * i),
             ["mon", "tue", "wed", "thu"][i % 4], i) for i in range(200)]
    df = spark.createDataFrame(rows, "ts timestamp, day string, n long")
    out = str(tmp_path_factory.mktemp("shadow")) + "/store"
    engine.run_encode(spark, df, out, buckets=2, salt_col="day")
    stores = {"ev2": out}
    df.createOrReplaceTempView("ev2")
    for sql in [
        "SELECT to_date(ts) AS day, upper(day) AS U, count(*) AS c "
        "FROM ev2 GROUP BY to_date(ts), upper(day)",
        "SELECT upper(day) AS U, to_date(ts) AS day, count(*) AS c "
        "FROM ev2 GROUP BY upper(day), to_date(ts)",
        "SELECT to_date(ts) AS day, count(distinct upper(day)) AS d "
        "FROM ev2 GROUP BY to_date(ts)",
        "SELECT to_date(ts) AS day, count(distinct day) AS d "
        "FROM ev2 GROUP BY to_date(ts)",
    ]:
        assert sqlagg.route_agg_sql(spark, sql, stores) is None, sql
        fast = sqlagg.store_agg_sql(spark, sql, stores)
        slow = spark.sql(sql)
        assert sorted(map(repr, map(tuple, fast.collect()))) \
            == sorted(map(repr, map(tuple, slow.collect()))), sql
    # the same statements over NON-colliding aliases still route
    ok = ("SELECT to_date(ts) AS d0, upper(day) AS U, count(*) AS c "
          "FROM ev2 GROUP BY to_date(ts), upper(day)")
    assert sqlagg.route_agg_sql(spark, ok, stores) is not None
    fast = sqlagg.store_agg_sql(spark, ok, stores)
    slow = spark.sql(ok)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect())))
