#!/usr/bin/env python3
"""Generate golden TSVs for GoldenSpec from DuckDB (an independent engine)
over the sf0.001 parquet tables. Each file: header of variable names, rows
in the query's ORDER BY (binary collation, NULLS FIRST, matching Spark),
nulls rendered as empty strings; "NO ANSWERS." for empty results.

Usage: python3 tools/golden.py [sf_dir] [out_dir]
"""
import duckdb, sys, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/golden"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

# SQL equivalents of the GoldenSpec SPARQL queries (triple-ized schema:
# subject = '<table>:<pk>', predicate = column name).
QUERIES = {
    "sparql_optional": """
        SELECT x, m FROM (
          SELECT 'customer:' || c_custkey AS x, c_mktsegment AS m FROM customer
          UNION ALL SELECT 'nation:' || n_nationkey, NULL FROM nation
          UNION ALL SELECT 'region:' || r_regionkey, NULL FROM region
          UNION ALL SELECT 'supplier:' || s_suppkey, NULL FROM supplier
          UNION ALL SELECT 'part:' || p_partkey, NULL FROM part
        ) ORDER BY x, m NULLS FIRST""",
    "sparql_service_var": """
        SELECT ep, x, nm FROM (
          SELECT 'graft://nations' AS ep, 'nation:' || n_nationkey AS x,
                 n_name AS nm FROM nation
          UNION ALL SELECT 'graft://regions', 'region:' || r_regionkey, r_name
          FROM region
        ) ORDER BY ep, x, nm""",
    "sparql_minus": """
        SELECT 'customer:' || c_custkey AS c FROM customer
        WHERE c_mktsegment <> 'BUILDING' ORDER BY c""",
    "sparql_agg": """
        SELECT r_name AS nm, count(*) AS cnt
        FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY nm""",
    "sparql_exists_expr": """
        SELECT 'customer:' || c_custkey AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_regionkey = 0 OR 'customer:' || c_custkey = 'customer:1'
        ORDER BY c""",
    "sparql_if_exists": """
        SELECT 'nation:' || n_nationkey AS n,
          CASE WHEN EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
               THEN 'has-suppliers' ELSE 'none' END AS k
        FROM nation ORDER BY n""",
    "sparql_path": """
        SELECT c, r FROM (
          SELECT 'customer:' || c_custkey AS c, 'region:' || n_regionkey AS r
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          UNION ALL
          SELECT 'supplier:' || s_suppkey, 'region:' || n_regionkey
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ) ORDER BY c, r""",
    "sparql_path_alt": """
        SELECT n, v FROM (
          SELECT 'nation:' || n_nationkey AS n, n_name AS v FROM nation
          UNION ALL
          SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ) ORDER BY n, v""",
    "sparql_path_inv": """
        SELECT 'region:' || n_regionkey AS r, 'nation:' || n_nationkey AS n
        FROM nation ORDER BY r, n""",
    "sparql_path_star": """
        SELECT x FROM (
          SELECT 'nation:3' AS x
          UNION ALL
          SELECT DISTINCT 'region:' || n_regionkey FROM nation WHERE n_nationkey = 3
        ) ORDER BY x""",
    "sparql_bind": """
        SELECT 'part:' || p_partkey AS p, 'sz-' || p_size AS label
        FROM part ORDER BY p""",
    "sparql_bound": """
        SELECT 'customer:' || c_custkey AS x FROM customer
        WHERE c_mktsegment <> 'BUILDING' ORDER BY x""",
    "sparql_groupconcat": """
        SELECT 'region:' || n_regionkey AS r,
          string_agg(n_name, ',' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY r""",
    "sparql_exists": """
        SELECT DISTINCT 'nation:' || s_nationkey AS n FROM supplier ORDER BY n""",
    "sparql_subquery": """
        SELECT 'nation:' || k AS n, cnt FROM (
          SELECT k, count(*) AS cnt FROM (
            SELECT c_nationkey AS k FROM customer
            UNION ALL SELECT s_nationkey FROM supplier
          ) GROUP BY k
        ) ORDER BY n""",
    "sparql_in": """
        SELECT 'part:' || p_partkey AS p, CAST(p_size AS VARCHAR) AS sz
        FROM part WHERE p_size IN (25, 30, 35) ORDER BY p""",
    "sparql_npath": """
        SELECT 'nation:' || n_nationkey AS n, 'region:' || n_regionkey AS v
        FROM nation ORDER BY n, v""",
    "sparql_polist": """
        SELECT 'order:' || o_orderkey AS o, 'customer:' || o_custkey AS c
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F' AND c_mktsegment = 'BUILDING'
        ORDER BY o, c""",
    "sparql_opt_cond": """
        SELECT x, m FROM (
          SELECT 'customer:' || c_custkey AS x,
            CASE WHEN c_nationkey = 3 THEN c_mktsegment END AS m
          FROM customer) ORDER BY x, m NULLS FIRST""",
    "sparql_strfns": """
        SELECT 'part:' || p_partkey AS p,
          substring(p_name, 1, 4) AS head,
          CASE WHEN contains(p_name, ' ')
               THEN substring(p_name, position(' ' IN p_name) + 1)
               ELSE '' END AS noun
        FROM part ORDER BY p""",
    # VALUES with an UNDEF (wildcard) cell: every customer matches the
    # UNDEF row with tag 'any'; BUILDING customers also match the bound row
    "sparql_values_undef": """
        SELECT c, m, tag FROM (
          SELECT 'customer:' || c_custkey AS c, c_mktsegment AS m, 'b' AS tag
          FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION ALL
          SELECT 'customer:' || c_custkey, c_mktsegment, 'any' FROM customer
        ) ORDER BY c, tag""",
    # ORDER BY on an expression key (pre-projection algebra position)
    "sparql_order_expr": """
        SELECT 'part:' || p_partkey AS p, p_name AS nm
        FROM part ORDER BY length(p_name) DESC, p""",
    # GROUP BY (expr AS ?v) — computed grouping key
    "sparql_group_expr": """
        SELECT 'seg-' || c_mktsegment AS seg, count(*) AS cnt
        FROM customer GROUP BY 1 ORDER BY seg""",
    # --- adversarial semantics: where ARQ algebra diverges from naive SQL ---
    # zero-length path from a constant ABSENT from the graph still matches
    # itself (SPARQL 1.1 S9.3)
    "sparql_path_zero_absent": """
        SELECT 'ghost:1' AS x""",
    # nested OPTIONAL: the inner optional never binds (suppliers carry no
    # mktsegment edge) and must not eliminate the outer rows
    "sparql_opt_nested": """
        SELECT n, s, m FROM (
          SELECT 'nation:' || n_nationkey AS n,
            CASE WHEN s_suppkey IS NULL THEN NULL
                 ELSE 'supplier:' || s_suppkey END AS s,
            NULL AS m
          FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        ) ORDER BY n, s NULLS FIRST, m NULLS FIRST""",
    # OPTIONAL then MINUS: the left join extends, then MINUS removes on the
    # shared ?c only
    "sparql_opt_minus": """
        SELECT 'customer:' || c_custkey AS c, c_mktsegment AS m
        FROM customer WHERE c_mktsegment <> 'BUILDING' ORDER BY c, m""",
    # UNION with DISJOINT variables: each branch null-pads the other's var
    "sparql_union_disjoint": """
        SELECT x, y FROM (
          SELECT 'region:' || r_regionkey AS x, NULL AS y
          FROM region WHERE r_name = 'ASIA'
          UNION ALL
          SELECT NULL, 'customer:' || c_custkey
          FROM customer WHERE c_mktsegment = 'BUILDING'
        ) ORDER BY x NULLS FIRST, y NULLS FIRST""",
    # GROUP_CONCAT over groups with ZERO bound values (optional var never
    # binds): empty concatenation, not a dropped group
    "sparql_groupconcat_empty": """
        SELECT 'nation:' || n_nationkey AS n, NULL AS gs
        FROM nation ORDER BY n""",
    # subquery with LIMIT inside: the limit applies in the subquery's
    # (lexicographic) order, before the outer join
    "sparql_subquery_limit": """
        SELECT n, nm FROM (
          SELECT 'nation:' || n_nationkey AS n, n_name AS nm FROM nation
        ) WHERE n IN (
          SELECT 'nation:' || n_nationkey FROM nation ORDER BY 1 LIMIT 5)
        ORDER BY n, nm""",
    # multi-var VALUES with a non-matching row: joins on BOTH columns
    "sparql_values_multi": """
        SELECT 'nation:' || n_nationkey AS n, n_name AS nm
        FROM nation WHERE n_nationkey = 1 AND n_name = 'NATION_1'
        ORDER BY n""",
    # NOT EXISTS over a pattern whose predicate is absent from the store:
    # the fail-fast empty inner group must keep every outer row
    "sparql_not_exists_empty": """
        SELECT 'region:' || r_regionkey AS r FROM region ORDER BY r""",
    # zero-or-one path `p?` from a constant: itself plus direct objects
    "sparql_path_opt": """
        SELECT x FROM (
          SELECT 'nation:3' AS x
          UNION ALL
          SELECT DISTINCT 'region:' || n_regionkey FROM nation
          WHERE n_nationkey = 3
        ) ORDER BY x""",
    # ORDER BY DESC + LIMIT + OFFSET interaction
    "sparql_desc_offset": """
        SELECT 'nation:' || n_nationkey AS n, n_name AS nm
        FROM nation ORDER BY nm DESC, n LIMIT 5 OFFSET 3""",
    # nested boolean FILTER (|| inside &&, negation)
    "sparql_filter_bool": """
        SELECT 'part:' || p_partkey AS p, p_size::VARCHAR AS sz
        FROM part
        WHERE (p_size > 40 OR p_size < 3) AND NOT p_brand = 'Brand#3'
        ORDER BY p""",
    # OPTIONAL scoped INSIDE one union arm; the other arm binds ?m to null
    "sparql_union_optional": """
        SELECT x, m FROM (
          SELECT 'customer:' || c_custkey AS x, c_mktsegment AS m FROM customer
          UNION ALL SELECT 'region:' || r_regionkey, NULL FROM region
        ) ORDER BY x, m NULLS FIRST""",
    # closure over an ALTERNATION path from a bound subject:
    # customer -> nation (nationkey) -> region (regionkey)
    "sparql_closure_alt": """
        SELECT x FROM (
          SELECT 'nation:' || c_nationkey AS x FROM customer WHERE c_custkey = 7
          UNION
          SELECT 'region:' || n_regionkey
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          WHERE c_custkey = 7
        ) ORDER BY x""",
    # --- SPARQL UPDATE golden cases: the SQL replays update + query ---
    # DELETE {name} INSERT {label} WHERE: every nation name becomes label
    "update_rewrite": """
        SELECT 'nation:' || n_nationkey AS n, n_name AS m
        FROM nation ORDER BY n, m""",
    # DELETE WHERE drops every BUILDING mktsegment triple
    "update_delete_where": """
        SELECT 'customer:' || c_custkey AS c, c_mktsegment AS m
        FROM customer WHERE c_mktsegment <> 'BUILDING' ORDER BY c, m""",
    # INSERT DATA adds a fresh region name alongside the stored ones
    "update_insert_data": """
        SELECT nm FROM (
          SELECT r_name AS nm FROM region
          UNION ALL SELECT 'OCEANIA'
        ) ORDER BY nm""",
    # IF with a nested else-branch over part sizes
    "sparql_if": """
        SELECT 'part:' || p_partkey AS p,
               CASE WHEN p_size > 25 THEN 'big'
                    WHEN p_size > 10 THEN 'mid'
                    ELSE 'small' END AS cls
        FROM part ORDER BY p""",
    # HOURS/MINUTES/SECONDS/TZ/TIMEZONE over a BIND-supplied datetime
    "sparql_time": """
        SELECT 'region:' || r_regionkey AS r,
               14 AS h, 45 AS m, 13.5 AS sec,
               '+05:30' AS tz, 'PT5H30M' AS dur
        FROM region ORDER BY r""",
    # [ po-list ] blank subject: a fresh hidden variable
    "sparql_blank_polist": """
        SELECT 'region:' || n_regionkey AS o FROM nation
        WHERE n_name = 'NATION_3' ORDER BY o""",
    # negated property set with forward AND inverse members:
    # forward edges of a nation other than a/name, no reverse edges
    # survive the ^nationkey exclusion
    "sparql_npath_inv": """
        SELECT 'nation:' || n_nationkey AS n, 'region:' || n_regionkey AS v
        FROM nation ORDER BY n, v""",
    # SUM/AVG over the DISTINCT value set
    "sparql_agg_distinct": """
        SELECT sum(DISTINCT p_size)::DOUBLE AS s,
               round(avg(DISTINCT p_size), 9) AS a FROM part""",
    # trailing ValuesClause: joined after the modifiers position in the
    # text, before projection in the algebra
    "sparql_values_trailing": """
        SELECT 'nation:' || n_nationkey AS n, n_name AS nm FROM nation
        WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_12') ORDER BY n""",
    # trailing ValuesClause joins AFTER aggregation (18.2.4.4)
    "sparql_values_postagg": """
        SELECT c_mktsegment AS seg, count(*) AS cnt FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1 ORDER BY seg""",
    # post-aggregation VALUES with an UNDEF wildcard: (UNDEF, 'w') matches
    # every group, ('BUILDING', 'b') only its own
    "sparql_values_postagg_undef": """
        SELECT seg, cnt, tag FROM (
          SELECT c_mktsegment AS seg, count(*) AS cnt FROM customer GROUP BY 1
        ) g JOIN (VALUES ('BUILDING', 'b'), (NULL, 'w')) v(vseg, tag)
          ON v.vseg IS NULL OR v.vseg = g.seg
        ORDER BY seg, tag""",
    # STRDT typed-literal constructor, DATATYPE extraction, BNODE skolem
    "sparql_strdt": """
        SELECT 'region:' || r_regionkey AS r,
               '"' || r_name || '"^^http://www.w3.org/2001/XMLSchema#token' AS t,
               'http://www.w3.org/2001/XMLSchema#token' AS dt,
               '_:b' || substring(md5(r_name), 1, 16) AS b
        FROM region ORDER BY r""",
    # property path inside FILTER EXISTS
    "sparql_exists_path": """
        SELECT 'customer:' || c_custkey AS c FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' ORDER BY c""",
    # nested OPTIONAL; the inner-scope filter nulls only the inner binding
    "sparql_nested_optional": """
        SELECT 'supplier:' || s_suppkey AS s, 'nation:' || s_nationkey AS n,
               CASE WHEN n_regionkey <> 0 THEN 'region:' || n_regionkey END AS r
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ORDER BY s, n, r NULLS FIRST""",
    # GROUP_CONCAT with a custom separator (inputs sorted, the engine's
    # documented determinism convention)
    "sparql_groupconcat_sep": """
        SELECT 'region:' || n_regionkey AS r,
               string_agg(n_name, '|' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY r""",
    # property path inside MINUS
    "sparql_minus_path": """
        SELECT 'customer:' || c_custkey AS c FROM customer
        WHERE c_nationkey NOT IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        ORDER BY c""",
    # UNION inside FILTER EXISTS
    "sparql_exists_union": """
        SELECT 'nation:' || n_nationkey AS n FROM nation
        WHERE n_name IN ('NATION_2', 'NATION_5') ORDER BY n""",
}

os.makedirs(out, exist_ok=True)
for name, sql in QUERIES.items():
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    path = os.path.join(out, f"{name}.tsv")
    with open(path, "w") as f:
        if not rows:
            f.write("NO ANSWERS.\n")
        else:
            f.write("\t".join(cols) + "\n")
            for r in rows:
                f.write("\t".join("" if v is None else str(v) for v in r) + "\n")
    print(f"wrote {path}: {len(rows)} rows")
