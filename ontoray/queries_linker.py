"""DuckDB mirror of the entity-linking family (J1-J5, A3-A6, C1-C2).

Promotes kg_entities / kg_entity_decisions / kg_nodes / kg_edges /
kg_degree_topk / kg_summary from rows-only to hash-checked: the WHOLE linker
decision engine — the reference's hybrid matcher + decision table
(reference src/ontology_extension_manager.py:225-421) as re-expressed in
ontoray/linking.py — is evaluated in ANSI SQL over the same corpus CTEs the
(already hash-green) kg_triples_norm mirror uses.

Every match method is mirrored exactly:

* embedding cosine (J1) — the exact-arithmetic contract from
  ontoray/text/embed.py: md5-int60 gram hash, signed int bucket counts,
  ``CAST(dot AS DOUBLE) / sqrt(CAST(n_c * n_m AS DOUBLE))`` — bit-equal to
  the numpy expression.
* lexical exact + surface aliases (J2) — normalized-name equality via the
  generated singularizer SQL (ontoray/text/normalize.py:sql_norm_expr).
* lexical fuzzy (J2) — ``difflib.SequenceMatcher.ratio`` computed EXACTLY by
  a recursive CTE: maximal common substrings per diagonal ("runs"), then the
  get_matching_blocks region recursion with difflib's tie-break
  (longest, then lowest a-start, then lowest b-start); ratio =
  2.0*M/(la+lb) in the identical float64 expression.  Property-verified
  against difflib on 1.8k randomized/adversarial pairs in
  tests/test_linker_mirror.py.
* technical specs (J3) — frequency-range overlap and impedance tolerance
  (ontoray/text/specs.py) with the concept-side constants pre-parsed by the
  same Python parser that the engine broadcasts.
* decision table + task routing (A3/A4) — the threshold CASE expressions.
* node/edge materialize (A6) — MERGE-by-name semantics, resolution-map
  winner per normalized surface, relation sanitizer, float32 confidence
  upcast parity, (src, rel, dst) rollup.
* curation (C1/C2) — reachability from 'ElectronicComponent' (recursive
  CTE bounded at max_depth=12), orphan removal, post-orphan degree <= 1
  pruning — graph_cleaner semantics (reference src/curation/graph_cleaner.py).

All constants (23-class hierarchy, surface aliases, technical specs) come
from ontoray/aliases.py at SQL-generation time — code constants, not data.
"""

from __future__ import annotations

from ontoray.aliases import build_alias_data
from ontoray.queries import _sql_triples_norm_ctes
from ontoray.text.extract import TOKEN_PATTERN
from ontoray.text.normalize import sql_norm_expr
from ontoray.text.specs import _first_number, extract_freq_range


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _concept_rows() -> list[dict]:
    """Concept constants exactly as the broadcast AliasData holds them:
    (i, name, name_norm, freq_lo, freq_hi, imp) with the technical specs
    pre-parsed by the same Python parsers the engine's matchers call."""
    alias = build_alias_data()
    rows = []
    for i, name in enumerate(alias.names):
        tech = alias.tech[i]
        fr = extract_freq_range(tech["frequency"]) if tech.get("frequency") else None
        imp = _first_number(tech["impedance"]) if tech.get("impedance") else None
        rows.append({
            "i": i, "name": name, "nnorm": alias.name_norms[i],
            "freq_lo": fr[0] if fr else None, "freq_hi": fr[1] if fr else None,
            "imp": imp,
        })
    return rows


def _surface_rows() -> list[tuple[str, str]]:
    """(alias_norm, canonical_name) pairs for which the surface-alias branch
    fires (find_matches: surface_map hit whose canonical norm differs)."""
    alias = build_alias_data()
    out = []
    for an, idx in alias.surface_map.items():
        if alias.name_norms[idx] != an:
            out.append((an, alias.names[idx]))
    return sorted(out)


def _baseline_rows() -> list[tuple[str, str | None]]:
    """(name, parent) for the baseline node/edge tables (parent NULL = root)."""
    alias = build_alias_data()
    return [(n, alias.parent[n]) for n in alias.parent]


def _values(rows: list[str]) -> str:
    return ", ".join(rows)


# The exact float64-expressible SequenceMatcher.ratio sub-chain, per distinct
# (a=mention_norm, b=concept_norm) pair in lk_fpair.  See module docstring.
# NOTE: lk_runs must NOT be MATERIALIZED — DuckDB returns wrong results for
# a correlated subquery that reads a materialized CTE from inside a
# recursive CTE (verified empirically; tests/test_linker_mirror.py guards).
_RATIO_CTES = """
lk_ai AS (SELECT a, b, lb, unnest(generate_series(1, la)) AS i FROM lk_fpair),
lk_cells AS (
  SELECT a, b, i, j FROM (
    SELECT a, b, i, unnest(generate_series(1, lb)) AS j FROM lk_ai)
  WHERE substr(a, i, 1) = substr(b, j, 1)
),
lk_runs AS (
  SELECT a, b, min(i) AS gi, min(j) AS gj, count(*) AS gk
  FROM (SELECT a, b, i, j,
               i - row_number() OVER (PARTITION BY a, b, (j - i) ORDER BY i) AS grp
        FROM lk_cells)
  GROUP BY a, b, (j - i), grp
),
lk_blocks AS (
  SELECT a, b, CAST(1 AS BIGINT) AS alo, CAST(la + 1 AS BIGINT) AS ahi,
         CAST(1 AS BIGINT) AS blo, CAST(lb + 1 AS BIGINT) AS bhi
  FROM lk_fpair
  UNION ALL
  SELECT a, b,
    CASE WHEN side = 0 THEN alo ELSE best.i + best.k END AS alo,
    CASE WHEN side = 0 THEN best.i ELSE ahi END AS ahi,
    CASE WHEN side = 0 THEN blo ELSE best.j + best.k END AS blo,
    CASE WHEN side = 0 THEN best.j ELSE bhi END AS bhi
  FROM (
    SELECT r.a, r.b, r.alo, r.ahi, r.blo, r.bhi,
      (SELECT struct_pack(
          i := u.gi + greatest(r.alo - u.gi, r.blo - u.gj, 0),
          j := u.gj + greatest(r.alo - u.gi, r.blo - u.gj, 0),
          k := least(r.ahi - u.gi, r.bhi - u.gj, u.gk)
               - greatest(r.alo - u.gi, r.blo - u.gj, 0))
       FROM lk_runs u
       WHERE u.a = r.a AND u.b = r.b
         AND least(r.ahi - u.gi, r.bhi - u.gj, u.gk)
             - greatest(r.alo - u.gi, r.blo - u.gj, 0) > 0
       ORDER BY least(r.ahi - u.gi, r.bhi - u.gj, u.gk)
                - greatest(r.alo - u.gi, r.blo - u.gj, 0) DESC,
                u.gi + greatest(r.alo - u.gi, r.blo - u.gj, 0) ASC,
                u.gj + greatest(r.alo - u.gi, r.blo - u.gj, 0) ASC
       LIMIT 1) AS best
    FROM lk_blocks r) t
  CROSS JOIN (VALUES (0), (1)) sides(side)
  WHERE best IS NOT NULL AND
    CASE WHEN side = 0 THEN best.i > alo AND best.j > blo
         ELSE best.i + best.k < ahi AND best.j + best.k < bhi END
),
lk_mb AS (
  SELECT t.a, t.b, coalesce(
    (SELECT least(t.ahi - u.gi, t.bhi - u.gj, u.gk)
            - greatest(t.alo - u.gi, t.blo - u.gj, 0)
     FROM lk_runs u
     WHERE u.a = t.a AND u.b = t.b
       AND least(t.ahi - u.gi, t.bhi - u.gj, u.gk)
           - greatest(t.alo - u.gi, t.blo - u.gj, 0) > 0
     ORDER BY least(t.ahi - u.gi, t.bhi - u.gj, u.gk)
              - greatest(t.alo - u.gi, t.blo - u.gj, 0) DESC,
              u.gi + greatest(t.alo - u.gi, t.blo - u.gj, 0) ASC,
              u.gj + greatest(t.alo - u.gi, t.blo - u.gj, 0) ASC
     LIMIT 1), 0) AS k
  FROM lk_blocks t
),
lk_msum AS (SELECT a, b, sum(k) AS m FROM lk_mb GROUP BY a, b),
lk_ratio AS MATERIALIZED (
  SELECT f.a, f.b, f.ci,
         2.0 * coalesce(s.m, 0) / (f.la + f.lb) AS ratio
  FROM lk_fpair f LEFT JOIN lk_msum s ON s.a = f.a AND s.b = f.b
)"""


def sql_linker_const_ctes() -> str:
    """The constant VALUES tables (23-class concepts + parsed specs, surface
    aliases, baseline hierarchy) shared by the corpus chain and the
    synthetic-mention parity tests."""
    concept_vals = _values([
        f"({r['i']}, {_sql_quote(r['name'])}, {_sql_quote(r['nnorm'])}, "
        f"{('CAST(%r AS DOUBLE)' % r['freq_lo']) if r['freq_lo'] is not None else 'CAST(NULL AS DOUBLE)'}, "
        f"{('CAST(%r AS DOUBLE)' % r['freq_hi']) if r['freq_hi'] is not None else 'CAST(NULL AS DOUBLE)'}, "
        f"{('CAST(%r AS DOUBLE)' % r['imp']) if r['imp'] is not None else 'CAST(NULL AS DOUBLE)'})"
        for r in _concept_rows()])
    surface_vals = _values(
        [f"({_sql_quote(an)}, {_sql_quote(cn)})" for an, cn in _surface_rows()]
    ) or "('', '')"
    base_vals = _values([
        f"({_sql_quote(n)}, {_sql_quote(p) if p else 'CAST(NULL AS VARCHAR)'})"
        for n, p in _baseline_rows()])
    return f"""lk_concepts(i, name, nnorm, freq_lo, freq_hi, imp) AS (VALUES {concept_vals}),
lk_surface(an, cname) AS (VALUES {surface_vals}),
lk_base(bname, bparent) AS (VALUES {base_vals})"""


def sql_linker_decision_ctes(dim: int = 64) -> str:
    """Decision + graph + curation chain: lk_mnorm → lk_entities →
    lk_nodes_cur / lk_edges_cur.  Consumes ``lk_ment`` (mention, n_mentions)
    and ``lk_filt`` (subj, pred, obj, conf per triple occurrence) plus the
    constant tables — callers provide those (the corpus chain in
    sql_linker_ctes, synthetic fixtures in tests/test_linker_mirror.py)."""
    nn = sql_norm_expr("mention")
    return f"""lk_mnorm AS MATERIALIZED (SELECT mention, n_mentions, {nn} AS nn FROM lk_ment),
-- signed md5-int60 3-gram count vectors (ontoray/text/embed.py contract)
lk_mgram AS (
  SELECT mention, CAST(('0x' || substr(md5(substr(t, g, 3)), 1, 15)) AS BIGINT) AS h
  FROM (SELECT mention, t, unnest(generate_series(1, length(t) - 2)) AS g
        FROM (SELECT mention, ' ' || lower(mention) || ' ' AS t FROM lk_ment))
),
lk_mvec AS MATERIALIZED (
  SELECT mention, h % {dim} AS idx,
         SUM(CASE WHEN (h >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM lk_mgram GROUP BY mention, h % {dim}
),
lk_msq AS (SELECT mention, CAST(SUM(v * v) AS BIGINT) AS n_m FROM lk_mvec GROUP BY mention),
lk_cgram AS (
  SELECT i, CAST(('0x' || substr(md5(substr(t, g, 3)), 1, 15)) AS BIGINT) AS h
  FROM (SELECT i, t, unnest(generate_series(1, length(t) - 2)) AS g
        FROM (SELECT i, ' ' || lower(name) || ' ' AS t FROM lk_concepts))
),
lk_cvec AS MATERIALIZED (
  SELECT i, h % {dim} AS idx,
         SUM(CASE WHEN (h >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM lk_cgram GROUP BY i, h % {dim}
),
lk_csq AS (SELECT i, CAST(SUM(v * v) AS BIGINT) AS n_c FROM lk_cvec GROUP BY i),
lk_dot AS (
  SELECT m.mention, c.i, CAST(SUM(m.v * c.v) AS BIGINT) AS dot
  FROM lk_mvec m JOIN lk_cvec c ON c.idx = m.idx
  GROUP BY m.mention, c.i
),
lk_emb AS (
  SELECT d.mention, d.i,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(c.n_c * m.n_m AS DOUBLE)) AS sim
  FROM lk_dot d
  JOIN lk_csq c ON c.i = d.i AND c.n_c > 0
  JOIN lk_msq m ON m.mention = d.mention AND m.n_m > 0
),
-- fuzzy candidate pairs: length-ratio prefilter (the char-multiset bound is
-- a pure prune — every pair it rejects has ratio < 0.8 and is re-rejected by
-- the exact ratio filter below)
lk_fpair AS (
  SELECT DISTINCT m.nn AS a, c.nnorm AS b, c.i AS ci,
         length(m.nn) AS la, length(c.nnorm) AS lb
  FROM (SELECT DISTINCT nn FROM lk_mnorm) m, lk_concepts c
  WHERE m.nn <> c.nnorm AND length(m.nn) > 0
    AND 2.0 * least(length(m.nn), length(c.nnorm))
        / (length(m.nn) + length(c.nnorm)) >= CAST(0.8 AS DOUBLE)
),{_RATIO_CTES},
-- technical-spec properties: min-obj per (surface, pred) over pattern triples
lk_props AS (
  SELECT subj, pred, min(obj) AS value FROM lk_filt
  WHERE pred IN ('frequency', 'impedance', 'voltage')
  GROUP BY subj, pred
),
lk_mprop AS (
  SELECT m.mention,
         max(CASE WHEN p.pred = 'frequency' THEN p.value END) AS freq,
         max(CASE WHEN p.pred = 'impedance' THEN p.value END) AS imp
  FROM lk_ment m JOIN lk_props p ON p.subj = m.mention
  GROUP BY m.mention
),
lk_fnum AS (
  SELECT mention, imp,
    CASE WHEN contains(fs, 'ghz') THEN CAST(1000.0 AS DOUBLE)
         WHEN contains(fs, 'mhz') THEN CAST(1.0 AS DOUBLE) END AS mult,
    list_filter(regexp_extract_all(fs, '[0-9.]+'), x -> trim(x, '.') <> '') AS nums
  FROM (SELECT mention, imp, replace(lower(freq), ' ', '') AS fs FROM lk_mprop
        WHERE freq IS NOT NULL)
  UNION ALL
  SELECT mention, imp, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR[])
  FROM lk_mprop WHERE freq IS NULL
),
lk_frange AS (
  SELECT mention, vals,
    CASE WHEN ok THEN CASE WHEN len(vals) = 1 THEN vals[1] ELSE list_min(vals) END END AS flo,
    CASE WHEN ok THEN CASE WHEN len(vals) = 1 THEN vals[1] ELSE list_max(vals) END END AS fhi,
    CASE WHEN imp IS NOT NULL THEN
      TRY_CAST(list_filter(regexp_extract_all(lower(imp), '[0-9.]+'),
                           x -> trim(x, '.') <> '')[1] AS DOUBLE) END AS impv
  FROM (
    SELECT mention, imp,
      list_transform(nums, x -> TRY_CAST(x AS DOUBLE) * mult) AS vals,
      (mult IS NOT NULL AND len(nums) > 0
       AND list_aggregate(list_transform(nums, x -> TRY_CAST(x AS DOUBLE)), 'count')
           = len(nums)) AS ok
    FROM lk_fnum)
),
lk_tech0 AS (
  SELECT f.mention, c.i,
    CASE WHEN c.freq_lo IS NOT NULL AND f.flo IS NOT NULL THEN
      CASE WHEN greatest(f.flo, c.freq_lo) <= least(f.fhi, c.freq_hi) THEN
        CASE WHEN (greatest(f.fhi, c.freq_hi) - least(f.flo, c.freq_lo)) > 0
             THEN (least(f.fhi, c.freq_hi) - greatest(f.flo, c.freq_lo))
                  / (greatest(f.fhi, c.freq_hi) - least(f.flo, c.freq_lo))
             ELSE CAST(1.0 AS DOUBLE) END
        ELSE CAST(0.0 AS DOUBLE) END
      ELSE CAST(0.0 AS DOUBLE) END AS sf,
    CASE WHEN c.imp IS NOT NULL AND f.impv IS NOT NULL THEN
      CASE WHEN f.impv = c.imp THEN CAST(1.0 AS DOUBLE)
           WHEN abs(f.impv - c.imp) / greatest(f.impv, c.imp) <= CAST(0.1 AS DOUBLE)
           THEN CAST(0.9 AS DOUBLE)
           ELSE CAST(0.0 AS DOUBLE) END
      ELSE CAST(0.0 AS DOUBLE) END AS si
  FROM lk_frange f
  JOIN lk_concepts c ON c.freq_lo IS NOT NULL OR c.imp IS NOT NULL
),
lk_tech AS (
  SELECT mention, i, total / details AS avg FROM (
    SELECT mention, i,
      (CASE WHEN sf > CAST(0.7 AS DOUBLE) THEN sf ELSE CAST(0.0 AS DOUBLE) END
       + CASE WHEN si > CAST(0.7 AS DOUBLE) THEN si ELSE CAST(0.0 AS DOUBLE) END) AS total,
      (CASE WHEN sf > CAST(0.7 AS DOUBLE) THEN 1 ELSE 0 END
       + CASE WHEN si > CAST(0.7 AS DOUBLE) THEN 1 ELSE 0 END) AS details
    FROM lk_tech0)
  WHERE total >= CAST(1.5 AS DOUBLE)
),
-- the match list in find_matches append order: seq = method*1e6 + concept i
lk_cand AS (
  SELECT mention, i, sim AS score, sim AS conf, CAST(i AS BIGINT) AS seq
  FROM lk_emb WHERE sim >= CAST(0.5 AS DOUBLE)
  UNION ALL
  SELECT m.mention, c.i, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
         CAST(1000000 + c.i AS BIGINT)
  FROM lk_mnorm m JOIN lk_concepts c ON c.nnorm = m.nn
  UNION ALL
  SELECT m.mention, r.ci, r.ratio, r.ratio, CAST(2000000 + r.ci AS BIGINT)
  FROM lk_mnorm m JOIN lk_ratio r ON r.a = m.nn
  WHERE r.ratio >= CAST(0.8 AS DOUBLE)
  UNION ALL
  SELECT m.mention, c.i, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
         CAST(3000000 AS BIGINT)
  FROM lk_mnorm m JOIN lk_surface s ON s.an = m.nn
  JOIN lk_concepts c ON c.name = s.cname
  UNION ALL
  SELECT t.mention, t.i, t.avg, t.avg, CAST(4000000 + t.i AS BIGINT)
  FROM lk_tech t
),
-- per-concept best (max score, first-seen on ties) + dict insertion rank
lk_perc AS (
  SELECT mention, i, score, conf, fseq FROM (
    SELECT mention, i, score, conf,
           row_number() OVER (PARTITION BY mention, i
                              ORDER BY score DESC, seq ASC) AS rn,
           min(seq) OVER (PARTITION BY mention, i) AS fseq
    FROM lk_cand)
  WHERE rn = 1
),
lk_top AS (
  SELECT mention, cname, score, conf FROM (
    SELECT p.mention, c.name AS cname, p.score, p.conf,
           row_number() OVER (PARTITION BY p.mention
                              ORDER BY p.score DESC, p.fseq ASC) AS rn
    FROM lk_perc p JOIN lk_concepts c ON c.i = p.i)
  WHERE rn = 1
),
-- decision table (linking.decide with enable_rule_validation=False) + routing
lk_entities AS MATERIALIZED (
  SELECT m.mention AS name, m.nn AS name_norm,
    CASE WHEN t.mention IS NULL THEN 'extend_ontology'
         WHEN t.score >= CAST(0.999 AS DOUBLE) THEN 'map_to_existing_exact'
         WHEN t.score >= CAST(0.70 AS DOUBLE) THEN 'requires_manual_review'
         ELSE 'extend_ontology' END AS decision,
    CASE WHEN t.mention IS NOT NULL AND t.score >= CAST(0.70 AS DOUBLE)
         THEN t.cname END AS target,
    CASE WHEN t.mention IS NULL THEN CAST(0.9 AS DOUBLE)
         WHEN t.score >= CAST(0.999 AS DOUBLE) THEN t.conf
         WHEN t.score >= CAST(0.70 AS DOUBLE) THEN CAST(0.5 AS DOUBLE)
         ELSE CAST(0.8 AS DOUBLE) END AS confidence,
    coalesce(t.score, CAST(0.0 AS DOUBLE)) AS best_score,
    CAST(m.n_mentions AS BIGINT) AS n_mentions,
    CASE WHEN t.mention IS NULL THEN 'ElectronicComponent'
         WHEN t.score >= CAST(0.999 AS DOUBLE) THEN NULL
         ELSE t.cname END AS parent_class,
    CASE WHEN t.mention IS NULL THEN 'new'
         WHEN t.score >= CAST(0.999 AS DOUBLE) THEN NULL
         WHEN t.score >= CAST(0.70 AS DOUBLE) THEN 'review'
         ELSE 'new' END AS status
  FROM lk_mnorm m LEFT JOIN lk_top t ON t.mention = m.mention
),
-- node table (graph.build_nodes): learned EXTEND/UNCERTAIN rows (baseline
-- name collisions dropped) + baseline rows
lk_nodes_all AS MATERIALIZED (
  SELECT name, CAST('learned_from_dataset' AS VARCHAR) AS source, status,
         parent_class, n_mentions, confidence
  FROM lk_entities
  WHERE decision IN ('extend_ontology', 'requires_manual_review')
    AND name NOT IN (SELECT bname FROM lk_base)
  UNION ALL
  SELECT bname, 'Baseline', '', bparent, CAST(0 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM lk_base
),
-- resolution winner per normalized surface (graph.resolution_map): mapped
-- targets first, then n_mentions desc, then lexicographic resolved
lk_res AS MATERIALIZED (
  SELECT surface, resolved FROM (
    SELECT name_norm AS surface,
      CASE WHEN decision IN ('map_to_existing_exact', 'map_to_existing_similar')
                AND target IS NOT NULL THEN target ELSE name END AS resolved,
      row_number() OVER (PARTITION BY name_norm ORDER BY
        CASE WHEN decision IN ('map_to_existing_exact', 'map_to_existing_similar')
                  AND target IS NOT NULL THEN 0 ELSE 1 END ASC,
        n_mentions DESC,
        CASE WHEN decision IN ('map_to_existing_exact', 'map_to_existing_similar')
                  AND target IS NOT NULL THEN target ELSE name END ASC) AS rn
    FROM lk_entities)
  WHERE rn = 1
),
-- triple rollup with the ENGINE's float32 confidence (CAST AS REAL matches
-- the extractor's float32 column; the union upcast to DOUBLE is below)
lk_tdd AS MATERIALIZED (
  SELECT {sql_norm_expr('subj')} AS subj_norm, lower(pred) AS pred_norm,
         {sql_norm_expr('obj')} AS obj_norm,
         max(CAST(conf AS REAL)) AS conf32, count(*) AS n
  FROM lk_filt GROUP BY 1, 2, 3
),
lk_alledges AS (
  SELECT name AS src, 'SUBCLASS_OF' AS rel, parent_class AS dst,
         1 AS tax, confidence AS conf, CAST(1 AS BIGINT) AS n
  FROM lk_entities
  WHERE decision IN ('extend_ontology', 'requires_manual_review')
    AND parent_class IS NOT NULL
  UNION ALL
  SELECT bname, 'SUBCLASS_OF', bparent, 1,
         CAST(CAST(1.0 AS REAL) AS DOUBLE), CAST(1 AS BIGINT)
  FROM lk_base WHERE bparent IS NOT NULL
  UNION ALL
  SELECT coalesce(r1.resolved, t.subj_norm),
         upper(regexp_replace(t.pred_norm, '[^a-zA-Z0-9_]', '_', 'g')),
         coalesce(r2.resolved, t.obj_norm),
         0, CAST(t.conf32 AS DOUBLE), CAST(t.n AS BIGINT)
  FROM lk_tdd t
  LEFT JOIN lk_res r1 ON r1.surface = t.subj_norm
  LEFT JOIN lk_res r2 ON r2.surface = t.obj_norm
  WHERE t.pred_norm <> 'subclass_of'
),
lk_edges0 AS MATERIALIZED (
  SELECT src, rel, dst, CAST(max(tax) AS BOOLEAN) AS taxonomic,
         max(conf) AS confidence, CAST(sum(n) AS BIGINT) AS n_obs
  FROM lk_alledges GROUP BY src, rel, dst
),
-- C1 reachability: SUBCLASS_OF* paths to 'ElectronicComponent', <= 12 levels
lk_reach AS (
  SELECT CAST('ElectronicComponent' AS VARCHAR) AS name, 0 AS d
  UNION
  SELECT e.src, r.d + 1 FROM lk_reach r
  JOIN lk_edges0 e ON e.rel = 'SUBCLASS_OF' AND e.dst = r.name
  WHERE r.d < 12
),
lk_orphans AS MATERIALIZED (
  SELECT name FROM lk_nodes_all
  WHERE source = 'learned_from_dataset'
    AND name NOT IN (SELECT name FROM lk_reach)
),
-- C2: degree over non-orphan edges; learned survivors with degree <= 1 go
lk_deg1 AS MATERIALIZED (
  SELECT name, count(*) AS degree FROM (
    SELECT src AS name FROM lk_edges0
    WHERE src NOT IN (SELECT name FROM lk_orphans)
      AND dst NOT IN (SELECT name FROM lk_orphans)
    UNION ALL
    SELECT dst FROM lk_edges0
    WHERE src NOT IN (SELECT name FROM lk_orphans)
      AND dst NOT IN (SELECT name FROM lk_orphans))
  GROUP BY name
),
lk_gone AS MATERIALIZED (
  SELECT name FROM lk_orphans
  UNION ALL
  SELECT n.name FROM lk_nodes_all n LEFT JOIN lk_deg1 d ON d.name = n.name
  WHERE n.source = 'learned_from_dataset'
    AND n.name NOT IN (SELECT name FROM lk_orphans)
    AND coalesce(d.degree, 0) <= 1
),
lk_nodes_cur AS (
  SELECT * FROM lk_nodes_all WHERE name NOT IN (SELECT name FROM lk_gone)
),
lk_edges_cur AS (
  SELECT * FROM lk_edges0
  WHERE src NOT IN (SELECT name FROM lk_gone)
    AND dst NOT IN (SELECT name FROM lk_gone)
)"""


def sql_linker_ctes(dim: int = 64) -> str:
    """Full WITH RECURSIVE chain ending in lk_entities / lk_nodes_cur /
    lk_edges_cur — shared by the six linker-family mirrors.  Builds on the
    (hash-green) kg_triples_norm corpus chain: pages → cleaned(en) → chunks →
    filt (per-occurrence pattern triples)."""
    from ontoray.config import CONCEPT_STOPWORDS
    from ontoray.queries import GAZETTEER

    stopw = ", ".join(_sql_quote(w) for w in sorted(CONCEPT_STOPWORDS))
    phrase_parts = "".join(
        f" UNION SELECT doc_id, chunk_id, {_sql_quote(p)} AS mention "
        f"FROM chunks WHERE contains(chunk_text, {_sql_quote(p)})"
        for p in GAZETTEER)

    return f"""{_sql_triples_norm_ctes()},
{sql_linker_const_ctes()},
lk_mch AS (
  SELECT DISTINCT doc_id, chunk_id, tok AS mention FROM (
    SELECT doc_id, chunk_id,
           unnest(regexp_extract_all(chunk_text, '{TOKEN_PATTERN}')) AS tok
    FROM chunks)
  WHERE tok NOT IN ({stopw}){phrase_parts}
),
lk_ment AS MATERIALIZED (SELECT mention, count(*) AS n_mentions FROM lk_mch GROUP BY mention),
lk_filt AS MATERIALIZED (SELECT subj, pred, obj, conf FROM filt),
{sql_linker_decision_ctes(dim)}"""


SQL_KG_ENTITIES = (f"{sql_linker_ctes()} "
                   "SELECT name, name_norm, decision, target, confidence, "
                   "best_score, n_mentions, parent_class, status FROM lk_entities")

SQL_KG_ENTITY_DECISIONS = (f"{sql_linker_ctes()} "
                           "SELECT decision, count(*) AS n FROM lk_entities "
                           "GROUP BY decision")

SQL_KG_NODES = (f"{sql_linker_ctes()} "
                "SELECT name, source, status, parent_class, n_mentions, "
                "confidence FROM lk_nodes_cur")

SQL_KG_EDGES = (f"{sql_linker_ctes()} "
                "SELECT src, rel, dst, taxonomic, confidence, n_obs "
                "FROM lk_edges_cur")

SQL_KG_DEGREE_TOPK = (f"{sql_linker_ctes()} "
                      "SELECT name, degree FROM ("
                      "  SELECT name, count(*) AS degree FROM ("
                      "    SELECT src AS name FROM lk_edges_cur"
                      "    UNION ALL SELECT dst FROM lk_edges_cur)"
                      "  GROUP BY name) "
                      "ORDER BY degree DESC, name ASC LIMIT 25")

SQL_KG_REVIEW_QUEUE = (f"{sql_linker_ctes()} "
                       "SELECT name, name_norm, decision, target, confidence, "
                       "best_score, n_mentions, parent_class, status "
                       "FROM lk_entities WHERE status = 'review' "
                       "ORDER BY name LIMIT 200")

SQL_KG_CONFIDENCE_TOPK = (f"{sql_linker_ctes()} "
                          "SELECT name, name_norm, decision, target, confidence, "
                          "best_score, n_mentions, parent_class, status "
                          "FROM lk_entities "
                          "ORDER BY confidence DESC, name ASC LIMIT 25")

# average_confidence: exact int nano-quantized sum (order-independent), one
# float64 division — bit-equal to reporting.run_summary.
SQL_KG_SUMMARY = (f"{sql_linker_ctes()} "
                  "SELECT count(*) AS total_concepts_extracted, "
                  "CAST(sum(CASE WHEN decision IN ('map_to_existing_exact', "
                  "'map_to_existing_similar') THEN 1 ELSE 0 END) AS BIGINT) "
                  "AS concepts_mapped_to_existing, "
                  "CAST(sum(CASE WHEN decision = 'extend_ontology' THEN 1 "
                  "ELSE 0 END) AS BIGINT) AS concepts_extending_ontology, "
                  "CAST(sum(CASE WHEN decision = 'requires_manual_review' "
                  "THEN 1 ELSE 0 END) AS BIGINT) AS concepts_requiring_review, "
                  "CASE WHEN count(*) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
                  "CAST(sum(CAST(floor(confidence * 1e9 + 0.5) AS BIGINT)) "
                  "AS DOUBLE) / CAST(count(*) * 1000000000 AS BIGINT) END "
                  "AS average_confidence, "
                  "CASE WHEN count(*) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
                  "CAST(sum(CASE WHEN decision IN ('map_to_existing_exact', "
                  "'map_to_existing_similar', 'extend_ontology') THEN 1 ELSE 0 "
                  "END) AS DOUBLE) / count(*) * 100 END AS automation_rate "
                  "FROM lk_entities")


def _sql_jsonld_ctes() -> str:
    """JSON-LD export mirror (S4/M13): the exporter's fallback object is a
    fixed-shape dict over [a-z0-9 -] vocabulary (no JSON escaping can occur),
    so ``json.dumps(obj, sort_keys=True)`` is an exact string concatenation
    in sorted-key order: @context, @type, additionalType, category,
    description, name[, reviewStatus][, subClassOf].  additionalType uses
    the 14-entry productontology map in ITS dict order (first match wins,
    export.py PRODUCT_ONTOLOGY_MAP); category is the keyword heuristic
    (export.py infer_category); file is the sanitize_filename chain."""
    from ontoray.stages.export import PRODUCT_ONTOLOGY_MAP

    atype = "CASE " + " ".join(
        f"WHEN contains(lname, {_sql_quote(k)}) THEN "
        f"'http://www.productontology.org/id/{w}'"
        for k, w in PRODUCT_ONTOLOGY_MAP.items()
    ) + " ELSE 'http://www.productontology.org/id/' || replace(name, ' ', '_') END"
    cat = ("CASE WHEN contains(lname, 'capacitor') OR contains(lname, 'resistor')"
           " OR contains(lname, 'inductor') THEN 'Passive Components'"
           " WHEN contains(lname, 'transistor') OR contains(lname, 'diode')"
           " OR contains(lname, 'ic') OR contains(lname, 'amplifier')"
           " OR contains(lname, 'circuit') THEN 'Active Components'"
           " WHEN contains(lname, 'connector') OR contains(lname, 'cable')"
           " OR contains(lname, 'socket') THEN 'Interconnects'"
           " ELSE 'General Electronics' END")
    fname = ("substr(trim(regexp_replace(regexp_replace(name,"
             " '[<>:\"/\\\\|?*\\x00-\\x1f]', '_', 'g'), '_+', '_', 'g'),"
             " '_'), 1, 80) || '.jsonld'")
    return f"""
lk_jldf AS (
  SELECT name, lower(name) AS lname, parent_class, status
  FROM lk_entities
  WHERE decision IN ('extend_ontology', 'requires_manual_review')
),
lk_jld AS (
  SELECT name, {fname} AS file,
    '{{"@context": "https://schema.org", "@type": "Product", "additionalType": "'
    || ({atype})
    || '", "category": "' || ({cat})
    || '", "description": "' || substr('Electronic component: ' || name, 1, 200)
    || '", "name": "' || name || '"'
    || CASE WHEN status = 'review' THEN ', "reviewStatus": "NeedsReview"' ELSE '' END
    || CASE WHEN parent_class IS NOT NULL AND parent_class <> ''
            THEN ', "subClassOf": "' || parent_class || '"' ELSE '' END
    || '}}' AS jsonld
  FROM lk_jldf
)"""


SQL_KG_JSONLD_EXPORT = (f"{sql_linker_ctes()},{_sql_jsonld_ctes()} "
                        "SELECT name, file, jsonld FROM lk_jld")

# Validation mirror (schema_org_validator semantics over the SAME fields the
# export constructs): required @context/@type/name -> an error only when the
# name is empty.  The exporter writes @context "https://schema.org" while the
# validator whitelist requires the trailing slash ("https://schema.org/") —
# faithfully ported from the reference pair, so EVERY object carries exactly
# one @context warning (additionalType is a valid URI and no field is empty).
# The Product recommended set (description, category, manufacturer) always
# misses manufacturer -> exactly one recommendation.
SQL_KG_JSONLD_VALIDATION = (
    f"{sql_linker_ctes()},{_sql_jsonld_ctes()} "
    "SELECT name, "
    "CAST(name IS NOT NULL AND name <> '' AS BOOLEAN) AS valid, "
    "CAST(CASE WHEN name IS NULL OR name = '' THEN 1 ELSE 0 END AS BIGINT) AS n_errors, "
    "CAST(1 AS BIGINT) AS n_warnings, "
    "CAST(1 AS BIGINT) AS n_recommendations "
    "FROM lk_jld")
