"""Driver-contract queries: one entry per operator, each as (a) a Ray Data
pipeline over the sf_dir parquet tables and (b) where expressible, an ANSI-SQL
mirror for the DuckDB oracle.  Column names/types match exactly between the
two (the driver hash-compares values after sorting columns by name).

Both sides share the same RE2-compatible pattern tables
(ontoray.text.extract.TRIPLE_PATTERNS) and the same deterministic pages
derivation (ontoray.pages), which is what makes the extraction pipeline
SQL-checkable end to end.
"""

from __future__ import annotations

import pyarrow as pa

from ontoray.aliases import SURFACE_ALIASES
from ontoray.config import CONCEPT_STOPWORDS
from ontoray.pages import pages_from_documents, sql_pages_cte
from ontoray.text.clean import clean_many, sql_clean_expr
from ontoray.text.extract import (ENDPOINT_STOP, TOKEN_PATTERN, TRIPLE_PATTERNS,
                                  extract_mentions, extract_triples)

GAZETTEER = tuple(sorted(a for a, _ in SURFACE_ALIASES if " " in a))

_CLEANED_CTE = (f"WITH pages AS ({sql_pages_cte()}), "
                f"cleaned AS (SELECT doc_id, {sql_clean_expr('text')} AS ct FROM pages)")


def _clean_docs_ds(sf_dir: str):
    def clean(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "doc_text": pa.array(clean_many(batch.column("text").to_pylist()), pa.string()),
        })
    return pages_from_documents(sf_dir).map_batches(clean, batch_format="pyarrow")


# --- kg_clean_docs ----------------------------------------------------------

def q_kg_clean_docs(sf_dir: str):
    return _clean_docs_ds(sf_dir)


SQL_KG_CLEAN_DOCS = (f"WITH pages AS ({sql_pages_cte()}) "
                     f"SELECT doc_id, {sql_clean_expr('text')} AS doc_text FROM pages")


# --- kg_mentions / kg_mention_counts ---------------------------------------

def q_kg_mentions(sf_dir: str):
    def extract(batch: pa.Table) -> pa.Table:
        ids, ments = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("doc_text").to_pylist()):
            for m in extract_mentions(text, GAZETTEER):
                ids.append(did)
                ments.append(m)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "mention": pa.array(ments, pa.string())})
    return _clean_docs_ds(sf_dir).map_batches(extract, batch_format="pyarrow")


def _sql_mentions_body() -> str:
    stopw = ", ".join(f"'{w}'" for w in sorted(CONCEPT_STOPWORDS))
    uni = (f"SELECT DISTINCT doc_id, tok AS mention FROM "
           f"(SELECT doc_id, unnest(regexp_extract_all(ct, '{TOKEN_PATTERN}')) AS tok FROM cleaned) "
           f"WHERE tok NOT IN ({stopw})")
    phrase_parts = [
        f"SELECT doc_id, '{p}' AS mention FROM cleaned WHERE contains(ct, '{p}')"
        for p in GAZETTEER
    ]
    return " UNION ".join([uni] + phrase_parts)


SQL_KG_MENTIONS = f"{_CLEANED_CTE} {_sql_mentions_body()}"


def q_kg_cooccurrence(sf_dir: str):
    """Concept co-occurrence counts (SURVEY M17): per-doc DISTINCT mention
    pairs emitted batch-locally (each doc's pair fan-out is bounded by its
    own mention-set size, k·(k-1)/2 — no mention rows ever shuffle), then the
    two-phase bucketed count.  At crawl scale a per-doc mention cap bounds
    the quadratic fan-out for pathological pages."""
    from itertools import combinations

    from ontoray.stages.agg import hash_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        m1, m2 = [], []
        for text in batch.column("doc_text").to_pylist():
            ms = sorted(set(extract_mentions(text, GAZETTEER)))
            for x, y in combinations(ms, 2):
                m1.append(x)
                m2.append(y)
        return pa.table({"m1": pa.array(m1, pa.string()),
                         "m2": pa.array(m2, pa.string())})

    ds = _clean_docs_ds(sf_dir).map_batches(pairs, batch_format="pyarrow")
    return hash_aggregate(ds, ["m1", "m2"],
                          partial_aggs=[("m1", "count")],
                          aggs=[("m1_count", "sum")],
                          rename={"m1_count_sum": "n_docs"})


SQL_KG_COOCCURRENCE = (
    f"{_CLEANED_CTE}, m AS ({_sql_mentions_body()}) "
    f"SELECT a.mention AS m1, b.mention AS m2, count(*) AS n_docs "
    f"FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.mention < b.mention "
    f"GROUP BY 1, 2")


def q_kg_mention_counts(sf_dir: str):
    from ontoray.stages.agg import hash_aggregate
    return hash_aggregate(
        q_kg_mentions(sf_dir).select_columns(["mention"]), ["mention"],
        partial_aggs=[("mention", "count")],
        aggs=[("mention_count", "sum")], rename={"mention_count_sum": "n_docs"})


SQL_KG_MENTION_COUNTS = (f"{_CLEANED_CTE}, m AS ({_sql_mentions_body()}) "
                         f"SELECT mention, count(*) AS n_docs FROM m GROUP BY mention")


# --- kg_triples (raw distinct pattern triples) ------------------------------

def q_kg_triples(sf_dir: str):
    def extract(batch: pa.Table) -> pa.Table:
        subs, preds, objs = [], [], []
        for text in batch.column("doc_text").to_pylist():
            for s, p, o, _tag, _conf in extract_triples(text):
                subs.append(s)
                preds.append(p)
                objs.append(o)
        return pa.table({"subj": pa.array(subs, pa.string()),
                         "pred": pa.array(preds, pa.string()),
                         "obj": pa.array(objs, pa.string())})

    ds = _clean_docs_ds(sf_dir).map_batches(extract, batch_format="pyarrow")
    # Distinct via bucketed hash aggregation (vectorized shuffle dedup).
    from ontoray.stages.agg import hash_aggregate
    return hash_aggregate(ds, ["subj", "pred", "obj"],
                          partial_aggs=[("subj", "count")],
                          aggs=[("subj_count", "sum")], rename={"subj_count_sum": "__n"}
                          ).select_columns(["subj", "pred", "obj"])


def _sql_triples_body() -> str:
    stops = ", ".join(f"'{w}'" for w in sorted(ENDPOINT_STOP))
    parts = []
    for _name, pat, spec, _tag, _conf in TRIPLE_PATTERNS:
        sql_pat = pat.replace("'", "''")
        for sg, pred, og in spec:
            parts.append(
                f"SELECT c.doc_id, s.z[1] AS subj, '{pred}' AS pred, s.z[2] AS obj "
                f"FROM cleaned c, unnest(list_zip("
                f"regexp_extract_all(c.ct, '{sql_pat}', {sg}), "
                f"regexp_extract_all(c.ct, '{sql_pat}', {og}))) AS s(z)")
    union = " UNION ALL ".join(parts)
    return (f"SELECT DISTINCT subj, pred, obj FROM ({union}) "
            f"WHERE subj <> '' AND obj <> '' "
            f"AND subj NOT IN ({stops}) AND obj NOT IN ({stops})")


SQL_KG_TRIPLES = f"{_CLEANED_CTE} {_sql_triples_body()}"


# --- kg_chunks (recursive-CTE mirror of the greedy word-merge chunker) ------

# The chunker (ontoray/text/chunk.py, LangChain RecursiveCharacterTextSplitter
# semantics at chunk_size=1000 / overlap=100) operates on post-clean text,
# which contains no newlines — so it reduces to a greedy word merge with a
# trailing-overlap carry.  That is exactly expressible as a recursive CTE over
# per-word prefix sums: S(i) = sum of len(word_j)+1 for j<=i, join length of
# words a..b = S(b)-S(a-1)-1.  Each chunk k starting after prefix `sa` ends at
# e = max i with S(i) <= sa+1001; the next chunk keeps the longest suffix
# within the overlap budget that still admits the overflowing word:
# sa' = min S(j) >= max(S(e)-101, S(e)+D-1000) with D = len(word e+1), else
# S(e) (empty carry).  ASSUMPTION (documented): no single word reaches
# chunk_size (a >=1000-char word takes the splitter's character-level
# recursion, which this mirror does not model).  Verified exact against
# split_text on randomized + adversarial boundary fixtures in tests.
_CHUNK_CTES = """
docs AS (SELECT doc_id, ct FROM cleaned WHERE ct <> ''),
wordlen AS (
  SELECT doc_id, unnest(generate_series(1, len(string_split(ct, ' ')))) AS i,
         unnest(list_transform(string_split(ct, ' '), w -> length(w))) AS wl
  FROM docs
),
prefix AS (
  SELECT doc_id, i, sum(wl + 1) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS s
  FROM wordlen
),
nwords AS (SELECT doc_id, max(i) AS n FROM prefix GROUP BY doc_id),
rec AS (
  SELECT doc_id, 0 AS chunk_id, CAST(0 AS BIGINT) AS sa FROM nwords
  UNION ALL
  SELECT doc_id, chunk_id + 1, sa2 FROM (
    SELECT r.doc_id, r.chunk_id,
      (SELECT max(p.s) FROM prefix p WHERE p.doc_id = r.doc_id AND p.s <= r.sa + 1001) AS se,
      (SELECT max(p.i) FROM prefix p WHERE p.doc_id = r.doc_id AND p.s <= r.sa + 1001) AS e,
      n.n FROM rec r JOIN nwords n USING (doc_id)
  ) t,
  LATERAL (SELECT CASE WHEN t.e >= t.n THEN NULL
           ELSE (SELECT p.s FROM prefix p WHERE p.doc_id = t.doc_id AND p.i = t.e + 1) - t.se - 1 END AS d) dd,
  LATERAL (SELECT coalesce(
      (SELECT min(p.s) FROM prefix p WHERE p.doc_id = t.doc_id
         AND p.s >= greatest(t.se - 101, t.se + dd.d - 1000) AND p.s < t.se), t.se) AS sa2) nx
  WHERE t.e < t.n
),
chunks AS MATERIALIZED (
  SELECT r.doc_id, r.chunk_id,
    substr(d.ct, CAST(r.sa + 1 AS INTEGER),
           CAST((SELECT max(p.s) FROM prefix p WHERE p.doc_id = r.doc_id AND p.s <= r.sa + 1001) - r.sa - 1 AS INTEGER)) AS chunk_text
  FROM rec r JOIN docs d USING (doc_id)
)"""

def _recursive_cleaned_cte(where: str = "") -> str:
    return (f"WITH RECURSIVE pages AS ({sql_pages_cte()}), "
            f"cleaned AS (SELECT doc_id, {sql_clean_expr('text')} AS ct "
            f"FROM pages{where})")


_RECURSIVE_CLEANED_CTE = _recursive_cleaned_cte()

SQL_KG_CHUNKS = (f"{_RECURSIVE_CLEANED_CTE}, {_CHUNK_CTES} "
                 f"SELECT CAST(doc_id AS VARCHAR) AS url, "
                 f"CAST(chunk_id AS INTEGER) AS chunk_id, chunk_text "
                 f"FROM chunks")


# --- kg_triples_norm (chunk-level extraction + normalizer + rollup) ---------

def _sql_triples_norm_ctes() -> str:
    """The full triples_norm CTE chain, ending in a ``tnorm`` CTE — reused by
    the kg_triples_norm mirror and by graph-analytics mirrors over the same
    triple graph (kg_pagerank)."""
    from ontoray.text.normalize import sql_norm_expr
    stops = ", ".join(f"'{w}'" for w in sorted(ENDPOINT_STOP))
    parts = []
    for _name, pat, spec, _tag, conf in TRIPLE_PATTERNS:
        sql_pat = pat.replace("'", "''")
        for sg, pred, og in spec:
            parts.append(
                f"SELECT s.z[1] AS subj, '{pred}' AS pred, s.z[2] AS obj, "
                f"CAST({conf!r} AS DOUBLE) AS conf "
                f"FROM chunks c, unnest(list_zip("
                f"regexp_extract_all(c.chunk_text, '{sql_pat}', {sg}), "
                f"regexp_extract_all(c.chunk_text, '{sql_pat}', {og}))) AS s(z)")
    union = " UNION ALL ".join(parts)
    # The KG pipeline extracts over the en-filtered, url-deduped corpus; the
    # derived pages here carry no warc_ts (one row per doc_id, urls unique),
    # so only the language filter needs mirroring.
    en_cte = _recursive_cleaned_cte(" WHERE lang = 'en'")
    return (
        f"{en_cte}, {_CHUNK_CTES}, "
        f"raw AS ({union}), "
        f"filt AS (SELECT * FROM raw WHERE subj <> '' AND obj <> '' "
        f"AND subj NOT IN ({stops}) AND obj NOT IN ({stops})), "
        f"tnorm AS (SELECT {sql_norm_expr('subj')} AS subj_norm, "
        f"lower(pred) AS pred_norm, "
        f"{sql_norm_expr('obj')} AS obj_norm, "
        f"round(max(conf), 6) AS conf, count(*) AS n_obs "
        f"FROM filt GROUP BY 1, 2, 3)")


SQL_KG_TRIPLES_NORM = f"{_sql_triples_norm_ctes()} SELECT * FROM tnorm"


# --- kg_pagerank (fixed-point power iteration over the triple graph) --------

def _sql_pagerank_chain(iters: int = 5) -> list:
    """The fixed-point pagerank recurrence as chained CTEs over an
    EXISTING ``trip(src, dst)`` CTE — shared by the concept-graph mirror
    (``sql_kg_pagerank``) and the host-webgraph mirror
    (``sql_web_host_rank``).  Final scores live in CTE ``r{iters}``."""
    scale = 10**12
    ctes = [
        # DISTINCT-over-UNION-ALL, not UNION: inside a WITH RECURSIVE chain
        # DuckDB 1.0 compiles a plain `a UNION b` CTE without the dedup.
        "nodes AS (SELECT DISTINCT name FROM ("
        "SELECT src AS name FROM trip UNION ALL SELECT dst FROM trip))",
        "cnt AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS od FROM trip GROUP BY src)",
        f"r0 AS (SELECT name, (SELECT {scale} // n FROM cnt) AS r FROM nodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS (SELECT nd.name, "
            f"(SELECT (15 * {scale}) // (100 * n) FROM cnt) "
            f"+ CAST((85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes nd LEFT JOIN ("
            f"  SELECT t.dst AS name, sum(p.r // d.od) AS c "
            f"  FROM trip t JOIN r{k-1} p ON t.src = p.name "
            f"  JOIN deg d ON d.src = t.src GROUP BY t.dst) s "
            f"ON nd.name = s.name)")
    return ctes


def sql_kg_pagerank(iters: int = 5) -> str:
    """DuckDB mirror of stages.analytics.pagerank over the kg_triples_norm
    graph: the identical integer recurrence unrolled as ``iters`` chained
    CTEs — BIGINT floor division everywhere, so both engines land on the
    same int64 fixed-point scores regardless of summation order."""
    ctes = ["trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst "
            "FROM tnorm)"] + _sql_pagerank_chain(iters)
    return (f"{_sql_triples_norm_ctes()}, " + ", ".join(ctes) +
            f" SELECT name, CAST(r AS BIGINT) AS rank FROM r{iters}")


def q_kg_pagerank_from(triples_dedup_ds, iters: int = 5):
    from ontoray.stages.analytics import pagerank
    return pagerank(triples_dedup_ds, iters=iters,
                    src_col="subj_norm", dst_col="obj_norm")


# --- kg graph analytics: components + triangles ------------------------------

def q_kg_components_from(triples_dedup_ds):
    """Undirected connected components of the extracted concept graph
    (duplicate-entity cluster discovery / topic islands): (name, component)
    with component = member-minimum concept name.  Engine plan in
    stages/analytics.connected_components; the mirror computes min-reachable
    via a recursive CTE over the same distinct-edge set."""
    from ontoray.stages.analytics import connected_components, distinct_edges
    ep = distinct_edges(triples_dedup_ds, "subj_norm", "obj_norm")
    return connected_components(ep)


SQL_KG_COMPONENTS = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm), "
    "und AS (SELECT src AS a, dst AS b FROM trip WHERE src <> dst "
    "UNION SELECT dst, src FROM trip WHERE src <> dst), "
    "nodes AS (SELECT DISTINCT name FROM ("
    "SELECT src AS name FROM trip UNION ALL SELECT dst FROM trip)), "
    "reach AS (SELECT name AS v, name AS w FROM nodes "
    "UNION SELECT r.v, u.b FROM reach r JOIN und u ON u.a = r.w) "
    "SELECT v AS name, min(w) AS component FROM reach GROUP BY v")


def q_kg_taxonomy_depth_from(triples_dedup_ds):
    """Per-node depth in the extracted subclass taxonomy (min-parent
    forest, roots at depth 0) — join-BFS levels in the engine vs a bounded
    recursive CTE in the mirror; cycle members excluded on both sides.
    Plan in stages/analytics.taxonomy_depth."""
    from ontoray.stages.analytics import taxonomy_depth
    return taxonomy_depth(triples_dedup_ds)


SQL_KG_TAXONOMY_DEPTH = (
    f"{_sql_triples_norm_ctes()}, "
    "forest AS (SELECT subj_norm AS child, min(obj_norm) AS parent "
    "FROM tnorm WHERE pred_norm = 'subclass_of' GROUP BY 1), "
    "taxroots AS (SELECT DISTINCT parent AS name FROM forest "
    "WHERE parent NOT IN (SELECT child FROM forest)), "
    "walk AS (SELECT name, CAST(0 AS BIGINT) AS depth FROM taxroots "
    "UNION ALL SELECT f.child, w.depth + 1 FROM walk w "
    "JOIN forest f ON f.parent = w.name WHERE w.depth < 30) "
    "SELECT name, depth FROM walk")


def q_kg_triangles_from(triples_dedup_ds):
    """Triangle census of the undirected concept graph — the clustering-
    coefficient signal the reference leaves as a TODO (reference
    src/evaluation/graph.py:88): (n_nodes, n_edges_und, n_wedges,
    n_triangles) over und-incident nodes; global clustering coefficient =
    3*tri/wedges at the consumer.  Adjacency-forward counting with a
    vocabulary-bounded broadcast (stages/analytics.triangle_census)."""
    from ontoray.stages.analytics import triangle_census

    def pairs(batch):
        return pa.table({"src": batch.column("subj_norm"),
                         "dst": batch.column("obj_norm")})

    return triangle_census(
        triples_dedup_ds.map_batches(pairs, batch_format="pyarrow"))


SQL_KG_TRIANGLES = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm), "
    "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
    "FROM trip WHERE src <> dst), "
    "unodes AS (SELECT DISTINCT x FROM ("
    "SELECT a AS x FROM und UNION ALL SELECT b FROM und)), "
    "tri AS (SELECT count(*) AS n FROM und e1 "
    "JOIN und e2 ON e2.a = e1.b "
    "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b), "
    "deg AS (SELECT x, count(*) AS d FROM ("
    "SELECT a AS x FROM und UNION ALL SELECT b FROM und) GROUP BY x) "
    "SELECT (SELECT count(*) FROM unodes) AS n_nodes, "
    "(SELECT count(*) FROM und) AS n_edges_und, "
    "(SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges, "
    "(SELECT n FROM tri) AS n_triangles")


def q_kg_clustering_from(triples_dedup_ds):
    """Per-node local clustering coefficient of the undirected concept
    graph — (name, degree, n_tri, lcc_micro) with exact integer
    lcc_micro = 2·t·10^6 // (d·(d-1)); plan in
    stages/analytics.clustering_coeff (adjacency-forward broadcast)."""
    from ontoray.stages.analytics import clustering_coeff
    return clustering_coeff(triples_dedup_ds, "subj_norm", "obj_norm")


SQL_KG_CLUSTERING = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm), "
    "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
    "FROM trip WHERE src <> dst), "
    "tris AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c FROM und e1 "
    "JOIN und e2 ON e2.a = e1.b "
    "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b), "
    "pernode AS (SELECT x, count(*) AS t FROM ("
    "SELECT a AS x FROM tris UNION ALL SELECT b FROM tris "
    "UNION ALL SELECT c FROM tris) GROUP BY x), "
    "udeg AS (SELECT x, count(*) AS d FROM ("
    "SELECT a AS x FROM und UNION ALL SELECT b FROM und) GROUP BY x) "
    "SELECT udeg.x AS name, udeg.d AS degree, "
    "CAST(coalesce(p.t, 0) AS BIGINT) AS n_tri, "
    "CAST(CASE WHEN udeg.d >= 2 THEN (2 * coalesce(p.t, 0) * 1000000) "
    "// (udeg.d * (udeg.d - 1)) ELSE 0 END AS BIGINT) AS lcc_micro "
    "FROM udeg LEFT JOIN pernode p ON p.x = udeg.x")


def q_kg_kcore_from(triples_dedup_ds, k: int = 2):
    """k-core of the undirected concept graph (iterative peel to fixpoint,
    convergence-guarded) — (name, core_degree); plan in
    stages/analytics.kcore."""
    from ontoray.stages.analytics import kcore
    return kcore(triples_dedup_ds, k=k,
                 src_col="subj_norm", dst_col="obj_norm")


def sql_kg_kcore(k: int = 2, rounds: int = 12) -> str:
    """DuckDB mirror of stages.analytics.kcore: the peel recurrence
    unrolled ``rounds`` times (the engine raises if not converged within
    the same bound, so bounded unrolling cannot diverge)."""
    # Every u{r} is read three times per round (directly + twice through
    # kd{r}); without MATERIALIZED DuckDB inlines the chain into a 3^rounds
    # plan blowup.
    ctes = [
        "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm)",
        "u0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM trip WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"kd{r} AS MATERIALIZED (SELECT x, count(*) AS d FROM ("
            f"SELECT a AS x FROM u{r-1} UNION ALL SELECT b FROM u{r-1}) "
            f"GROUP BY x)")
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT e.a, e.b FROM u{r-1} e "
            f"JOIN kd{r} da ON da.x = e.a JOIN kd{r} db ON db.x = e.b "
            f"WHERE da.d >= {k} AND db.d >= {k})")
    return (f"{_sql_triples_norm_ctes()}, " + ", ".join(ctes) +
            f" SELECT x AS name, count(*) AS core_degree FROM ("
            f"SELECT a AS x FROM u{rounds} UNION ALL SELECT b FROM u{rounds}) "
            f"GROUP BY x")


def q_kg_transreduce_from(triples_dedup_ds):
    """Taxonomy transitive-reduction flags: every subclass edge with
    ``redundant`` = a 2-hop witness path exists; plan in
    stages/analytics.transitive_reduction."""
    from ontoray.stages.analytics import transitive_reduction
    return transitive_reduction(triples_dedup_ds)


SQL_KG_TRANSREDUCE = (
    f"{_sql_triples_norm_ctes()}, "
    "tax AS (SELECT DISTINCT subj_norm AS child, obj_norm AS parent "
    "FROM tnorm WHERE pred_norm = 'subclass_of' AND subj_norm <> obj_norm), "
    "two AS (SELECT DISTINCT e1.child AS child, e2.parent AS parent "
    "FROM tax e1 JOIN tax e2 ON e2.child = e1.parent) "
    "SELECT t.child, t.parent, (tw.child IS NOT NULL) AS redundant "
    "FROM tax t LEFT JOIN two tw "
    "ON tw.child = t.child AND tw.parent = t.parent")


def q_web_host_rank(sf_dir: str):
    """Host-level web-graph PageRank — the crawl-frontier authority signal
    (Common-Crawl host-webgraph shape): distinct host→host link edges from
    the RAW derived pages (extras/weblinks.host_edges), ranked by the same
    exact fixed-point pagerank as the concept graph."""
    import pyarrow as pa  # noqa: F811 — local to keep wrapper self-contained

    from ontoray.extras.weblinks import host_edges
    from ontoray.pages import pages_from_documents
    from ontoray.stages.analytics import pagerank
    ranks = pagerank(host_edges(pages_from_documents(sf_dir)))
    return pa.table({"host": ranks.column("name"),
                     "rank": ranks.column("rank")})


def sql_web_host_rank() -> str:
    from ontoray.extras.weblinks import sql_host_edges
    from ontoray.pages import sql_pages_cte
    ctes = [sql_host_edges(sql_pages_cte())] + _sql_pagerank_chain()
    return ("WITH " + ", ".join(ctes) +
            " SELECT name AS host, CAST(r AS BIGINT) AS rank FROM r5")


# --- n-gram LM counts --------------------------------------------------------

def q_lm_bigrams(sf_dir: str):
    """Corpus bigram LM table with exact conditional probabilities
    (extras/textstats.bigram_counts): Counter combiner -> two-phase count ->
    prefix totals from the bigram table itself -> partitioned join."""
    import ray.data as rd

    from ontoray.extras.textstats import bigram_counts
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bigram_counts(ds, min_count=3)


def sql_lm_bigrams() -> str:
    from ontoray.extras.textstats import sql_bigram_counts
    return sql_bigram_counts(min_count=3)


# --- top principal direction (power iteration) -------------------------------

def q_embed_pca1(sf_dir: str):
    """Projection of every embedding onto the corpus's dominant principal
    direction — fixed-point power iteration (3 rounds, max-abs integer
    normalization), hash-checked against the unrolled-CTE mirror.  Plan in
    extras/pca.pca1_power."""
    import ray.data as rd

    from ontoray.extras.pca import pca1_power
    return pca1_power(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                      columns=["vec_id", "embedding"]))


def sql_embed_pca1() -> str:
    from ontoray.extras.pca import sql_embed_pca1 as _s
    return _s()


# --- embedding outlier scan ---------------------------------------------------

def q_embed_outliers(sf_dir: str):
    """Top-25 embedding outliers by exact integer distance to their final
    k-means centroid — the pre-training garbage-vector scan.  Plan in
    extras/kmeans.kmeans_outliers (one extra broadcast-centroid pass +
    local-top-k merge on top of kmeans_fixed)."""
    import ray.data as rd

    from ontoray.extras.kmeans import kmeans_outliers
    return kmeans_outliers(rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]))


def sql_embed_outliers() -> str:
    from ontoray.extras.kmeans import sql_kmeans_outliers
    return sql_kmeans_outliers()


# --- k-means over the embeddings table ---------------------------------------

def q_embed_kmeans(sf_dir: str):
    """Distributed Lloyd k-means in exact int64 fixed-point
    (extras/kmeans.py): 3 assignment rounds over broadcast centroids, each
    update ONE k x dim-bounded exchange — hash-checked against the unrolled
    SQL recurrence despite being an iterative ML algorithm."""
    import ray.data as rd

    from ontoray.extras.kmeans import kmeans_fixed
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kmeans_fixed(ds, k=8, iters=3)


# --- sketches: HLL distinct tokens, count-min heavy hitters ------------------

_TOK_SQL = ("SELECT source, unnest(regexp_extract_all(coalesce(text, ''), "
            "'[a-z0-9]+')) AS tok FROM documents")


def _token_rows_ds(sf_dir: str):
    import ray.data as rd

    from ontoray.extras.textstats import TOKEN_RE

    def toks(batch: pa.Table) -> pa.Table:
        src_out, tok_out = [], []
        for s, t in zip(batch.column("source").to_pylist(),
                        batch.column("text").to_pylist()):
            for w in TOKEN_RE.findall(t or ""):
                src_out.append(s)
                tok_out.append(w)
        return pa.table({"source": pa.array(src_out, pa.string()),
                         "tok": pa.array(tok_out, pa.string())})

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]).map_batches(
                               toks, batch_format="pyarrow")


def q_hll_tokens_by_source(sf_dir: str):
    """Approximate distinct-token cardinality per source via HyperLogLog —
    the shuffle-free COUNT(DISTINCT) at 100 TB (extras/sketches.py).  The
    register table, harmonic numerator and estimate are all hash-checked
    against the SQL mirror (identical md5 hash + integer register algebra)."""
    from ontoray.extras.sketches import hll_estimate
    return hll_estimate(_token_rows_ds(sf_dir), "tok", group_col="source")


def sql_hll_tokens_by_source() -> str:
    from ontoray.extras.sketches import sql_hll_estimate
    return sql_hll_estimate(_TOK_SQL, "tok", group_col="source")


def q_cms_heavy_tokens(sf_dir: str, threshold: int = 200):
    """Heavy-hitter tokens by count-min sketch: build pass (d x w counter
    sums, associative) + probe pass (distinct candidates vs the ray.put
    sketch), keeping estimates >= threshold.  No exact corpus-scale count
    anywhere; estimates are exact-mirrored in SQL."""
    from ontoray.extras.sketches import cms_heavy_hitters
    from ontoray.stages.agg import hash_aggregate

    tok = _token_rows_ds(sf_dir).select_columns(["tok"])
    cand = hash_aggregate(tok, ["tok"], partial_aggs=[("tok", "count")],
                          aggs=[("tok_count", "sum")],
                          rename={"tok_count_sum": "__n"}
                          ).select_columns(["tok"])
    return cms_heavy_hitters(tok, cand, "tok", "tok", threshold)


def sql_cms_heavy_tokens(threshold: int = 200) -> str:
    from ontoray.extras.sketches import sql_cms_heavy
    return sql_cms_heavy(_TOK_SQL, "tok", threshold)


# --- text stats / token counts / lang counts -------------------------------

def q_doc_stats(sf_dir: str):
    import ray.data as rd
    from ontoray.extras.textstats import doc_stats_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(doc_stats_batch, batch_format="pyarrow")


def q_token_counts_by_source(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ontoray.extras.textstats import TOKEN_RE

    def per_row(batch: pa.Table) -> pa.Table:
        counts = [len(TOKEN_RE.findall(t)) for t in batch.column("text").to_pylist()]
        return pa.table({"source": batch.column("source"),
                         "n": pa.array(counts, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return (ds.map_batches(per_row, batch_format="pyarrow")
            .groupby("source").aggregate(Sum("n", alias_name="total_tokens")))


SQL_TOKEN_COUNTS = ("SELECT source, CAST(sum(length(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) "
                    "AS total_tokens FROM documents GROUP BY source")


def q_lang_counts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


SQL_LANG_COUNTS = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"


# --- url canonicalization ----------------------------------------------------

def q_url_canonical(sf_dir: str):
    """Crawl-side URL canonicalization (fragment / tracking-param / default-
    port / case / www normalization).  The synthetic corpus' urls are already
    clean, so the query DECORATES them deterministically (md5-salted utm
    params, fragments, fbclid, uppercased scheme+host, injected www.) before
    canonicalizing — the SQL mirror reproduces both the decoration and the
    cleanup, which makes the hash check exercise every rule on real rows."""
    import hashlib

    import ray.data as rd

    from ontoray.text.urlnorm import canonicalize_url_column

    def decorate(batch: pa.Table) -> pa.Table:
        out = []
        for d, s in zip(batch.column("doc_id").to_pylist(),
                        batch.column("source").to_pylist()):
            u = f"https://{s}.example.org/doc-{d}"
            if d % 5 == 0:
                u = "HTTPS://WWW." + u[8:]
            m = d % 4
            if m == 0:
                u += "?utm_source=x&utm_campaign=" + hashlib.md5(str(d).encode()).hexdigest()
            elif m == 1:
                u += "#frag"
            elif m == 2:
                u += f"?id={d}&fbclid=abc"
            out.append(u)
        arr = pa.array(out, pa.string())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": arr,
                         "canon_url": canonicalize_url_column(arr)})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return ds.map_batches(decorate, batch_format="pyarrow")


def sql_url_canonical() -> str:
    from ontoray.text.urlnorm import sql_canon_expr
    return (
        "WITH u0 AS (SELECT doc_id, 'https://' || source || '.example.org/doc-' "
        "|| doc_id AS b FROM documents), "
        "u1 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
        "THEN 'HTTPS://WWW.' || substr(b, 9) ELSE b END AS b FROM u0), "
        "u2 AS (SELECT doc_id, CASE doc_id % 4 "
        "WHEN 0 THEN b || '?utm_source=x&utm_campaign=' || md5(CAST(doc_id AS VARCHAR)) "
        "WHEN 1 THEN b || '#frag' "
        "WHEN 2 THEN b || '?id=' || doc_id || '&fbclid=abc' "
        "ELSE b END AS url FROM u1) "
        f"SELECT doc_id, url, {sql_canon_expr('url')} AS canon_url FROM u2")


# --- dedup ------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    import ray.data as rd
    from ontoray.extras.dedup import exact_dedup_groups
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_groups(ds)


SQL_DEDUP_EXACT = ("SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_copies "
                   "FROM documents GROUP BY text")


# --- ANN --------------------------------------------------------------------

def _embedding_dim(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(f.iter_batches(batch_size=1))
    return len(first.column("embedding")[0])


def q_ann_topk(sf_dir: str, k: int = 10):
    import ray.data as rd
    from ontoray.extras.ann import brute_force_topk, query_vector
    dim = _embedding_dim(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, query_vector(dim), k=k)


def sql_ann_topk(sf_dir: str, k: int = 10) -> str:
    from ontoray.extras.ann import query_vector
    dim = _embedding_dim(sf_dir)
    q = query_vector(dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in q) + "]"
    return (f"SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            f"CAST({qlit} AS DOUBLE[])), 6) AS cosine "
            f"FROM embeddings ORDER BY cosine DESC, vec_id LIMIT {k}")


def q_ann_topk_multi(sf_dir: str, m: int = 4, k: int = 10):
    """Batched-query exact cosine top-k: ONE broadcast query matrix, one
    matmul per batch scores all m queries (the multi-query serving shape —
    per-query scans would read the corpus m times)."""
    import ray.data as rd
    from ontoray.extras.ann import brute_force_topk_multi, query_matrix
    dim = _embedding_dim(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk_multi(ds, query_matrix(m, dim), k=k)


def sql_ann_topk_multi(sf_dir: str, m: int = 4, k: int = 10) -> str:
    """DuckDB mirror of q_ann_topk_multi: the query matrix as a VALUES
    literal, cross join + per-query row_number window.  Rounding happens
    BEFORE ranking on both sides, so 1e-6 ties resolve identically
    (vec_id tiebreak)."""
    from ontoray.extras.ann import query_matrix
    dim = _embedding_dim(sf_dir)
    qm = query_matrix(m, dim)
    vals = ", ".join(
        "(" + str(j) + ", CAST([" + ", ".join(repr(float(x)) for x in qm[j])
        + "] AS DOUBLE[]))" for j in range(m))
    return f"""
    WITH q(query_id, qv) AS (VALUES {vals}),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
      FROM embeddings e CROSS JOIN q),
    ranked AS (
      SELECT query_id, vec_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
    SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= {k}
    ORDER BY query_id, cosine DESC, vec_id
    """


# --- relational breadth (J7 hash join + A5 agg, A11 top-k) ------------------

def q_orders_by_nation(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count
    from ontoray.stages.joins import hash_join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j1 = hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")
    j2 = hash_join(j1, nation, "c_nationkey", "n_nationkey", how="inner")
    return j2.groupby("n_name").aggregate(Count(alias_name="n_orders"))


SQL_ORDERS_BY_NATION = ("SELECT n_name, count(*) AS n_orders FROM orders "
                        "JOIN customer ON o_custkey = c_custkey "
                        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name")


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing rollup over the LARGEST table — the wide
    two-phase aggregate exercised at its real scale path (per-batch partial
    sums before the bucket shuffle)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def cents(col) -> pa.Array:
        # Exact, order-independent money math: per-row floor(x*100 + 0.5)
        # cents as int64 (float sums are not associative, so a distributed
        # partial-sum vs DuckDB's single-pass sum would differ in the last
        # bits at 1e9 magnitudes; integer cents are exact on both sides).
        return pc.cast(pc.floor(pc.add(pc.multiply(pc.cast(col, pa.float64()),
                                                   pa.scalar(100.0)),
                                       pa.scalar(0.5))), pa.int64())

    def derive(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch.column("l_extendedprice"),
                           pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_c": cents(batch.column("l_quantity")),
            "price_c": cents(batch.column("l_extendedprice")),
            "disc_c": cents(disc),
            "one": pa.array([1] * batch.num_rows, pa.int64()),
        })

    out = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        partial_aggs=[("qty_c", "sum"), ("price_c", "sum"), ("disc_c", "sum"),
                      ("one", "sum")],
        aggs=[("qty_c_sum", "sum"), ("price_c_sum", "sum"), ("disc_c_sum", "sum"),
              ("one_sum", "sum")],
        rename={"qty_c_sum_sum": "qty_c", "price_c_sum_sum": "price_c",
                "disc_c_sum_sum": "disc_c", "one_sum_sum": "count_order"})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pc.divide(pc.cast(batch.column("qty_c"), pa.float64()),
                                 pa.scalar(100.0)),
            "sum_base_price": pc.divide(pc.cast(batch.column("price_c"), pa.float64()),
                                        pa.scalar(100.0)),
            "sum_disc_price": pc.divide(pc.cast(batch.column("disc_c"), pa.float64()),
                                        pa.scalar(100.0)),
            "count_order": batch.column("count_order"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


_CENTS = "CAST(floor({x} * 100 + 0.5) AS BIGINT)"
SQL_LINEITEM_PRICING = (
    "SELECT l_returnflag, l_linestatus, "
    f"sum({_CENTS.format(x='l_quantity')}) / 100.0 AS sum_qty, "
    f"sum({_CENTS.format(x='l_extendedprice')}) / 100.0 AS sum_base_price, "
    f"sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) / 100.0 AS sum_disc_price, "
    "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus")


def q_top_parts_per_brand(sf_dir: str, k: int = 2):
    """Per-group top-k (O2 at group granularity): 2 priciest parts per brand,
    deterministic tie-break on p_partkey."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_brand", "p_partkey", "p_retailprice"])

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True]).head(k)
        return pa.Table.from_pandas(g, preserve_index=False).cast(pa.schema([
            ("p_brand", pa.string()), ("p_partkey", pa.int64()),
            ("p_retailprice", pa.float64())]))

    return ds.groupby("p_brand").map_groups(topk, batch_format="pandas")


SQL_TOP_PARTS_PER_BRAND = (
    "SELECT p_brand, CAST(p_partkey AS BIGINT) AS p_partkey, p_retailprice FROM ("
    "  SELECT p_brand, p_partkey, p_retailprice, row_number() OVER ("
    "PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part"
    ") WHERE rn <= 2")


def q_orders_by_region(sf_dir: str):
    """Broadcast small-side join pattern (no shuffle for the dimension
    tables): region ⋈ nation collapses to a driver map shipped via ray.put;
    only orders ⋈ customer uses the partitioned hash join."""
    import ray
    import ray.data as rd
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    region = rd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"]).take_all()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"]).take_all()
    rmap = {r["r_regionkey"]: r["r_name"] for r in region}
    n2r = {n["n_nationkey"]: rmap[n["n_regionkey"]] for n in nation}
    n2r_ref = ray.put(n2r)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")

    def to_region(batch: pa.Table) -> pa.Table:
        m = ray.get(n2r_ref)
        return pa.table({"r_name": pa.array(
            [m[k] for k in batch.column("c_nationkey").to_pylist()], pa.string())})

    return hash_aggregate(
        j.map_batches(to_region, batch_format="pyarrow"), ["r_name"],
        partial_aggs=[("r_name", "count")],
        aggs=[("r_name_count", "sum")], rename={"r_name_count_sum": "n_orders"})


SQL_ORDERS_BY_REGION = (
    "SELECT r_name, count(*) AS n_orders FROM orders "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name")


def q_topk_parts(sf_dir: str, k: int = 5):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"])
    rows = ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).take(k)
    return pa.table({
        "p_partkey": pa.array([r["p_partkey"] for r in rows], pa.int64()),
        "p_retailprice": pa.array([r["p_retailprice"] for r in rows], pa.float64()),
    })


SQL_TOPK_PARTS = ("SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_retailprice FROM part "
                  "ORDER BY p_retailprice DESC, p_partkey LIMIT 5")


# --- streaming-shaped: tumbling window over events (§2.7 guide shape) ------

def q_events_window(sf_dir: str, window_s: int = 3600):
    import ray.data as rd
    from ontoray.stages.events import tumbling_window
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    out = tumbling_window(ds, window_s)

    def round_val(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(batch.schema.get_field_index("max_value"), "max_value",
                                pc.round(batch.column("max_value"), 6))
    return out.map_batches(round_val, batch_format="pyarrow")


SQL_EVENTS_WINDOW = (
    "SELECT event_type, epoch_us(ts) // CAST(3600000000 AS BIGINT) AS window_id, "
    "count(*) AS n_events, round(max(value), 6) AS max_value "
    "FROM events GROUP BY event_type, epoch_us(ts) // CAST(3600000000 AS BIGINT)")


def q_events_hopping(sf_dir: str, window_s: int = 3600, slide_s: int = 900):
    import ray.data as rd
    from ontoray.stages.events import hopping_window
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    out = hopping_window(ds, window_s, slide_s)

    def round_val(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.set_column(batch.schema.get_field_index("max_value"), "max_value",
                                pc.round(batch.column("max_value"), 6))
    return out.map_batches(round_val, batch_format="pyarrow")


SQL_EVENTS_HOPPING = (
    "SELECT event_type, window_id, count(*) AS n_events, "
    "round(max(value), 6) AS max_value FROM ("
    "  SELECT event_type, value, unnest(generate_series("
    "(epoch_us(ts) - 3600000000) // CAST(900000000 AS BIGINT) + 1, "
    "epoch_us(ts) // CAST(900000000 AS BIGINT))) AS window_id FROM events"
    ") GROUP BY event_type, window_id")


# --- quality filter over doc stats ------------------------------------------

# --- kg_mention_contexts (J6 provenance join mirror) ------------------------

def _sql_mention_contexts_query(limit_docs: int = 200) -> str:
    """Chunk-level mention extraction joined back to chunk text over the
    first ``limit_docs`` docs (documents.parquet is doc_id-ordered, so the
    engine's Dataset.limit equals the ORDER BY doc_id LIMIT here)."""
    stopw = ", ".join(f"'{w}'" for w in sorted(CONCEPT_STOPWORDS))
    lim_cte = _recursive_cleaned_cte(
        f" WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id"
        f" LIMIT {limit_docs})")
    uni = (f"SELECT DISTINCT doc_id, chunk_id, tok AS mention FROM "
           f"(SELECT doc_id, chunk_id, "
           f"unnest(regexp_extract_all(chunk_text, '{TOKEN_PATTERN}')) AS tok "
           f"FROM chunks) WHERE tok NOT IN ({stopw})")
    phrase_parts = [
        f"SELECT doc_id, chunk_id, '{p}' AS mention FROM chunks "
        f"WHERE contains(chunk_text, '{p}')"
        for p in GAZETTEER
    ]
    body = " UNION ".join([uni] + phrase_parts)
    return (f"{lim_cte}, {_CHUNK_CTES}, m AS ({body}) "
            f"SELECT CAST(m.doc_id AS VARCHAR) AS url, "
            f"CAST(m.chunk_id AS INTEGER) AS chunk_id, m.mention, c.chunk_text "
            f"FROM m JOIN chunks c ON m.doc_id = c.doc_id AND m.chunk_id = c.chunk_id")


SQL_KG_MENTION_CONTEXTS = _sql_mention_contexts_query()


# --- kg_saturation (md5-rank shuffle + cumulative-distinct fold mirror) ------

def _sql_saturation_query(batch_size: int = 10, seed: int = 42) -> str:
    """Saturation curve in ANSI SQL: chunks ranked by md5(url:chunk_id:seed)
    (the same pure per-row shuffle the engine uses — Fisher-Yates is not
    SQL-expressible, md5-rank is), scanned in batches of ``batch_size``; a
    mention is 'new' in the batch where its min-ranked chunk lands; the
    cumulative window sum reproduces total_seen."""
    stopw = ", ".join(f"'{w}'" for w in sorted(CONCEPT_STOPWORDS))
    uni = (f"SELECT doc_id, chunk_id, tok AS mention FROM "
           f"(SELECT doc_id, chunk_id, "
           f"unnest(regexp_extract_all(chunk_text, '{TOKEN_PATTERN}')) AS tok "
           f"FROM chunks) WHERE tok NOT IN ({stopw})")
    phrase_parts = [
        f"SELECT doc_id, chunk_id, '{p}' AS mention FROM chunks "
        f"WHERE contains(chunk_text, '{p}')"
        for p in GAZETTEER]
    body = " UNION ALL ".join([uni] + phrase_parts)
    key = f"CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR)"
    return (
        f"{_RECURSIVE_CLEANED_CTE}, {_CHUNK_CTES}, "
        f"m AS ({body}), "
        f"ord AS (SELECT doc_id, chunk_id, "
        f"(row_number() OVER (ORDER BY md5({key} || ':{seed}'), {key}) - 1) "
        f"// {batch_size} AS batch FROM chunks), "
        f"firstb AS (SELECT m.mention, min(o.batch) AS fb FROM m JOIN ord o "
        f"ON m.doc_id = o.doc_id AND m.chunk_id = o.chunk_id GROUP BY m.mention), "
        f"newc AS (SELECT fb AS batch, count(*) AS new_concepts FROM firstb GROUP BY fb), "
        f"batches AS (SELECT DISTINCT batch FROM ord) "
        f"SELECT CAST(b.batch AS BIGINT) AS batch, "
        f"CAST(coalesce(n.new_concepts, 0) AS BIGINT) AS new_concepts, "
        f"CAST(sum(coalesce(n.new_concepts, 0)) OVER "
        f"(ORDER BY b.batch ROWS UNBOUNDED PRECEDING) AS BIGINT) AS total_seen "
        f"FROM batches b LEFT JOIN newc n ON b.batch = n.batch")


SQL_KG_SATURATION = _sql_saturation_query()


# --- session windows (gap-based sessionization mirror) ----------------------

SQL_EVENTS_SESSION = (
    "SELECT user_id, session_id, count(*) AS n_events, "
    "min(ts_us) AS session_start_us, max(ts_us) AS session_end_us FROM ("
    "  SELECT user_id, ts_us, CAST(sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 "
    "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts_us "
    "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id FROM ("
    "    SELECT user_id, epoch_us(ts) AS ts_us, "
    "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events)) "
    "GROUP BY user_id, session_id")


# --- language id (stopword-profile argmax mirror) ----------------------------

def _sql_langid_query() -> str:
    from ontoray.extras.textstats import STOP_PROFILES
    cols = []
    for lang in sorted(STOP_PROFILES):
        stopw = ", ".join(f"'{w}'" for w in sorted(STOP_PROFILES[lang]))
        cols.append(f"length(list_filter(regexp_extract_all(text, '[a-z0-9]+'), "
                    f"w -> w IN ({stopw}))) AS n_{lang}")
    langs = sorted(STOP_PROFILES)
    mx = "greatest(" + ", ".join(f"n_{l}" for l in langs) + ")"
    # Python picks the FIRST language (alphabetical scan, strict >) reaching
    # the max, and 'und' when no profile scores at all.
    pick = " ".join(f"WHEN n_{l} = {mx} THEN '{l}'" for l in langs[:-1])
    return (f"SELECT doc_id, CASE WHEN {mx} = 0 THEN 'und' "
            f"ELSE (CASE {pick} ELSE '{langs[-1]}' END) END AS lang_pred "
            f"FROM (SELECT doc_id, {', '.join(cols)} FROM documents)")


SQL_TEXT_LANGID = _sql_langid_query()


# --- mention sources (salted collect-distinct mirror) ------------------------

SQL_KG_MENTION_SOURCES = (
    f"{_CLEANED_CTE}, m AS ({_sql_mentions_body()}) "
    f"SELECT mention, list(doc ORDER BY doc) AS docs, count(*) AS n_distinct_capped "
    f"FROM ("
    f"  SELECT mention, doc, row_number() OVER (PARTITION BY mention ORDER BY doc) AS rn"
    f"  FROM (SELECT DISTINCT mention, CAST(doc_id AS VARCHAR) AS doc FROM m)"
    f") WHERE rn <= 5 GROUP BY mention")


def q_quality_filter(sf_dir: str, min_tokens: int = 20, max_stop: float = 0.5):
    from ontoray.extras.textstats import doc_stats_batch
    import ray.data as rd

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ok = pc.and_(pc.greater_equal(batch.column("n_tokens"), min_tokens),
                     pc.less_equal(batch.column("stopword_ratio"), max_stop))
        return batch.filter(ok).select(["doc_id", "n_tokens", "stopword_ratio"])

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(doc_stats_batch, batch_format="pyarrow").map_batches(
        keep, batch_format="pyarrow")


def sql_quality_filter(min_tokens: int = 20, max_stop: float = 0.5) -> str:
    from ontoray.extras.textstats import sql_doc_stats
    return (f"SELECT doc_id, n_tokens, stopword_ratio FROM ({sql_doc_stats()}) "
            f"WHERE n_tokens >= {min_tokens} AND stopword_ratio <= {max_stop}")


# --- as-of join over the events log (custom operator: Ray Data lacks one) ---

def q_events_asof(sf_dir: str, left_type: str = "purchase",
                  right_type: str = "click"):
    """Each purchase matched to the user's most recent prior (inclusive)
    click — backward as-of join, the classic event-attribution shape."""
    import ray.data as rd
    from ontoray.stages.events import asof_join
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    left = ds.filter(expr=f"event_type == '{left_type}'")
    right = ds.filter(expr=f"event_type == '{right_type}'")
    return asof_join(left, right, key="user_id")


SQL_EVENTS_ASOF = (
    "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events "
    "WHERE event_type = 'purchase'), "
    "c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events "
    "WHERE event_type = 'click'), "
    "j AS (SELECT p.event_id, p.user_id, p.ts_us, c.event_id AS match_id, "
    "c.ts_us AS match_ts_us, row_number() OVER (PARTITION BY p.event_id "
    "ORDER BY c.ts_us DESC, c.event_id DESC) AS rn "
    "FROM p JOIN c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us) "
    "SELECT event_id, user_id, ts_us, match_id, match_ts_us, "
    "ts_us - match_ts_us AS gap_us FROM j WHERE rn = 1")


# --- grouped exact quantiles (distributed value-histogram reduce) -----------

def q_lineitem_quantiles(sf_dir: str):
    """Exact discrete price quantiles per return flag over the largest fact
    table — rows collapse to a per-flag price histogram before anything
    shuffles (see extras.quantiles for the scale contract)."""
    from fractions import Fraction

    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantiles_disc

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])

    def derive(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "price_c": cents})

    qs = {"p25": Fraction(1, 4), "p50": Fraction(1, 2), "p75": Fraction(3, 4),
          "p90": Fraction(9, 10), "p99": Fraction(99, 100)}
    out = grouped_quantiles_disc(ds.map_batches(derive, batch_format="pyarrow"),
                                 "l_returnflag", "price_c", qs)

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"l_returnflag": batch.column("l_returnflag")}
        for name in sorted(qs):
            cols[name] = pc.divide(pc.cast(batch.column(name), pa.float64()),
                                   pa.scalar(100.0))
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


_QCENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
SQL_LINEITEM_QUANTILES = (
    "SELECT l_returnflag, "
    + ", ".join(f"quantile_disc({_QCENTS}, {q}) / 100.0 AS p{int(q*100)}"
                for q in (0.25, 0.5, 0.75, 0.9, 0.99))
    + " FROM lineitem GROUP BY l_returnflag")


# --- global running total (distributed prefix sum) --------------------------

def q_events_cumsum(sf_dir: str):
    import ray.data as rd

    from ontoray.stages.events import running_total
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "value"])
    return running_total(ds)


SQL_EVENTS_CUMSUM = (
    "SELECT event_id, epoch_us(ts) AS ts_us, "
    "sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER ("
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) / 100.0 AS running_value "
    "FROM events")


# --- broadcast anti-join (blocklist filtering, the webtext staple) ----------

def q_docs_blocklist(sf_dir: str, n_blocked: int = 2):
    """Drop documents whose source is on a blocklist — here the 2 most
    prolific sources, computed as a tiny aggregate and broadcast via
    ``ray.put``: the anti-join costs ZERO shuffle of the corpus (the pattern
    for every url/domain blocklist filter at crawl scale)."""
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    counts = hash_aggregate(
        docs.select_columns(["source"]), ["source"],
        partial_aggs=[("source", "count")],
        aggs=[("source_count", "sum")], rename={"source_count_sum": "n"},
        num_buckets=8).take_all()                      # source-vocabulary-scale
    counts.sort(key=lambda r: (-r["n"], r["source"]))
    blocked_ref = ray.put(frozenset(r["source"] for r in counts[:n_blocked]))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        blocked = ray.get(blocked_ref)
        mask = pc.invert(pc.is_in(batch.column("source"),
                                  value_set=pa.array(sorted(blocked), pa.string())))
        return batch.filter(mask)

    return docs.map_batches(keep, batch_format="pyarrow")


SQL_DOCS_BLOCKLIST = (
    "SELECT doc_id, source FROM documents WHERE source NOT IN ("
    "SELECT source FROM documents GROUP BY source "
    "ORDER BY count(*) DESC, source LIMIT 2)")


# --- IVF ANN (iterative k-means index; rows-only: not SQL-expressible) ------

def q_ann_ivf(sf_dir: str, k: int = 10):
    """Exact-arithmetic IVF ANN (hash-checked): fixed-point k-means index +
    integer cluster-sum probe ranking + nprobe-pruned cosine scan.  The
    float ivf_build/ivf_topk pair stays as the library's general API; this
    query rides the exact variant so the DuckDB oracle computes the
    IDENTICAL probe set and result."""
    import ray.data as rd

    from ontoray.extras.ann import ivf_topk_exact, query_vector
    dim = _embedding_dim(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ivf_topk_exact(ds, query_vector(dim), k=k, nprobe=4,
                          n_clusters=16, iters=3)


def sql_ann_ivf(sf_dir: str, k: int = 10, nprobe: int = 4,
                n_clusters: int = 16, iters: int = 3, seed: int = 42) -> str:
    """DuckDB mirror of q_ann_ivf: the unrolled fixed-point k-means CTEs,
    per-cluster HUGEINT sum vectors, the identical probe cosine
    (CAST(dot AS DOUBLE)/sqrt(CAST(n2*n1 AS DOUBLE))), and the ann_topk
    comparator over the probed subset."""
    import numpy as np

    from ontoray.extras.ann import query_vector
    from ontoray.extras.kmeans import KM_SCALE, sql_kmeans_ctes
    dim = _embedding_dim(sf_dir)
    qv = query_vector(dim)
    qq = [int(x) for x in np.floor(qv * KM_SCALE + 0.5).astype(np.int64)]
    n1 = sum(v * v for v in qq)
    qq_vals = ", ".join(f"({i + 1}, CAST({v} AS HUGEINT))"
                        for i, v in enumerate(qq))
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    ctes, final = sql_kmeans_ctes(n_clusters, iters, seed, "embeddings")
    return f"""
    WITH {", ".join(ctes)},
    qq(pos, v) AS (VALUES {qq_vals}),
    csum AS (SELECT a.cl, t.pos, CAST(sum(CAST(q.qv[t.pos] AS HUGEINT)) AS HUGEINT) AS s
             FROM {final} a JOIN q USING (vec_id),
                  unnest(generate_series(1, len(q.qv))) AS t(pos)
             GROUP BY 1, 2),
    pr AS (SELECT c.cl, sum(c.s * qq.v) AS dot, sum(c.s * c.s) AS n2
           FROM csum c JOIN qq USING (pos) GROUP BY c.cl),
    probes AS (SELECT cl FROM (
        SELECT cl, CASE WHEN n2 > 0 THEN CAST(dot AS DOUBLE)
                                         / sqrt(CAST(n2 * {n1} AS DOUBLE))
                        ELSE -2.0 END AS cos
        FROM pr) ORDER BY cos DESC, cl LIMIT {nprobe})
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST({qlit} AS DOUBLE[])), 6) AS cosine
    FROM embeddings e
    JOIN {final} a ON a.vec_id = e.vec_id
    JOIN probes p ON p.cl = a.cl
    ORDER BY cosine DESC, e.vec_id LIMIT {k}
    """


# --- exact grouped count-distinct (two-round vocabulary shuffle) ------------

def q_events_distinct_users(sf_dir: str):
    import ray.data as rd

    from ontoray.stages.agg import count_distinct
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return count_distinct(ds, ["event_type"], "user_id", out_col="n_users")


SQL_EVENTS_DISTINCT_USERS = (
    "SELECT event_type, count(DISTINCT user_id) AS n_users "
    "FROM events GROUP BY event_type")


# --- broadcast range join (banding against a dimension-scale range table) ---

PRICE_BANDS = [("budget", 0.0, 20_000.0), ("mid", 20_000.0, 60_000.0),
               ("premium", 60_000.0, 1e18)]


def q_lineitem_price_bands(sf_dir: str):
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import broadcast_range_join

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    banded = broadcast_range_join(ds, PRICE_BANDS, "l_extendedprice")

    def one(batch: pa.Table) -> pa.Table:
        return pa.table({"band": batch.column("band"),
                         "one": pa.array([1] * batch.num_rows, pa.int64())})

    return hash_aggregate(banded.map_batches(one, batch_format="pyarrow"),
                          ["band"], partial_aggs=[("one", "sum")],
                          aggs=[("one_sum", "sum")],
                          rename={"one_sum_sum": "n_items"}, num_buckets=4)


SQL_LINEITEM_PRICE_BANDS = (
    "SELECT band, count(*) AS n_items FROM lineitem "
    "JOIN (VALUES " + ", ".join(f"('{n}', {lo!r}, {hi!r})" for n, lo, hi in PRICE_BANDS)
    + ") AS bands(band, lo, hi) "
    "ON l_extendedprice >= lo AND l_extendedprice < hi GROUP BY band")


# --- per-key rolling window sum ---------------------------------------------

def q_events_rolling(sf_dir: str, n: int = 5):
    import ray.data as rd

    from ontoray.stages.events import rolling_window_sum
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    return rolling_window_sum(ds, n=n)


SQL_EVENTS_ROLLING = (
    "SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
    "sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS 4 PRECEDING) / 100.0 AS rolling_sum FROM events")


# --- continuous (interpolated) quantiles -------------------------------------

def q_lineitem_quantiles_cont(sf_dir: str):
    """Exact CONTINUOUS price quantiles per return flag — the interpolated
    (ANSI quantile_cont) variant beside the discrete one; same histogram
    scale contract."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantiles_cont

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])

    def derive(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"l_returnflag": batch.column("l_returnflag"),
                         "price_c": cents})

    qs = {"c50": 0.5, "c90": 0.9, "c99": 0.99}
    out = grouped_quantiles_cont(ds.map_batches(derive, batch_format="pyarrow"),
                                 "l_returnflag", "price_c", qs)

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"l_returnflag": batch.column("l_returnflag")}
        for name in sorted(qs):
            cols[name] = pc.divide(batch.column(name), pa.scalar(100.0))
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def _sql_quantile_cont_col(q: float, name: str) -> str:
    """Explicit ANSI quantile_cont over (v, rk, n) rows — the interpolation
    spelled out so every double op matches the engine verbatim (DuckDB's
    builtin quantile_cont sums in a different order and strays ~1 ulp on
    some inputs, which would break hash comparison)."""
    # CAST the quantile literal: DuckDB parses bare 0.9 as exact DECIMAL,
    # which would compute a different (exact) delta than the engine's double.
    qd = f"CAST({q!r} AS DOUBLE)"
    pos = f"({qd} * (n - 1))"              # per-row inside aggregates
    apos = f"({qd} * (any_value(n) - 1))"  # aggregate context outside them
    lork = f"CAST(floor({pos}) AS BIGINT)"
    delta = f"({apos} - floor({apos}))"
    vlo = f"max(CASE WHEN rk = {lork} THEN v END)"
    vhi = f"max(CASE WHEN rk = LEAST({lork} + 1, n - 1) THEN v END)"
    return (f"(CAST({vlo} AS DOUBLE) * (1.0 - {delta})"
            f" + CAST({vhi} AS DOUBLE) * {delta}) / 100.0 AS {name}")


SQL_LINEITEM_QUANTILES_CONT = (
    "WITH ranked AS ("
    f"  SELECT l_returnflag, {_QCENTS} AS v,"
    "   row_number() OVER (PARTITION BY l_returnflag"
    f"                     ORDER BY {_QCENTS}) - 1 AS rk,"
    "   count(*) OVER (PARTITION BY l_returnflag) AS n"
    "  FROM lineitem) "
    "SELECT l_returnflag, "
    + ", ".join(_sql_quantile_cont_col(q, name)
                for name, q in (("c50", 0.5), ("c90", 0.9), ("c99", 0.99)))
    + " FROM ranked GROUP BY l_returnflag")


# --- distributed set operations (INTERSECT / EXCEPT distinct) ----------------

def q_custs_inactive(sf_dir: str):
    """ANSI EXCEPT at table scale: customers with no order since 2000-01-01
    (the synthetic foreign keys are dense, so the unfiltered except is
    empty/vacuous).  Both sides collapse to per-batch distinct keys before
    ONE vocabulary-scale exchange (stages/setops.py); the date predicate is
    pushed into the parquet read so filtered row groups never leave
    storage."""
    import datetime

    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.setops import except_distinct
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderdate") >= datetime.datetime(2000, 1, 1))
    return except_distinct(cust, recent, "c_custkey", "o_custkey")


SQL_CUSTS_INACTIVE = (
    "SELECT c_custkey FROM customer "
    "EXCEPT SELECT o_custkey FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '2000-01-01'")


def q_nations_with_both(sf_dir: str):
    """ANSI INTERSECT: nation keys present in BOTH customer and supplier."""
    import ray.data as rd

    from ontoray.stages.setops import intersect_distinct
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
    return intersect_distinct(cust, supp, "c_nationkey", "s_nationkey",
                              out_col="nationkey")


SQL_NATIONS_WITH_BOTH = (
    "SELECT c_nationkey AS nationkey FROM customer "
    "INTERSECT SELECT s_nationkey AS nationkey FROM supplier")


# --- benchmark decontamination (n-gram overlap rule) -------------------------

def q_docs_decontaminate(sf_dir: str, n: int = 8):
    """Drop training docs sharing any word 8-gram with the benchmark split
    (doc_id % 13 == 0 simulates the held-out eval suite): benchmark gram
    hashes broadcast once, training corpus filtered in one streaming pass —
    zero shuffle (GPT-3 App. C / Gopher A.3 decontamination shape)."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.dedup import decontaminate

    def split(bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return batch.filter(pa.array(mask, pa.bool_()))
        return f

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    return decontaminate(train, bench, n=n,
                         out_cols=["doc_id", "source"])


# --- grouped z-score normalization -------------------------------------------

def q_events_zscore(sf_dir: str):
    """Per-event-type z-score of event values: exact int64-cents partials
    (float partial sums are not associative across distributed partials),
    group stats broadcast back — corpus streams twice, never shuffles."""
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_zscore
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return grouped_zscore(ds)


# --- Gopher repetition quality signals ----------------------------------------

def q_docs_repetition(sf_dir: str):
    """Per-doc repetition signals (Gopher A.1.1): top-2/3-gram character
    fraction + duplicate-2/5-gram occurrence fraction — embarrassingly
    parallel per-batch pass, no shuffle."""
    import ray.data as rd

    from ontoray.extras.textstats import repetition_stats
    return repetition_stats(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                            columns=["doc_id", "text"]))


# --- corpus-level boilerplate line removal ------------------------------------

import re as _re
_WRAP_TOK = _re.compile(r"[a-z0-9]+")
# The shared preprocessor: wrap tokens into 3-word lines (the synthetic corpus
# has no newlines; real crawls would skip this step).  DuckDB list expression
# computing the identical wrapping:
_SQL_WRAP_LINES = (
    "list_transform(range(1, len(regexp_extract_all(coalesce(text,''), "
    "'[a-z0-9]+'))+1, 3), i -> array_to_string(regexp_extract_all("
    "coalesce(text,''), '[a-z0-9]+')[i:i+2], ' '))")


def q_docs_boilerplate(sf_dir: str, min_docs: int = 5):
    """CCNet/C4-style boilerplate removal: every line occurring in >=
    ``min_docs`` distinct docs is scrubbed from all docs.  The line-hash
    counts cross a two-phase metadata exchange; the repeated set broadcasts
    once; the corpus streams through twice, never shuffles."""
    import ray.data as rd

    from ontoray.extras.dedup import remove_repeated_lines

    def wrap(batch: pa.Table) -> pa.Table:
        ts = []
        for t in batch.column("text").to_pylist():
            ws = _WRAP_TOK.findall(t or "")
            ts.append("\n".join(" ".join(ws[i:i + 3])
                                for i in range(0, len(ws), 3)))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(ts, pa.string())})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return remove_repeated_lines(docs.map_batches(wrap, batch_format="pyarrow"),
                                 min_docs=min_docs)


def sql_docs_boilerplate(min_docs: int = 5) -> str:
    from ontoray.extras.dedup import sql_remove_repeated_lines
    return sql_remove_repeated_lines(min_docs=min_docs,
                                     line_expr=_SQL_WRAP_LINES)


# --- within-group quantile buckets ---------------------------------------------

def q_docs_decile(sf_dir: str):
    """Length decile of each doc within its source group (ntile-by-value:
    deterministic across partitionings, unlike SQL ntile's order-dependent
    tie placement) — cutpoints from the exact distributed grouped quantiles,
    broadcast once; assignment is one searchsorted per batch."""
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantile_buckets
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])
    return grouped_quantile_buckets(ds, "source", "n_chars", "doc_id")


def sql_docs_decile() -> str:
    from ontoray.extras.quantiles import sql_grouped_quantile_buckets
    return sql_grouped_quantile_buckets("documents", "source", "n_chars",
                                        "doc_id")


# --- per-key rank window --------------------------------------------------------

def q_events_rank(sf_dir: str):
    """row_number() over (partition by event_type order by value desc) via
    the (key, value-bucket) composition — no single-group-per-key
    assumption; hot keys split across value ranges."""
    import ray.data as rd

    from ontoray.stages.events import grouped_rank
    return grouped_rank(rd.read_parquet(f"{sf_dir}/events.parquet",
                                        columns=["event_id", "event_type", "value"]))


# --- LM sequence packing --------------------------------------------------------

def q_docs_pack(sf_dir: str):
    """Training-sequence packing: deterministic md5 shuffle order + token
    prefix-sum binning into 512-token sequences — a distributed ordered
    prefix sum over 256 hash-ordered buckets, no global sort."""
    import ray.data as rd

    from ontoray.extras.textstats import pack_sequences
    return pack_sequences(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                          columns=["doc_id", "text"]),
                          seq_len=512)


# --- host-level crawl aggregation ----------------------------------------------

def q_host_stats(sf_dir: str):
    """Domain-level crawl curation stats over the derived pages: docs and
    character mass per host (the aggregation behind per-domain caps and
    blocklists) — host parsed vectorized per batch, two-phase bucketed
    aggregate on the host key."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.pages import pages_from_documents
    from ontoray.stages.agg import hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            batch.column("url"), pattern=r"^https?://([^/]+)/.*$",
            replacement=r"\1")
        return pa.table({
            "host": host.combine_chunks().cast(pa.string()),
            "one": pa.array([1] * batch.num_rows, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
        })

    pages = pages_from_documents(sf_dir)
    return hash_aggregate(
        pages.map_batches(derive, batch_format="pyarrow"), ["host"],
        partial_aggs=[("one", "sum"), ("n_chars", "sum")],
        aggs=[("one_sum", "sum"), ("n_chars_sum", "sum")],
        rename={"one_sum_sum": "n_docs", "n_chars_sum_sum": "total_chars"},
        num_buckets=16)


def sql_host_stats() -> str:
    from ontoray.pages import sql_pages_cte
    return f"""
    WITH pages AS ({sql_pages_cte()})
    SELECT regexp_replace(url, '^https?://([^/]+)/.*$', '\\1') AS host,
           count(*)::BIGINT AS n_docs,
           sum(length(text))::BIGINT AS total_chars
    FROM pages GROUP BY host
    """


# --- ordered per-key sequence build ---------------------------------------------

def q_events_seq(sf_dir: str):
    """Per-user ordered behavior string (group-concat ORDER BY ts) — the
    sequence-building aggregation for session modeling."""
    import ray.data as rd

    from ontoray.stages.events import ordered_group_concat
    return ordered_group_concat(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_id", "ts", "event_type"]))


# --- skew-aware join (hot-key broadcast hybrid) ----------------------------------

def q_orders_by_nation_skew(sf_dir: str):
    """Same rollup as orders_by_nation, planned through the skew-aware
    hybrid join: the hottest custkeys map-side join against a broadcast of
    their customer rows (no shuffle), the cold remainder takes the
    partitioned hash join — the hot-url straggler defuser, exact by
    construction (oracle-verified against the identical SQL)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ontoray.stages.joins import hash_join, skew_join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j1 = skew_join(orders, cust, "o_custkey", "c_custkey", how="inner", hot_k=8)
    j2 = hash_join(j1, nation, "c_nationkey", "n_nationkey", how="inner")
    return j2.groupby("n_name").aggregate(Count(alias_name="n_orders"))


# --- span-level duplicated-text detection ----------------------------------------

def q_docs_dup_spans(sf_dir: str):
    """Per-doc duplicated-span fraction (non-overlapping 8-token tiles,
    cross-document distinct count — the streaming analog of suffix-array
    substring dedup).  Text never shuffles; tile-hash metadata rides two
    two-phase aggregates + one keyed join."""
    import ray.data as rd

    from ontoray.extras.dedup import dup_span_stats
    return dup_span_stats(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                          columns=["doc_id", "text"]))


# --- SemDeDup ---------------------------------------------------------------------

def q_embed_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means clusters, then within-cluster
    cosine >= 0.45 marks lower-id-shadowed duplicates — pairwise work
    bounded by cluster size, exact fixed-point arithmetic end to end."""
    import ray.data as rd

    from ontoray.extras.semdedup import semdedup
    return semdedup(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"]))


# --- per-key lag window -------------------------------------------------------------

def q_events_lag(sf_dir: str):
    """lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) + the
    inter-event delta — one keyed exchange, per-group vectorized shift."""
    import ray.data as rd

    from ontoray.stages.events import grouped_lag
    return grouped_lag(rd.read_parquet(f"{sf_dir}/events.parquet",
                                       columns=["event_id", "user_id", "ts", "value"]))


# --- BM25 retrieval ------------------------------------------------------------------

BM25_TERMS = ["join", "hash", "scan", "column"]


def q_docs_bm25(sf_dir: str):
    """Exact-integer Okapi BM25 top-10 for a fixed query — one stats pass
    (driver sees a handful of ints), one scoring pass with per-batch local
    top-k; corpus text never shuffles."""
    import ray.data as rd

    from ontoray.extras.textstats import bm25_topk
    return bm25_topk(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"]), BM25_TERMS)


def sql_docs_bm25() -> str:
    from ontoray.extras.textstats import sql_bm25_topk
    return sql_bm25_topk(BM25_TERMS)


# --- collocation mining ----------------------------------------------------------------

def q_lm_collocations(sf_dir: str):
    """Top-20 bigram collocations by integer PMI-lift (Church & Hanks with
    the monotone log dropped) — vocabulary-scale two-phase counts + two
    partitioned joins; exact arithmetic end to end."""
    import ray.data as rd

    from ontoray.extras.textstats import collocations_topk
    return collocations_topk(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                             columns=["doc_id", "text"]))


def sql_lm_collocations() -> str:
    from ontoray.extras.textstats import sql_collocations
    return sql_collocations()


# --- grouped Pearson correlation ----------------------------------------------------

def q_lineitem_corr(sf_dir: str):
    """corr(l_quantity, l_discount) per return flag from exact integer
    moment partials — one streaming pass, one vocabulary-scale exchange."""
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_corr
    return grouped_corr(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_returnflag", "l_quantity", "l_discount"]),
        "l_returnflag", "l_quantity", "l_discount")


def sql_lineitem_corr() -> str:
    from ontoray.extras.quantiles import sql_grouped_corr
    return sql_grouped_corr("lineitem", "l_returnflag", "l_quantity", "l_discount")


# --- span-level dedup (removal form) ---------------------------------------------------

def q_docs_scrub_spans(sf_dir: str):
    """Cross-document duplicated-span REMOVAL (the operator form of
    docs_dup_spans): tiles in >=2 distinct docs are dropped everywhere;
    only tile metadata shuffles, text re-tokenizes locally."""
    import ray.data as rd

    from ontoray.extras.dedup import remove_dup_spans
    return remove_dup_spans(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                            columns=["doc_id", "text"]))


def sql_docs_scrub_spans() -> str:
    from ontoray.extras.dedup import sql_remove_dup_spans
    return sql_remove_dup_spans()


# --- Bloom-prefiltered anti-join as a pipeline (deleted-customer filter) ----------------

def q_orders_anti_deleted(sf_dir: str):
    """Removed-set filtering at scale: orders whose customer is NOT in the
    'deleted' set (customers of nations 0-2), planned through the
    Bloom-prefiltered EXACT anti-join — bloom misses bypass the shuffle,
    positives re-check in the partitioned hash join."""
    import ray.data as rd

    from ontoray.stages.joins import bloom_anti_join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    deleted = rd.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"]) \
        .filter(expr="c_nationkey < 3").select_columns(["c_custkey"])
    return bloom_anti_join(orders, deleted, "o_custkey", "c_custkey")


SQL_ORDERS_ANTI_DELETED = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_nationkey < 3)
"""


# --- PII redaction as a driver-checked pipeline ------------------------------------------

def _pii_injected_table_sql() -> str:
    """The documents table with deterministic synthetic PII appended to every
    third doc (the corpus itself is digit-free, so the redactor would be
    vacuous without injection; doc_id-derived strings keep both sides exact)."""
    return ("(SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN "
            "' contact u' || doc_id || '@example.com from 10.0.' || "
            "(doc_id % 256) || '.' || (doc_id % 100) ELSE '' END AS text "
            "FROM documents) pii_src")


def q_docs_pii_redact(sf_dir: str):
    """PII scrub over the corpus with deterministic synthetic PII injected
    into every third doc — chained compiled-regex substitution per batch,
    no shuffle; counts per pattern on the original text."""
    import ray.data as rd

    from ontoray.extras.textstats import redact_pii

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        txts = batch.column("text").to_pylist()
        out = [t + (f" contact u{d}@example.com from 10.0.{d % 256}.{d % 100}"
                    if d % 3 == 0 else "")
               for d, t in zip(ids, txts)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return redact_pii(docs.map_batches(inject, batch_format="pyarrow"))


def sql_docs_pii_redact() -> str:
    from ontoray.extras.textstats import sql_redact_pii
    return sql_redact_pii(table=_pii_injected_table_sql())


# --- ANN sign-LSH bucketed top-k (driver-checked) -----------------------------------------

def q_ann_lsh(sf_dir: str, k: int = 10, probes: int = 3):
    """Sign-LSH bucketed cosine top-k with multi-probe (query bucket + its 2
    least-confident Hamming-1 neighbors) — the sublinear-scan serving path;
    candidates outside the probed buckets never leave the filter."""
    import ray.data as rd

    from ontoray.extras.ann import lsh_topk, query_vector
    dim = _embedding_dim(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return lsh_topk(ds, query_vector(dim), k=k, probes=probes)


def sql_ann_lsh(sf_dir: str, k: int = 10, probes: int = 3) -> str:
    from ontoray.extras.ann import sql_lsh_topk
    return sql_lsh_topk(_embedding_dim(sf_dir), k=k, probes=probes)


# --- full outer join ---------------------------------------------------------------------

def q_custs_orders_outer(sf_dir: str):
    """Full outer join: nation<5 customers x their orders — keeps orderless
    customers (left-only) AND orders of out-of-scope customers (right-only,
    key coalesced into c_custkey per Arrow full-outer semantics)."""
    import ray.data as rd

    from ontoray.stages.joins import hash_join
    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
            .filter(expr="c_nationkey < 5"))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    return hash_join(cust, orders, "c_custkey", "o_custkey", how="full_outer")


SQL_CUSTS_ORDERS_OUTER = """
SELECT coalesce(c.c_custkey, o.o_custkey) AS c_custkey, c.c_nationkey, o.o_orderkey
FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 5) c
FULL OUTER JOIN orders o ON o.o_custkey = c.c_custkey
"""


# --- DSIR importance scoring --------------------------------------------------------------

def q_docs_dsir(sf_dir: str):
    """DSIR-style hashed-bigram importance contrast: target = every 13th doc
    (the decontaminate split convention); fixed 8192-bucket feature space so
    both LMs broadcast as flat arrays — corpus streams twice, never
    shuffles."""
    import ray.data as rd

    from ontoray.extras.textstats import dsir_scores

    def mark(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "is_target", pa.array(ids % 13 == 0, pa.bool_()))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dsir_scores(docs.map_batches(mark, batch_format="pyarrow"))


def sql_docs_dsir() -> str:
    from ontoray.extras.textstats import sql_dsir_scores
    return sql_dsir_scores()


# --- TPC-H Q5-shaped multi-way join (local-supplier revenue by nation) --------

def q_orders_revenue(sf_dir: str):
    """Five-table star join with the Q5 twist (customer and supplier must
    share a nation — a join condition between two DIMENSION paths of the
    fact row): lineitem ⋈ orders ⋈ customer is the big partitioned spine,
    supplier and nation are broadcast lookups (dimension-bounded: suppliers
    are ~1e4 per TPC-H SF, nation is 25 rows — `ray.put` once, `index_in`
    per batch, never re-shipped), and revenue uses the int64-cents contract
    so distributed partial sums match DuckDB's single-pass sum exactly."""
    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]).take_all()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]).take_all()
    s_keys = np.array([r["s_suppkey"] for r in supp], dtype=np.int64)
    s_nat = np.array([r["s_nationkey"] for r in supp], dtype=np.int32)
    n_keys = np.array([r["n_nationkey"] for r in nation], dtype=np.int32)
    n_names = np.array([r["n_name"] for r in nation], dtype=object)
    side_ref = ray.put((s_keys, s_nat, n_keys, n_names))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    oc = hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")
    spine = hash_join(li, oc.select_columns(["o_orderkey", "c_nationkey"]),
                      "l_orderkey", "o_orderkey", how="inner")

    def local_revenue(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sk, sn, nk, nn = ray.get(side_ref)
        idx = pc.index_in(batch.column("l_suppkey"),
                          value_set=pa.array(sk, pa.int64()))
        supp_nat = sn[idx.to_numpy(zero_copy_only=False)]
        cust_nat = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        mask = supp_nat == cust_nat
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        nidx = pc.index_in(pa.array(supp_nat[mask], pa.int32()),
                           value_set=pa.array(nk, pa.int32()))
        names = nn[nidx.to_numpy(zero_copy_only=False)]
        return pa.table({
            "n_name": pa.array(list(names), pa.string()),
            "rev_c": rev_c.filter(pa.array(mask, pa.bool_())),
        })

    out = hash_aggregate(
        spine.map_batches(local_revenue, batch_format="pyarrow"), ["n_name"],
        partial_aggs=[("rev_c", "sum")],
        aggs=[("rev_c_sum", "sum")], rename={"rev_c_sum_sum": "rev_c"})

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "n_name": batch.column("n_name"),
            "revenue": pc.divide(pc.cast(batch.column("rev_c"), pa.float64()),
                                 pa.scalar(100.0)),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_REVENUE = (
    "SELECT n_name, "
    f"sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) / 100.0 "
    "AS revenue FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name")


# --- mixture sampling / vocab build / pivot / dedup-apply wrappers ------------

def q_docs_mixture(sf_dir: str, budget_tokens: int = 1000):
    """Per-source token-budget mixture cut (Pile/LLaMA-style source
    weighting): deterministic md5-ordered prefix of each source, kept while
    the source's running token total < budget."""
    import ray.data as rd
    from ontoray.extras.textstats import mixture_sample
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    return mixture_sample(ds, budget_tokens=budget_tokens)


def sql_docs_mixture(budget_tokens: int = 1000) -> str:
    from ontoray.extras.textstats import sql_mixture_sample
    return sql_mixture_sample(budget_tokens=budget_tokens)


def q_lm_vocab(sf_dir: str, min_count: int = 2):
    """Tokenizer-vocabulary build: frequency-ranked contiguous token ids via
    the log2-band distributed dense rank (no global sort)."""
    import ray.data as rd
    from ontoray.extras.textstats import build_vocab
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return build_vocab(ds, min_count=min_count)


def sql_lm_vocab(min_count: int = 2) -> str:
    from ontoray.extras.textstats import sql_build_vocab
    return sql_build_vocab(min_count=min_count)


def q_events_pivot(sf_dir: str):
    """Long→wide pivot over the fixed event-type vocabulary; counts + exact
    cents purchase total per user in ONE combiner-side exchange."""
    import ray.data as rd
    from ontoray.stages.events import pivot_counts
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])
    return pivot_counts(ds)


def sql_events_pivot() -> str:
    from ontoray.stages.events import sql_pivot_counts
    return sql_pivot_counts()


def q_docs_neardup_keep(sf_dir: str):
    """Fuzzy-dedup APPLY: Jaccard pairs → components → drop losers →
    anti-join; returns the surviving documents."""
    import ray.data as rd
    from ontoray.extras.dedup import neardup_keep
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    return neardup_keep(ds, threshold=0.8)


def sql_docs_neardup_keep() -> str:
    from ontoray.extras.dedup import sql_neardup_keep
    return sql_neardup_keep(threshold=0.8)


def q_docs_postings(sf_dir: str):
    """Inverted-index build: token → (df, capped sorted posting list)."""
    import ray.data as rd
    from ontoray.extras.textstats import build_postings
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    # the synthetic documents vocabulary is small, so the stop-token cap
    # sits high here; at web scale max_df is the lever that bounds lists
    return build_postings(ds, max_df=1000)


def sql_docs_postings() -> str:
    from ontoray.extras.textstats import sql_build_postings
    return sql_build_postings(max_df=1000)


def q_events_funnel(sf_dir: str):
    """Ordered conversion funnel (view -> click -> purchase) via min-time
    chaining; one keyed exchange + a global fold to a single row."""
    import ray.data as rd
    from ontoray.stages.events import funnel_counts
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds)


def sql_events_funnel() -> str:
    from ontoray.stages.events import sql_funnel_counts
    return sql_funnel_counts()


def q_events_retention(sf_dir: str):
    """Cohort retention triangle: distinct active users per
    (first-activity-day cohort, day offset)."""
    import ray.data as rd
    from ontoray.stages.events import retention_cohorts
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return retention_cohorts(ds)


def sql_events_retention() -> str:
    from ontoray.stages.events import sql_retention_cohorts
    return sql_retention_cohorts()


# --- ROLLUP / grouping-sets aggregate -----------------------------------------

def q_orders_rollup(sf_dir: str):
    """OLAP rollup: order count + exact-cents revenue at THREE grouping
    levels — (region, nation), (region), grand total — the GROUP BY ROLLUP
    family.  Rolled-up columns carry the 'ALL' sentinel (COALESCEd
    identically in the mirror, so NULL-representation differences between
    engines can't leak into the hash).

    Scale shape: ONE partitioned fact join (orders ⋈ customer) + broadcast
    dimension maps; level 2 is the only corpus-scale exchange — levels 1/0
    re-aggregate level 2's vocabulary-bounded output (region × nation rows),
    so the rollup costs one shuffle regardless of level count."""
    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name", "n_regionkey"]).take_all()
    region = rd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"]).take_all()
    rmap = {r["r_regionkey"]: r["r_name"] for r in region}
    n_keys = np.array([r["n_nationkey"] for r in nation], dtype=np.int32)
    n_names = np.array([r["n_name"] for r in nation], dtype=object)
    r_names = np.array([rmap[r["n_regionkey"]] for r in nation], dtype=object)
    side_ref = ray.put((n_keys, n_names, r_names))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk, nn, rn = ray.get(side_ref)
        idx = pc.index_in(batch.column("c_nationkey"),
                          value_set=pa.array(nk, pa.int32()))
        pos = idx.to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({
            "r_name": pa.array(list(rn[pos]), pa.string()),
            "n_name": pa.array(list(nn[pos]), pa.string()),
            "price_c": cents,
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    lvl2 = hash_aggregate(
        j.map_batches(derive, batch_format="pyarrow"), ["r_name", "n_name"],
        partial_aggs=[("one", "sum"), ("price_c", "sum")],
        aggs=[("one_sum", "sum"), ("price_c_sum", "sum")],
        rename={"one_sum_sum": "n_orders", "price_c_sum_sum": "price_c"}
    ).materialize()                      # vocabulary-bounded (region × nation)

    lvl1 = hash_aggregate(
        lvl2.select_columns(["r_name", "n_orders", "price_c"]), ["r_name"],
        aggs=[("n_orders", "sum"), ("price_c", "sum")],
        rename={"n_orders_sum": "n_orders", "price_c_sum": "price_c"},
        num_buckets=4)

    def tag_all_nation(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": batch.column("r_name"),
            "n_name": pa.array(["ALL"] * batch.num_rows, pa.string()),
            "n_orders": batch.column("n_orders"),
            "price_c": batch.column("price_c"),
        })

    def tag_grand(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": pa.array(["ALL"] * batch.num_rows, pa.string()),
            "n_name": pa.array(["ALL"] * batch.num_rows, pa.string()),
            "n_orders": batch.column("n_orders"),
            "price_c": batch.column("price_c"),
        })

    lvl1 = lvl1.map_batches(tag_all_nation, batch_format="pyarrow").materialize()

    def add_g(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array([0] * batch.num_rows, pa.int64()))

    lvl0 = hash_aggregate(
        lvl1.select_columns(["n_orders", "price_c"]).map_batches(
            add_g, batch_format="pyarrow"), ["__g"],
        aggs=[("n_orders", "sum"), ("price_c", "sum")],
        rename={"n_orders_sum": "n_orders", "price_c_sum": "price_c"},
        num_buckets=1).map_batches(tag_grand, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "r_name": batch.column("r_name"),
            "n_name": batch.column("n_name"),
            "n_orders": batch.column("n_orders"),
            "total_price": pc.divide(pc.cast(batch.column("price_c"),
                                             pa.float64()), pa.scalar(100.0)),
        })

    return (lvl2.select_columns(["r_name", "n_name", "n_orders", "price_c"])
            .union(lvl1, lvl0).map_batches(finish, batch_format="pyarrow"))


SQL_ORDERS_ROLLUP = (
    "SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name, "
    "count(*) AS n_orders, "
    f"sum({_CENTS.format(x='o_totalprice')}) / 100.0 AS total_price "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY ROLLUP(r_name, n_name)")


def q_docs_winnow(sf_dir: str):
    """MOSS-style winnowing fingerprints per doc (batch-local, shuffle-free)."""
    import ray.data as rd
    from ontoray.extras.textstats import winnow_fingerprints
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return winnow_fingerprints(ds)


def sql_docs_winnow() -> str:
    from ontoray.extras.textstats import sql_winnow_fingerprints
    return sql_winnow_fingerprints()


# --- web anchor-text mining -----------------------------------------------------

def q_web_anchors(sf_dir: str):
    """Anchor-text alias mining over the RAW derived pages (pre-cleaner —
    the cleaner strips markdown): (anchor, target, target_host, n) counts,
    per-batch regex extraction + one vocabulary-bounded exchange."""
    from ontoray.extras.weblinks import extract_anchors
    return extract_anchors(pages_from_documents(sf_dir))


def sql_web_anchors_q() -> str:
    from ontoray.extras.weblinks import sql_web_anchors
    return sql_web_anchors(sql_pages_cte())


# --- CCNet-style quality split --------------------------------------------------

def q_docs_ccnet(sf_dir: str):
    """CCNet head/middle/tail: per-language corpus-LM fluency terciles
    (lm_score_docs + grouped value-tercile buckets)."""
    import ray.data as rd

    from ontoray.extras.textstats import ccnet_buckets
    return ccnet_buckets(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]))


def sql_docs_ccnet() -> str:
    from ontoray.extras.textstats import sql_ccnet_buckets
    return sql_ccnet_buckets()


# --- model-based quality filter -------------------------------------------------

def q_docs_quality_logit(sf_dir: str):
    """Integer-logit quality classifier surrogate (sign of a fixed linear
    logit over stopword/alpha/length/mean-token-length features)."""
    import ray.data as rd

    from ontoray.extras.textstats import quality_logit
    return quality_logit(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def sql_docs_quality_logit() -> str:
    from ontoray.extras.textstats import sql_quality_logit
    return sql_quality_logit()


# --- graph-context node similarity ----------------------------------------------

def q_kg_similar_nodes_from(triples_dedup_ds):
    """Shared-neighbor Jaccard node pairs over the extracted concept graph
    (hub-capped pair expansion; exact integer jaccard)."""
    from ontoray.stages.analytics import similar_nodes
    return similar_nodes(triples_dedup_ds)


SQL_KG_SIMILAR_NODES_CAP = 32
SQL_KG_SIMILAR_NODES_MINJ = 200_000

SQL_KG_SIMILAR_NODES = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm "
    "WHERE subj_norm <> obj_norm), "
    "und AS (SELECT src AS v, dst AS x FROM trip UNION SELECT dst, src FROM trip), "
    "deg AS (SELECT v, count(*) AS d FROM und GROUP BY 1), "
    "caps AS (SELECT u.v, u.x FROM und u JOIN deg ON deg.v = u.v "
    f"WHERE deg.d <= {SQL_KG_SIMILAR_NODES_CAP}), "
    "pairs AS (SELECT c1.x AS na, c2.x AS nb FROM caps c1 "
    "JOIN caps c2 ON c1.v = c2.v AND c1.x < c2.x), "
    "com AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS common FROM pairs GROUP BY 1, 2) "
    "SELECT com.na AS node_a, com.nb AS node_b, com.common, "
    "CAST(1000000 * com.common // (da.d + db.d - com.common) AS BIGINT) AS jac_micro "
    "FROM com JOIN deg da ON da.v = com.na JOIN deg db ON db.v = com.nb "
    f"WHERE 1000000 * com.common // (da.d + db.d - com.common) >= {SQL_KG_SIMILAR_NODES_MINJ}")


# --- leakage-safe group-holdout split -------------------------------------------

def q_docs_split_by_host(sf_dir: str):
    """Group-coherent train/val/test split: the md5 uniform is computed on
    the SOURCE (host), so every doc of a host lands in the same split — the
    leakage-safe holdout a dedup-imperfect web corpus needs (near-dups
    cluster within hosts; doc-level splits leak them across)."""
    import ray.data as rd

    from ontoray.extras.textstats import hash_split
    return hash_split(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "source"]),
                      id_col="source", salt="hostsplit")


def sql_docs_split_by_host() -> str:
    from ontoray.extras.textstats import sql_hash_split
    return sql_hash_split(id_col="source", salt="hostsplit",
                          cols="doc_id, source")


# --- product quantization -------------------------------------------------------

def q_embed_pq(sf_dir: str):
    """PQ codes: per-subspace exact fixed-point k-means assignment
    (4 subspaces x k=8 -> 12-bit codes per vector)."""
    import ray.data as rd

    from ontoray.extras.pq import pq_codes
    return pq_codes(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"]))


def sql_embed_pq() -> str:
    from ontoray.extras.pq import sql_pq_codes
    return sql_pq_codes(dim=64)


# --- windowed distinct-count sketch ---------------------------------------------

def q_events_hll_window(sf_dir: str):
    """Distinct users per tumbling hour via HyperLogLog — the streaming
    cardinality dashboard op: per-batch register partials keyed by window,
    ONE (window x 4096)-bounded exchange, bit-exact integer register state
    vs the mirror (extras/sketches.hll_estimate with the window as group)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.sketches import hll_estimate
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def win(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        w = pc.divide(us, 3600000000)
        return pa.table({"win": pc.cast(w, pa.string()),
                         "user_id": batch.column("user_id")})

    return hll_estimate(ds.map_batches(win, batch_format="pyarrow"),
                        "user_id", group_col="win")


def sql_events_hll_window() -> str:
    from ontoray.extras.sketches import sql_hll_estimate
    return sql_hll_estimate(
        "SELECT CAST(epoch_us(ts) // 3600000000 AS VARCHAR) AS win, "
        "user_id FROM events",
        "CAST(user_id AS VARCHAR)", group_col="win")


# --- Pareto skyline -------------------------------------------------------------

def q_custs_skyline(sf_dir: str):
    """Best-customer trade-off frontier: 2-D skyline (maximize total spend
    cents AND order count) over per-customer aggregates — local-prune +
    tiny-global-merge, mirrored by a NOT EXISTS dominance query."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.skyline import skyline
    from ontoray.stages.agg import hash_aggregate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"c_custkey": batch.column("o_custkey"), "c": c,
                         "one": pa.array([1] * batch.num_rows, pa.int64())})

    agg = hash_aggregate(
        orders.map_batches(cents, batch_format="pyarrow"), ["c_custkey"],
        partial_aggs=[("c", "sum"), ("one", "sum")],
        aggs=[("c_sum", "sum"), ("one_sum", "sum")],
        rename={"c_sum_sum": "spend_cents", "one_sum_sum": "n_orders"})
    return skyline(agg, "c_custkey", "spend_cents", "n_orders")


SQL_CUSTS_SKYLINE = (
    "WITH agg AS (SELECT o_custkey AS c_custkey, "
    "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents, "
    "CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) "
    "SELECT a.c_custkey, a.spend_cents, a.n_orders FROM agg a "
    "WHERE NOT EXISTS (SELECT 1 FROM agg b "
    "WHERE b.spend_cents >= a.spend_cents AND b.n_orders >= a.n_orders "
    "AND (b.spend_cents > a.spend_cents OR b.n_orders > a.n_orders))")


# --- per-nation spend inequality ------------------------------------------------

def q_orders_gini(sf_dir: str):
    """Per-nation Gini coefficient of order totals (int cents): broadcast
    dimension lookup (customer+nation, ray.put once) -> (nation, cents)
    histogram partials -> exact closed-form fold per nation."""
    import ray
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_gini

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]).take_all()
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).take_all()
    nname = {r["n_nationkey"]: r["n_name"] for r in nat}
    cmap = {r["c_custkey"]: nname[r["c_nationkey"]] for r in cust}
    bcast = ray.put(cmap)

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = ray.get(bcast)
        names = [m[k] for k in batch.column("o_custkey").to_pylist()]
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "cents": cents})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    return grouped_gini(orders.map_batches(derive, batch_format="pyarrow"),
                        "n_name", "cents")


SQL_ORDERS_GINI = (
    "WITH oc AS (SELECT n.n_name, "
    "CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents "
    "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN nation n ON n.n_nationkey = c.c_nationkey), "
    "r AS (SELECT n_name, cents, "
    "row_number() OVER (PARTITION BY n_name ORDER BY cents) AS rn, "
    "count(*) OVER (PARTITION BY n_name) AS nn, "
    "sum(cents) OVER (PARTITION BY n_name) AS tot FROM oc) "
    "SELECT n_name, CAST(max(nn) AS BIGINT) AS n, "
    "CAST(max(tot) AS BIGINT) AS total, "
    "CAST(1000000 * sum((2 * rn - nn - 1) * cents) // (max(nn) * max(tot)) "
    "AS BIGINT) AS gini_micro FROM r GROUP BY 1")


# --- per-group winsorization ----------------------------------------------------

def q_events_winsorized(sf_dir: str):
    """Outlier-robust clipping: per-event-type values (int cents) clipped to
    the exact [p01, p99] group quantiles — histogram-compressed cutpoints
    broadcast once, one vectorized clip pass."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_winsorize

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"event_id": batch.column("event_id"),
                         "event_type": batch.column("event_type"),
                         "cents": c})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return grouped_winsorize(ds.map_batches(cents, batch_format="pyarrow"),
                             "event_type", "cents", "event_id")


def sql_events_winsorized() -> str:
    from ontoray.extras.quantiles import sql_grouped_winsorize
    inner = ("(SELECT event_id, event_type, "
             "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)")
    return sql_grouped_winsorize(inner, "event_type", "cents", "event_id")


# --- exact-k uniform sample -----------------------------------------------------

def q_docs_sample_k(sf_dir: str):
    """Exactly-k uniform doc sample by md5 order statistic (the distributed
    reservoir-sampling replacement; local top-k + tiny merge)."""
    import ray.data as rd

    from ontoray.extras.textstats import sample_k
    return sample_k(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["doc_id"]), k=100)


def sql_docs_sample_k() -> str:
    from ontoray.extras.textstats import sql_sample_k
    return sql_sample_k(k=100)


# --- per-group robust spread (MAD) ----------------------------------------------

def q_events_mad(sf_dir: str):
    """Per-type median absolute deviation over int-cents values — two
    histogram-compressed passes, medians broadcast between them."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_mad

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"event_type": batch.column("event_type"), "cents": c})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_mad(ds.map_batches(cents, batch_format="pyarrow"),
                       "event_type", "cents")


def sql_events_mad() -> str:
    from ontoray.extras.quantiles import sql_grouped_mad
    inner = ("(SELECT event_type, "
             "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)")
    return sql_grouped_mad(inner, "event_type", "cents")


# --- label-propagation communities ----------------------------------------------

def q_kg_communities_from(triples_dedup_ds):
    """Deterministic synchronous LPA communities (3 rounds, min-label
    ties) — stages/analytics.label_propagation."""
    from ontoray.stages.analytics import label_propagation
    return label_propagation(triples_dedup_ds)


def _sql_lpa(rounds: int = 3) -> str:
    ctes = [
        "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst "
        "FROM tnorm WHERE subj_norm <> obj_norm)",
        "und AS (SELECT src AS a, dst AS b FROM trip "
        "UNION SELECT dst, src FROM trip)",
        "lnodes AS (SELECT DISTINCT a AS name FROM und)",
        "l0 AS (SELECT name, name AS lab FROM lnodes)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"n{t} AS (SELECT u.a AS v, l.lab, count(*) AS n "
            f"FROM und u JOIN l{t-1} l ON l.name = u.b GROUP BY 1, 2)")
        ctes.append(
            f"l{t} AS (SELECT v AS name, lab FROM ("
            f"SELECT v, lab, row_number() OVER (PARTITION BY v "
            f"ORDER BY n DESC, lab) AS rn FROM n{t}) WHERE rn = 1)")
    return (", ".join(ctes) +
            f" SELECT name, lab AS community FROM l{rounds}")


SQL_KG_COMMUNITIES = f"{_sql_triples_norm_ctes()}, {_sql_lpa(3)}"


# --- Markov transition counts ---------------------------------------------------

def q_events_markov(sf_dir: str):
    """Event-type Markov transitions over per-user ordered sequences
    (grouped_lag exchange + state-vocabulary count; exact integer
    conditional probabilities)."""
    import ray.data as rd

    from ontoray.stages.events import transition_counts
    return transition_counts(rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]))


# --- mention-pair PMI (relation-candidate scoring) ------------------------------

def q_kg_cooc_pmi(sf_dir: str):
    """Relation-candidate scoring: co-occurrence PMI lift between concept
    mentions — lift_micro = 1e6 * n_docs(m1,m2) * N // (df1 * df2) (the
    Church-Hanks association with the monotone log dropped, the
    lm_collocations contract applied to the M17 pair table).  Pairs and
    per-mention doc frequencies are both two-phase bucketed counts; the df
    table joins onto the pair table (no driver dict)."""
    from itertools import combinations

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    docs = _clean_docs_ds(sf_dir).materialize()
    n_docs_total = docs.count()

    def pairs(batch: pa.Table) -> pa.Table:
        m1, m2 = [], []
        for text in batch.column("doc_text").to_pylist():
            ms = sorted(set(extract_mentions(text, GAZETTEER)))
            for x, y in combinations(ms, 2):
                m1.append(x)
                m2.append(y)
        return pa.table({"m1": pa.array(m1, pa.string()),
                         "m2": pa.array(m2, pa.string())})

    cooc = hash_aggregate(
        docs.map_batches(pairs, batch_format="pyarrow"), ["m1", "m2"],
        partial_aggs=[("m1", "count")], aggs=[("m1_count", "sum")],
        rename={"m1_count_sum": "n_docs"})

    def per_doc_mentions(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("doc_text").to_pylist():
            out.extend(sorted(set(extract_mentions(text, GAZETTEER))))
        return pa.table({"mention": pa.array(out, pa.string()),
                         "one": pa.array([1] * len(out), pa.int64())})

    df = hash_aggregate(
        docs.map_batches(per_doc_mentions, batch_format="pyarrow"), ["mention"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "df"})

    j1 = hash_join(cooc, df, "m1", "mention", right_cols=["df"])
    j2 = hash_join(j1, df, "m2", "mention", right_cols=["df"], suffix="_2")

    def lift(batch: pa.Table) -> pa.Table:
        import numpy as np
        n = batch.column("n_docs").to_numpy(zero_copy_only=False).astype(object)
        d1 = batch.column("df").to_numpy(zero_copy_only=False).astype(object)
        d2 = batch.column("df_2").to_numpy(zero_copy_only=False).astype(object)
        lm = [int(1_000_000 * int(a) * n_docs_total // (int(b) * int(c)))
              for a, b, c in zip(n, d1, d2)]
        return pa.table({"m1": batch.column("m1"), "m2": batch.column("m2"),
                         "n_docs": batch.column("n_docs"),
                         "lift_micro": pa.array(lm, pa.int64())})

    return j2.map_batches(lift, batch_format="pyarrow")


def sql_kg_cooc_pmi() -> str:
    return (
        f"{_CLEANED_CTE}, m AS ({_sql_mentions_body()}), "
        "cooc AS (SELECT a.mention AS m1, b.mention AS m2, "
        "CAST(count(*) AS BIGINT) AS n_docs "
        "FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.mention < b.mention "
        "GROUP BY 1, 2), "
        "dfm AS (SELECT mention, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY 1), "
        "nn AS (SELECT count(*) AS n FROM cleaned) "
        "SELECT c.m1, c.m2, c.n_docs, "
        "CAST(1000000 * c.n_docs * nn.n // (d1.df * d2.df) AS BIGINT) AS lift_micro "
        "FROM cooc c, nn JOIN dfm d1 ON d1.mention = c.m1 "
        "JOIN dfm d2 ON d2.mention = c.m2")


# --- per-doc entity density -----------------------------------------------------

def q_kg_entity_density(sf_dir: str):
    """KG-corpus selection signal: distinct mentions per doc, tokens per
    doc, density_micro = 1e6 * n_mentions // max(n_tokens, 1).  Entirely
    batch-local (no shuffle) — density is a per-row function."""
    import re as _re

    from ontoray.text.extract import TOKEN_PATTERN

    tok_re = _re.compile(TOKEN_PATTERN)

    def density(batch: pa.Table) -> pa.Table:
        ids, nm, nt, dm = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("doc_text").to_pylist()):
            ms = set(extract_mentions(text, GAZETTEER))
            toks = tok_re.findall(text)
            ids.append(did)
            nm.append(len(ms))
            nt.append(len(toks))
            dm.append(1_000_000 * len(ms) // max(len(toks), 1))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_mentions": pa.array(nm, pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "density_micro": pa.array(dm, pa.int64())})

    return _clean_docs_ds(sf_dir).map_batches(density, batch_format="pyarrow")


def sql_kg_entity_density() -> str:
    from ontoray.text.extract import TOKEN_PATTERN
    return (
        f"{_CLEANED_CTE}, m AS ({_sql_mentions_body()}), "
        "mc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_mentions "
        "FROM m GROUP BY 1), "
        f"tc AS (SELECT doc_id, CAST(length(regexp_extract_all(ct, "
        f"'{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens FROM cleaned) "
        "SELECT tc.doc_id, CAST(coalesce(mc.n_mentions, 0) AS BIGINT) AS n_mentions, "
        "tc.n_tokens, "
        "CAST(1000000 * coalesce(mc.n_mentions, 0) // greatest(tc.n_tokens, 1) "
        "AS BIGINT) AS density_micro "
        "FROM tc LEFT JOIN mc USING (doc_id)")


# --- HITS hubs & authorities ----------------------------------------------------

def q_kg_hits_from(triples_dedup_ds):
    """Integer fixed-point HITS (2 rounds, max-normalized) —
    stages/analytics.hits_scores."""
    from ontoray.stages.analytics import hits_scores
    return hits_scores(triples_dedup_ds)


def _sql_hits(rounds: int = 2) -> str:
    ctes = [
        "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm)",
        "hn AS (SELECT DISTINCT name FROM ("
        "SELECT src AS name FROM trip UNION ALL SELECT dst FROM trip))",
        "h0 AS (SELECT name, CAST(1000000 AS BIGINT) AS s FROM hn)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"ar{t} AS (SELECT t.dst AS name, sum(h{t-1}.s) AS r "
            f"FROM trip t JOIN h{t-1} ON h{t-1}.name = t.src GROUP BY 1)")
        ctes.append(
            f"a{t} AS (SELECT name, CAST(r * 1000000 // "
            f"(SELECT max(r) FROM ar{t}) AS BIGINT) AS s FROM ar{t} WHERE r > 0)")
        ctes.append(
            f"hr{t} AS (SELECT t.src AS name, sum(a{t}.s) AS r "
            f"FROM trip t JOIN a{t} ON a{t}.name = t.dst GROUP BY 1)")
        ctes.append(
            f"h{t} AS (SELECT name, CAST(r * 1000000 // "
            f"(SELECT max(r) FROM hr{t}) AS BIGINT) AS s FROM hr{t} WHERE r > 0)")
    return (", ".join(ctes) +
            f" SELECT hn.name, CAST(coalesce(h{rounds}.s, 0) AS BIGINT) AS hub_micro, "
            f"CAST(coalesce(a{rounds}.s, 0) AS BIGINT) AS auth_micro "
            f"FROM hn LEFT JOIN h{rounds} ON h{rounds}.name = hn.name "
            f"LEFT JOIN a{rounds} ON a{rounds}.name = hn.name")


SQL_KG_HITS = f"{_sql_triples_norm_ctes()}, {_sql_hits(2)}"


# --- late-r3 session-4 additions -------------------------------------------------

def q_embed_knn(sf_dir: str, k: int = 5):
    """Exact cosine k-NN graph over the embeddings table (self excluded):
    broadcast matrix + one matmul per batch; scale contract in knn_graph."""
    import ray.data as rd
    from ontoray.extras.ann import knn_graph
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_graph(ds, k=k)


def sql_embed_knn(k: int = 5) -> str:
    from ontoray.extras.ann import sql_knn_graph
    return sql_knn_graph(k=k)


def q_text_rake(sf_dir: str, min_freq: int = 3):
    """RAKE keyword scores (deg/freq over stopword-delimited phrases) with
    the exact integer score_micro contract."""
    import ray.data as rd
    from ontoray.extras.rake import rake_words
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return rake_words(ds, min_freq=min_freq)


def sql_text_rake(min_freq: int = 3) -> str:
    from ontoray.extras.rake import sql_rake_words
    return sql_rake_words(min_freq=min_freq)


def q_lm_renyi2(sf_dir: str):
    """Per-source collision concentration (Renyi-2 surrogate) — exact
    integer ppb from two vocabulary-bounded exchanges."""
    import ray.data as rd
    from ontoray.extras.textstats import renyi2_by_source
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    return renyi2_by_source(ds)


def sql_lm_renyi2() -> str:
    from ontoray.extras.textstats import sql_renyi2_by_source
    return sql_renyi2_by_source()


def q_events_attribution(sf_dir: str):
    """Last-touch attribution of purchase events (keyed exchange +
    vectorized running-last per user)."""
    import ray.data as rd
    from ontoray.stages.events import last_touch_attribution
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    return last_touch_attribution(ds)


def sql_events_attribution() -> str:
    from ontoray.stages.events import sql_last_touch_attribution
    return sql_last_touch_attribution()


def q_orders_share(sf_dir: str):
    """Revenue share per nation WITHIN its region: ratio-to-total as exact
    integer ppm (share_ppm = 1e6 * nation_cents // region_cents).

    Scale shape: ONE partitioned fact join (orders ⋈ customer) + broadcast
    dimension maps (the q_orders_rollup spine); the share division runs on
    the vocabulary-bounded (region × nation) aggregate."""
    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name", "n_regionkey"]).take_all()
    region = rd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"]).take_all()
    rmap = {r["r_regionkey"]: r["r_name"] for r in region}
    n_keys = np.array([r["n_nationkey"] for r in nation], dtype=np.int32)
    n_names = np.array([r["n_name"] for r in nation], dtype=object)
    r_names = np.array([rmap[r["n_regionkey"]] for r in nation], dtype=object)
    side_ref = ray.put((n_keys, n_names, r_names))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j = hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk, nn, rn = ray.get(side_ref)
        idx = pc.index_in(batch.column("c_nationkey"),
                          value_set=pa.array(nk, pa.int32()))
        pos = idx.to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({
            "r_name": pa.array(list(rn[pos]), pa.string()),
            "n_name": pa.array(list(nn[pos]), pa.string()),
            "price_c": cents,
        })

    lvl2 = hash_aggregate(
        j.map_batches(derive, batch_format="pyarrow"), ["r_name", "n_name"],
        partial_aggs=[("price_c", "sum")],
        aggs=[("price_c_sum", "sum")],
        rename={"price_c_sum_sum": "price_c"})

    def share(g: pa.Table) -> pa.Table:
        import numpy as np
        c = g.column("price_c").to_numpy(zero_copy_only=False)
        tot = int(c.sum())
        return pa.table({
            "r_name": g.column("r_name"),
            "n_name": g.column("n_name"),
            "revenue": pa.array(c / 100.0, pa.float64()),
            "share_ppm": pa.array(c * 1_000_000 // tot if tot else c * 0,
                                  pa.int64()),
        })

    return lvl2.groupby("r_name").map_groups(share, batch_format="pyarrow")


SQL_ORDERS_SHARE = (
    "WITH a AS (SELECT r_name, n_name, "
    f"sum({_CENTS.format(x='o_totalprice')}) AS cents "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY r_name, n_name) "
    "SELECT r_name, n_name, CAST(cents AS BIGINT) / 100.0 AS revenue, "
    "(CAST(cents AS BIGINT) * 1000000) "
    "// CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_ppm "
    "FROM a")


def q_embed_hardneg(sf_dir: str):
    """Contrastive pair mining: nearest same-label (positive) + nearest
    different-label (hard negative) per anchor, exact cosine."""
    import ray.data as rd
    from ontoray.extras.ann import hard_negatives
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    return hard_negatives(ds)


def sql_embed_hardneg() -> str:
    from ontoray.extras.ann import sql_hard_negatives
    return sql_hard_negatives()


def q_custs_rfm(sf_dir: str):
    """RFM segmentation: per customer (recency day, order frequency, money
    cents) folded in ONE corpus exchange over orders, then three
    ntile-by-VALUE quintile assignments (per-metric value histograms ->
    cutpoints broadcast once -> vectorized searchsorted) and
    rfm_code = 100*r + 10*f + m.  Higher bucket = more recent / more
    frequent / higher spend.

    Scale note: the money histogram's value vocabulary is distinct cents
    (corpus-bounded but wide); quantize to coarser units upstream if the
    histogram exchange ever dominates (same trade the quantile family
    documents)."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantile_buckets
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        day = pc.cast(batch.column("o_orderdate"), pa.int64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({
            "c_custkey": batch.column("o_custkey"),
            "day": pc.divide(day, pa.scalar(86_400_000_000)),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "cents": cents,
        })

    base = hash_aggregate(
        orders.map_batches(derive, batch_format="pyarrow"), ["c_custkey"],
        partial_aggs=[("day", "max"), ("one", "sum"), ("cents", "sum")],
        aggs=[("day_max", "max"), ("one_sum", "sum"), ("cents_sum", "sum")],
        rename={"day_max_max": "last_day", "one_sum_sum": "n_orders",
                "cents_sum_sum": "cents"})

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "seg", pa.array(["all"] * batch.num_rows, pa.string()))

    base = base.map_batches(tag, batch_format="pyarrow").materialize()

    def buckets(col: str, out: str):
        b = grouped_quantile_buckets(base, "seg", col, "c_custkey", n_buckets=5)
        return b.select_columns(["c_custkey", "bucket"]).map_batches(
            lambda t, o=out: t.rename_columns(["c_custkey", o]),
            batch_format="pyarrow")

    r = buckets("last_day", "r_score")
    f = buckets("n_orders", "f_score")
    m = buckets("cents", "m_score")
    j = hash_join(hash_join(r, f, "c_custkey", "c_custkey", how="inner",
                            right_cols=["f_score"]),
                  m, "c_custkey", "c_custkey", how="inner",
                  right_cols=["m_score"])

    def code(batch: pa.Table) -> pa.Table:
        rr = batch.column("r_score").to_numpy(zero_copy_only=False)
        ff = batch.column("f_score").to_numpy(zero_copy_only=False)
        mm = batch.column("m_score").to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "r_score": pa.array(rr, pa.int64()),
            "f_score": pa.array(ff, pa.int64()),
            "m_score": pa.array(mm, pa.int64()),
            "rfm_code": pa.array(100 * rr + 10 * ff + mm, pa.int64()),
        })

    return j.map_batches(code, batch_format="pyarrow")


SQL_CUSTS_RFM = (
    "WITH base AS ("
    "  SELECT o_custkey AS c_custkey,"
    "         epoch_us(max(o_orderdate)) // 86400000000 AS last_day,"
    "         CAST(count(*) AS BIGINT) AS n_orders,"
    f"         CAST(sum({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS cents"
    "  FROM orders GROUP BY o_custkey), "
    + " ".join(
        f"{p}r AS (SELECT {col} AS v,"
        f"  row_number() OVER (ORDER BY {col}) AS rn, count(*) OVER () AS n"
        f"  FROM base),"
        f" {p}c AS (SELECT q.i, min(v) AS cut FROM {p}r,"
        f"  (SELECT unnest(range(1, 5)) AS i) q"
        f"  WHERE rn = (n * q.i + 4) // 5 GROUP BY q.i),"
        f" {p}b AS (SELECT b.c_custkey,"
        f"  CAST(sum(CASE WHEN b.{col} > c.cut THEN 1 ELSE 0 END) AS BIGINT)"
        f"    AS {out}"
        f"  FROM base b CROSS JOIN {p}c c GROUP BY b.c_custkey),"
        for p, col, out in [("r", "last_day", "r_score"),
                            ("f", "n_orders", "f_score"),
                            ("m", "cents", "m_score")]
    ).rstrip(",")
    + " SELECT rb.c_custkey, r_score, f_score, m_score,"
    "  100 * r_score + 10 * f_score + m_score AS rfm_code"
    " FROM rb JOIN fb ON rb.c_custkey = fb.c_custkey"
    " JOIN mb ON rb.c_custkey = mb.c_custkey")


def q_custs_returned(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape: returned-item revenue per customer, top-k.  The
    l_returnflag predicate pushes into the parquet read (filtered row groups
    never leave storage); lineitem ⋈ orders is the partitioned spine; the
    per-customer aggregate is customer-scale, sorted distributed (A11
    pattern) and cut at k; c_name attaches to the k survivors via a
    key-filtered dimension read — the corpus never sees customer strings."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"],
                         filter=pc.field("l_returnflag") == "R")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    spine = hash_join(li, orders, "l_orderkey", "o_orderkey", how="inner",
                      right_cols=["o_custkey"])

    def cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"c_custkey": batch.column("o_custkey"),
                         "rev_c": rev_c})

    agg = hash_aggregate(
        spine.map_batches(cents, batch_format="pyarrow"), ["c_custkey"],
        partial_aggs=[("rev_c", "sum")],
        aggs=[("rev_c_sum", "sum")], rename={"rev_c_sum_sum": "rev_c"})

    top = agg.sort(["rev_c", "c_custkey"],
                   descending=[True, False]).limit(k).take_all()
    keys = [r["c_custkey"] for r in top]
    names = {r["c_custkey"]: r["c_name"] for r in rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filter=pc.field("c_custkey").isin(keys)).take_all()}
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([names[c] for c in keys], pa.string()),
        "revenue": pa.array([r["rev_c"] / 100.0 for r in top], pa.float64()),
    })


SQL_CUSTS_RETURNED = (
    "SELECT o_custkey AS c_custkey, c_name, "
    f"sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) / 100.0 "
    "AS revenue FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "WHERE l_returnflag = 'R' GROUP BY o_custkey, c_name "
    f"ORDER BY sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) "
    "DESC, o_custkey LIMIT 20")


def q_orders_monthly_ma(sf_dir: str):
    """Calendar-month order counts + 3-month trailing moving average (the
    time-dimension rollup + trend smoothing pair).  ONE corpus exchange
    folds (ym -> n, cents); the month vocabulary (~decades x 12 rows) then
    sorts locally in a single group.  ma = window cents / window months in
    ONE pinned float64 division, int sums underneath — hash-exact."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(batch.column("o_orderdate")),
                                        pa.int64()), pa.scalar(100)),
                    pc.cast(pc.month(batch.column("o_orderdate")), pa.int64()))
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"ym": ym,
                         "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                         "cents": cents})

    agg = hash_aggregate(
        orders.map_batches(derive, batch_format="pyarrow"), ["ym"],
        partial_aggs=[("one", "sum"), ("cents", "sum")],
        aggs=[("one_sum", "sum"), ("cents_sum", "sum")],
        rename={"one_sum_sum": "n_orders", "cents_sum_sum": "cents"})

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__g", pa.array([0] * batch.num_rows, pa.int64()))

    def window(g: pa.Table) -> pa.Table:
        ym = g.column("ym").to_numpy(zero_copy_only=False)
        n = g.column("n_orders").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        o = np.argsort(ym)
        ym, n, c = ym[o], n[o], c[o]
        csum = np.concatenate([[0], np.cumsum(c)])
        win_c = csum[1:] - csum[np.maximum(np.arange(len(c)) - 2, 0)]
        win_n = np.minimum(np.arange(len(c)) + 1, 3)
        return pa.table({
            "ym": pa.array(ym, pa.int64()),
            "n_orders": pa.array(n, pa.int64()),
            "revenue": pa.array(c / 100.0, pa.float64()),
            "ma3_revenue": pa.array((win_c / win_n) / 100.0, pa.float64()),
        })

    return (agg.map_batches(tag, batch_format="pyarrow")
            .groupby("__g").map_groups(window, batch_format="pyarrow"))


SQL_ORDERS_MONTHLY_MA = (
    "WITH m AS (SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) "
    "AS BIGINT) AS ym, CAST(count(*) AS BIGINT) AS n_orders, "
    f"CAST(sum({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS cents "
    "FROM orders GROUP BY 1) "
    "SELECT ym, n_orders, CAST(cents AS BIGINT) / 100.0 AS revenue, "
    "(CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w) / 100.0 "
    "AS ma3_revenue FROM m "
    "WINDOW w AS (ORDER BY ym ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")


def q_docs_topics(sf_dir: str):
    """Hashed-BoW k-means topic clusters with per-cluster top terms."""
    import ray.data as rd
    from ontoray.extras.topics import docs_topics
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return docs_topics(ds)


def sql_docs_topics() -> str:
    from ontoray.extras.topics import sql_docs_topics
    return sql_docs_topics()


def q_kg_walks_from(triples_dedup_ds, length: int = 3):
    """Deterministic DeepWalk-style walk sampling over the concept graph
    (md5 hop selection — the graph-embedding training-data stage)."""
    from ontoray.stages.analytics import random_walks

    def pairs(batch):
        return pa.table({"src": batch.column("subj_norm"),
                         "dst": batch.column("obj_norm")})

    return random_walks(triples_dedup_ds.map_batches(
        pairs, batch_format="pyarrow"), length=length)


def sql_kg_walks(length: int = 3) -> str:
    from ontoray.stages.analytics import sql_random_walks
    return sql_random_walks(_sql_triples_norm_ctes(), length=length)


def q_docs_novelty(sf_dir: str):
    """Per-doc first-occurrence k-gram fraction (novelty_ppm)."""
    import ray.data as rd
    from ontoray.extras.dedup import novelty_stats
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return novelty_stats(ds)


def sql_docs_novelty() -> str:
    from ontoray.extras.dedup import sql_novelty_stats
    return sql_novelty_stats()


def q_lineitem_q6(sf_dir: str):
    """TPC-H Q6 shape: forecast-revenue delta — ONE filtered streaming
    aggregate, every predicate pushed into the parquet read (date range,
    discount band, quantity cap prune row groups at storage), per-batch
    cents partials, no shuffle at all (single global sum)."""
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    expr = ((pc.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
            & (pc.field("l_shipdate") < datetime.datetime(1997, 1, 1))
            & (pc.field("l_discount") >= 0.02)
            & (pc.field("l_discount") <= 0.04)
            & (pc.field("l_quantity") < 24))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount"],
                         filter=expr)

    def cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          batch.column("l_discount"))
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "rev_c": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64()),
        })

    parts = li.map_batches(cents, batch_format="pyarrow").take_all()
    total_c = sum(r["rev_c"] for r in parts)
    n = sum(r["n"] for r in parts)
    return pa.table({"revenue": pa.array([total_c / 100.0], pa.float64()),
                     "n_items": pa.array([n], pa.int64())})


SQL_LINEITEM_Q6 = (
    f"SELECT sum({_CENTS.format(x='l_extendedprice * l_discount')}) / 100.0 "
    "AS revenue, CAST(count(*) AS BIGINT) AS n_items FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24")


def q_kg_degree_dist_from(edges_ds):
    """Degree distribution of the concept graph in log2 bands — the
    power-law / skew diagnostic a shuffle planner reads before picking salt
    factors: (band, n_nodes, min_degree, max_degree), band = bit_length-1
    (EXACT integer log2 — no float log near power-of-two boundaries).

    Scale shape: distributed two-sided degree count (curation._degree_table,
    one vocabulary-bounded exchange) + a band-vocabulary second fold."""
    import numpy as np

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.curation import _degree_table

    deg = _degree_table(edges_ds, pa.array([], pa.string()))

    def band(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False)
        b = np.array([int(x).bit_length() - 1 for x in d], dtype=np.int64)
        return pa.table({"band": pa.array(b, pa.int64()),
                         "one": pa.array(np.ones(len(d), dtype=np.int64)),
                         "degree": pa.array(d, pa.int64())})

    return hash_aggregate(
        deg.map_batches(band, batch_format="pyarrow"), ["band"],
        partial_aggs=[("one", "sum"), ("degree", "min"), ("degree", "max")],
        aggs=[("one_sum", "sum"), ("degree_min", "min"), ("degree_max", "max")],
        rename={"one_sum_sum": "n_nodes", "degree_min_min": "min_degree",
                "degree_max_max": "max_degree"}, num_buckets=8)


SQL_KG_DEGREE_DIST_TAIL = (
    ", dt AS (SELECT name, CAST(count(*) AS BIGINT) AS degree FROM ("
    "SELECT src AS name FROM lk_edges_cur UNION ALL SELECT dst "
    "FROM lk_edges_cur) GROUP BY name) "
    "SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS band, "
    "CAST(count(*) AS BIGINT) AS n_nodes, min(degree) AS min_degree, "
    "max(degree) AS max_degree FROM dt GROUP BY 1")


def q_events_bursts(sf_dir: str):
    """Peak events-per-minute per event type (burst detection)."""
    import ray.data as rd
    from ontoray.stages.events import burst_peaks
    return burst_peaks(rd.read_parquet(f"{sf_dir}/events.parquet",
                                       columns=["event_type", "ts"]))


def q_events_ab(sf_dir: str):
    """Hash-split A/B micro-mean comparison per event type."""
    import ray.data as rd
    from ontoray.stages.events import ab_metrics
    return ab_metrics(rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"]))


# --- TPC-H Q3 / Q14 shapes, late-shipment semi-join ----------------------------

def q_orders_q3(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape (shipping priority): segment-filtered customers
    semi-join orders, join lineitem, top-k unshipped orders by revenue.

    Scale shape: every predicate pushed into the parquet reads (segment,
    both date bounds prune row groups at storage); the customer side is a
    partitioned LEFT-SEMI join (no broadcast — customers are
    corpus-proportional); revenue folds in the int64-cents contract; top-k
    is local per block then one single-block merge under the SAME
    comparator (rev_c DESC, l_orderkey ASC) — never a global sort."""
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    cutoff = datetime.datetime(1998, 7, 1)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == "BUILDING"),
    ).select_columns(["c_custkey"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < cutoff))
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > cutoff))

    o2 = hash_join(orders, cust, "o_custkey", "c_custkey", how="left_semi")
    spine = hash_join(li, o2.select_columns(["o_orderkey", "o_orderdate"]),
                      "l_orderkey", "o_orderkey")

    def derive(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        days = pc.divide(pc.cast(batch.column("o_orderdate"), pa.int64()),
                         pa.scalar(86_400_000_000))
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "o_date_days": days, "rev_c": rev_c})

    agg = hash_aggregate(
        spine.map_batches(derive, batch_format="pyarrow"),
        ["l_orderkey", "o_date_days"], partial_aggs=[("rev_c", "sum")],
        aggs=[("rev_c_sum", "sum")], rename={"rev_c_sum_sum": "rev_c"})

    def topk(batch: pa.Table) -> pa.Table:
        okey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = batch.column("rev_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(order, pa.int64()))

    cand = agg.map_batches(topk, batch_format="pyarrow").repartition(1)\
        .map_batches(topk, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "o_date_days": batch.column("o_date_days"),
            "revenue": pc.divide(pc.cast(batch.column("rev_c"), pa.float64()),
                                 pa.scalar(100.0)),
        })

    return cand.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_Q3 = (
    "SELECT l_orderkey, "
    "epoch_us(o_orderdate) // 86400000000 AS o_date_days, "
    f"sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) / 100.0 "
    "AS revenue FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "AND o_orderdate < TIMESTAMP '1998-07-01' "
    "AND l_shipdate > TIMESTAMP '1998-07-01' "
    "GROUP BY 1, 2 "
    f"ORDER BY sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) "
    "DESC, l_orderkey LIMIT 10")


def q_lineitem_q14(sf_dir: str):
    """TPC-H Q14 shape (promo revenue): one-quarter shipdate window,
    lineitem ⋈ part partitioned hash join, promo share of revenue as an
    exact integer micro-percent (bigint-safe floor division on both sides).

    Output: (promo_revenue, total_revenue, promo_pct_micro)."""
    import datetime

    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.joins import hash_join

    lo, hi = datetime.datetime(1997, 1, 1), datetime.datetime(1997, 4, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=((pc.field("l_shipdate") >= lo)
                & (pc.field("l_shipdate") < hi)))
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    sp = hash_join(li, part, "l_partkey", "p_partkey", right_cols=["p_type"])

    def partials(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        promo = pc.equal(batch.column("p_type"), pa.scalar("PROMO"))
        p = pc.sum(rev_c.filter(promo)).as_py() or 0
        t = pc.sum(rev_c).as_py() or 0
        return pa.table({"promo_c": pa.array([p], pa.int64()),
                         "total_c": pa.array([t], pa.int64())})

    parts = sp.map_batches(partials, batch_format="pyarrow").take_all()
    promo_c = sum(r["promo_c"] for r in parts)
    total_c = sum(r["total_c"] for r in parts)
    pct = (100_000_000 * promo_c) // total_c if total_c else 0
    return pa.table({
        "promo_revenue": pa.array([promo_c / 100.0], pa.float64()),
        "total_revenue": pa.array([total_c / 100.0], pa.float64()),
        "promo_pct_micro": pa.array([pct], pa.int64()),
    })


_Q14_CENTS = _CENTS.format(x="l_extendedprice * (1 - l_discount)")
SQL_LINEITEM_Q14 = (
    f"SELECT sum(CASE WHEN p_type = 'PROMO' THEN {_Q14_CENTS} ELSE 0 END) "
    "/ 100.0 AS promo_revenue, "
    f"sum({_Q14_CENTS}) / 100.0 AS total_revenue, "
    "CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN "
    f"{_Q14_CENTS} ELSE 0 END) AS HUGEINT) * 100000000) "
    f"// sum({_Q14_CENTS}) AS BIGINT) AS promo_pct_micro "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-04-01'")


def q_orders_late_ship(sf_dir: str):
    """Late-shipment order counts per priority — the TPC-H Q4 EXISTS
    semi-join shape without the missing commitdate column: an order is late
    when ANY of its lineitems shipped > 60 days after the order date
    (max(l_shipdate) > o_orderdate + 60d — EXISTS folded into a per-key MAX
    so the corpus side exchanges one row per order, not one per lineitem)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "ship_us": pc.cast(batch.column("l_shipdate"), pa.int64()),
        })

    ms = hash_aggregate(
        li.map_batches(to_us, batch_format="pyarrow"), ["l_orderkey"],
        partial_aggs=[("ship_us", "max")], aggs=[("ship_us_max", "max")],
        rename={"ship_us_max_max": "ship_us"})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(ms, orders, "l_orderkey", "o_orderkey",
                  right_cols=["o_orderdate", "o_orderpriority"])

    def late(batch: pa.Table) -> pa.Table:
        ship = batch.column("ship_us").to_numpy(zero_copy_only=False)
        od = pc.cast(batch.column("o_orderdate"), pa.int64())\
            .to_numpy(zero_copy_only=False)
        keep = pa.array(ship > od + 60 * 86_400_000_000)
        t = batch.filter(keep)
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    return hash_aggregate(
        j.map_batches(late, batch_format="pyarrow"), ["o_orderpriority"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_late"}, num_buckets=8)


SQL_ORDERS_LATE_SHIP = (
    "WITH ms AS (SELECT l_orderkey, max(epoch_us(l_shipdate)) AS ship_us "
    "FROM lineitem GROUP BY 1) "
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late "
    "FROM orders JOIN ms ON o_orderkey = l_orderkey "
    "WHERE ship_us > epoch_us(o_orderdate) + 5184000000000 GROUP BY 1")


# --- readability / BPE / resource-allocation wrappers --------------------------

def q_docs_readability(sf_dir: str):
    """Flesch-shaped readability per document, exact int64 micro contract
    (extras/textstats.readability)."""
    import ray.data as rd
    from ontoray.extras.textstats import readability
    return readability(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["doc_id", "text"]))


def sql_docs_readability() -> str:
    from ontoray.extras.textstats import sql_readability
    return sql_readability()


def q_lm_bpe(sf_dir: str, k: int = 6):
    """First k BPE tokenizer merges over the documents corpus
    (extras/bpe.bpe_merges — ONE distributed word-count pass, then the
    vocabulary-bounded trainer loop)."""
    import ray.data as rd
    from ontoray.extras.bpe import bpe_merges
    return bpe_merges(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["text"]), k=k)


def sql_lm_bpe(k: int = 6) -> str:
    from ontoray.extras.bpe import sql_bpe_merges
    return sql_bpe_merges(k=k)


def q_kg_resource_alloc_from(triples_dedup_ds):
    """Resource-allocation link prediction over the concept graph
    (stages/analytics.resource_allocation)."""
    from ontoray.stages.analytics import resource_allocation
    return resource_allocation(triples_dedup_ds)


SQL_KG_RESOURCE_ALLOC = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm "
    "WHERE subj_norm <> obj_norm), "
    "und AS (SELECT src AS v, dst AS x FROM trip UNION SELECT dst, src FROM trip), "
    "deg AS (SELECT v, count(*) AS d FROM und GROUP BY 1), "
    "caps AS (SELECT u.v, u.x, CAST(1000000000 // deg.d AS BIGINT) AS w "
    "FROM und u JOIN deg ON deg.v = u.v WHERE deg.d <= 32), "
    "pairs AS (SELECT c1.x AS na, c2.x AS nb, c1.w FROM caps c1 "
    "JOIN caps c2 ON c1.v = c2.v AND c1.x < c2.x), "
    "ra AS (SELECT na, nb, CAST(sum(w) AS BIGINT) AS ra_nano, "
    "CAST(count(*) AS BIGINT) AS common FROM pairs GROUP BY 1, 2), "
    "ep AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
    "FROM trip) "
    "SELECT ra.na AS node_a, ra.nb AS node_b, ra.common, ra.ra_nano "
    "FROM ra LEFT JOIN ep ON ep.a = ra.na AND ep.b = ra.nb "
    "WHERE ep.a IS NULL AND ra.ra_nano >= 50000000")


def q_lm_bpe_encode(sf_dir: str, k: int = 6):
    """Apply the k learned BPE merges back to every document — the
    tokenizer ENCODE step (extras/bpe.bpe_encode): per doc, word/char/BPE
    symbol counts and the achieved micro-fixed-point compression ratio."""
    import ray.data as rd
    from ontoray.extras.bpe import bpe_encode
    return bpe_encode(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"]), k=k)


def sql_lm_bpe_encode(k: int = 6) -> str:
    from ontoray.extras.bpe import sql_bpe_encode
    return sql_bpe_encode(k=k)


def q_events_cusum(sf_dir: str):
    """Per-type one-sided CUSUM change statistic per event, via the
    parallel-prefix closed form (stages/events.cusum_scan)."""
    import ray.data as rd
    from ontoray.stages.events import cusum_scan
    return cusum_scan(rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "event_id", "ts", "value"]))


# --- TPC-H Q18/Q16/Q19/Q22 shapes ----------------------------------------------

def q_orders_bigqty(sf_dir: str, min_qty: int = 250):
    """TPC-H Q18 shape (large-volume orders): per-order quantity totals
    (two-phase hash_aggregate — the fact table exchanges one combiner row
    per order, never a lineitem row), HAVING-filtered to > ``min_qty``, then
    two partitioned hash joins pull the order header and the customer name.
    The HAVING filter runs BEFORE either join, so join input is the handful
    of qualifying orders, not the corpus."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def qty(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "q": pc.cast(pc.floor(pc.add(
                pc.cast(batch.column("l_quantity"), pa.float64()),
                pa.scalar(0.5))), pa.int64()),
        })

    ms = hash_aggregate(
        li.map_batches(qty, batch_format="pyarrow"), ["l_orderkey"],
        partial_aggs=[("q", "sum")], aggs=[("q_sum", "sum")],
        rename={"q_sum_sum": "sum_qty"})
    big = ms.map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"),
                                      pa.scalar(min_qty, pa.int64()))),
        batch_format="pyarrow")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = hash_join(big, orders, "l_orderkey", "o_orderkey",
                  right_cols=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    j2 = hash_join(j, cust, "o_custkey", "c_custkey", right_cols=["c_name"])

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": batch.column("c_name"),
            "o_orderkey": batch.column("l_orderkey"),
            "o_orderdate_us": pc.cast(batch.column("o_orderdate"), pa.int64()),
            "total_cents": pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(batch.column("o_totalprice"), pa.float64()),
                pa.scalar(100.0)), pa.scalar(0.5))), pa.int64()),
            "sum_qty": batch.column("sum_qty"),
        })

    return j2.map_batches(out, batch_format="pyarrow")


SQL_ORDERS_BIGQTY = (
    "WITH ms AS (SELECT l_orderkey, "
    "CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty "
    "FROM lineitem GROUP BY 1 HAVING sum_qty > 250) "
    "SELECT c_name, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, "
    "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents, sum_qty "
    "FROM ms JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey")


def q_parts_supplier_cnt(sf_dir: str, bal_cents_lt: int = 100000):
    """TPC-H Q16 shape (supplier count per part attribute group) over the
    lineitem-evidenced (part, supplier) pairs — the synthetic schema has no
    partsupp table, so distinct (l_partkey, l_suppkey) stands in for it.

    Scale shape: the fact table collapses to distinct pairs via a two-phase
    hash_aggregate (per-batch combiner first); the supplier blocklist
    (low-standing suppliers, the Q16 'complaints' surrogate: acctbal cents <
    ``bal_cents_lt``) is dimension-bounded and broadcasts as a set; part
    attributes arrive by partitioned hash join; a second vocabulary-scale
    distinct on (brand, type, size, suppkey) feeds the final count —
    count(DISTINCT suppkey) without ever shipping a non-distinct row."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    pairs = hash_aggregate(
        li.map_batches(one, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        partial_aggs=[("one", "max")], aggs=[("one_max", "max")],
        rename={"one_max_max": "one"})

    import pyarrow.parquet as pq
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    cents = pc.cast(pc.floor(pc.add(pc.multiply(
        pc.cast(sup.column("s_acctbal"), pa.float64()),
        pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
    blocked = set(sup.column("s_suppkey").filter(
        pc.less(cents, pa.scalar(bal_cents_lt, pa.int64()))).to_pylist())
    blocked_ref = ray.put(blocked)

    def drop_blocked(batch: pa.Table) -> pa.Table:
        bl = ray.get(blocked_ref)
        keep = pa.array([s not in bl
                         for s in batch.column("l_suppkey").to_pylist()])
        return batch.filter(keep)

    ok = pairs.map_batches(drop_blocked, batch_format="pyarrow")
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_type",
                                    "p_size"])
    j = hash_join(ok, part, "l_partkey", "p_partkey",
                  right_cols=["p_brand", "p_type", "p_size"])

    SIZES = {1, 7, 14, 21, 28, 35, 42, 49}

    def attr_filter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(batch.column("p_size"),
                     value_set=pa.array(sorted(SIZES), pa.int32())),
            pc.invert(pc.equal(batch.column("p_brand"), "Brand#13")))
        t = batch.filter(keep)
        return t.select(["p_brand", "p_type", "p_size", "l_suppkey"])\
            .append_column("one",
                           pa.array(np.ones(t.num_rows, dtype=np.int64)))

    quads = hash_aggregate(
        j.map_batches(attr_filter, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        partial_aggs=[("one", "max")], aggs=[("one_max", "max")],
        rename={"one_max_max": "one"})
    return hash_aggregate(
        quads, ["p_brand", "p_type", "p_size"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "supplier_cnt"}, num_buckets=8)


SQL_PARTS_SUPPLIER_CNT = (
    "WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), "
    "ok AS (SELECT * FROM pairs WHERE l_suppkey NOT IN "
    "(SELECT s_suppkey FROM supplier "
    "WHERE CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) < 100000)) "
    "SELECT p_brand, p_type, p_size, "
    "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM ok JOIN part ON p_partkey = l_partkey "
    "WHERE p_size IN (1, 7, 14, 21, 28, 35, 42, 49) "
    "AND p_brand <> 'Brand#13' GROUP BY 1, 2, 3")


def q_lineitem_disjunct_rev(sf_dir: str):
    """TPC-H Q19 shape (disjunctive brand/size/quantity predicates): ONE
    partitioned hash join carries (brand, size) onto the quantity-pruned
    fact rows (the OR's union quantity envelope [1, 30] pushes into the
    parquet read), the three-clause disjunction evaluates as vectorized
    Arrow boolean algebra, and revenue folds as int64-cents partials —
    a single global sum, no further exchange.

    Output: one row (n_items, revenue_cents)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=((pc.field("l_quantity") >= 1)
                & (pc.field("l_quantity") <= 30)))
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    j = hash_join(li, part, "l_partkey", "p_partkey",
                  right_cols=["p_brand", "p_size"])

    def clause(batch, brand, size_hi, q_lo, q_hi):
        return pc.and_(pc.and_(
            pc.equal(batch.column("p_brand"), brand),
            pc.and_(pc.greater_equal(batch.column("p_size"), 1),
                    pc.less_equal(batch.column("p_size"), size_hi))),
            pc.and_(pc.greater_equal(batch.column("l_quantity"), q_lo),
                    pc.less_equal(batch.column("l_quantity"), q_hi)))

    def partials(batch: pa.Table) -> pa.Table:
        keep = pc.or_(pc.or_(clause(batch, "Brand#12", 15, 1.0, 11.0),
                             clause(batch, "Brand#23", 25, 10.0, 20.0)),
                      clause(batch, "Brand#34", 35, 20.0, 30.0))
        t = batch.filter(keep)
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "rc": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
        })

    parts_ds = j.map_batches(partials, batch_format="pyarrow")

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_items": pa.array([pc.sum(batch.column("n")).as_py() or 0],
                                pa.int64()),
            "revenue_cents": pa.array(
                [pc.sum(batch.column("rc")).as_py() or 0], pa.int64()),
        })

    return fold(pa.concat_tables(
        [pa.table(b) for b in parts_ds.iter_batches(batch_format="pyarrow")]))


SQL_LINEITEM_DISJUNCT_REV = (
    "SELECT CAST(count(*) AS BIGINT) AS n_items, "
    "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) "
    "AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
    "AND l_quantity BETWEEN 1 AND 11) "
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 "
    "AND l_quantity BETWEEN 10 AND 20) "
    "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 "
    "AND l_quantity BETWEEN 20 AND 30)")


def q_custs_above_avg_idle(sf_dir: str, cutoff: str = "2000-07-01"):
    """TPC-H Q22 shape (above-average-balance customers with no recent
    orders), restated distributed-exact:

    * the global positive-balance average broadcasts as TWO integers
      (n, sum_cents) and the per-row test is the cross-multiplication
      ``cents * n > sum`` — exact, no division, no float;
    * 'no recent order' is the repo's EXCEPT operator (stages/setops): both
      sides collapse to per-batch distinct keys before ONE vocabulary-scale
      exchange; the recent-order date predicate pushes into the parquet
      read so pruned row groups never leave storage;
    * customer attributes re-attach by partitioned hash join and the final
      per-segment (count, balance-cents) aggregate is vocabulary-bounded.

    Output: (c_mktsegment, n_custs, bal_cents)."""
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join
    from ontoray.stages.setops import except_distinct

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal",
                                    "c_mktsegment"])

    def cents_of(batch: pa.Table):
        return pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("c_acctbal"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())

    def stat_partial(batch: pa.Table) -> pa.Table:
        c = cents_of(batch)
        pos = pc.filter(c, pc.greater(c, pa.scalar(0, pa.int64())))
        return pa.table({
            "n": pa.array([len(pos)], pa.int64()),
            "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
        })

    st = pa.concat_tables([pa.table(b) for b in cust.map_batches(
        stat_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")])
    n_tot = pc.sum(st.column("n")).as_py() or 0
    s_tot = pc.sum(st.column("s")).as_py() or 0

    lo = datetime.datetime.fromisoformat(cutoff)
    recent = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"],
                             filter=(pc.field("o_orderdate") >= lo))
    idle = except_distinct(cust, recent, "c_custkey", "o_custkey")
    j = hash_join(idle, cust, "c_custkey", "c_custkey",
                  right_cols=["c_acctbal", "c_mktsegment"])

    def seg_partial(batch: pa.Table) -> pa.Table:
        c = cents_of(batch)
        keep = pc.greater(pc.multiply(c, pa.scalar(n_tot, pa.int64())),
                          pa.scalar(s_tot, pa.int64()))
        t = batch.filter(keep)
        ck = pc.filter(c, keep)
        return pa.table({
            "c_mktsegment": t.column("c_mktsegment"),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "cents": ck,
        })

    return hash_aggregate(
        j.map_batches(seg_partial, batch_format="pyarrow"),
        ["c_mktsegment"],
        partial_aggs=[("one", "sum"), ("cents", "sum")],
        aggs=[("one_sum", "sum"), ("cents_sum", "sum")],
        rename={"one_sum_sum": "n_custs", "cents_sum_sum": "bal_cents"},
        num_buckets=8)


SQL_CUSTS_ABOVE_AVG_IDLE = (
    "WITH c AS (SELECT c_custkey, c_mktsegment, "
    "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents FROM customer), "
    "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(cents) AS BIGINT) AS s FROM c WHERE cents > 0), "
    "idle AS (SELECT c_custkey FROM customer EXCEPT "
    "SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-07-01') "
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs, "
    "CAST(sum(cents) AS BIGINT) AS bal_cents "
    "FROM c JOIN idle USING (c_custkey), s "
    "WHERE cents * s.n > s.s GROUP BY 1")


def q_docs_span_dedup(sf_dir: str):
    """Corpus-wide keep-first exact 8-token-tile dedup summary
    (extras/dedup.span_dedup_keep_first — the Lee et al. substring-dedup
    winner assignment)."""
    import ray.data as rd
    from ontoray.extras.dedup import span_dedup_keep_first
    return span_dedup_keep_first(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def sql_docs_span_dedup() -> str:
    from ontoray.extras.dedup import sql_span_dedup_keep_first
    return sql_span_dedup_keep_first()


def q_embed_dim_stats(sf_dir: str):
    """Per-dimension embedding feature profile (extras/pca.dim_stats)."""
    import ray.data as rd
    from ontoray.extras.pca import dim_stats
    return dim_stats(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                     columns=["embedding"]))


def sql_embed_dim_stats() -> str:
    from ontoray.extras.pca import sql_dim_stats
    return sql_dim_stats()


# --- TPC-H Q2/Q7/Q11 shapes + incremental snapshot diff -------------------------

def q_parts_min_supplier(sf_dir: str, region: str = "AFRICA",
                         max_size: int = 10):
    """TPC-H Q2 shape (min-cost supplier per part): the ARGMIN-JOIN-BACK
    pattern — per-(part, supplier) offer prices fold via a two-phase min
    (the synthetic schema has no partsupp, so min lineitem price per pair
    stands in for supply cost); suppliers prune to the target region
    through the dimension-bounded supplier⋈nation⋈region broadcast; the
    per-part minimum is a second vocabulary-scale aggregate joined BACK
    onto the offers so ties surface every winning supplier (Q2 semantics);
    part attributes attach by partitioned hash join with the size filter.

    Output: (p_partkey, p_name, s_name, n_name, offer_cents)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch.column("l_partkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "c": pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(batch.column("l_extendedprice"), pa.float64()),
                pa.scalar(100.0)), pa.scalar(0.5))), pa.int64()),
        })

    offers = hash_aggregate(
        li.map_batches(cents, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        partial_aggs=[("c", "min")], aggs=[("c_min", "min")],
        rename={"c_min_min": "offer_cents"})

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = {r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region}
    nmap = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
            if r["n_regionkey"] in rk}
    smap = {r["s_suppkey"]: (r["s_name"], nmap[r["s_nationkey"]])
            for r in sup.to_pylist() if r["s_nationkey"] in nmap}
    smap_ref = ray.put(smap)

    def attach_sup(batch: pa.Table) -> pa.Table:
        m = ray.get(smap_ref)
        rows = batch.column("l_suppkey").to_pylist()
        keep = pa.array([s in m for s in rows])
        t = batch.filter(keep)
        kept = [m[s] for s in t.column("l_suppkey").to_pylist()]
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "offer_cents": t.column("offer_cents"),
            "s_name": pa.array([x[0] for x in kept], pa.string()),
            "n_name": pa.array([x[1] for x in kept], pa.string()),
        })

    ro = offers.map_batches(attach_sup, batch_format="pyarrow").materialize()
    mn = hash_aggregate(
        ro.select_columns(["l_partkey", "offer_cents"]), ["l_partkey"],
        partial_aggs=[("offer_cents", "min")],
        aggs=[("offer_cents_min", "min")],
        rename={"offer_cents_min_min": "mn"})
    j = hash_join(ro, mn, "l_partkey", "l_partkey", right_cols=["mn"])

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name", "p_size"],
                           filter=(pc.field("p_size") <= max_size))
    j2 = hash_join(j, part, "l_partkey", "p_partkey",
                   right_cols=["p_name", "p_size"])

    def out(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("offer_cents"),
                                  batch.column("mn")))
        return pa.table({
            "p_partkey": t.column("l_partkey"),
            "p_name": t.column("p_name"),
            "s_name": t.column("s_name"),
            "n_name": t.column("n_name"),
            "offer_cents": t.column("offer_cents"),
        })

    return j2.map_batches(out, batch_format="pyarrow")


def sql_parts_min_supplier(region: str = "AFRICA", max_size: int = 10) -> str:
    return f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS offer_cents
      FROM lineitem GROUP BY 1, 2
    ), rs AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey WHERE r_name = '{region}'
    ), ro AS (
      SELECT o.l_partkey, o.offer_cents, rs.s_name, rs.n_name
      FROM offers o JOIN rs ON rs.s_suppkey = o.l_suppkey
    ), mn AS (
      SELECT l_partkey, min(offer_cents) AS mn FROM ro GROUP BY 1
    )
    SELECT p_partkey, p_name, s_name, n_name, offer_cents
    FROM ro JOIN mn USING (l_partkey) JOIN part ON p_partkey = l_partkey
    WHERE offer_cents = mn AND p_size <= {max_size}
    """


def q_orders_nation_flows(sf_dir: str):
    """TPC-H Q7 shape (trade volume between nation pairs by year): the
    lineitem⋈orders partitioned spine carries the order date; the customer
    nation arrives by a second partitioned hash join; the supplier→nation
    and nation→name maps are dimension-bounded broadcasts (ray.put once,
    dict lookup per batch); the final (supp_nation × cust_nation × year)
    aggregate is vocabulary-bounded (25×25×years rows).

    Output: (supp_nation, cust_nation, o_year, n_items, revenue_cents)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    j = hash_join(li, orders, "l_orderkey", "o_orderkey",
                  right_cols=["o_custkey", "o_orderdate"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j2 = hash_join(j, cust, "o_custkey", "c_custkey",
                   right_cols=["c_nationkey"])

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nmap = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    smap = {r["s_suppkey"]: nmap[r["s_nationkey"]] for r in sup.to_pylist()}
    maps_ref = ray.put((smap, nmap))

    def partial(batch: pa.Table) -> pa.Table:
        sm, nm = ray.get(maps_ref)
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "supp_nation": pa.array(
                [sm[s] for s in batch.column("l_suppkey").to_pylist()],
                pa.string()),
            "cust_nation": pa.array(
                [nm[k] for k in batch.column("c_nationkey").to_pylist()],
                pa.string()),
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64()),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "c": c,
        })

    return hash_aggregate(
        j2.map_batches(partial, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "o_year"],
        partial_aggs=[("one", "sum"), ("c", "sum")],
        aggs=[("one_sum", "sum"), ("c_sum", "sum")],
        rename={"one_sum_sum": "n_items", "c_sum_sum": "revenue_cents"},
        num_buckets=16)


SQL_ORDERS_NATION_FLOWS = (
    "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
    "CAST(year(o_orderdate) AS BIGINT) AS o_year, "
    "CAST(count(*) AS BIGINT) AS n_items, "
    "CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) "
    "AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation sn ON sn.n_nationkey = s_nationkey "
    "JOIN nation cn ON cn.n_nationkey = c_nationkey "
    "GROUP BY 1, 2, 3")


def q_parts_value_share(sf_dir: str, denom: int = 2000):
    """TPC-H Q11 shape (important stock): per-part revenue vs a GLOBAL
    total — the global-scalar HAVING, restated exact: the per-part cents
    fold is one two-phase aggregate; the grand total folds from the SAME
    vocabulary-bounded group table (driver fold over part-vocabulary rows,
    never corpus rows); the share test is the integer cross-multiplication
    ``v * denom > total`` — no division, no float.

    Output: (l_partkey, value_cents) for parts above 1/denom of total."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch.column("l_partkey"),
            "c": pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(batch.column("l_extendedprice"), pa.float64()),
                pa.scalar(100.0)), pa.scalar(0.5))), pa.int64()),
        })

    pv = hash_aggregate(
        li.map_batches(cents, batch_format="pyarrow"), ["l_partkey"],
        partial_aggs=[("c", "sum")], aggs=[("c_sum", "sum")],
        rename={"c_sum_sum": "value_cents"}).materialize()

    tot = 0
    for b in pv.select_columns(["value_cents"]).iter_batches(
            batch_format="pyarrow"):
        tot += pc.sum(b.column("value_cents")).as_py() or 0

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(
            pc.multiply(batch.column("value_cents"),
                        pa.scalar(denom, pa.int64())),
            pa.scalar(tot, pa.int64())))

    return pv.map_batches(keep, batch_format="pyarrow")


SQL_PARTS_VALUE_SHARE = (
    "WITH pv AS (SELECT l_partkey, "
    "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS value_cents FROM lineitem GROUP BY 1), "
    "t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tot FROM pv) "
    "SELECT l_partkey, value_cents FROM pv, t "
    "WHERE value_cents * 2000 > tot")


def q_docs_snapshot_diff(sf_dir: str):
    """Incremental-ingest snapshot diff — the op a 100 TB pipeline runs
    between crawl snapshots to process only what moved: two snapshots
    derive deterministically from the corpus (old = doc_id % 10 <> 0,
    new = doc_id % 10 <> 1, with new-side text revised where doc_id % 7 =
    3), each side carries only (doc_id, md5-int60(text)) METADATA rows,
    and ONE partitioned full-outer hash join classifies every doc as
    added / removed / changed (unchanged rows drop — the point of the op:
    downstream stages see only the delta).

    Output: (doc_id, status)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.fastmd5 import md5_int60
    from ontoray.stages.joins import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def side(new: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            txts = batch.column("text").to_pylist()
            out_ids, msgs = [], []
            for i, t in zip(ids, txts):
                if new and i % 10 == 1:
                    continue
                if not new and i % 10 == 0:
                    continue
                t = t or ""
                if new and i % 7 == 3:
                    t = t + " rev2"
                out_ids.append(i)
                msgs.append(t.encode())
            col = "h_new" if new else "h_old"
            return pa.table({
                "doc_id": pa.array(out_ids, pa.int64()),
                col: pa.array(md5_int60(msgs), pa.int64()),
            })
        return f

    old = docs.map_batches(side(False), batch_format="pyarrow")
    new = docs.map_batches(side(True), batch_format="pyarrow")
    j = hash_join(old, new, "doc_id", "doc_id", how="full_outer",
                  right_cols=["h_new"])

    def classify(batch: pa.Table) -> pa.Table:
        ho, hn = batch.column("h_old"), batch.column("h_new")
        added = pc.is_null(ho)
        removed = pc.is_null(hn)
        changed = pc.and_kleene(
            pc.and_kleene(pc.is_valid(ho), pc.is_valid(hn)),
            pc.invert(pc.equal(ho, hn)))
        status = pc.if_else(added, pa.scalar("added"),
                            pc.if_else(removed, pa.scalar("removed"),
                                       pa.scalar("changed")))
        keep = pc.or_kleene(pc.or_kleene(added, removed),
                            pc.fill_null(changed, False))
        t = pa.table({"doc_id": batch.column("doc_id"), "status": status})
        return t.filter(keep)

    return j.map_batches(classify, batch_format="pyarrow")


SQL_DOCS_SNAPSHOT_DIFF = (
    "WITH old AS (SELECT doc_id, "
    "('0x' || substr(md5(coalesce(text, '')), 1, 15))::BIGINT AS h "
    "FROM documents WHERE doc_id % 10 <> 0), "
    "new AS (SELECT doc_id, ('0x' || substr(md5(CASE WHEN doc_id % 7 = 3 "
    "THEN coalesce(text, '') || ' rev2' ELSE coalesce(text, '') END), "
    "1, 15))::BIGINT AS h FROM documents WHERE doc_id % 10 <> 1) "
    "SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, "
    "CASE WHEN o.doc_id IS NULL THEN 'added' "
    "WHEN n.doc_id IS NULL THEN 'removed' ELSE 'changed' END AS status "
    "FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id "
    "WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h")


def q_supplier_wait_blame(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders with >= 2 distinct suppliers where EXACTLY ONE supplier shipped
    late, count blamed orders per supplier — the EXISTS/NOT-EXISTS double
    correlated subquery folded into per-key aggregates:

    * lateness (ship > orderdate + 60d — the commitdate surrogate shared
      with q_orders_late_ship) folds into a distinct (order, supplier,
      max-late) pair table via ONE two-phase aggregate, so the corpus
      exchanges one row per pair;
    * the per-order (n_suppliers, n_late, blamed) fold exploits nl = 1:
      sum(suppkey·late) IS the unique late supplier's key — no second pass;
    * supplier names attach from the dimension-bounded broadcast map.

    Output: (s_name, numwait)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"],
                             filter=(pc.field("o_orderstatus") == "F"))
    j = hash_join(li, orders, "l_orderkey", "o_orderkey",
                  right_cols=["o_orderdate"])

    def late_of(batch: pa.Table) -> pa.Table:
        ship = pc.cast(batch.column("l_shipdate"), pa.int64())
        od = pc.cast(batch.column("o_orderdate"), pa.int64())
        late = pc.cast(pc.greater(ship, pc.add(
            od, pa.scalar(60 * 86_400_000_000, pa.int64()))), pa.int64())
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_suppkey": batch.column("l_suppkey"),
                         "late": late})

    pairs = hash_aggregate(
        j.map_batches(late_of, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"],
        partial_aggs=[("late", "max")], aggs=[("late_max", "max")],
        rename={"late_max_max": "late"})

    def order_partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "late": batch.column("late"),
            "sk_late": pc.multiply(batch.column("l_suppkey"),
                                   batch.column("late")),
        })

    per_order = hash_aggregate(
        pairs.map_batches(order_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        partial_aggs=[("one", "sum"), ("late", "sum"), ("sk_late", "sum")],
        aggs=[("one_sum", "sum"), ("late_sum", "sum"),
              ("sk_late_sum", "sum")],
        rename={"one_sum_sum": "ns", "late_sum_sum": "nl",
                "sk_late_sum_sum": "blamed"})

    smap = {r["s_suppkey"]: r["s_name"] for r in pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"]).to_pylist()}
    smap_ref = ray.put(smap)

    def blame(batch: pa.Table) -> pa.Table:
        m = ray.get(smap_ref)
        keep = pc.and_(pc.greater_equal(batch.column("ns"),
                                        pa.scalar(2, pa.int64())),
                       pc.equal(batch.column("nl"), pa.scalar(1, pa.int64())))
        t = batch.filter(keep)
        return pa.table({
            "s_name": pa.array([m[s] for s in
                                t.column("blamed").to_pylist()], pa.string()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    return hash_aggregate(
        per_order.map_batches(blame, batch_format="pyarrow"), ["s_name"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "numwait"}, num_buckets=8)


SQL_SUPPLIER_WAIT_BLAME = (
    "WITH f AS (SELECT l_orderkey, l_suppkey, "
    "max(CASE WHEN epoch_us(l_shipdate) > epoch_us(o_orderdate) "
    "+ 5184000000000 THEN 1 ELSE 0 END) AS late "
    "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
    "WHERE o_orderstatus = 'F' GROUP BY 1, 2), "
    "o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS ns, "
    "CAST(sum(late) AS BIGINT) AS nl, "
    "CAST(sum(l_suppkey * late) AS BIGINT) AS blamed FROM f GROUP BY 1) "
    "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait "
    "FROM o JOIN supplier ON s_suppkey = blamed "
    "WHERE ns >= 2 AND nl = 1 GROUP BY 1")


def q_embed_whiten(sf_dir: str):
    """Diagonal whitening of the embeddings table — unpivoted per-coordinate
    z-scores (extras/pca.whiten)."""
    import ray.data as rd
    from ontoray.extras.pca import whiten
    return whiten(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                  columns=["vec_id", "embedding"]))


def sql_embed_whiten() -> str:
    from ontoray.extras.pca import sql_whiten
    return sql_whiten()


def q_kg_bfs_from(triples_dedup_ds, n_seeds: int = 4, max_hops: int = 4):
    """Multi-source BFS hop distances from md5-chosen probe concepts
    (stages/analytics.multi_source_bfs)."""
    from ontoray.stages.analytics import multi_source_bfs
    return multi_source_bfs(triples_dedup_ds, n_seeds=n_seeds,
                            max_hops=max_hops)


SQL_KG_BFS = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm), "
    "und AS (SELECT src AS a, dst AS b FROM trip WHERE src <> dst "
    "UNION SELECT dst, src FROM trip WHERE src <> dst), "
    "unodes AS (SELECT DISTINCT a AS x FROM und), "
    "seeds AS (SELECT x FROM unodes ORDER BY md5(x || ':bfs'), x LIMIT 4), "
    "walk AS (SELECT x AS seed, x AS name, 0 AS dist FROM seeds "
    "UNION SELECT w.seed, u.b, w.dist + 1 FROM walk w "
    "JOIN und u ON u.a = w.name WHERE w.dist < 4) "
    "SELECT seed, name, CAST(min(dist) AS BIGINT) AS dist "
    "FROM walk GROUP BY 1, 2")


# --- cohort LTV / DAU-MAU / KG confidence calibration ---------------------------

def q_orders_cohort_ltv(sf_dir: str):
    """Customer-cohort lifetime-value triangle — the product-analytics
    cohort table: cohort = year of the customer's FIRST order (per-customer
    two-phase min over the fact table, never a sorted window), joined back
    onto every order by partitioned hash join, folded to the
    vocabulary-bounded (cohort_year × order_year) grid.

    Output: (cohort_year, order_year, n_orders, revenue_cents)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])

    def date_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "d": pc.cast(batch.column("o_orderdate"), pa.int64()),
        })

    first = hash_aggregate(
        orders.map_batches(date_us, batch_format="pyarrow"), ["o_custkey"],
        partial_aggs=[("d", "min")], aggs=[("d_min", "min")],
        rename={"d_min_min": "first_us"})

    def cohort_of(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "cohort_year": pc.cast(pc.year(pc.cast(
                batch.column("first_us"), pa.timestamp("us"))), pa.int64()),
        })

    cohorts = first.map_batches(cohort_of, batch_format="pyarrow")
    j = hash_join(orders, cohorts, "o_custkey", "o_custkey",
                  right_cols=["cohort_year"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_year": batch.column("cohort_year"),
            "order_year": pc.cast(pc.year(batch.column("o_orderdate")),
                                  pa.int64()),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "c": pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(batch.column("o_totalprice"), pa.float64()),
                pa.scalar(100.0)), pa.scalar(0.5))), pa.int64()),
        })

    return hash_aggregate(
        j.map_batches(partial, batch_format="pyarrow"),
        ["cohort_year", "order_year"],
        partial_aggs=[("one", "sum"), ("c", "sum")],
        aggs=[("one_sum", "sum"), ("c_sum", "sum")],
        rename={"one_sum_sum": "n_orders", "c_sum_sum": "revenue_cents"},
        num_buckets=8)


SQL_ORDERS_COHORT_LTV = (
    "WITH first AS (SELECT o_custkey, min(o_orderdate) AS fd "
    "FROM orders GROUP BY 1) "
    "SELECT CAST(year(fd) AS BIGINT) AS cohort_year, "
    "CAST(year(o_orderdate) AS BIGINT) AS order_year, "
    "CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS revenue_cents "
    "FROM orders JOIN first USING (o_custkey) GROUP BY 1, 2")


def q_events_dau_mau(sf_dir: str):
    """DAU/MAU stickiness per month — exact distinct actives at two
    granularities: the (user, day) and (user, month) universes each
    collapse to per-batch distincts before ONE vocabulary-scale exchange
    (the setops shape), daily counts fold to per-month (Σ dau, n_days),
    and stickiness is the exact integer micro-ratio
    1e6·Σdau // (n_days·mau) — the average-DAU/MAU definition with the
    division LAST, so both engines divide identical integers.

    Output: (month, sum_dau, n_days, mau, stickiness_micro)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def keys(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        y = pc.year(batch.column("ts"))
        m = pc.month(batch.column("ts"))
        month = pc.add(pc.multiply(pc.cast(y, pa.int64()),
                                   pa.scalar(100, pa.int64())),
                       pc.cast(m, pa.int64()))
        return pa.table({"user_id": batch.column("user_id"),
                         "day": day, "month": month})

    k = ev.map_batches(keys, batch_format="pyarrow").materialize()

    ud = hash_aggregate(
        k.select_columns(["user_id", "day", "month"]),
        ["user_id", "day"],
        partial_aggs=[("month", "max")], aggs=[("month_max", "max")],
        rename={"month_max_max": "month"})
    dau = hash_aggregate(
        ud.map_batches(
            lambda b: pa.table({
                "day": b.column("day"), "month": b.column("month"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["day"],
        partial_aggs=[("one", "sum"), ("month", "max")],
        aggs=[("one_sum", "sum"), ("month_max", "max")],
        rename={"one_sum_sum": "dau", "month_max_max": "month"},
        num_buckets=8)
    per_month = hash_aggregate(
        dau.map_batches(
            lambda b: pa.table({
                "month": b.column("month"), "dau": b.column("dau"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["month"],
        partial_aggs=[("dau", "sum"), ("one", "sum")],
        aggs=[("dau_sum", "sum"), ("one_sum", "sum")],
        rename={"dau_sum_sum": "sum_dau", "one_sum_sum": "n_days"},
        num_buckets=4)

    um = hash_aggregate(
        k.select_columns(["user_id", "month"]), ["user_id", "month"],
        partial_aggs=[("user_id", "count")], aggs=[("user_id_count", "sum")],
        rename={"user_id_count_sum": "__n"})
    mau = hash_aggregate(
        um.map_batches(
            lambda b: pa.table({
                "month": b.column("month"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["month"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "mau"}, num_buckets=4)

    from ontoray.stages.joins import hash_join
    j = hash_join(per_month, mau, "month", "month", right_cols=["mau"])

    def final(batch: pa.Table) -> pa.Table:
        sd = batch.column("sum_dau").to_numpy(zero_copy_only=False)
        nd = batch.column("n_days").to_numpy(zero_copy_only=False)
        ma = batch.column("mau").to_numpy(zero_copy_only=False)
        stick = (1_000_000 * sd) // (nd * ma)
        return pa.table({
            "month": batch.column("month"),
            "sum_dau": batch.column("sum_dau"),
            "n_days": batch.column("n_days"),
            "mau": batch.column("mau"),
            "stickiness_micro": pa.array(stick, pa.int64()),
        })

    return j.map_batches(final, batch_format="pyarrow")


SQL_EVENTS_DAU_MAU = (
    "WITH k AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, "
    "CAST(year(ts) AS BIGINT) * 100 + CAST(month(ts) AS BIGINT) AS month "
    "FROM events), "
    "ud AS (SELECT DISTINCT user_id, day, month FROM k), "
    "dau AS (SELECT day, max(month) AS month, "
    "CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1), "
    "pm AS (SELECT month, CAST(sum(dau) AS BIGINT) AS sum_dau, "
    "CAST(count(*) AS BIGINT) AS n_days FROM dau GROUP BY 1), "
    "mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau "
    "FROM k GROUP BY 1) "
    "SELECT month, sum_dau, n_days, mau, "
    "CAST(1000000 * sum_dau // (n_days * mau) AS BIGINT) "
    "AS stickiness_micro "
    "FROM pm JOIN mau USING (month)")


def q_kg_conf_calibration_from(triples_dedup_ds):
    """Edge-confidence calibration profile of the extracted triple table:
    per confidence decile bucket (floor(conf·10) over the round-6 conf —
    the kg_triples_norm parity contract), how many deduped triples land
    there and how well-supported they are (exact integer micro mean of
    n_obs).  The reliability-diagram input for tuning extraction pattern
    confidences.  One vocabulary-bounded aggregate (≤ 11 buckets).

    Output: (conf_bucket, n_triples, sum_obs, avg_obs_micro)."""
    import numpy as np
    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        conf = pc.round(pc.cast(batch.column("conf"), pa.float64()), 6)
        bucket = pc.cast(pc.floor(pc.multiply(
            conf, pa.scalar(10.0))), pa.int64())
        return pa.table({
            "conf_bucket": bucket,
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_obs": pc.cast(batch.column("n_obs"), pa.int64()),
        })

    agg = hash_aggregate(
        triples_dedup_ds.map_batches(partial, batch_format="pyarrow"),
        ["conf_bucket"],
        partial_aggs=[("one", "sum"), ("n_obs", "sum")],
        aggs=[("one_sum", "sum"), ("n_obs_sum", "sum")],
        rename={"one_sum_sum": "n_triples", "n_obs_sum_sum": "sum_obs"},
        num_buckets=4)

    def final(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "avg_obs_micro",
            pa.array((1_000_000
                      * batch.column("sum_obs").to_numpy(zero_copy_only=False))
                     // batch.column("n_triples").to_numpy(zero_copy_only=False),
                     pa.int64()))

    return agg.map_batches(final, batch_format="pyarrow")


SQL_KG_CONF_CALIBRATION = (
    f"{_sql_triples_norm_ctes()} "
    "SELECT CAST(floor(conf * 10) AS BIGINT) AS conf_bucket, "
    "CAST(count(*) AS BIGINT) AS n_triples, "
    "CAST(sum(n_obs) AS BIGINT) AS sum_obs, "
    "CAST(1000000 * sum(n_obs) // count(*) AS BIGINT) AS avg_obs_micro "
    "FROM tnorm GROUP BY 1")


# --- TPC-H Q4 / Q5 / Q8 / Q13 shapes ---------------------------------------


def q_orders_priority_exists(sf_dir: str, slack_days: int = 30):
    """TPC-H Q4 shape (order-priority checking): count orders per priority
    class that have AT LEAST ONE slow lineitem (shipped > ``slack_days``
    after the order date — this schema has no commit/receipt dates, so
    ship-vs-order lateness stands in for commit-vs-receipt).

    Scale shape: the EXISTS collapses to a distinct over (orderkey,
    priority) — orderkey→priority is functional, so ONE keyed exchange
    dedups the slow evidence, then the survivor rows fold to the
    5-priority vocabulary grid.  Lineitem never carries text; both fact
    reads are column-pruned."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    j = hash_join(li, orders, "l_orderkey", "o_orderkey",
                  right_cols=["o_orderdate", "o_orderpriority"])

    def slow(batch: pa.Table) -> pa.Table:
        l_day = pc.divide(pc.cast(batch.column("l_shipdate"), pa.int64()),
                          pa.scalar(86_400_000_000, pa.int64()))
        o_day = pc.divide(pc.cast(batch.column("o_orderdate"), pa.int64()),
                          pa.scalar(86_400_000_000, pa.int64()))
        keep = pc.greater(l_day, pc.add(o_day, pa.scalar(slack_days,
                                                         pa.int64())))
        out = batch.filter(keep)
        return pa.table({"l_orderkey": out.column("l_orderkey"),
                         "o_orderpriority": out.column("o_orderpriority")})

    distinct = hash_aggregate(
        j.map_batches(slow, batch_format="pyarrow"),
        ["l_orderkey", "o_orderpriority"],
        partial_aggs=[("l_orderkey", "count")],
        aggs=[("l_orderkey_count", "sum")],
        rename={"l_orderkey_count_sum": "__n"})

    return hash_aggregate(
        distinct.map_batches(
            lambda b: pa.table({
                "o_orderpriority": b.column("o_orderpriority"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["o_orderpriority"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_orders"}, num_buckets=4)


SQL_ORDERS_PRIORITY_EXISTS = (
    "WITH slow AS (SELECT DISTINCT l_orderkey, o_orderpriority "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE epoch_us(l_shipdate) // 86400000000 "
    "> epoch_us(o_orderdate) // 86400000000 + 30) "
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
    "FROM slow GROUP BY 1")


def q_orders_local_revenue(sf_dir: str, region: str = "ASIA",
                           year: int = 1997):
    """TPC-H Q5 shape (local supplier volume): revenue per nation from
    orders placed in ``year`` by customers of a region, counting only
    lineitems whose SUPPLIER sits in the customer's own nation.

    Scale shape: the year predicate is pushed into the orders read; the
    three corpus-proportional joins (orders⋈customer, lineitem⋈orders,
    lineitem⋈supplier) are partitioned hash joins; nation/region are
    vocabulary tables joined AFTER the facts collapse — the
    same-nation equality filter runs vectorized per batch before the
    final 25-key aggregate."""
    import datetime

    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    lo = datetime.datetime(year, 1, 1)
    hi = datetime.datetime(year + 1, 1, 1)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pc.field("o_orderdate") >= lo)
                & (pc.field("o_orderdate") < hi)))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])

    o2 = hash_join(orders, cust, "o_custkey", "c_custkey",
                   right_cols=["c_nationkey"])
    j = hash_join(li, o2.select_columns(["o_orderkey", "c_nationkey"]),
                  "l_orderkey", "o_orderkey", right_cols=["c_nationkey"])
    j = hash_join(j, supp, "l_suppkey", "s_suppkey",
                  right_cols=["s_nationkey"])

    def local_rev(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("c_nationkey"),
                        batch.column("s_nationkey"))
        out = batch.filter(keep)
        rev = pc.multiply(out.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), out.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"c_nationkey": out.column("c_nationkey"),
                         "rev_c": rev_c})

    per_nation = hash_aggregate(
        j.map_batches(local_rev, batch_format="pyarrow"), ["c_nationkey"],
        partial_aggs=[("rev_c", "sum")], aggs=[("rev_c_sum", "sum")],
        rename={"rev_c_sum_sum": "revenue_cents"}, num_buckets=4)

    reg = rd.read_parquet(f"{sf_dir}/region.parquet",
                          filter=(pc.field("r_name") == region),
                          columns=["r_regionkey"])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name", "n_regionkey"])
    nat_in = hash_join(nat, reg, "n_regionkey", "r_regionkey",
                       how="left_semi", num_partitions=1)
    out = hash_join(per_nation, nat_in, "c_nationkey", "n_nationkey",
                    right_cols=["n_name"], num_partitions=4)
    return out.select_columns(["n_name", "revenue_cents"])


SQL_ORDERS_LOCAL_REVENUE = (
    "SELECT n_name, CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) "
    "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "AND c_nationkey = s_nationkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1997-01-01' "
    "AND o_orderdate < DATE '1998-01-01' GROUP BY 1")


def q_nation_market_share(sf_dir: str, region: str = "ASIA",
                          nation: str = "NATION_7",
                          p_type: str = "PROMO"):
    """TPC-H Q8 shape (national market share): per order year, the share
    of ``p_type`` revenue sold into ``region`` that was supplied by
    ``nation``.  Share is the exact integer micro-ratio with the division
    LAST (1e6·num // den) so both engines divide identical int64 cents.

    Scale shape: the part filter semi-joins lineitem FIRST (biggest
    selectivity cut before any wide join); supplier-nation membership is
    resolved by joining the 25-row nation table onto the already-collapsed
    fact rows; num/den fold in one per-year aggregate (conditional sum —
    no second pass)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           filter=(pc.field("p_type") == p_type),
                           columns=["p_partkey"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    li = hash_join(li, part, "l_partkey", "p_partkey", how="left_semi")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    reg = rd.read_parquet(f"{sf_dir}/region.parquet",
                          filter=(pc.field("r_name") == region),
                          columns=["r_regionkey"])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name", "n_regionkey"])
    nat_in = hash_join(nat, reg, "n_regionkey", "r_regionkey",
                       how="left_semi", num_partitions=1)
    cust_in = hash_join(cust, nat_in.select_columns(["n_nationkey"]),
                        "c_nationkey", "n_nationkey", how="left_semi")
    o2 = hash_join(orders, cust_in.select_columns(["c_custkey"]),
                   "o_custkey", "c_custkey", how="left_semi")

    j = hash_join(li, o2.select_columns(["o_orderkey", "o_orderdate"]),
                  "l_orderkey", "o_orderkey", right_cols=["o_orderdate"])
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    j = hash_join(j, supp, "l_suppkey", "s_suppkey",
                  right_cols=["s_nationkey"])
    j = hash_join(j, nat.select_columns(["n_nationkey", "n_name"]),
                  "s_nationkey", "n_nationkey", right_cols=["n_name"],
                  num_partitions=4)

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        is_nat = pc.cast(pc.equal(batch.column("n_name"),
                                  pa.scalar(nation)), pa.int64())
        return pa.table({
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64()),
            "num_c": pc.multiply(rev_c, is_nat),
            "den_c": rev_c,
        })

    agg = hash_aggregate(
        j.map_batches(partial, batch_format="pyarrow"), ["o_year"],
        partial_aggs=[("num_c", "sum"), ("den_c", "sum")],
        aggs=[("num_c_sum", "sum"), ("den_c_sum", "sum")],
        rename={"num_c_sum_sum": "num_c", "den_c_sum_sum": "den_c"},
        num_buckets=4)

    def final(batch: pa.Table) -> pa.Table:
        num = batch.column("num_c").to_numpy(zero_copy_only=False)
        den = batch.column("den_c").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "share_micro", pa.array((1_000_000 * num) // den, pa.int64()))

    return agg.map_batches(final, batch_format="pyarrow")


SQL_NATION_MARKET_SHARE = (
    "WITH f AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
    "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) "
    "AS rev_c, "
    "CASE WHEN sn.n_name = 'NATION_7' THEN 1 ELSE 0 END AS is_nat "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation cn ON c_nationkey = cn.n_nationkey "
    "JOIN region ON cn.n_regionkey = r_regionkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation sn ON s_nationkey = sn.n_nationkey "
    "WHERE p_type = 'PROMO' AND r_name = 'ASIA') "
    "SELECT o_year, CAST(sum(rev_c * is_nat) AS BIGINT) AS num_c, "
    "CAST(sum(rev_c) AS BIGINT) AS den_c, "
    "CAST(1000000 * sum(rev_c * is_nat) // sum(rev_c) AS BIGINT) "
    "AS share_micro FROM f GROUP BY 1")


def q_custs_order_histogram(sf_dir: str):
    """TPC-H Q13 shape (customer distribution): histogram of customers by
    their order count, INCLUDING zero-order customers (the left join is
    the point of the query).

    Scale shape: orders fold per-custkey first (two-phase count), the
    customer spine LEFT-joins that collapsed table (one partitioned
    exchange of key+count only), nulls fill to 0 vectorized, and the
    histogram is a count-bounded aggregate."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    per_cust = hash_aggregate(
        orders, ["o_custkey"],
        partial_aggs=[("o_custkey", "count")],
        aggs=[("o_custkey_count", "sum")],
        rename={"o_custkey_count_sum": "n_orders"})

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    j = hash_join(cust, per_cust, "c_custkey", "o_custkey",
                  how="left", right_cols=["n_orders"])

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(batch.column("n_orders"), pa.int64()),
                         pa.scalar(0, pa.int64()))
        return pa.table({
            "n_orders": n,
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    return hash_aggregate(
        j.map_batches(partial, batch_format="pyarrow"), ["n_orders"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_custs"}, num_buckets=4)


SQL_CUSTS_ORDER_HISTOGRAM = (
    "WITH c AS (SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) "
    "AS n_orders FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
    "GROUP BY 1) "
    "SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs FROM c GROUP BY 1")


# --- TPC-H Q15 / Q17, market-basket lift, langid confusion ------------------


def q_supplier_top_revenue(sf_dir: str, year: int = 1997):
    """TPC-H Q15 shape (top supplier): per-supplier revenue over one
    quarter, returning the supplier(s) achieving the GLOBAL maximum —
    tie-preserving (the view + max subquery form, not LIMIT 1).

    Scale shape: revenue folds per-suppkey first (two-phase, metadata-only
    exchange); the collapsed per-supplier table is materialized once (it is
    supplier-cardinality, orders of magnitude below the fact table), the
    global max is a driver SCALAR (O(1)), and the equality filter + name
    join run over the collapsed table only."""
    import datetime

    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    lo = datetime.datetime(year, 1, 1)
    hi = datetime.datetime(year, 4, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=((pc.field("l_shipdate") >= lo)
                & (pc.field("l_shipdate") < hi)))

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"l_suppkey": batch.column("l_suppkey"),
                         "rev_c": rev_c})

    per_supp = hash_aggregate(
        li.map_batches(partial, batch_format="pyarrow"), ["l_suppkey"],
        partial_aggs=[("rev_c", "sum")], aggs=[("rev_c_sum", "sum")],
        rename={"rev_c_sum_sum": "revenue_cents"}).materialize()

    best = per_supp.max("revenue_cents")
    top = per_supp.filter(expr=f"revenue_cents == {best}")
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    out = hash_join(top, supp, "l_suppkey", "s_suppkey",
                    right_cols=["s_name"], num_partitions=1)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch.column("l_suppkey"),
                         "s_name": batch.column("s_name"),
                         "revenue_cents": batch.column("revenue_cents")})

    return out.map_batches(shape, batch_format="pyarrow")


SQL_SUPPLIER_TOP_REVENUE = (
    "WITH r AS (SELECT l_suppkey, CAST(sum(CAST(floor(l_extendedprice "
    "* (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS revenue_cents FROM lineitem "
    "WHERE l_shipdate >= DATE '1997-01-01' "
    "AND l_shipdate < DATE '1997-04-01' GROUP BY 1) "
    "SELECT l_suppkey AS s_suppkey, s_name, revenue_cents "
    "FROM r JOIN supplier ON l_suppkey = supplier.s_suppkey "
    "WHERE revenue_cents = (SELECT max(revenue_cents) FROM r)")


def q_lineitem_small_qty(sf_dir: str, brand: str = "Brand#1"):
    """TPC-H Q17 shape (small-quantity-order revenue): total revenue and
    line count of ``brand`` lineitems whose quantity is below 20% of the
    part's average quantity.  The correlated AVG comparison is exact: with
    quantities scaled to int64 hundredths, ``q < 0.2·avg`` becomes the
    cross-multiplication ``5·q·n < Σq`` — both engines compare identical
    integers, no float division anywhere.

    Scale shape: brand semi-join prunes lineitem first; per-part (Σq, n)
    folds two-phase; the join back is partitioned on partkey; the final
    global fold always emits exactly one row (zero-match safe)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           filter=(pc.field("p_brand") == brand),
                           columns=["p_partkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])
    li = hash_join(li, part, "l_partkey", "p_partkey", how="left_semi")

    def scale(batch: pa.Table) -> pa.Table:
        q_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("l_quantity"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        p_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"l_partkey": batch.column("l_partkey"),
                         "q_c": q_c, "p_c": p_c,
                         "one": pa.array(np.ones(batch.num_rows,
                                                 dtype=np.int64))})

    scaled = li.map_batches(scale, batch_format="pyarrow")
    st = hash_aggregate(
        scaled.select_columns(["l_partkey", "q_c", "one"]), ["l_partkey"],
        partial_aggs=[("q_c", "sum"), ("one", "sum")],
        aggs=[("q_c_sum", "sum"), ("one_sum", "sum")],
        rename={"q_c_sum_sum": "sum_qc", "one_sum_sum": "n"})
    j = hash_join(scaled, st, "l_partkey", "l_partkey",
                  right_cols=["sum_qc", "n"])

    def small(batch: pa.Table) -> pa.Table:
        q = batch.column("q_c").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        s = batch.column("sum_qc").to_numpy(zero_copy_only=False)
        p = batch.column("p_c").to_numpy(zero_copy_only=False)
        keep = (5 * q * n) < s
        return pa.table({
            "n_lines": pa.array([np.int64(keep.sum())], pa.int64()),
            "revenue_cents": pa.array([np.int64(p[keep].sum())],
                                      pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        nl = batch.column("n_lines").to_numpy(zero_copy_only=False)
        rc = batch.column("revenue_cents").to_numpy(zero_copy_only=False)
        return pa.table({"n_lines": pa.array([np.int64(nl.sum())], pa.int64()),
                         "revenue_cents": pa.array([np.int64(rc.sum())],
                                                   pa.int64())})

    return (j.map_batches(small, batch_format="pyarrow")
             .repartition(1).map_batches(fold, batch_format="pyarrow"))


SQL_LINEITEM_SMALL_QTY = (
    "WITH pq AS (SELECT l_partkey, "
    "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q_c, "
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p_c "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_brand = 'Brand#1'), "
    "st AS (SELECT l_partkey, sum(q_c) AS sum_qc, count(*) AS n "
    "FROM pq GROUP BY 1) "
    "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
    "CAST(coalesce(sum(p_c), 0) AS BIGINT) AS revenue_cents "
    "FROM pq JOIN st USING (l_partkey) WHERE 5 * q_c * n < sum_qc")


def q_basket_brand_lift(sf_dir: str, num_buckets: int = 64):
    """Market-basket brand-pair lift over orders: for every unordered pair
    of part brands co-purchased in one order, the observed co-order count
    vs the independence expectation — lift as the exact integer micro-ratio
    1e6·n_pair·n_orders // (n_a·n_b), division LAST.

    Scale shape: lineitem joins the brand in, orders bucket by orderkey
    (co-locating each basket WITHOUT a per-order group explosion — one
    bounded-fan exchange), pair expansion is per-bucket with per-bucket
    partial counts (brand vocabulary is fixed, so partials are
    vocab²-bounded), marginals reuse the same distinct table, and the total
    order count is the only driver scalar."""
    from itertools import combinations

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    ob = hash_join(li, part, "l_partkey", "p_partkey",
                   right_cols=["p_brand"])

    distinct = hash_aggregate(
        ob.select_columns(["l_orderkey", "p_brand"]),
        ["l_orderkey", "p_brand"],
        partial_aggs=[("l_orderkey", "count")],
        aggs=[("l_orderkey_count", "sum")],
        rename={"l_orderkey_count_sum": "__n"}).materialize()

    def bucketize(batch: pa.Table) -> pa.Table:
        g = pc.cast(pc.bit_wise_and(batch.column("l_orderkey"),
                                    pa.scalar(num_buckets - 1, pa.int64())),
                    pa.int64())
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "p_brand": batch.column("p_brand"), "__g": g})

    def pairs(group: pa.Table) -> pa.Table:
        import collections
        by_order: dict = collections.defaultdict(list)
        for okey, brand in zip(
                group.column("l_orderkey").to_pylist(),
                group.column("p_brand").to_pylist()):
            by_order[okey].append(brand)
        counts: dict = collections.Counter()
        for brands in by_order.values():
            for a, b in combinations(sorted(brands), 2):
                counts[(a, b)] += 1
        if not counts:
            return pa.table({"brand_a": pa.array([], pa.string()),
                             "brand_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ks = sorted(counts)
        return pa.table({
            "brand_a": pa.array([k[0] for k in ks], pa.string()),
            "brand_b": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64())})

    pair_partials = (distinct
                     .map_batches(bucketize, batch_format="pyarrow")
                     .groupby("__g").map_groups(pairs,
                                                batch_format="pyarrow"))
    pair_counts = hash_aggregate(
        pair_partials, ["brand_a", "brand_b"],
        partial_aggs=[("n", "sum")], aggs=[("n_sum", "sum")],
        rename={"n_sum_sum": "n_pair"}, num_buckets=4)

    marg = hash_aggregate(
        distinct.map_batches(
            lambda b: pa.table({
                "p_brand": b.column("p_brand"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["p_brand"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_brand"}, num_buckets=4).materialize()

    n_orders = hash_aggregate(
        distinct.map_batches(
            lambda b: pa.table({"l_orderkey": b.column("l_orderkey")}),
            batch_format="pyarrow"),
        ["l_orderkey"],
        partial_aggs=[("l_orderkey", "count")],
        aggs=[("l_orderkey_count", "sum")],
        rename={"l_orderkey_count_sum": "__n"}).count()

    j = hash_join(pair_counts, marg, "brand_a", "p_brand",
                  right_cols=["n_brand"], num_partitions=4)
    j = j.map_batches(lambda b: b.rename_columns(
        [c if c != "n_brand" else "n_a" for c in b.column_names]),
        batch_format="pyarrow")
    j = hash_join(j, marg, "brand_b", "p_brand",
                  right_cols=["n_brand"], num_partitions=4)

    def final(batch: pa.Table) -> pa.Table:
        np_ = batch.column("n_pair").to_numpy(zero_copy_only=False)
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_brand").to_numpy(zero_copy_only=False)
        lift = (1_000_000 * np_ * int(n_orders)) // (na * nb)
        return pa.table({
            "brand_a": batch.column("brand_a"),
            "brand_b": batch.column("brand_b"),
            "n_pair": batch.column("n_pair"),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "lift_micro": pa.array(lift, pa.int64())})

    return j.map_batches(final, batch_format="pyarrow")


SQL_BASKET_BRAND_LIFT = (
    "WITH ob AS (SELECT DISTINCT l_orderkey, p_brand "
    "FROM lineitem JOIN part ON l_partkey = p_partkey), "
    "pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, "
    "CAST(count(*) AS BIGINT) AS n_pair FROM ob a JOIN ob b "
    "ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand GROUP BY 1, 2), "
    "marg AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n FROM ob "
    "GROUP BY 1), "
    "tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders "
    "FROM ob) "
    "SELECT brand_a, brand_b, n_pair, ma.n AS n_a, mb.n AS n_b, "
    "CAST(1000000 * n_pair * n_orders // (ma.n * mb.n) AS BIGINT) "
    "AS lift_micro "
    "FROM pairs JOIN marg ma ON brand_a = ma.p_brand "
    "JOIN marg mb ON brand_b = mb.p_brand CROSS JOIN tot")


def q_docs_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: declared ``lang`` column vs the
    stopword-profile detector's prediction (the text_langid contract),
    counted per (declared, predicted) cell — the eval table for the
    heuristic's precision per language.

    Scale shape: detection is per-batch with profiles built once per
    worker; the output folds to the |langs|²-bounded grid in one
    vocabulary exchange."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.textstats import STOP_PROFILES, TOKEN_RE
    from ontoray.stages.agg import hash_aggregate

    profiles = {k: frozenset(v) for k, v in sorted(STOP_PROFILES.items())}

    def predict(batch: pa.Table) -> pa.Table:
        decl = batch.column("lang").to_pylist()
        preds = []
        for t in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(t)
            best, best_n = "und", 0
            for lang in sorted(profiles):
                n = sum(1 for w in toks if w in profiles[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table({
            "lang_decl": pa.array(decl, pa.string()),
            "lang_pred": pa.array(preds, pa.string()),
            "one": pa.array(np.ones(len(preds), dtype=np.int64))})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return hash_aggregate(
        ds.map_batches(predict, batch_format="pyarrow"),
        ["lang_decl", "lang_pred"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_docs"}, num_buckets=4)


def sql_docs_lang_confusion() -> str:
    return (f"WITH lp AS ({_sql_langid_query()}) "
            "SELECT d.lang AS lang_decl, lp.lang_pred, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents d JOIN lp USING (doc_id) GROUP BY 1, 2")


# --- ANN recall eval, inter-arrival histogram, reciprocity, open orders -----


def q_ann_recall_eval(sf_dir: str, k: int = 10):
    """Index-quality evaluation: recall@k of the exact-arithmetic IVF index
    against the brute-force cosine ground truth for the fixed probe query —
    the metric that gates an ANN index rollout.  Exact integer micro-recall
    (1e6·hits // k), division last.

    Scale shape: both sides are existing streaming operators (IVF probe
    scan vs one-matmul-per-batch brute force); the comparison is a
    k-bounded semi-join and the output is ONE row."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.joins import hash_join

    def _as_ds(res):
        return rd.from_arrow(res) if isinstance(res, pa.Table) else res

    ivf = _as_ds(q_ann_ivf(sf_dir, k=k)).select_columns(["vec_id"])
    brute = _as_ds(q_ann_topk(sf_dir, k=k)).select_columns(["vec_id"])
    hits = hash_join(ivf, brute, "vec_id", "vec_id", how="left_semi",
                     num_partitions=1)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n_hits": pa.array([np.int64(batch.num_rows)],
                                            pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        n = np.int64(batch.column("n_hits")
                     .to_numpy(zero_copy_only=False).sum())
        return pa.table({
            "n_hits": pa.array([n], pa.int64()),
            "k": pa.array([np.int64(k)], pa.int64()),
            "recall_micro": pa.array([np.int64(1_000_000 * n // k)],
                                     pa.int64())})

    return (hits.map_batches(partial, batch_format="pyarrow")
                .repartition(1).map_batches(fold, batch_format="pyarrow"))


def sql_ann_recall_eval(sf_dir: str, k: int = 10) -> str:
    return (f"WITH ivf AS ({sql_ann_ivf(sf_dir, k=k)}), "
            f"brute AS ({sql_ann_topk(sf_dir, k=k)}) "
            f"SELECT CAST(count(*) AS BIGINT) AS n_hits, "
            f"CAST({k} AS BIGINT) AS k, "
            f"CAST(1000000 * count(*) // {k} AS BIGINT) AS recall_micro "
            f"FROM ivf WHERE vec_id IN (SELECT vec_id FROM brute)")


def q_events_interarrival(sf_dir: str, cap_minutes: int = 60):
    """Inter-arrival-time histogram per event type: consecutive same-user
    same-type gaps (ordered by ts, event_id), bucketed to whole minutes
    capped at ``cap_minutes`` — the latency-profile table behind session
    gap tuning.  Bucketing is integer division (exact on both engines).

    Scale shape: ONE keyed exchange on the composite (user, type) key,
    per-group vectorized lexsort+diff (a user's per-type history is
    bounded), then the two-phase vocabulary-grid count."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def derive(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("user_id"), pa.string()),
            batch.column("event_type"), "|")
        return pa.table({
            "__k": key,
            "event_type": batch.column("event_type"),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64())})

    def gaps(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        st = ts[order]
        d = st[1:] - st[:-1]
        bucket = np.minimum(d // 60_000_000, cap_minutes)
        et = g.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * len(bucket), pa.string()),
            "gap_bucket": pa.array(bucket, pa.int64()),
            "one": pa.array(np.ones(len(bucket), dtype=np.int64))})

    per_gap = (ev.map_batches(derive, batch_format="pyarrow")
                 .groupby("__k").map_groups(gaps, batch_format="pyarrow"))
    return hash_aggregate(
        per_gap, ["event_type", "gap_bucket"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_gaps"}, num_buckets=4)


SQL_EVENTS_INTERARRIVAL = (
    "WITH g AS (SELECT event_type, epoch_us(ts) AS ts_us, "
    "lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type "
    "ORDER BY ts, event_id) AS prev FROM events) "
    "SELECT event_type, "
    "CAST(least((ts_us - prev) // 60000000, 60) AS BIGINT) AS gap_bucket, "
    "CAST(count(*) AS BIGINT) AS n_gaps "
    "FROM g WHERE prev IS NOT NULL GROUP BY 1, 2")


def q_kg_edge_reciprocity_from(triples_dedup_ds):
    """Directed-graph reciprocity of the concept graph: the fraction of
    distinct directed (subj→obj) edges whose reverse edge also exists —
    taxonomy-quality smell (hypernym edges should NOT reciprocate).  One
    row: (n_edges, n_recip_edges, reciprocity_micro), exact integers.

    Scale shape: distinct directed pairs fold two-phase, then ONE
    undirected-key exchange (lo=min, hi=max) counts directions per pair;
    the final fold is metadata-only."""
    import numpy as np
    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate

    def directed(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch.column("subj_norm"),
                                  batch.column("obj_norm")))
        out = batch.filter(keep)
        return pa.table({"s": out.column("subj_norm"),
                         "o": out.column("obj_norm")})

    dpairs = hash_aggregate(
        triples_dedup_ds.map_batches(directed, batch_format="pyarrow"),
        ["s", "o"], partial_aggs=[("s", "count")],
        aggs=[("s_count", "sum")], rename={"s_count_sum": "__n"})

    def undirected(batch: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(batch.column("s"), batch.column("o"))
        hi = pc.max_element_wise(batch.column("s"), batch.column("o"))
        return pa.table({"lo": lo, "hi": hi,
                         "one": pa.array(np.ones(batch.num_rows,
                                                 dtype=np.int64))})

    per_und = hash_aggregate(
        dpairs.map_batches(undirected, batch_format="pyarrow"),
        ["lo", "hi"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_dir"})

    def partial(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_dir").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_edges": pa.array([np.int64(nd.sum())], pa.int64()),
            "n_recip": pa.array([np.int64(2 * (nd == 2).sum())],
                                pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        ne = np.int64(batch.column("n_edges")
                      .to_numpy(zero_copy_only=False).sum())
        nr = np.int64(batch.column("n_recip")
                      .to_numpy(zero_copy_only=False).sum())
        micro = np.int64(1_000_000 * nr // ne) if ne else np.int64(0)
        return pa.table({
            "n_edges": pa.array([ne], pa.int64()),
            "n_recip_edges": pa.array([nr], pa.int64()),
            "reciprocity_micro": pa.array([micro], pa.int64())})

    return (per_und.map_batches(partial, batch_format="pyarrow")
                   .repartition(1).map_batches(fold, batch_format="pyarrow"))


SQL_KG_EDGE_RECIPROCITY = (
    f"{_sql_triples_norm_ctes()}, "
    "d AS (SELECT DISTINCT subj_norm AS s, obj_norm AS o FROM tnorm "
    "WHERE subj_norm <> obj_norm), "
    "u AS (SELECT least(s, o) AS lo, greatest(s, o) AS hi, "
    "count(*) AS n_dir FROM d GROUP BY 1, 2) "
    "SELECT CAST(sum(n_dir) AS BIGINT) AS n_edges, "
    "CAST(2 * sum(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_recip_edges, "
    "CAST(1000000 * (2 * sum(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END)) "
    "// sum(n_dir) AS BIGINT) AS reciprocity_micro FROM u")


def q_orders_open_by_month(sf_dir: str):
    """Open-order load over time: for each month where the count CHANGES,
    the number of orders open in it — an order is open from its order
    month through the month of its LAST lineitem shipment (orders with no
    lineitems close in their own month).  The interval-counting shape:
    ±1 deltas at interval ends, then a prefix sum.

    Scale shape: per-order close month folds two-phase over lineitem
    (metadata only); each order emits exactly two delta rows; deltas fold
    per linear month index (calendar-bounded vocabulary), and the prefix
    sum runs over that tiny grid in one block."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    last_ship = hash_aggregate(
        li.map_batches(
            lambda b: pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "ship_us": pc.cast(b.column("l_shipdate"), pa.int64())}),
            batch_format="pyarrow"),
        ["l_orderkey"], partial_aggs=[("ship_us", "max")],
        aggs=[("ship_us_max", "max")], rename={"ship_us_max_max": "ship_us"})

    j = hash_join(orders, last_ship, "o_orderkey", "l_orderkey",
                  how="left", right_cols=["ship_us"])

    def deltas(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        start = (pc.cast(pc.year(od), pa.int64()).to_numpy(
            zero_copy_only=False) * 12
            + pc.cast(pc.month(od), pa.int64()).to_numpy(
                zero_copy_only=False) - 1)
        ship = pc.fill_null(batch.column("ship_us"),
                            pa.scalar(0, pa.int64()))
        st = pc.cast(ship, pa.timestamp("us"))
        end = (pc.cast(pc.year(st), pa.int64()).to_numpy(
            zero_copy_only=False) * 12
            + pc.cast(pc.month(st), pa.int64()).to_numpy(
                zero_copy_only=False) - 1)
        end = np.maximum(end, start)       # null ship filled to epoch
        ym = np.concatenate([start, end + 1])
        dl = np.concatenate([np.ones(len(start), dtype=np.int64),
                             -np.ones(len(end), dtype=np.int64)])
        return pa.table({"ym": pa.array(ym, pa.int64()),
                         "delta": pa.array(dl, pa.int64())})

    agg = hash_aggregate(
        j.map_batches(deltas, batch_format="pyarrow"), ["ym"],
        partial_aggs=[("delta", "sum")], aggs=[("delta_sum", "sum")],
        rename={"delta_sum_sum": "delta"}, num_buckets=4)

    def prefix(batch: pa.Table) -> pa.Table:
        ym = batch.column("ym").to_numpy(zero_copy_only=False)
        dl = batch.column("delta").to_numpy(zero_copy_only=False)
        order = np.argsort(ym)
        ym, dl = ym[order], dl[order]
        run = np.cumsum(dl)
        month = (ym // 12) * 100 + (ym % 12) + 1
        return pa.table({"month": pa.array(month, pa.int64()),
                         "n_open": pa.array(run, pa.int64())})

    return agg.repartition(1).map_batches(prefix, batch_format="pyarrow")


SQL_ORDERS_OPEN_BY_MONTH = (
    "WITH ls AS (SELECT l_orderkey, max(epoch_us(l_shipdate)) AS ship_us "
    "FROM lineitem GROUP BY 1), "
    "iv AS (SELECT CAST(year(o_orderdate) AS BIGINT) * 12 "
    "+ CAST(month(o_orderdate) AS BIGINT) - 1 AS sm, "
    "greatest(CAST(year(make_timestamp(coalesce(ship_us, 0))) AS BIGINT) "
    "* 12 "
    "+ CAST(month(make_timestamp(coalesce(ship_us, 0))) AS BIGINT) - 1, "
    "CAST(year(o_orderdate) AS BIGINT) * 12 "
    "+ CAST(month(o_orderdate) AS BIGINT) - 1) AS em "
    "FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey), "
    "d AS (SELECT sm AS ym, 1 AS delta FROM iv "
    "UNION ALL SELECT em + 1, -1 FROM iv), "
    "g AS (SELECT ym, CAST(sum(delta) AS BIGINT) AS delta FROM d "
    "GROUP BY 1) "
    "SELECT CAST((ym // 12) * 100 + (ym % 12) + 1 AS BIGINT) AS month, "
    "CAST(sum(delta) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) "
    "AS BIGINT) AS n_open FROM g")


# --- 2-path composition, reorder intervals, cosine histogram, word lengths --


def q_kg_coupling_from(triples_dedup_ds, min_shared: int = 2):
    """Bibliographic coupling over the concept graph: pairs of SUBJECTS
    that assert triples about ≥``min_shared`` common OBJECTS — the
    sibling-concept candidate generator (the graph is bipartite by
    construction: normalized subjects and objects never overlap, so
    2-hop directed paths are structurally empty and coupling is the
    informative composition).

    Scale shape: distinct (subj, obj) edges fold two-phase, then ONE
    composition join partitioned on the shared object (per-object subject
    fan-out is bounded by the concept vocabulary; a df-cap belongs here if
    objects ever go open-vocabulary), and pair counts fold per (s1, s2)."""
    import numpy as np
    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    def directed(batch: pa.Table) -> pa.Table:
        return pa.table({"s": batch.column("subj_norm"),
                         "o": batch.column("obj_norm")})

    edges = hash_aggregate(
        triples_dedup_ds.map_batches(directed, batch_format="pyarrow"),
        ["s", "o"], partial_aggs=[("s", "count")],
        aggs=[("s_count", "sum")], rename={"s_count_sum": "__n"})\
        .select_columns(["s", "o"]).materialize()

    right = edges.map_batches(
        lambda b: pa.table({"o2": b.column("o"), "s2": b.column("s")}),
        batch_format="pyarrow")
    comp = hash_join(edges, right, "o", "o2", right_cols=["s2"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("s"), batch.column("s2"))
        out = batch.filter(keep)
        return pa.table({
            "s1": out.column("s"), "s2": out.column("s2"),
            "one": pa.array(np.ones(out.num_rows, dtype=np.int64))})

    counts = hash_aggregate(
        comp.map_batches(partial, batch_format="pyarrow"), ["s1", "s2"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_shared"})
    return counts.filter(expr=f"n_shared >= {min_shared}")


SQL_KG_COUPLING = (
    f"{_sql_triples_norm_ctes()}, "
    "e AS (SELECT DISTINCT subj_norm AS s, obj_norm AS o FROM tnorm) "
    "SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS n_shared "
    "FROM e a JOIN e b ON a.o = b.o AND a.s < b.s "
    "GROUP BY 1, 2 HAVING count(*) >= 2")


def q_orders_reorder_interval(sf_dir: str, cap_weeks: int = 52):
    """Repeat-purchase latency histogram: gaps between a customer's
    consecutive orders (ordered by date, key as tiebreak) bucketed to
    whole weeks capped at ``cap_weeks`` — the replenishment-cycle profile.

    Scale shape: ONE keyed exchange on custkey, per-group vectorized
    lexsort+diff (a customer's order history is bounded), then the
    two-phase week-grid count."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "o_orderkey": batch.column("o_orderkey"),
            "d_us": pc.cast(batch.column("o_orderdate"), pa.int64())})

    def gaps(g: pa.Table) -> pa.Table:
        keys = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = g.column("d_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, d))
        sd = d[order]
        gap = sd[1:] - sd[:-1]
        bucket = np.minimum(gap // (7 * 86_400_000_000), cap_weeks)
        return pa.table({
            "gap_weeks": pa.array(bucket, pa.int64()),
            "one": pa.array(np.ones(len(bucket), dtype=np.int64))})

    per_gap = (orders.map_batches(derive, batch_format="pyarrow")
                     .groupby("o_custkey")
                     .map_groups(gaps, batch_format="pyarrow"))
    return hash_aggregate(
        per_gap, ["gap_weeks"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_gaps"}, num_buckets=4)


SQL_ORDERS_REORDER_INTERVAL = (
    "WITH g AS (SELECT epoch_us(o_orderdate) AS d_us, "
    "lag(epoch_us(o_orderdate)) OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey) AS prev FROM orders) "
    "SELECT CAST(least((d_us - prev) // 604800000000, 52) AS BIGINT) "
    "AS gap_weeks, CAST(count(*) AS BIGINT) AS n_gaps "
    "FROM g WHERE prev IS NOT NULL GROUP BY 1")


def q_embed_cosine_hist(sf_dir: str, bucket_size: int = 4096):
    """Pairwise-similarity profile of the embedding space: cosine of each
    vector with its successor (vec_id+1 — a deterministic, uniformly
    spread pairing that needs NO all-pairs work), bucketed to tenths over
    the round-6 cosine (the ann_topk float contract).

    Scale shape: pair (i, i+1) lives in bucket i // ``bucket_size``; each
    vector ships ONCE to its own bucket plus (boundary rows only) the
    previous one — a single keyed exchange, no join, list columns never
    cross a join (pyarrow joins reject list payloads).  Cosine is one
    numpy pass per bucket; the histogram folds to the 21-bucket grid."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id")
        own = pa.table({
            "__g": pc.divide(vid, pa.scalar(bucket_size, pa.int64())),
            "vec_id": vid, "embedding": batch.column("embedding")})
        # bucket-leading rows also serve as the RIGHT member of the
        # previous bucket's last pair
        lead = pc.equal(pc.bit_wise_and(
            vid, pa.scalar(bucket_size - 1, pa.int64())),
            pa.scalar(0, pa.int64()))
        b = batch.filter(lead)
        prev = pa.table({
            "__g": pc.subtract(pc.divide(b.column("vec_id"),
                                         pa.scalar(bucket_size, pa.int64())),
                               pa.scalar(1, pa.int64())),
            "vec_id": b.column("vec_id"),
            "embedding": b.column("embedding")})
        return pa.concat_tables([own, prev])

    def cos_pairs(g: pa.Table) -> pa.Table:
        gid = g.column("__g")[0].as_py()
        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)
        vid = vid[order]
        emb = np.asarray(g.column("embedding").take(
            pa.array(order, pa.int64())).to_pylist(), dtype=np.float64)
        # consecutive ids whose PAIR belongs to this bucket
        adj = (vid[1:] - vid[:-1] == 1) & (vid[:-1] // bucket_size == gid)
        if not adj.any():
            return pa.table({"cos_bucket": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        a = emb[:-1][adj]
        b = emb[1:][adj]
        dot = (a * b).sum(axis=1)
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        cos = np.round(dot / (na * nb), 6)
        bucket = np.floor(cos * 10).astype(np.int64)
        return pa.table({
            "cos_bucket": pa.array(bucket, pa.int64()),
            "one": pa.array(np.ones(len(bucket), dtype=np.int64))})

    per_pair = (ds.map_batches(assign, batch_format="pyarrow")
                  .groupby("__g").map_groups(cos_pairs,
                                             batch_format="pyarrow"))
    return hash_aggregate(
        per_pair, ["cos_bucket"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_pairs"}, num_buckets=4)


SQL_EMBED_COSINE_HIST = (
    "SELECT CAST(floor(round(list_cosine_similarity("
    "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) "
    "* 10) AS BIGINT) AS cos_bucket, "
    "CAST(count(*) AS BIGINT) AS n_pairs "
    "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1 "
    "GROUP BY 1")


def q_docs_wordlen_profile(sf_dir: str, cap_len: int = 20):
    """Word-length distribution per language — the subword statistic that
    sizes tokenizer vocabularies: (lang, word length capped at
    ``cap_len``, count), exact.

    Scale shape: per-batch regex extraction + numpy length fold (text
    never leaves the batch), then the vocabulary-grid count."""
    import re

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    rx = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        langs, lens = [], []
        for lg, t in zip(batch.column("lang").to_pylist(),
                         batch.column("text").to_pylist()):
            for w in rx.findall(t):
                langs.append(lg)
                lens.append(min(len(w), cap_len))
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "word_len": pa.array(np.asarray(lens, dtype=np.int64)),
            "one": pa.array(np.ones(len(lens), dtype=np.int64))})

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "word_len"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_words"}, num_buckets=4)


SQL_DOCS_WORDLEN_PROFILE = (
    "SELECT lang, CAST(least(length(w), 20) AS BIGINT) AS word_len, "
    "CAST(count(*) AS BIGINT) AS n_words "
    "FROM (SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w "
    "FROM documents) GROUP BY 1, 2")


# --- YoY growth, dedup survivorship, source vocabulary overlap --------------


def q_orders_yoy_growth(sf_dir: str):
    """Year-over-year revenue growth per customer nation — the trend table:
    each (nation, year) joined to its own previous year, growth as the
    exact signed integer micro-ratio trunc(1e6·(cur − prev) / prev)
    (division last, truncated toward zero — DuckDB's integer `//`
    truncates while Python's floors, so negative growth needs the
    explicit sign·(abs//prev) form; years without a predecessor drop,
    the YoY contract).

    Scale shape: the fact table folds to the (nation × year) vocabulary
    grid FIRST (one partitioned customer join + one two-phase aggregate);
    the self-join on the computed (nation, year−1) key runs over the
    collapsed grid only."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])

    j = hash_join(orders, cust, "o_custkey", "c_custkey",
                  right_cols=["c_nationkey"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({
            "c_nationkey": batch.column("c_nationkey"),
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64()),
            "cents": cents})

    grid = hash_aggregate(
        j.map_batches(partial, batch_format="pyarrow"),
        ["c_nationkey", "o_year"],
        partial_aggs=[("cents", "sum")], aggs=[("cents_sum", "sum")],
        rename={"cents_sum_sum": "rev_c"}, num_buckets=8).materialize()

    named = hash_join(grid, nat, "c_nationkey", "n_nationkey",
                      right_cols=["n_name"], num_partitions=4)

    def with_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("n_name"),
            pc.cast(batch.column("o_year"), pa.string()), "|")
        return pa.table({"__k": key, "n_name": batch.column("n_name"),
                         "o_year": batch.column("o_year"),
                         "rev_c": batch.column("rev_c")})

    def prev_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("n_name"),
            pc.cast(pc.add(batch.column("o_year"),
                           pa.scalar(1, pa.int64())), pa.string()), "|")
        return pa.table({"__kp": key, "prev_c": batch.column("rev_c")})

    cur = named.map_batches(with_key, batch_format="pyarrow")
    prev = named.map_batches(prev_key, batch_format="pyarrow")
    yoy = hash_join(cur, prev, "__k", "__kp", right_cols=["prev_c"],
                    num_partitions=4)

    def final(batch: pa.Table) -> pa.Table:
        cur_c = batch.column("rev_c").to_numpy(zero_copy_only=False)
        prev_c = batch.column("prev_c").to_numpy(zero_copy_only=False)
        num = 1_000_000 * (cur_c - prev_c)
        growth = np.sign(num) * (np.abs(num) // prev_c)
        return pa.table({
            "n_name": batch.column("n_name"),
            "o_year": batch.column("o_year"),
            "rev_c": batch.column("rev_c"),
            "prev_c": batch.column("prev_c"),
            "growth_micro": pa.array(growth, pa.int64())})

    return yoy.map_batches(final, batch_format="pyarrow")


SQL_ORDERS_YOY_GROWTH = (
    "WITH g AS (SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
    "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS rev_c FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2) "
    "SELECT a.n_name, a.o_year, a.rev_c, b.rev_c AS prev_c, "
    "CAST(1000000 * (a.rev_c - b.rev_c) // b.rev_c AS BIGINT) "
    "AS growth_micro "
    "FROM g a JOIN g b ON a.n_name = b.n_name AND a.o_year = b.o_year + 1")


def q_docs_dedup_survivorship(sf_dir: str):
    """Curation audit for exact dedup: per source, how many documents
    arrived, how many survive as exact-text winners (min doc_id per text —
    the dedup_exact contract), and how many drop — the per-mixture loss
    report a curation run ships with its output.

    Scale shape: text hashes per batch (text never shuffles); winners fold
    two-phase on the fixed-width hash; kept-flags attach by ONE partitioned
    semi-join on doc_id; per-source counts are vocabulary-bounded."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def hashed(batch: pa.Table) -> pa.Table:
        hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") >> 4
              for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "h": pa.array(np.asarray(hs, dtype=np.int64))})

    rows = ds.map_batches(hashed, batch_format="pyarrow").materialize()

    winners = hash_aggregate(
        rows.select_columns(["h", "doc_id"]), ["h"],
        partial_aggs=[("doc_id", "min")], aggs=[("doc_id_min", "min")],
        rename={"doc_id_min_min": "wd"}).select_columns(["wd"])

    kept = hash_join(rows.select_columns(["doc_id", "source"]), winners,
                     "doc_id", "wd", how="left_semi")
    kept_by_src = hash_aggregate(
        kept.map_batches(
            lambda b: pa.table({
                "source": b.column("source"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["source"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_kept"},
        num_buckets=4)
    total_by_src = hash_aggregate(
        rows.map_batches(
            lambda b: pa.table({
                "source": b.column("source"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["source"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_docs"},
        num_buckets=4)

    j = hash_join(total_by_src, kept_by_src, "source", "source",
                  how="left", right_cols=["n_kept"], num_partitions=4)

    def final(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nk = pc.fill_null(pc.cast(batch.column("n_kept"), pa.int64()),
                          pa.scalar(0, pa.int64()))
        return pa.table({
            "source": batch.column("source"),
            "n_docs": batch.column("n_docs"),
            "n_kept": nk,
            "n_dropped": pc.subtract(batch.column("n_docs"), nk)})

    return j.map_batches(final, batch_format="pyarrow")


SQL_DOCS_DEDUP_SURVIVORSHIP = (
    "WITH w AS (SELECT min(doc_id) AS wd FROM documents GROUP BY text), "
    "k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept "
    "FROM documents JOIN w ON doc_id = wd GROUP BY 1), "
    "t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY 1) "
    "SELECT source, n_docs, CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept, "
    "CAST(n_docs - coalesce(n_kept, 0) AS BIGINT) AS n_dropped "
    "FROM t LEFT JOIN k USING (source)")


def q_docs_source_overlap(sf_dir: str):
    """Corpus-mixture vocabulary overlap: for every pair of sources, the
    exact token-vocabulary intersection and Jaccard (micro, division last)
    — the mixture-design table that says which corpora are redundant.

    Scale shape: distinct (source, token) folds two-phase (text never
    shuffles); the pair expansion is a composition join partitioned on the
    token (per-token fan is bounded by the source vocabulary); marginals
    reuse the distinct table; union size derives as n_a + n_b − n_common."""
    import re

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    rx = re.compile(r"[a-z0-9]+")

    def toks(batch: pa.Table) -> pa.Table:
        srcs, ts = [], []
        for s, t in zip(batch.column("source").to_pylist(),
                        batch.column("text").to_pylist()):
            for w in set(rx.findall(t)):
                srcs.append(s)
                ts.append(w)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "tok": pa.array(ts, pa.string())})

    distinct = hash_aggregate(
        ds.map_batches(toks, batch_format="pyarrow"), ["source", "tok"],
        partial_aggs=[("source", "count")], aggs=[("source_count", "sum")],
        rename={"source_count_sum": "__n"})\
        .select_columns(["source", "tok"]).materialize()

    marg = hash_aggregate(
        distinct.map_batches(
            lambda b: pa.table({
                "source": b.column("source"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["source"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_tok"},
        num_buckets=4).materialize()

    right = distinct.map_batches(
        lambda b: pa.table({"tok2": b.column("tok"),
                            "s2": b.column("source")}),
        batch_format="pyarrow")
    comp = hash_join(distinct, right, "tok", "tok2", right_cols=["s2"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less(batch.column("source"), batch.column("s2"))
        out = batch.filter(keep)
        return pa.table({
            "s1": out.column("source"), "s2": out.column("s2"),
            "one": pa.array(np.ones(out.num_rows, dtype=np.int64))})

    common = hash_aggregate(
        comp.map_batches(partial, batch_format="pyarrow"), ["s1", "s2"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_common"}, num_buckets=4)

    j = hash_join(common, marg, "s1", "source", right_cols=["n_tok"],
                  num_partitions=4)
    j = j.map_batches(lambda b: b.rename_columns(
        [c if c != "n_tok" else "n_a" for c in b.column_names]),
        batch_format="pyarrow")
    j = hash_join(j, marg, "s2", "source", right_cols=["n_tok"],
                  num_partitions=4)

    def final(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_common").to_numpy(zero_copy_only=False)
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_tok").to_numpy(zero_copy_only=False)
        jac = (1_000_000 * nc) // (na + nb - nc)
        return pa.table({
            "s1": batch.column("s1"), "s2": batch.column("s2"),
            "n_common": batch.column("n_common"),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "jaccard_micro": pa.array(jac, pa.int64())})

    return j.map_batches(final, batch_format="pyarrow")


SQL_DOCS_SOURCE_OVERLAP = (
    "WITH st AS (SELECT DISTINCT source, "
    "unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok FROM documents), "
    "marg AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st "
    "GROUP BY 1), "
    "c AS (SELECT a.source AS s1, b.source AS s2, "
    "CAST(count(*) AS BIGINT) AS n_common FROM st a JOIN st b "
    "ON a.tok = b.tok AND a.source < b.source GROUP BY 1, 2) "
    "SELECT s1, s2, n_common, ma.n AS n_a, mb.n AS n_b, "
    "CAST(1000000 * n_common // (ma.n + mb.n - n_common) AS BIGINT) "
    "AS jaccard_micro "
    "FROM c JOIN marg ma ON s1 = ma.source JOIN marg mb ON s2 = mb.source")


# --- Lorenz curve, Heaps curve, assortativity, MMR retrieval ----------------


def q_orders_lorenz(sf_dir: str, n_buckets: int = 10):
    """Revenue-concentration (Lorenz) table: customers bucketed into spend
    deciles by VALUE (the deterministic ntile variant — ties land together,
    a pure function of the value histogram), then cumulative customer and
    revenue shares per decile — the whale-curve behind per-host caps and
    mixture budgeting.

    Scale shape: orders collapse to per-customer cents in ONE exchange;
    decile cutpoints come from the value histogram (vocabulary exchange,
    broadcast once); the final grid is <= n_buckets rows, cumsummed on the
    driver with exact integer ppm (division last)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantile_buckets
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"c_custkey": batch.column("o_custkey"),
                         "cents": cents})

    base = hash_aggregate(
        orders.map_batches(derive, batch_format="pyarrow"), ["c_custkey"],
        partial_aggs=[("cents", "sum")], aggs=[("cents_sum", "sum")],
        rename={"cents_sum_sum": "cents"})

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "k", pa.array(["all"] * batch.num_rows, pa.string()))

    base = base.map_batches(tag, batch_format="pyarrow").materialize()
    b = grouped_quantile_buckets(base, "k", "cents", "c_custkey",
                                 n_buckets=n_buckets)
    withv = hash_join(b.select_columns(["c_custkey", "bucket"]),
                      base.select_columns(["c_custkey", "cents"]),
                      "c_custkey", "c_custkey", right_cols=["cents"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": batch.column("bucket"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "cents": batch.column("cents")})

    grid = hash_aggregate(
        withv.map_batches(partial, batch_format="pyarrow"), ["bucket"],
        partial_aggs=[("one", "sum"), ("cents", "sum")],
        aggs=[("one_sum", "sum"), ("cents_sum", "sum")],
        rename={"one_sum_sum": "n_custs", "cents_sum_sum": "cents"},
        num_buckets=4).take_all()                 # <= n_buckets rows

    grid.sort(key=lambda r: r["bucket"])
    tot_n = sum(int(r["n_custs"]) for r in grid)
    tot_c = sum(int(r["cents"]) for r in grid)
    bs, ns, cs, cn, cc = [], [], [], [], []
    run_n = run_c = 0
    for r in grid:                                # exact Python bigints
        run_n += int(r["n_custs"])
        run_c += int(r["cents"])
        bs.append(int(r["bucket"]))
        ns.append(int(r["n_custs"]))
        cs.append(int(r["cents"]))
        cn.append(1_000_000 * run_n // tot_n)
        cc.append(1_000_000 * run_c // tot_c)
    return rd.from_arrow(pa.table({
        "bucket": pa.array(bs, pa.int64()),
        "n_custs": pa.array(ns, pa.int64()),
        "cents": pa.array(cs, pa.int64()),
        "cum_cust_ppm": pa.array(cn, pa.int64()),
        "cum_rev_ppm": pa.array(cc, pa.int64())}))


SQL_ORDERS_LORENZ = (
    "WITH base AS (SELECT o_custkey AS c_custkey, "
    f"CAST(sum({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS cents "
    "FROM orders GROUP BY 1), "
    "r AS (SELECT cents AS v, row_number() OVER (ORDER BY cents) AS rn, "
    "count(*) OVER () AS n FROM base), "
    "c AS (SELECT q.i, min(v) AS cut FROM r, "
    "(SELECT unnest(range(1, 10)) AS i) q "
    "WHERE rn = (n * q.i + 9) // 10 GROUP BY q.i), "
    "b AS (SELECT base.c_custkey, base.cents, "
    "CAST(sum(CASE WHEN base.cents > c.cut THEN 1 ELSE 0 END) AS BIGINT) "
    "AS bucket FROM base CROSS JOIN c GROUP BY 1, 2), "
    "g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_custs, "
    "CAST(sum(cents) AS BIGINT) AS cents FROM b GROUP BY 1) "
    "SELECT bucket, n_custs, cents, "
    "CAST(1000000 * sum(n_custs) OVER (ORDER BY bucket) "
    "// (SELECT sum(n_custs) FROM g) AS BIGINT) AS cum_cust_ppm, "
    "CAST(1000000 * sum(cents) OVER (ORDER BY bucket) "
    "// (SELECT sum(cents) FROM g) AS BIGINT) AS cum_rev_ppm FROM g")


def q_docs_heaps(sf_dir: str):
    """Heaps-law vocabulary-growth curve over word BIGRAMS: new distinct
    bigram types first seen in each LOG2 doc_id band (doc 0, 1-2, 3-6,
    7-14, ...), plus the cumulative vocabulary — the diminishing-returns
    profile that says when more corpus stops buying phrase vocabulary.
    Bigrams, not unigrams, and log bands, not linear: the corpus unigram
    vocabulary is CLOSED (~31 types, saturates inside the first band —
    the non-vacuity lesson), and log bands resolve exactly the early
    region where growth happens.

    Scale shape: each bigram's first-occurrence doc folds two-phase on the
    gram (text never shuffles; per-batch group_by min is the combiner);
    the band grid is <= 63 rows; the only driver structure is the tiny
    cumsum.  bucket = bit_length(fd + 1) - 1, exact integer on both sides
    (the SQL counts powers of two <= fd + 1 — no float log)."""
    import re

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rx = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        toks, fds = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            ws = rx.findall(t)
            for g in {f"{a} {b}" for a, b in zip(ws, ws[1:])}:
                toks.append(g)
                fds.append(d)
        t = pa.table({"tok": pa.array(toks, pa.string()),
                      "fd": pa.array(np.asarray(fds, dtype=np.int64))})
        g = t.group_by(["tok"]).aggregate([("fd", "min")])
        return g.rename_columns(["tok", "fd"])

    first = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["tok"],
        aggs=[("fd", "min")], rename={"fd_min": "fd"})

    def to_bucket(batch: pa.Table) -> pa.Table:
        fd = batch.column("fd").to_pylist()
        # token-vocabulary-bounded rows; exact integer log2 via bit_length
        b = [(int(v) + 1).bit_length() - 1 for v in fd]
        return pa.table({
            "bucket": pa.array(np.asarray(b, dtype=np.int64)),
            "one": pa.array(np.ones(len(fd), dtype=np.int64))})

    grid = hash_aggregate(
        first.map_batches(to_bucket, batch_format="pyarrow"), ["bucket"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "new_tokens"}, num_buckets=4).take_all()

    grid.sort(key=lambda r: r["bucket"])
    run = 0
    bs, news, cums = [], [], []
    for r in grid:
        run += int(r["new_tokens"])
        bs.append(int(r["bucket"]))
        news.append(int(r["new_tokens"]))
        cums.append(run)
    return rd.from_arrow(pa.table({
        "bucket": pa.array(bs, pa.int64()),
        "new_tokens": pa.array(news, pa.int64()),
        "cum_tokens": pa.array(cums, pa.int64())}))


SQL_DOCS_HEAPS = (
    "WITH w AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS ws "
    "FROM documents), "
    "idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w), "
    "f AS (SELECT ws[i] || ' ' || ws[i + 1] AS tok, min(doc_id) AS fd "
    "FROM idx GROUP BY 1), "
    "pow AS (SELECT (CAST(1 AS BIGINT) << CAST(e AS INTEGER)) AS v "
    "FROM (SELECT unnest(range(0, 63)) AS e)), "
    "g AS (SELECT CAST((SELECT count(*) FROM pow WHERE pow.v <= f.fd + 1) "
    "- 1 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS new_tokens "
    "FROM f GROUP BY 1) "
    "SELECT bucket, new_tokens, "
    "CAST(sum(new_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens "
    "FROM g")


def q_kg_assortativity_from(triples_dedup_ds):
    """Degree assortativity of the undirected concept graph: Pearson
    correlation between the degrees at the two ends of every edge (both
    orientations — the standard undirected convention).  Negative values =
    hub-and-spoke (hubs attach to leaves), positive = core-periphery.

    Scale shape: distinct edges fold two-phase; degrees are ONE
    vocabulary-bounded exchange; degrees attach to edge endpoints by two
    partitioned hash joins; the moments ride ``grouped_corr``'s exact
    int64 partials (degrees enter as whole numbers, so the cents
    quantization is exact), and the driver sees one stats row."""
    from ontoray.extras.quantiles import grouped_corr
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    import numpy as np

    def directed(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("subj_norm"),
                         "v": batch.column("obj_norm")})

    edges = hash_aggregate(
        triples_dedup_ds.map_batches(directed, batch_format="pyarrow"),
        ["u", "v"], partial_aggs=[("u", "count")],
        aggs=[("u_count", "sum")], rename={"u_count_sum": "__n"})\
        .select_columns(["u", "v"])

    rev = edges.map_batches(
        lambda b: pa.table({"u": b.column("v"), "v": b.column("u")}),
        batch_format="pyarrow")
    ue = hash_aggregate(
        edges.union(rev), ["u", "v"], partial_aggs=[("u", "count")],
        aggs=[("u_count", "sum")], rename={"u_count_sum": "__n"})\
        .select_columns(["u", "v"]).materialize()

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("u"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    deg = hash_aggregate(
        ue.map_batches(ones, batch_format="pyarrow"), ["node"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "d"}).materialize()

    degx = deg.map_batches(
        lambda b: pa.table({"nx": b.column("node"), "x": b.column("d")}),
        batch_format="pyarrow")
    degy = deg.map_batches(
        lambda b: pa.table({"ny": b.column("node"), "y": b.column("d")}),
        batch_format="pyarrow")
    j = hash_join(ue, degx, "u", "nx", right_cols=["x"])
    j = hash_join(j, degy, "v", "ny", right_cols=["y"])

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array(["all"] * batch.num_rows, pa.string()),
            "x": batch.column("x"), "y": batch.column("y")})

    return grouped_corr(j.map_batches(keyed, batch_format="pyarrow"),
                        "k", "x", "y")


def _sql_kg_assortativity() -> str:
    from ontoray.extras.quantiles import sql_grouped_corr
    pairs = (
        f"({_sql_triples_norm_ctes()}, "
        "e AS (SELECT DISTINCT subj_norm AS u, obj_norm AS v FROM tnorm), "
        "ue AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e), "
        "deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d "
        "FROM ue GROUP BY 1) "
        "SELECT 'all' AS k, du.d AS x, dv.d AS y "
        "FROM ue JOIN deg du ON ue.u = du.node "
        "JOIN deg dv ON ue.v = dv.node) t")
    return sql_grouped_corr(pairs, "k", "x", "y")


def q_embed_mmr(sf_dir: str, m: int = 40, k: int = 10):
    """Maximal-marginal-relevance diversified top-k retrieval: the greedy
    reranker over the brute-force top-m candidate set — at each step pick
    argmax of lambda*rel − (1−lambda)*max-sim-to-selected (lambda = 0.7,
    spelled in scaled integers: score = 7*rel_u − 3*max_sim_u over
    micro-cosines, max term 0 at step 1; ties break on vec_id).  The
    training-data-selection shape: relevance without redundancy.

    Scale shape: the candidate cut is the distributed brute-force top-m
    (broadcast query, one matmul per batch, final-comparator local top-k);
    everything after is m-bounded on the driver by contract — the greedy
    recursion is inherently sequential, so the operator's cost model is
    "distributed scan + O(m^2) driver epilogue", documented."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.ann import brute_force_topk, query_vector

    dim = _embedding_dim(sf_dir)
    q = query_vector(dim)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cand = brute_force_topk(ds, q, k=m)           # m-bounded pa.table
    ids = cand.column("vec_id").to_pylist()
    rel_u = [int(round(c * 1_000_000))
             for c in cand.column("cosine").to_pylist()]

    import ray
    idref = ray.put(np.array(sorted(ids), dtype=np.int64))

    def only_cands(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        want = ray.get(idref)
        mask = pc.is_in(batch.column("vec_id"),
                        value_set=pa.array(want, pa.int64()))
        return batch.filter(mask)

    # Candidate vectors come back through a distributed filter — only the
    # m winners cross to the driver, never the corpus.
    rows = ds.map_batches(only_cands, batch_format="pyarrow").take_all()
    by_id = {r["vec_id"]: r["embedding"] for r in rows}
    vecs = np.array([by_id[i] for i in ids], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    # Same op order as list_cosine_similarity: dot, then the norm product.
    sims = np.round((vecs @ vecs.T) / (norms[:, None] * norms[None, :]), 6)
    sim_u = np.round(sims * 1_000_000).astype(np.int64)

    selected: list[int] = []
    out_rank, out_id, out_rel, out_score = [], [], [], []
    remaining = list(range(len(ids)))
    for step in range(1, min(k, len(ids)) + 1):
        best = None
        for i in remaining:
            mx = max(int(sim_u[i, j]) for j in selected) if selected else 0
            score = 7 * rel_u[i] - 3 * mx
            key = (-score, ids[i])
            if best is None or key < best[0]:
                best = (key, i, score)
        _, pick, score = best
        selected.append(pick)
        remaining.remove(pick)
        out_rank.append(step)
        out_id.append(ids[pick])
        out_rel.append(rel_u[pick])
        out_score.append(score)
    return rd.from_arrow(pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        "vec_id": pa.array(out_id, pa.int64()),
        "rel_u": pa.array(out_rel, pa.int64()),
        "score": pa.array(out_score, pa.int64())}))


def sql_embed_mmr(sf_dir: str, m: int = 40, k: int = 10) -> str:
    """DuckDB mirror of ``q_embed_mmr``: the greedy selection unrolled into
    k chained CTE steps (the kmeans/pagerank unrolled-mirror pattern — NOT
    a recursive CTE, whose correlated-subquery interaction is the
    documented footgun).  ``p{i}`` accumulates picks; ``s{i}`` selects the
    argmax over the remainder with the identical integer score."""
    from ontoray.extras.ann import query_vector
    dim = _embedding_dim(sf_dir)
    q = query_vector(dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in q) + "]"
    parts = [
        # MATERIALIZED: the correlated max-sim subqueries in s2..sk would
        # otherwise re-open the embeddings scan per evaluated row (fd
        # exhaustion, verified).  Safe here — no recursive CTE reads them
        # (the documented recursive+MATERIALIZED footgun does not apply).
        "WITH cand AS MATERIALIZED (SELECT vec_id, "
        "round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
        f"CAST({qlit} AS DOUBLE[])), 6) AS rel, "
        "CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        f"ORDER BY rel DESC, vec_id LIMIT {m}), "
        "relu AS MATERIALIZED (SELECT vec_id, "
        "CAST(round(rel * 1000000) AS BIGINT) AS rel_u FROM cand), "
        "pr AS MATERIALIZED (SELECT a.vec_id AS i, b.vec_id AS j, "
        "CAST(round(round(list_cosine_similarity(a.v, b.v), 6) * 1000000) "
        "AS BIGINT) AS sim_u FROM cand a JOIN cand b "
        "ON a.vec_id <> b.vec_id), "
        # Every step CTE is MATERIALIZED: s{i} references p{i-1} twice and
        # p{i} references both — inlined, the chain re-evaluates its whole
        # prefix per step (the kcore mirror's documented 3^rounds blowup).
        "s1 AS MATERIALIZED (SELECT 1 AS rank, vec_id, rel_u, "
        "7 * rel_u AS score "
        "FROM relu ORDER BY score DESC, vec_id LIMIT 1), "
        "p1 AS MATERIALIZED (SELECT vec_id FROM s1)"]
    for i in range(2, k + 1):
        parts.append(
            f", s{i} AS MATERIALIZED (SELECT {i} AS rank, r.vec_id, "
            "r.rel_u, 7 * r.rel_u - 3 * (SELECT max(sim_u) FROM pr "
            f"WHERE pr.i = r.vec_id AND pr.j IN (SELECT vec_id FROM p{i-1})"
            ") AS score FROM relu r WHERE r.vec_id NOT IN "
            f"(SELECT vec_id FROM p{i-1}) ORDER BY score DESC, r.vec_id "
            "LIMIT 1)")
        parts.append(
            f", p{i} AS MATERIALIZED (SELECT vec_id FROM p{i-1} "
            f"UNION ALL SELECT vec_id FROM s{i})")
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    parts.append(f" SELECT rank, vec_id, rel_u, score FROM ({union})")
    return "".join(parts)


# --- order streaks, int8 quantization QA, 2-hop bands, windowed top-k -------


def q_orders_streaks(sf_dir: str):
    """Longest consecutive-month purchase streak per customer (the
    gaps-and-islands shape), folded to a streak-length histogram — the
    engagement-continuity profile behind churn models.

    Scale shape: orders collapse to distinct (custkey, month-index) rows
    two-phase (the per-batch combiner dedups before the exchange); ONE
    keyed exchange, per-group numpy island scan (a customer's month set is
    calendar-bounded); the histogram grid is months-of-history small."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def derive(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        m = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()),
                               pa.scalar(12, pa.int64())),
                   pc.cast(pc.subtract(pc.month(d),
                                       pa.scalar(1, pa.int32())), pa.int64()))
        return pa.table({"o_custkey": batch.column("o_custkey"), "m": m})

    months = hash_aggregate(
        orders.map_batches(derive, batch_format="pyarrow"),
        ["o_custkey", "m"], partial_aggs=[("m", "count")],
        aggs=[("m_count", "sum")], rename={"m_count_sum": "__n"})\
        .select_columns(["o_custkey", "m"])

    def best(g: pa.Table) -> pa.Table:
        m = np.sort(g.column("m").to_numpy(zero_copy_only=False))
        brk = np.flatnonzero(np.diff(m) != 1)
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(m) - 1]))
        streak = int((ends - starts + 1).max())
        return pa.table({"streak": pa.array([streak], pa.int64()),
                         "one": pa.array([1], pa.int64())})

    per_cust = months.groupby("o_custkey").map_groups(
        best, batch_format="pyarrow")
    return hash_aggregate(
        per_cust, ["streak"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_custs"},
        num_buckets=4)


SQL_ORDERS_STREAKS = (
    "WITH mo AS (SELECT DISTINCT o_custkey, "
    "CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT) AS m "
    "FROM orders), "
    "r AS (SELECT o_custkey, m, m - row_number() OVER ("
    "PARTITION BY o_custkey ORDER BY m) AS grp FROM mo), "
    "runs AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS len "
    "FROM r GROUP BY o_custkey, grp), "
    "best AS (SELECT o_custkey, max(len) AS streak FROM runs GROUP BY 1) "
    "SELECT streak, CAST(count(*) AS BIGINT) AS n_custs FROM best GROUP BY 1")


def q_embed_quantize_error(sf_dir: str):
    """Int8 scalar-quantization QA: per-vector reconstruction SSE of the
    symmetric per-vector int8 quantizer (scale = max|x|), folded to log2
    bands — the storage-vs-recall profiler run before shipping a quantized
    embedding table.

    All arithmetic is integer micro-units on BOTH sides: xq = floor(1e6·x
    + 0.5); q = (254·|xq| + s) // (2·s) — round-half-up on MAGNITUDES, so
    floor division equals DuckDB's truncating `//`; recon = q·s // 127;
    sse = Σ (|xq| − recon)².  int64-safe: err ≤ s/254 + 1, so err²·dim
    stays far under 2^63 for |x| ≤ 10³.  Zero vectors quantize exactly
    (sse 0) by contract.  Band = bit_length(sse + 1) − 1, the docs_heaps
    powers-of-two mirror."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def per_vec(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        xq = np.floor(v * 1_000_000.0 + 0.5).astype(np.int64)
        ax = np.abs(xq)
        s = ax.max(axis=1)
        s_safe = np.where(s == 0, 1, s)
        q = (254 * ax + s_safe[:, None]) // (2 * s_safe[:, None])
        recon = (q * s_safe[:, None]) // 127
        err = ax - recon
        sse = np.where(s == 0, 0, (err * err).sum(axis=1))
        band = np.asarray([(int(x) + 1).bit_length() - 1 for x in sse],
                          dtype=np.int64)       # per-VECTOR rows, not hot
        return pa.table({
            "band": pa.array(band),
            "one": pa.array(np.ones(len(sse), dtype=np.int64)),
            "sse": pa.array(sse.astype(np.int64))})

    return hash_aggregate(
        ds.map_batches(per_vec, batch_format="pyarrow"), ["band"],
        partial_aggs=[("one", "sum"), ("sse", "sum")],
        aggs=[("one_sum", "sum"), ("sse_sum", "sum")],
        rename={"one_sum_sum": "n_vecs", "sse_sum_sum": "sse_sum"},
        num_buckets=4)


SQL_EMBED_QUANTIZE_ERROR = (
    "WITH el AS (SELECT vec_id, unnest(embedding) AS x FROM embeddings), "
    "xq AS (SELECT vec_id, "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq "
    "FROM el), "
    "sv AS (SELECT vec_id, max(abs(xq)) AS s FROM xq GROUP BY 1), "
    "e AS (SELECT xq.vec_id, CASE WHEN sv.s = 0 THEN 0 ELSE "
    "abs(xq.xq) - (((254 * abs(xq.xq) + sv.s) // (2 * sv.s)) * sv.s) // 127 "
    "END AS err FROM xq JOIN sv USING (vec_id)), "
    "per AS (SELECT vec_id, CAST(sum(err * err) AS BIGINT) AS sse "
    "FROM e GROUP BY 1), "
    "pow AS (SELECT (CAST(1 AS BIGINT) << CAST(e AS INTEGER)) AS v "
    "FROM (SELECT unnest(range(0, 63)) AS e)), "
    "b AS (SELECT CAST((SELECT count(*) FROM pow WHERE pow.v <= per.sse + 1)"
    " - 1 AS BIGINT) AS band, per.sse FROM per) "
    "SELECT band, CAST(count(*) AS BIGINT) AS n_vecs, "
    "CAST(sum(sse) AS BIGINT) AS sse_sum FROM b GROUP BY 1")


def q_kg_twohop_from(triples_dedup_ds):
    """Two-hop reach profile: |N≤2(u)| per node over the undirected distinct
    concept graph, folded to log2 bands — the local-density fingerprint
    (neighborhood blowup predicts join costs for graph-feature stages).

    Scale shape: distinct edges fold two-phase; the wedge join partitions
    on the shared mid node; (u, x) candidate pairs dedup two-phase BEFORE
    counting; the band grid is ≤63 rows.  Hub wedges are deg² of the
    stopword-pruned concept vocabulary — bounded by contract, the same
    budget the triangle counter documents."""
    import numpy as np
    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    def directed(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("subj_norm"),
                         "v": batch.column("obj_norm")})

    edges = hash_aggregate(
        triples_dedup_ds.map_batches(directed, batch_format="pyarrow"),
        ["u", "v"], partial_aggs=[("u", "count")],
        aggs=[("u_count", "sum")], rename={"u_count_sum": "__n"})\
        .select_columns(["u", "v"])
    rev = edges.map_batches(
        lambda b: pa.table({"u": b.column("v"), "v": b.column("u")}),
        batch_format="pyarrow")
    ue = hash_aggregate(
        edges.union(rev), ["u", "v"], partial_aggs=[("u", "count")],
        aggs=[("u_count", "sum")], rename={"u_count_sum": "__n"})\
        .select_columns(["u", "v"]).materialize()

    mid = ue.map_batches(
        lambda b: pa.table({"m": b.column("u"), "w": b.column("v")}),
        batch_format="pyarrow")
    wedges = hash_join(ue, mid, "v", "m", right_cols=["w"])

    def hop2(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("u"), "x": batch.column("w")})

    one_hop = ue.map_batches(
        lambda b: pa.table({"u": b.column("u"), "x": b.column("v")}),
        batch_format="pyarrow")
    cand = one_hop.union(wedges.map_batches(hop2, batch_format="pyarrow"))

    def drop_self(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.equal(batch.column("u"),
                                               batch.column("x"))))

    nb = hash_aggregate(
        cand.map_batches(drop_self, batch_format="pyarrow"), ["u", "x"],
        partial_aggs=[("u", "count")], aggs=[("u_count", "sum")],
        rename={"u_count_sum": "__n"}).select_columns(["u", "x"])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": batch.column("u"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    reach = hash_aggregate(
        nb.map_batches(ones, batch_format="pyarrow"), ["u"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n"})

    def to_band(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_pylist()
        band = [(int(x) + 1).bit_length() - 1 for x in n]
        return pa.table({
            "band": pa.array(np.asarray(band, dtype=np.int64)),
            "one": pa.array(np.ones(len(n), dtype=np.int64)),
            "n": batch.column("n")})

    return hash_aggregate(
        reach.map_batches(to_band, batch_format="pyarrow"), ["band"],
        partial_aggs=[("one", "sum"), ("n", "sum")],
        aggs=[("one_sum", "sum"), ("n_sum", "sum")],
        rename={"one_sum_sum": "n_nodes", "n_sum_sum": "reach_sum"},
        num_buckets=4)


def _sql_kg_twohop() -> str:
    # nb is spelled DISTINCT-over-UNION-ALL, not a bare UNION: inside this
    # WITH RECURSIVE chain DuckDB 1.0 silently degrades a CTE-level UNION
    # whose second arm self-joins another CTE to UNION ALL semantics
    # (verified: 2112 rows vs the 400 the same UNION yields standalone).
    return (
        f"{_sql_triples_norm_ctes()}, "
        "e AS (SELECT DISTINCT subj_norm AS u, obj_norm AS v FROM tnorm), "
        "ue AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e), "
        "nb AS (SELECT DISTINCT u, x FROM (SELECT u, v AS x FROM ue "
        "UNION ALL SELECT a.u, b.v AS x FROM ue a JOIN ue b "
        "ON a.v = b.u)), "
        "d AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM nb "
        "WHERE x <> u GROUP BY 1), "
        "pow AS (SELECT (CAST(1 AS BIGINT) << CAST(e AS INTEGER)) AS v "
        "FROM (SELECT unnest(range(0, 63)) AS e)), "
        "b AS (SELECT CAST((SELECT count(*) FROM pow "
        "WHERE pow.v <= d.n + 1) - 1 AS BIGINT) AS band, d.n FROM d) "
        "SELECT band, CAST(count(*) AS BIGINT) AS n_nodes, "
        "CAST(sum(n) AS BIGINT) AS reach_sum FROM b GROUP BY 1")


def q_events_top_types_window(sf_dir: str, window_s: int = 86400,
                              k: int = 3):
    """Windowed leaderboard: top-k event types per tumbling day window by
    count (ties break on type name) — the per-slice heavy-hitter view that
    feeds dashboard tiles and drift alarms.

    Scale shape: the corpus folds to the (window × type) vocabulary grid
    two-phase; ranking runs per window-group over the tiny grid — no
    corpus rows survive to the rank step."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    wus = window_s * 1_000_000

    def derive(batch: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(wus, pa.int64()))
        return pa.table({
            "window_id": w,
            "event_type": batch.column("event_type"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    grid = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["window_id", "event_type"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n"},
        num_buckets=8)

    def rank(g: pa.Table) -> pa.Table:
        n = g.column("n").to_numpy(zero_copy_only=False)
        ts = np.asarray(g.column("event_type").to_pylist())
        order = np.lexsort((ts, -n))[:k]
        return pa.table({
            "window_id": pc.take(g.column("window_id"),
                                 pa.array(order, pa.int64())),
            "event_type": pc.take(g.column("event_type"),
                                  pa.array(order, pa.int64())),
            "n": pc.take(g.column("n"), pa.array(order, pa.int64())),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))})

    return grid.groupby("window_id").map_groups(rank, batch_format="pyarrow")


SQL_EVENTS_TOP_TYPES_WINDOW = (
    "SELECT window_id, event_type, n, rnk FROM ("
    "SELECT window_id, event_type, n, CAST(row_number() OVER ("
    "PARTITION BY window_id ORDER BY n DESC, event_type) AS BIGINT) AS rnk "
    "FROM (SELECT epoch_us(ts) // CAST(86400000000 AS BIGINT) AS window_id, "
    "event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)) "
    "WHERE rnk <= 3")


# --- Jaccard link prediction, ABC analysis, phash near-dup, hapax ratio -----


def q_kg_jaccard_from(triples_dedup_ds):
    """Jaccard-coefficient link prediction over the concept graph
    (stages/analytics.jaccard_linkpred) — the normalized companion of
    kg_resource_alloc, same hub-cap contract."""
    from ontoray.stages.analytics import jaccard_linkpred
    return jaccard_linkpred(triples_dedup_ds)


SQL_KG_JACCARD = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm "
    "WHERE subj_norm <> obj_norm), "
    "und AS (SELECT src AS v, dst AS x FROM trip UNION SELECT dst, src FROM trip), "
    "deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1), "
    "capped AS (SELECT u.v, u.x FROM und u JOIN deg ON deg.v = u.v "
    "WHERE deg.d <= 32), "
    "pairs AS (SELECT c1.x AS na, c2.x AS nb FROM capped c1 "
    "JOIN capped c2 ON c1.v = c2.v AND c1.x < c2.x), "
    "cmn AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS common "
    "FROM pairs GROUP BY 1, 2), "
    "jd AS (SELECT cmn.na, cmn.nb, cmn.common, "
    "CAST(1000000 * cmn.common // (da.d + db.d - cmn.common) AS BIGINT) "
    "AS jac_micro FROM cmn JOIN deg da ON da.v = cmn.na "
    "JOIN deg db ON db.v = cmn.nb), "
    "ep AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
    "FROM trip) "
    "SELECT jd.na AS node_a, jd.nb AS node_b, jd.common, jd.jac_micro "
    "FROM jd LEFT JOIN ep ON ep.a = jd.na AND ep.b = jd.nb "
    "WHERE ep.a IS NULL AND jd.jac_micro >= 100000")


def q_parts_abc(sf_dir: str):
    """ABC inventory analysis: parts classified A/B/C by cumulative revenue
    share (80% / 95% cut points over parts ranked by revenue desc, partkey
    tiebreak) — the classic Pareto stratification behind stocking policy.

    Scale shape: per-part revenue folds two-phase to the PART VOCABULARY
    (bounded by contract — the same regime as every dimension-keyed
    aggregate here); the ranked cumsum + classification runs over that
    bounded table on the driver in exact Python bigints (ppm division
    last), and the output is the 3-row class grid."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def derive(batch: pa.Table) -> pa.Table:
        ext = pc.cast(batch.column("l_extendedprice"), pa.float64())
        disc = pc.cast(batch.column("l_discount"), pa.float64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc)),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"l_partkey": batch.column("l_partkey"),
                         "cents": cents})

    per_part = hash_aggregate(
        li.map_batches(derive, batch_format="pyarrow"), ["l_partkey"],
        partial_aggs=[("cents", "sum")], aggs=[("cents_sum", "sum")],
        rename={"cents_sum_sum": "cents"}).take_all()  # part vocabulary

    per_part.sort(key=lambda r: (-int(r["cents"]), int(r["l_partkey"])))
    tot = sum(int(r["cents"]) for r in per_part)
    cum = 0
    agg: dict[str, list[int]] = {}
    for r in per_part:
        cum += int(r["cents"])
        ppm = 1_000_000 * cum // tot
        cls = "A" if ppm <= 800_000 else ("B" if ppm <= 950_000 else "C")
        a = agg.setdefault(cls, [0, 0])
        a[0] += 1
        a[1] += int(r["cents"])
    ks = sorted(agg)
    return rd.from_arrow(pa.table({
        "abc_class": pa.array(ks, pa.string()),
        "n_parts": pa.array([agg[k][0] for k in ks], pa.int64()),
        "cents": pa.array([agg[k][1] for k in ks], pa.int64())}))


SQL_PARTS_ABC = (
    "WITH pr AS (SELECT l_partkey, "
    f"CAST(sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) "
    "AS BIGINT) AS cents FROM lineitem GROUP BY 1), "
    "c AS (SELECT l_partkey, cents, "
    "sum(cents) OVER (ORDER BY cents DESC, l_partkey) AS cum, "
    "(SELECT sum(cents) FROM pr) AS tot FROM pr), "
    "k AS (SELECT CASE WHEN CAST(1000000 AS HUGEINT) * cum // tot "
    "<= 800000 THEN 'A' WHEN CAST(1000000 AS HUGEINT) * cum // tot "
    "<= 950000 THEN 'B' ELSE 'C' END AS abc_class, cents FROM c) "
    "SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts, "
    "CAST(sum(cents) AS BIGINT) AS cents FROM k GROUP BY 1")


def q_docs_hapax(sf_dir: str):
    """Hapax-legomena profile per source: vocabulary size, number of
    once-occurring types, and the hapax ratio — the classic
    corpus-freshness/quality signal (high hapax = open vocabulary or noise;
    low = templated text).

    Scale shape: (source, token) counts fold two-phase (per-batch combiner
    before the token-vocabulary exchange); the per-source rollup is a
    second vocabulary-bounded fold; division last, exact integer."""
    import re

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    rx = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        srcs, toks, ns = [], [], []
        for s, t in zip(batch.column("source").to_pylist(),
                        batch.column("text").to_pylist()):
            cnt: dict[str, int] = {}
            for w in rx.findall(t):
                cnt[w] = cnt.get(w, 0) + 1
            for w, n in cnt.items():
                srcs.append(s)
                toks.append(w)
                ns.append(n)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "w": pa.array(toks, pa.string()),
                         "n": pa.array(np.asarray(ns, dtype=np.int64))})

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["source", "w"],
        aggs=[("n", "sum")], rename={"n_sum": "n"})

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        one = np.ones(batch.num_rows, dtype=np.int64)
        hap = pc.cast(pc.equal(batch.column("n"), pa.scalar(1, pa.int64())),
                      pa.int64())
        return pa.table({"source": batch.column("source"),
                         "one": pa.array(one), "hap": hap})

    s = hash_aggregate(
        counts.map_batches(fold, batch_format="pyarrow"), ["source"],
        partial_aggs=[("one", "sum"), ("hap", "sum")],
        aggs=[("one_sum", "sum"), ("hap_sum", "sum")],
        rename={"one_sum_sum": "n_types", "hap_sum_sum": "n_hapax"},
        num_buckets=4)

    def ratio(batch: pa.Table) -> pa.Table:
        ty = batch.column("n_types").to_numpy(zero_copy_only=False)
        hp = batch.column("n_hapax").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "hapax_micro", pa.array(1_000_000 * hp // ty, pa.int64()))

    return s.map_batches(ratio, batch_format="pyarrow")


SQL_DOCS_HAPAX = (
    "WITH tok AS (SELECT source, "
    "unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents), "
    "c AS (SELECT source, w, count(*) AS n FROM tok GROUP BY 1, 2), "
    "s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types, "
    "CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax "
    "FROM c GROUP BY 1) "
    "SELECT source, n_types, n_hapax, "
    "CAST(1000000 * n_hapax // n_types AS BIGINT) AS hapax_micro FROM s")


def q_multimodal_phash_neardup(sf_dir: str, max_hamming: int = 3,
                               thumb_chars: int = 16):
    """Perceptual-hash near-duplicate pairs over the (fake-decoded) image
    payloads: the image-dedup stage of a multimodal pipeline — banded
    64-bit Hamming pairs (extras/dedup.hamming_candidate_pairs, the simhash
    pigeonhole plan) over the phash column the DecodeImage actor pool
    emits.  Real deployments swap the fake decode for a PIL/opencv phash
    over decoded pixels; the banding, shuffle and pair-verify shape is the
    production one.

    The fake payload is the first ``thumb_chars`` bytes of the text (a
    "thumbnail" stand-in): a full-text md5 fake would be vacuous on this
    corpus (every text unique → no collisions anywhere — the non-vacuity
    probe caught exactly that), while thumbnails collide the way real
    near-identical images hash together (25 collision groups at sf0.001).
    True 1-3-bit pairs are exercised by the hamming_candidate_pairs unit
    fixture; here the corpus yields hamming-0 groups."""
    import ray.data as rd

    from ontoray.extras.dedup import hamming_candidate_pairs
    from ontoray.extras.multimodal import decode_images

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in
                             batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t[:thumb_chars].encode() for t in
                                 batch.column("text").to_pylist()],
                                pa.binary())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    feats = decode_images(ds.map_batches(to_payload, batch_format="pyarrow"),
                          fake=True).select_columns(["url", "phash"])
    pairs = hamming_candidate_pairs(feats, "url", "phash",
                                    max_hamming=max_hamming)
    return pairs.map_batches(
        lambda b: pa.table({"url_a": b.column("id_a"),
                            "url_b": b.column("id_b"),
                            "hamming": b.column("hamming")}),
        batch_format="pyarrow")


def sql_multimodal_phash_neardup(max_hamming: int = 3,
                                 thumb_chars: int = 16) -> str:
    # Same md5-32 bit-twiddles as multimodal.sql_image_features, over the
    # thumbnail prefix instead of the whole text (ASCII corpus: substr
    # characters == utf-8 bytes, matching the engine's t[:n].encode()).
    return (
        "WITH f AS (SELECT 'doc-' || doc_id AS url, "
        "((('0x' || substr(md5(substr(coalesce(text, ''), 1, "
        f"{thumb_chars})), 1, 8))::UBIGINT * 2654435761) "
        "& 9223372036854775807)::BIGINT AS phash FROM documents) "
        "SELECT a.url AS url_a, b.url AS url_b, "
        "CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming "
        "FROM f a JOIN f b ON a.url < b.url "
        f"WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}")


# --- semi-structured extraction, Zipf coverage, norm bands, user lifespan ---


def q_events_props_extract(sf_dir: str):
    """Semi-structured payload extraction: pull the integer field ``k`` out
    of the JSON ``props`` string column with ONE vectorized RE2 pass (the
    pinned contract both sides share — a JSON parser's whitespace/number
    normalization would be a second implementation), then fold per-type
    stats.  The schema-on-read shape every event pipeline needs.

    Scale shape: extraction is per-batch pyarrow extract_regex (no Python
    row loop); the stats fold is two-phase onto the type vocabulary."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), '"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"), "k": k})
        return t.filter(pc.is_valid(k))

    return hash_aggregate(
        ds.map_batches(extract, batch_format="pyarrow"), ["event_type"],
        partial_aggs=[("k", "count"), ("k", "sum"), ("k", "min"),
                      ("k", "max")],
        aggs=[("k_count", "sum"), ("k_sum", "sum"), ("k_min", "min"),
              ("k_max", "max")],
        rename={"k_count_sum": "n", "k_sum_sum": "k_sum",
                "k_min_min": "k_min", "k_max_max": "k_max"},
        num_buckets=4)


SQL_EVENTS_PROPS_EXTRACT = (
    "WITH e AS (SELECT event_type, "
    "CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT) AS k "
    "FROM events WHERE regexp_matches(props, '\"k\": [0-9]+')) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(k) AS BIGINT) AS k_sum, CAST(min(k) AS BIGINT) AS k_min, "
    "CAST(max(k) AS BIGINT) AS k_max FROM e GROUP BY 1")


def q_lm_zipf_coverage(sf_dir: str, max_rank_log2: int = 10):
    """Zipf rank-frequency probes with vocabulary-coverage: token frequency
    at power-of-two ranks 1, 2, 4, …, 2^max_rank_log2 plus the cumulative
    share of all corpus tokens the top-r types cover — the curve that sizes
    tokenizer vocabularies and stopword lists.

    Scale shape: token counts fold two-phase to the vocabulary; the global
    (freq desc, token) order is a distributed sort + limit on the BOUNDED
    vocabulary table; only the top 2^max rows and the probe grid reach the
    driver.  Coverage is exact integer ppm, division last."""
    import re

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    rx = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for w in rx.findall(t):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table({"w": pa.array(list(cnt), pa.string()),
                         "n": pa.array(np.asarray(list(cnt.values()),
                                                  dtype=np.int64))})

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["w"],
        aggs=[("n", "sum")], rename={"n_sum": "n"}).materialize()

    def tot_fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"t": pa.array(
            [pc.sum(batch.column("n")).as_py() or 0], pa.int64())})

    total = sum(r["t"] for r in counts.map_batches(
        tot_fold, batch_format="pyarrow").take_all())

    lim = 1 << max_rank_log2
    top = counts.sort(["n", "w"], descending=[True, False]).limit(lim)\
        .take_all()                                   # bounded: 2^max rows
    cum = 0
    ranks, toks, freqs, cums = [], [], [], []
    probes = {1 << i for i in range(max_rank_log2 + 1)}
    for i, r in enumerate(top, start=1):
        cum += int(r["n"])
        if i in probes:
            ranks.append(i)
            toks.append(r["w"])
            freqs.append(int(r["n"]))
            cums.append(1_000_000 * cum // total)
    return rd.from_arrow(pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "token": pa.array(toks, pa.string()),
        "freq": pa.array(freqs, pa.int64()),
        "cum_ppm": pa.array(cums, pa.int64())}))


SQL_LM_ZIPF_COVERAGE = (
    "WITH tok AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w "
    "FROM documents), "
    "c AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1), "
    "r AS (SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rn, "
    "sum(n) OVER (ORDER BY n DESC, w "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
    "(SELECT sum(n) FROM c) AS tot FROM c) "
    "SELECT CAST(rn AS BIGINT) AS rank, w AS token, n AS freq, "
    "CAST(1000000 * cum // tot AS BIGINT) AS cum_ppm FROM r "
    "WHERE rn IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)")


def q_embed_norm_hist(sf_dir: str):
    """Embedding L2-norm profile in exact integer micro² bands: per-vector
    squared norm over quantized coordinates (xq = floor(1e6·x + 0.5)),
    banded by bit_length — the unnormalized-vector detector run before any
    cosine-based stage (a norm-0 or norm-outlier band means the upstream
    encoder misbehaved).  No sqrt anywhere: bands of norm² are bands of
    norm, and integers keep the mirror exact."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def per_vec(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        xq = np.floor(v * 1_000_000.0 + 0.5).astype(np.int64)
        nsq = (xq * xq).sum(axis=1)
        band = np.asarray([(int(x) + 1).bit_length() - 1 for x in nsq],
                          dtype=np.int64)
        return pa.table({
            "band": pa.array(band),
            "one": pa.array(np.ones(len(nsq), dtype=np.int64))})

    return hash_aggregate(
        ds.map_batches(per_vec, batch_format="pyarrow"), ["band"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_vecs"}, num_buckets=4)


SQL_EMBED_NORM_HIST = (
    "WITH el AS (SELECT vec_id, unnest(embedding) AS x FROM embeddings), "
    "xq AS (SELECT vec_id, "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq "
    "FROM el), "
    "per AS (SELECT vec_id, CAST(sum(xq * xq) AS BIGINT) AS nsq "
    "FROM xq GROUP BY 1), "
    "pow AS (SELECT (CAST(1 AS BIGINT) << CAST(e AS INTEGER)) AS v "
    "FROM (SELECT unnest(range(0, 63)) AS e)), "
    "b AS (SELECT CAST((SELECT count(*) FROM pow WHERE pow.v <= per.nsq + 1)"
    " - 1 AS BIGINT) AS band FROM per) "
    "SELECT band, CAST(count(*) AS BIGINT) AS n_vecs FROM b GROUP BY 1")


def q_events_user_lifespan(sf_dir: str):
    """User-lifespan histogram: whole days between a user's first and last
    event (single-event users land at 0) — the engagement-duration profile
    behind retention models.

    Scale shape: per-user (min ts, max ts) folds two-phase onto the user
    vocabulary; the span histogram is a second calendar-bounded fold."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def derive(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({"user_id": batch.column("user_id"), "us": us})

    spans = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"), ["user_id"],
        partial_aggs=[("us", "min"), ("us", "max")],
        aggs=[("us_min", "min"), ("us_max", "max")],
        rename={"us_min_min": "lo", "us_max_max": "hi"})

    def to_days(batch: pa.Table) -> pa.Table:
        lo = batch.column("lo").to_numpy(zero_copy_only=False)
        hi = batch.column("hi").to_numpy(zero_copy_only=False)
        d = (hi - lo) // 86_400_000_000
        return pa.table({
            "span_days": pa.array(d.astype(np.int64)),
            "one": pa.array(np.ones(len(d), dtype=np.int64))})

    return hash_aggregate(
        spans.map_batches(to_days, batch_format="pyarrow"), ["span_days"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_users"}, num_buckets=4)


SQL_EVENTS_USER_LIFESPAN = (
    "WITH s AS (SELECT user_id, "
    "(max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS span_days "
    "FROM events GROUP BY 1) "
    "SELECT CAST(span_days AS BIGINT) AS span_days, "
    "CAST(count(*) AS BIGINT) AS n_users FROM s GROUP BY 1")


def q_docs_ppjoin(sf_dir: str, threshold_micro: int = 500_000):
    """Prefix-filtered exact set-similarity self-join (AllPairs/PPJoin)
    over token sets: doc pairs with Jaccard >= 0.5 without an all-pairs
    scan (extras/dedup.ppjoin_pairs)."""
    import ray.data as rd
    from ontoray.extras.dedup import ppjoin_pairs
    return ppjoin_pairs(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        threshold_micro=threshold_micro)


def sql_docs_ppjoin(threshold_micro: int = 500_000) -> str:
    from ontoray.extras.dedup import sql_ppjoin_pairs
    return sql_ppjoin_pairs(threshold_micro=threshold_micro)


# --- closeness centrality, type-share drift, LSH recall eval ----------------


def q_kg_closeness_from(triples_dedup_ds, n_seeds: int = 4,
                        max_hops: int = 4):
    """Closeness centrality for the md5-chosen BFS probe concepts:
    closeness = (reached − 1) / Σ hop-distances over each seed's ≤max_hops
    neighborhood (the bounded-horizon Wasserman–Faust form) — rides the
    multi_source_bfs frontier machinery unchanged, so the only new work is
    a seed-vocabulary fold over the (seed, node, dist) table.  Exact
    integer micro, division last; an isolated seed reports 0."""
    import numpy as np

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.analytics import multi_source_bfs

    bfs = multi_source_bfs(triples_dedup_ds, n_seeds=n_seeds,
                           max_hops=max_hops)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "seed": batch.column("seed"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "dist": batch.column("dist")})

    s = hash_aggregate(
        bfs.map_batches(partial, batch_format="pyarrow"), ["seed"],
        partial_aggs=[("one", "sum"), ("dist", "sum")],
        aggs=[("one_sum", "sum"), ("dist_sum", "sum")],
        rename={"one_sum_sum": "n_reached", "dist_sum_sum": "sum_dist"},
        num_buckets=4)

    def closeness(batch: pa.Table) -> pa.Table:
        n = batch.column("n_reached").to_numpy(zero_copy_only=False)
        d = batch.column("sum_dist").to_numpy(zero_copy_only=False)
        c = np.where(d > 0, 1_000_000 * (n - 1) // np.maximum(d, 1), 0)
        return batch.append_column("closeness_micro",
                                   pa.array(c.astype(np.int64)))

    return s.map_batches(closeness, batch_format="pyarrow")


SQL_KG_CLOSENESS = (
    f"{_sql_triples_norm_ctes()}, "
    "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm), "
    "und AS (SELECT src AS a, dst AS b FROM trip WHERE src <> dst "
    "UNION SELECT dst, src FROM trip WHERE src <> dst), "
    "unodes AS (SELECT DISTINCT a AS x FROM und), "
    "seeds AS (SELECT x FROM unodes ORDER BY md5(x || ':bfs'), x LIMIT 4), "
    "walk AS (SELECT x AS seed, x AS name, 0 AS dist FROM seeds "
    "UNION SELECT w.seed, u.b, w.dist + 1 FROM walk w "
    "JOIN und u ON u.a = w.name WHERE w.dist < 4), "
    "d AS (SELECT seed, name, min(dist) AS dist FROM walk GROUP BY 1, 2), "
    "s AS (SELECT seed, CAST(count(*) AS BIGINT) AS n_reached, "
    "CAST(sum(dist) AS BIGINT) AS sum_dist FROM d GROUP BY 1) "
    "SELECT seed, n_reached, sum_dist, CAST(CASE WHEN sum_dist = 0 THEN 0 "
    "ELSE 1000000 * (n_reached - 1) // sum_dist END AS BIGINT) "
    "AS closeness_micro FROM s")


def q_events_type_share_drift(sf_dir: str):
    """Day-over-day traffic-mix drift: each event type's share of the
    day's events, joined against its previous-day share — the drift alarm
    input for ingestion monitoring.  Output rows exist only where a
    previous day exists (the YoY join pattern on the day index; day
    granularity because this corpus spans one calendar month).

    Scale shape: the corpus folds to the (day × type) vocabulary grid
    two-phase; totals, shares and the shifted self-join all run on that
    tiny grid."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def derive(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"), "d": d,
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    grid = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["event_type", "d"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n"},
        num_buckets=4).materialize()

    tot = hash_aggregate(
        grid.map_batches(
            lambda b: pa.table({"d": b.column("d"),
                                "n": b.column("n")}),
            batch_format="pyarrow"), ["d"],
        partial_aggs=[("n", "sum")], aggs=[("n_sum", "sum")],
        rename={"n_sum_sum": "tot"}, num_buckets=4)

    shares = hash_join(grid, tot, "d", "d", right_cols=["tot"])

    def share(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        t = batch.column("tot").to_numpy(zero_copy_only=False)
        s = 1_000_000 * n // t
        k = pc.binary_join_element_wise(
            batch.column("event_type"),
            pc.cast(batch.column("d"), pa.string()), "\x1f")
        return pa.table({"event_type": batch.column("event_type"),
                         "d": batch.column("d"),
                         "share_ppm": pa.array(s, pa.int64()), "k": k})

    cur = shares.map_batches(share, batch_format="pyarrow").materialize()

    def next_key(batch: pa.Table) -> pa.Table:
        nxt = pc.add(batch.column("d"), pa.scalar(1, pa.int64()))
        k = pc.binary_join_element_wise(
            batch.column("event_type"), pc.cast(nxt, pa.string()), "\x1f")
        return pa.table({"kp": k, "prev_share_ppm": batch.column("share_ppm")})

    prev = cur.map_batches(next_key, batch_format="pyarrow")
    j = hash_join(cur, prev, "k", "kp", right_cols=["prev_share_ppm"])

    def finish(batch: pa.Table) -> pa.Table:
        dl = pc.subtract(batch.column("share_ppm"),
                         batch.column("prev_share_ppm"))
        return pa.table({"event_type": batch.column("event_type"),
                         "d": batch.column("d"),
                         "share_ppm": batch.column("share_ppm"),
                         "prev_share_ppm": batch.column("prev_share_ppm"),
                         "delta_ppm": dl})

    return j.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TYPE_SHARE_DRIFT = (
    "WITH g AS (SELECT event_type, "
    "epoch_us(ts) // CAST(86400000000 AS BIGINT) AS d, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "t AS (SELECT d, CAST(sum(n) AS BIGINT) AS tot FROM g GROUP BY 1), "
    "s AS (SELECT g.event_type, g.d, "
    "CAST(1000000 * g.n // t.tot AS BIGINT) AS share_ppm "
    "FROM g JOIN t USING (d)) "
    "SELECT c.event_type, c.d, c.share_ppm, p.share_ppm AS prev_share_ppm, "
    "c.share_ppm - p.share_ppm AS delta_ppm FROM s c "
    "JOIN s p ON p.event_type = c.event_type AND p.d = c.d - 1")


def q_dedup_lsh_recall(sf_dir: str, threshold: float = 0.8):
    """LSH quality referee: the MinHash-banded verified pairs measured
    against the exact inverted-index ground truth at the SAME threshold —
    recall quantifies what the 16-band/64-hash plan misses (banding is
    probabilistic), precision confirms the verify step (1.0 by
    construction, asserted by data not assumption).  The ann_recall_eval
    pattern applied to the dedup family.

    Scale shape: both pair pipelines are the production ones; the
    comparison is a pair-key semi-join; only FIVE scalars reach the
    driver."""
    import ray.data as rd

    from ontoray.extras.dedup import jaccard_pairs, minhash_dedup
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"pk": pc.binary_join_element_wise(
            pc.cast(batch.column("doc_a"), pa.string()),
            pc.cast(batch.column("doc_b"), pa.string()), "\x1f")})

    lsh_raw = minhash_dedup(ds, threshold=threshold)
    if isinstance(lsh_raw, pa.Table):     # small/empty short path returns
        lsh_raw = rd.from_arrow(lsh_raw)  # an Arrow table, not a Dataset
    ex_raw = jaccard_pairs(ds, threshold=threshold)
    if isinstance(ex_raw, pa.Table):
        ex_raw = rd.from_arrow(ex_raw)
    lsh = lsh_raw.map_batches(keyed, batch_format="pyarrow").materialize()
    exact = ex_raw.map_batches(keyed, batch_format="pyarrow").materialize()

    n_lsh = lsh.count()
    n_exact = exact.count()
    n_common = hash_join(lsh, exact, "pk", "pk", how="left_semi").count()
    rec = 1_000_000 * n_common // n_exact if n_exact else 0
    prec = 1_000_000 * n_common // n_lsh if n_lsh else 0
    return rd.from_arrow(pa.table({
        "n_lsh": pa.array([n_lsh], pa.int64()),
        "n_exact": pa.array([n_exact], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "recall_micro": pa.array([rec], pa.int64()),
        "precision_micro": pa.array([prec], pa.int64())}))


def sql_dedup_lsh_recall(threshold: float = 0.8) -> str:
    from ontoray.extras.dedup import sql_jaccard_pairs, sql_minhash_pairs
    lsh = sql_minhash_pairs(threshold=threshold)
    ex = sql_jaccard_pairs(threshold=threshold)
    return (
        "SELECT n_lsh, n_exact, n_common, "
        "CAST(CASE WHEN n_exact = 0 THEN 0 ELSE "
        "1000000 * n_common // n_exact END AS BIGINT) AS recall_micro, "
        "CAST(CASE WHEN n_lsh = 0 THEN 0 ELSE "
        "1000000 * n_common // n_lsh END AS BIGINT) AS precision_micro "
        "FROM (SELECT "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ({lsh}) l) AS n_lsh, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ({ex}) e) AS n_exact, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ({lsh}) l "
        f"JOIN ({ex}) e ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b) "
        "AS n_common)")


# --- lag-1 autocorrelation, supplier HHI ------------------------------------


def q_events_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of daily event counts per type — the
    persistence diagnostic behind traffic forecasting (corr ≈ 0 means
    yesterday predicts nothing).  Exact integer moment partials through
    grouped_corr; (today, tomorrow) pairs exist only where both days have
    events (the sparse-grid join contract, spelled identically in SQL).

    Scale shape: the corpus folds to the (type × day) grid two-phase; the
    shifted self-join and the moment fold run on that tiny grid."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_corr
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def derive(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"), "d": d,
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    grid = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["event_type", "d"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n"},
        num_buckets=4).materialize()

    # x = the EARLIER day's count, y = the later (today) — a later-day row
    # (key d) joins the earlier row shipped under key d+1, matching the
    # mirror's p.n AS x / c.n AS y orientation exactly (corr is symmetric,
    # the reported means are not).
    def cur_key(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch.column("event_type"),
            pc.cast(batch.column("d"), pa.string()), "\x1f")
        return pa.table({"event_type": batch.column("event_type"),
                         "y": batch.column("n"), "k": k})

    def next_key(batch: pa.Table) -> pa.Table:
        nxt = pc.add(batch.column("d"), pa.scalar(1, pa.int64()))
        k = pc.binary_join_element_wise(
            batch.column("event_type"), pc.cast(nxt, pa.string()), "\x1f")
        return pa.table({"kp": k, "x": batch.column("n")})

    cur = grid.map_batches(cur_key, batch_format="pyarrow")
    prv = grid.map_batches(next_key, batch_format="pyarrow")
    pairs = hash_join(cur, prv, "k", "kp", right_cols=["x"])
    return grouped_corr(pairs, "event_type", "x", "y")


def _sql_events_autocorr() -> str:
    from ontoray.extras.quantiles import sql_grouped_corr
    pairs = (
        "(WITH g AS (SELECT event_type, "
        "epoch_us(ts) // CAST(86400000000 AS BIGINT) AS d, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
        "SELECT p.event_type, p.n AS x, c.n AS y FROM g p "
        "JOIN g c ON c.event_type = p.event_type AND c.d = p.d + 1) t")
    return sql_grouped_corr(pairs, "event_type", "x", "y")


def q_supplier_hhi(sf_dir: str):
    """Supplier market concentration per nation: the Herfindahl–Hirschman
    index over supplier revenue shares — hhi_ppm = 10^6·Σc_i² // (Σc_i)²,
    ONE division at the end so the squared-share sum is exact (per-share
    rounding would drift).  1e6/n_suppliers = perfectly even, 1e6 =
    monopoly.

    Scale shape: lineitem folds two-phase onto the (nation × supplier)
    vocabulary grid (supplier nation attached by a broadcast-size
    dimension join); the per-nation HHI fold runs in Python bigints over
    the bounded grid (c² overflows int64 at corpus revenue — HUGEINT in
    the mirror, arbitrary-precision here)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])

    def derive(batch: pa.Table) -> pa.Table:
        ext = pc.cast(batch.column("l_extendedprice"), pa.float64())
        disc = pc.cast(batch.column("l_discount"), pa.float64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc)),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"l_suppkey": batch.column("l_suppkey"),
                         "cents": cents})

    per_supp = hash_aggregate(
        li.map_batches(derive, batch_format="pyarrow"), ["l_suppkey"],
        partial_aggs=[("cents", "sum")], aggs=[("cents_sum", "sum")],
        rename={"cents_sum_sum": "cents"})

    j = hash_join(per_supp, sup, "l_suppkey", "s_suppkey",
                  right_cols=["s_nationkey"])
    j = hash_join(j, nat, "s_nationkey", "n_nationkey",
                  right_cols=["n_name"])

    def hhi(g: pa.Table) -> pa.Table:
        cs = [int(c) for c in g.column("cents").to_pylist()]
        tot = sum(cs)
        sq = sum(c * c for c in cs)                 # Python bigints
        ppm = 1_000_000 * sq // (tot * tot) if tot else 0
        return pa.table({
            "n_name": pa.array([g.column("n_name")[0].as_py()], pa.string()),
            "n_suppliers": pa.array([len(cs)], pa.int64()),
            "cents": pa.array([tot], pa.int64()),
            "hhi_ppm": pa.array([ppm], pa.int64())})

    return j.groupby("n_name").map_groups(hhi, batch_format="pyarrow")


SQL_SUPPLIER_HHI = (
    "WITH ps AS (SELECT l_suppkey, "
    f"CAST(sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) "
    "AS BIGINT) AS cents FROM lineitem GROUP BY 1), "
    "g AS (SELECT n.n_name, ps.cents FROM ps "
    "JOIN supplier s ON s.s_suppkey = ps.l_suppkey "
    "JOIN nation n ON n.n_nationkey = s.s_nationkey) "
    "SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers, "
    "CAST(sum(cents) AS BIGINT) AS cents, "
    "CAST(CASE WHEN sum(cents) = 0 THEN 0 ELSE "
    "1000000 * sum(CAST(cents AS HUGEINT) * cents) "
    "// (sum(CAST(cents AS HUGEINT)) * sum(CAST(cents AS HUGEINT))) END "
    "AS BIGINT) AS hhi_ppm FROM g GROUP BY 1")


# --- expectation suite, table profile ----------------------------------------


def q_lineitem_expectations(sf_dir: str):
    """Data-quality expectation suite over the biggest fact table — the
    Great-Expectations-style validation pass every ingest runs: each rule
    is a vectorized predicate folded to ONE violation count, all rules in
    a single streaming pass (boolean columns share the scan).

    Rules: discount ∈ [0, 1]; quantity > 0; extendedprice >= 0;
    tax ∈ [0, 1]; shipdate non-null; returnflag ∈ {A, N, R}."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_discount", "l_quantity",
                                  "l_extendedprice", "l_tax", "l_shipdate",
                                  "l_returnflag"])

    def violations(batch: pa.Table) -> pa.Table:
        disc = batch.column("l_discount")
        qty = batch.column("l_quantity")
        ext = batch.column("l_extendedprice")
        tax = batch.column("l_tax")
        ship = batch.column("l_shipdate")
        rf = batch.column("l_returnflag")
        checks = [
            ("discount_in_0_1", pc.or_(pc.less(disc, pa.scalar(0.0)),
                                       pc.greater(disc, pa.scalar(1.0)))),
            ("quantity_positive", pc.less_equal(qty, pa.scalar(0.0))),
            ("price_nonnegative", pc.less(ext, pa.scalar(0.0))),
            ("tax_in_0_1", pc.or_(pc.less(tax, pa.scalar(0.0)),
                                  pc.greater(tax, pa.scalar(1.0)))),
            ("shipdate_present", pc.is_null(ship)),
            ("returnflag_domain", pc.invert(pc.is_in(
                rf, value_set=pa.array(["A", "N", "R"], pa.string())))),
        ]
        rules, viol, rows = [], [], []
        n = batch.num_rows
        for name, mask in checks:
            rules.append(name)
            # null comparisons don't count as violations except the
            # explicit is_null rule — fill false like SQL's CASE WHEN
            viol.append(pc.sum(pc.fill_null(mask, False)).as_py() or 0)
            rows.append(n)
        return pa.table({
            "rule": pa.array(rules, pa.string()),
            "n_viol": pa.array(np.asarray(viol, dtype=np.int64)),
            "n_rows": pa.array(np.asarray(rows, dtype=np.int64))})

    return hash_aggregate(
        ds.map_batches(violations, batch_format="pyarrow"), ["rule"],
        aggs=[("n_viol", "sum"), ("n_rows", "sum")],
        rename={"n_viol_sum": "n_viol", "n_rows_sum": "n_rows"},
        num_buckets=4)


SQL_LINEITEM_EXPECTATIONS = (
    "WITH v AS (SELECT "
    "CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)"
    " AS BIGINT) AS discount_in_0_1, "
    "CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS quantity_positive, "
    "CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS price_nonnegative, "
    "CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS tax_in_0_1, "
    "CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS shipdate_present, "
    "CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') "
    "OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS returnflag_domain, "
    "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem) "
    "SELECT u.rule, u.n_viol, v.n_rows FROM v, LATERAL (VALUES "
    "('discount_in_0_1', v.discount_in_0_1), "
    "('quantity_positive', v.quantity_positive), "
    "('price_nonnegative', v.price_nonnegative), "
    "('tax_in_0_1', v.tax_in_0_1), "
    "('shipdate_present', v.shipdate_present), "
    "('returnflag_domain', v.returnflag_domain)) AS u(rule, n_viol)")


def q_docs_table_profile(sf_dir: str):
    """TFDV-style column profile of the documents table: per column, row
    count, null count, and EXACT distinct count — the schema-drift
    fingerprint computed before every training run (embed_dim_stats is
    the vector-column sibling).

    Scale shape: nulls fold in one streaming pass; each column's distinct
    count is its own two-phase vocabulary exchange (values collapse
    per-batch first, so the exchange carries vocabularies, not rows)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    def null_partial(batch: pa.Table) -> pa.Table:
        names, nulls, rows = [], [], []
        for c in cols:
            names.append(c)
            nulls.append(batch.column(c).null_count)
            rows.append(batch.num_rows)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n_null": pa.array(np.asarray(nulls, dtype=np.int64)),
            "n_rows": pa.array(np.asarray(rows, dtype=np.int64))})

    base = hash_aggregate(
        ds.map_batches(null_partial, batch_format="pyarrow"), ["col"],
        aggs=[("n_null", "sum"), ("n_rows", "sum")],
        rename={"n_null_sum": "n_null", "n_rows_sum": "n_rows"},
        num_buckets=4).take_all()                    # 5 rows

    import ray.data as rd2
    distinct: dict[str, int] = {}
    for c in cols:
        def val_partial(batch: pa.Table, col=c) -> pa.Table:
            v = pc.cast(batch.column(col), pa.string())
            t = pa.table({"v": v}).filter(pc.is_valid(v))  # COUNT(DISTINCT)
            return t.group_by(["v"]).aggregate([])         # excludes NULLs

        dcount = hash_aggregate(
            ds.select_columns([c]).map_batches(
                val_partial, batch_format="pyarrow"), ["v"],
            partial_aggs=[("v", "count")], aggs=[("v_count", "sum")],
            rename={"v_count_sum": "__n"}).count()
        distinct[c] = dcount

    rows = sorted(base, key=lambda r: r["col"])
    return rd2.from_arrow(pa.table({
        "col": pa.array([r["col"] for r in rows], pa.string()),
        "n_rows": pa.array([int(r["n_rows"]) for r in rows], pa.int64()),
        "n_null": pa.array([int(r["n_null"]) for r in rows], pa.int64()),
        "n_distinct": pa.array([distinct[r["col"]] for r in rows],
                               pa.int64())}))


SQL_DOCS_TABLE_PROFILE = (
    "SELECT u.col, u.n_rows, u.n_null, u.n_distinct FROM (SELECT "
    "CAST(count(*) AS BIGINT) AS nr, "
    "CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z1, "
    "CAST(count(DISTINCT CAST(doc_id AS VARCHAR)) AS BIGINT) AS d1, "
    "CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z2, "
    "CAST(count(DISTINCT CAST(text AS VARCHAR)) AS BIGINT) AS d2, "
    "CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z3, "
    "CAST(count(DISTINCT CAST(lang AS VARCHAR)) AS BIGINT) AS d3, "
    "CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z4, "
    "CAST(count(DISTINCT CAST(source AS VARCHAR)) AS BIGINT) AS d4, "
    "CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z5,"
    " CAST(count(DISTINCT CAST(n_chars AS VARCHAR)) AS BIGINT) AS d5 "
    "FROM documents) v, LATERAL (VALUES "
    "('doc_id', v.nr, v.z1, v.d1), ('text', v.nr, v.z2, v.d2), "
    "('lang', v.nr, v.z3, v.d3), ('source', v.nr, v.z4, v.d4), "
    "('n_chars', v.nr, v.z5, v.d5)) AS u(col, n_rows, n_null, n_distinct)")


# --- key-uniqueness expectation, spend-decile migration ----------------------


def q_orders_key_uniqueness(sf_dir: str):
    """The uniqueness expectation — the one data-quality rule a single
    streaming scan CANNOT check: primary-key duplicate detection over
    o_orderkey via a two-phase count exchange.  Output is the one-row
    verdict (n_rows, n_keys, n_dup_keys, n_dup_rows): n_dup_keys > 0 means
    an upstream ingest replayed a partition."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch.column("o_orderkey"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    per_key = hash_aggregate(
        ds.map_batches(ones, batch_format="pyarrow"), ["k"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n"})

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(["all"] * batch.num_rows, pa.string()),
            "rows": batch.column("n"),
            "keys": pa.array(np.ones(len(n), dtype=np.int64)),
            "dup_keys": pa.array((n > 1).astype(np.int64)),
            "dup_rows": pa.array(np.where(n > 1, n, 0).astype(np.int64))})

    s = hash_aggregate(
        per_key.map_batches(fold, batch_format="pyarrow"), ["g"],
        partial_aggs=[("rows", "sum"), ("keys", "sum"), ("dup_keys", "sum"),
                      ("dup_rows", "sum")],
        aggs=[("rows_sum", "sum"), ("keys_sum", "sum"),
              ("dup_keys_sum", "sum"), ("dup_rows_sum", "sum")],
        rename={"rows_sum_sum": "n_rows", "keys_sum_sum": "n_keys",
                "dup_keys_sum_sum": "n_dup_keys",
                "dup_rows_sum_sum": "n_dup_rows"}, num_buckets=2)
    return s.select_columns(["n_rows", "n_keys", "n_dup_keys", "n_dup_rows"])


SQL_ORDERS_KEY_UNIQUENESS = (
    "WITH pk AS (SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n "
    "FROM orders GROUP BY 1) "
    "SELECT CAST(sum(n) AS BIGINT) AS n_rows, "
    "CAST(count(*) AS BIGINT) AS n_keys, "
    "CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys, "
    "CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows "
    "FROM pk")


def q_custs_decile_migration(sf_dir: str):
    """Spend-decile migration matrix: each customer's within-year spend
    decile (ntile-by-VALUE — the deterministic grouped_quantile_buckets
    contract) joined against their NEXT year's decile, folded to the
    (dec_from × dec_to) transition grid — the rank-churn table behind
    lifecycle marketing.

    Scale shape: orders collapse to the (customer × year) grid two-phase;
    decile cuts broadcast once per year; the migration join runs on
    composite (cust, year+1) keys; the output grid is ≤100 rows."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantile_buckets
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def derive(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("o_totalprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({
            "c": batch.column("o_custkey"),
            "y": pc.cast(pc.year(batch.column("o_orderdate")), pa.int64()),
            "cents": cents})

    base = hash_aggregate(
        orders.map_batches(derive, batch_format="pyarrow"), ["c", "y"],
        partial_aggs=[("cents", "sum")], aggs=[("cents_sum", "sum")],
        rename={"cents_sum_sum": "cents"}).materialize()

    b = grouped_quantile_buckets(base, "y", "cents", "c").materialize()

    def cur_key(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(batch.column("c"), pa.string()),
            pc.cast(batch.column("y"), pa.string()), "\x1f")
        return pa.table({"dec_from": batch.column("bucket"), "k": k})

    def next_key(batch: pa.Table) -> pa.Table:
        nxt = pc.add(batch.column("y"), pa.scalar(-1, pa.int64()))
        k = pc.binary_join_element_wise(
            pc.cast(batch.column("c"), pa.string()),
            pc.cast(nxt, pa.string()), "\x1f")
        return pa.table({"kp": k, "dec_to": batch.column("bucket")})

    cur = b.map_batches(cur_key, batch_format="pyarrow")
    nxt = b.map_batches(next_key, batch_format="pyarrow")
    m = hash_join(cur, nxt, "k", "kp", right_cols=["dec_to"])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "dec_from": batch.column("dec_from"),
            "dec_to": batch.column("dec_to"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    return hash_aggregate(
        m.map_batches(ones, batch_format="pyarrow"), ["dec_from", "dec_to"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_custs"}, num_buckets=4)


def _sql_custs_decile_migration() -> str:
    from ontoray.extras.quantiles import sql_grouped_quantile_buckets
    inner = sql_grouped_quantile_buckets(
        f"(SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS y, "
        f"CAST(sum({_CENTS.format(x='o_totalprice')}) AS BIGINT) AS cents "
        "FROM orders GROUP BY 1, 2)", "y", "cents", "c")
    return (
        f"WITH b AS ({inner}) "
        "SELECT a.bucket AS dec_from, z.bucket AS dec_to, "
        "CAST(count(*) AS BIGINT) AS n_custs "
        "FROM b a JOIN b z ON z.c = a.c AND z.y = a.y + 1 GROUP BY 1, 2")


# --- degree-distribution Gini, bigram-LM argmax accuracy ---------------------


def q_kg_degree_gini_from(triples_dedup_ds):
    """Inequality of the concept-graph degree distribution: the Gini
    coefficient over node degrees — one number separating hub-dominated
    scale-free growth (high) from flat co-mention noise (low), tracked per
    build as a graph-health metric.

    Scale shape: distinct edges two-phase, vocabulary-bounded degree fold,
    then grouped_gini's exact closed form under the single 'all' key."""
    import numpy as np

    from ontoray.extras.quantiles import grouped_gini
    from ontoray.stages.agg import hash_aggregate

    def directed(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("subj_norm"),
                         "v": batch.column("obj_norm")})

    edges = hash_aggregate(
        triples_dedup_ds.map_batches(directed, batch_format="pyarrow"),
        ["u", "v"], partial_aggs=[("u", "count")],
        aggs=[("u_count", "sum")], rename={"u_count_sum": "__n"})\
        .select_columns(["u", "v"])
    rev = edges.map_batches(
        lambda b: pa.table({"u": b.column("v"), "v": b.column("u")}),
        batch_format="pyarrow")
    ue = hash_aggregate(
        edges.union(rev), ["u", "v"], partial_aggs=[("u", "count")],
        aggs=[("u_count", "sum")], rename={"u_count_sum": "__n"})\
        .select_columns(["u", "v"])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("u"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    deg = hash_aggregate(
        ue.map_batches(ones, batch_format="pyarrow"), ["node"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "d"})

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array(["all"] * batch.num_rows, pa.string()),
            "d": batch.column("d")})

    return grouped_gini(deg.map_batches(keyed, batch_format="pyarrow"),
                        "k", "d")


def _sql_kg_degree_gini() -> str:
    return (
        f"{_sql_triples_norm_ctes()}, "
        "e AS (SELECT DISTINCT subj_norm AS u, obj_norm AS v FROM tnorm), "
        "ue AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e), "
        "deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d "
        "FROM ue GROUP BY 1), "
        "r AS (SELECT 'all' AS k, d, "
        "row_number() OVER (ORDER BY d) AS rn, "
        "count(*) OVER () AS nn, sum(d) OVER () AS tot FROM deg) "
        "SELECT k, CAST(max(nn) AS BIGINT) AS n, "
        "CAST(max(tot) AS BIGINT) AS total, "
        "CAST(1000000 * sum((2 * rn - nn - 1) * d) // (max(nn) * max(tot)) "
        "AS BIGINT) AS gini_micro FROM r GROUP BY 1")


def q_lm_bigram_acc(sf_dir: str):
    """Bigram-LM argmax accuracy on its own training corpus — the
    train→eval loop closed for the count LM: for every bigram occurrence,
    is w2 the mode continuation of w1 (ties → lexicographically smallest,
    the deterministic argmax)?  One row: (n_pairs, n_correct, acc_micro).

    Scale shape: the bigram table folds two-phase (bigram_counts' combiner);
    argmax-join-back is the parts_min_supplier pattern on the bigram
    vocabulary; correctness mass comes from ONE pair-key join; three
    scalars reach the driver."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.textstats import bigram_counts
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    counts = bigram_counts(ds).select_columns(["w1", "w2", "n"])\
        .materialize()

    mx = hash_aggregate(
        counts.map_batches(
            lambda b: pa.table({"w1": b.column("w1"), "n": b.column("n")}),
            batch_format="pyarrow"), ["w1"],
        partial_aggs=[("n", "max")], aggs=[("n_max", "max")],
        rename={"n_max_max": "mx"})

    wm = hash_join(counts, mx, "w1", "w1", right_cols=["mx"])

    def only_modes(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("n"), batch.column("mx")))
        return pa.table({"w1": t.column("w1"), "w2": t.column("w2")})

    pred = hash_aggregate(
        wm.map_batches(only_modes, batch_format="pyarrow"), ["w1"],
        partial_aggs=[("w2", "min")], aggs=[("w2_min", "min")],
        rename={"w2_min_min": "pred"})

    def pkey(batch: pa.Table) -> pa.Table:
        return pa.table({"pk": pc.binary_join_element_wise(
            batch.column("w1"), batch.column("pred"), "\x1f")})

    def ckey(batch: pa.Table) -> pa.Table:
        return pa.table({"pk": pc.binary_join_element_wise(
            batch.column("w1"), batch.column("w2"), "\x1f"),
            "n": batch.column("n")})

    hits = hash_join(counts.map_batches(ckey, batch_format="pyarrow"),
                     pred.map_batches(pkey, batch_format="pyarrow"),
                     "pk", "pk", how="left_semi")

    def tot_of(d) -> int:
        return sum(r["t"] for r in d.map_batches(
            lambda b: pa.table({"t": pa.array(
                [pc.sum(b.column("n")).as_py() or 0], pa.int64())}),
            batch_format="pyarrow").take_all())

    n_correct = tot_of(hits)
    n_pairs = tot_of(counts)
    acc = 1_000_000 * n_correct // n_pairs if n_pairs else 0
    return rd.from_arrow(pa.table({
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "n_correct": pa.array([n_correct], pa.int64()),
        "acc_micro": pa.array([acc], pa.int64())}))


SQL_LM_BIGRAM_ACC = (
    "WITH w AS (SELECT regexp_extract_all(text, '[a-z0-9]+') AS ws "
    "FROM documents), "
    "ix AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM w), "
    "c AS (SELECT ws[i] AS w1, ws[i + 1] AS w2, "
    "CAST(count(*) AS BIGINT) AS n FROM ix GROUP BY 1, 2), "
    "m AS (SELECT w1, max(n) AS mx FROM c GROUP BY 1), "
    "p AS (SELECT c.w1, min(c.w2) AS pred FROM c "
    "JOIN m ON m.w1 = c.w1 AND c.n = m.mx GROUP BY 1), "
    "corr AS (SELECT CAST(sum(c.n) AS BIGINT) AS nc FROM c "
    "JOIN p ON p.w1 = c.w1 AND p.pred = c.w2), "
    "tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c) "
    "SELECT tot.nt AS n_pairs, corr.nc AS n_correct, "
    "CAST(CASE WHEN tot.nt = 0 THEN 0 ELSE 1000000 * corr.nc // tot.nt END "
    "AS BIGINT) AS acc_micro FROM corr, tot")


# --- sketch join-size estimator ----------------------------------------------


def q_join_size_est(sf_dir: str, d: int = 4, w: int = 1024):
    """Join-cardinality estimation — the AGMS/count-min inner-product
    estimator (Alon-Gibbons-Matias-Szegedy / Cormode-Muthukrishnan):
    |orders ⋈ lineitem on orderkey| ≈ min_i Σ_j cmsA[i,j]·cmsB[i,j],
    measured against the exact size — the planner-statistics referee, and
    the estimator a 100-TB optimizer would consult instead of scanning.

    Scale shape: each side folds to its d×w sketch (the exchange is
    sketch-sized regardless of input); the exact side is two per-key count
    folds + ONE partitioned join + a scalar product fold.  Estimate error
    is one-sided (CMS overestimates): err_ppm >= 0 by construction."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.sketches import cms_sketch
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])

    # --- exact ---------------------------------------------------------
    def ones(col):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "k": batch.column(col),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})
        return fn

    na = hash_aggregate(
        orders.map_batches(ones("o_orderkey"), batch_format="pyarrow"),
        ["k"], partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "na"})
    nb = hash_aggregate(
        li.map_batches(ones("l_orderkey"), batch_format="pyarrow"),
        ["k"], partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "nb"})
    j = hash_join(na, nb.map_batches(
        lambda b: pa.table({"kb": b.column("k"), "nb": b.column("nb")}),
        batch_format="pyarrow"), "k", "kb", right_cols=["nb"])

    def prod_fold(batch: pa.Table) -> pa.Table:
        p = pc.multiply(batch.column("na"), batch.column("nb"))
        return pa.table({"t": pa.array([pc.sum(p).as_py() or 0], pa.int64())})

    exact = sum(r["t"] for r in j.map_batches(
        prod_fold, batch_format="pyarrow").take_all())

    # --- estimate (sketch-bounded driver fold) --------------------------
    def to_grid(sk) -> np.ndarray:
        g = np.zeros((d, w), dtype=np.int64)
        for r in sk.take_all():                       # <= d*w rows
            g[r["i"], r["j"]] = r["c"]
        return g

    ga = to_grid(cms_sketch(orders, "o_orderkey", d, w))
    gb = to_grid(cms_sketch(li, "l_orderkey", d, w))
    est = int(min(int((ga[i].astype(object) * gb[i].astype(object)).sum())
                  for i in range(d)))
    err = 1_000_000 * (est - exact) // exact if exact else 0
    return rd.from_arrow(pa.table({
        "exact_size": pa.array([exact], pa.int64()),
        "est_size": pa.array([est], pa.int64()),
        "err_ppm": pa.array([err], pa.int64())}))


def sql_join_size_est(d: int = 4, w: int = 1024) -> str:
    def cms(table: str, key: str) -> str:
        return (
            f"SELECT di.i, ('0x' || substr(md5(CAST(di.i AS VARCHAR) || ':' "
            f"|| CAST({key} AS VARCHAR)), 1, 15))::BIGINT % {w} AS j, "
            f"CAST(count(*) AS BIGINT) AS c FROM {table} CROSS JOIN "
            f"(SELECT unnest(range(0, {d})) AS i) di GROUP BY 1, 2")
    return (
        f"WITH ca AS ({cms('orders', 'o_orderkey')}), "
        f"cb AS ({cms('lineitem', 'l_orderkey')}), "
        "est AS (SELECT CAST(min(s) AS BIGINT) AS est_size FROM ("
        "SELECT a.i, sum(a.c * b.c) AS s FROM ca a "
        "JOIN cb b ON b.i = a.i AND b.j = a.j GROUP BY 1)), "
        "xa AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na "
        "FROM orders GROUP BY 1), "
        "xb AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb "
        "FROM lineitem GROUP BY 1), "
        "ex AS (SELECT CAST(sum(na * nb) AS BIGINT) AS exact_size "
        "FROM xa JOIN xb USING (k)) "
        "SELECT ex.exact_size, est.est_size, "
        "CAST(CASE WHEN ex.exact_size = 0 THEN 0 ELSE "
        "1000000 * (est.est_size - ex.exact_size) // ex.exact_size END "
        "AS BIGINT) AS err_ppm FROM ex, est")


# --- ship-delay SLA percentiles, vocabulary drift ----------------------------


def q_lineitem_shipdelay_quantiles(sf_dir: str):
    """Fulfilment-SLA latency percentiles: p50/p90/p99 of whole-day ship
    delay (l_shipdate − o_orderdate) per order priority — the latency-SLO
    table every ops dashboard carries, here over the biggest fact join.

    Scale shape: ONE partitioned hash join attaches the order date; delays
    collapse to a per-priority day histogram before anything shuffles
    (grouped_quantiles_disc contract); the mirror's quantile_disc equals
    the engine's integer rank cut."""
    from fractions import Fraction

    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.quantiles import grouped_quantiles_disc
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    j = hash_join(li, orders, "l_orderkey", "o_orderkey",
                  right_cols=["o_orderdate", "o_orderpriority"])

    def derive(batch: pa.Table) -> pa.Table:
        ship = pc.cast(batch.column("l_shipdate"), pa.int64())
        od = pc.cast(batch.column("o_orderdate"), pa.int64())
        days = pc.divide(pc.subtract(ship, od),
                         pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                         "delay_days": days})

    qs = {"p50": Fraction(1, 2), "p90": Fraction(9, 10),
          "p99": Fraction(99, 100)}
    return grouped_quantiles_disc(
        j.map_batches(derive, batch_format="pyarrow"),
        "o_orderpriority", "delay_days", qs)


SQL_LINEITEM_SHIPDELAY_QUANTILES = (
    "WITH d AS (SELECT o.o_orderpriority, "
    "(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) "
    "// CAST(86400000000 AS BIGINT) AS delay_days "
    "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey) "
    "SELECT o_orderpriority, "
    "CAST(quantile_disc(delay_days, 0.5) AS BIGINT) AS p50, "
    "CAST(quantile_disc(delay_days, 0.9) AS BIGINT) AS p90, "
    "CAST(quantile_disc(delay_days, 0.99) AS BIGINT) AS p99 "
    "FROM d GROUP BY 1")


def q_docs_vocab_drift(sf_dir: str, k: int = 20):
    """Vocabulary drift between two deterministic md5 halves of the corpus
    (the A/B shadow every ingest-drift monitor runs): per-token document
    frequencies in each half, divergence scored by the integer
    cross-multiplication |df_a·N_b − df_b·N_a| (no ratios, no logs — one
    comparison, exact), top-k most-divergent tokens.  int64-safe to ~2e9
    docs per half (df·N < 2^63); beyond that the fold widens to HUGEINT /
    Python int — documented, same bound family as renyi2.

    Scale shape: distinct (half, token, doc) collapses per batch; df folds
    two-phase on the token vocabulary; the halves join token-partitioned;
    top-k is a distributed sort + limit on the vocabulary table."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    import re
    rx = re.compile(r"[a-z0-9]+")

    def halves(batch: pa.Table) -> pa.Table:
        from ontoray.extras.sketches import _md5_int60
        ids = batch.column("doc_id").to_pylist()
        hv = _md5_int60(ids) % 2
        toks, hs = [], []
        for h, t in zip(hv.tolist(), batch.column("text").to_pylist()):
            for w in set(rx.findall(t)):
                toks.append(w)
                hs.append(h)
        return pa.table({"half": pa.array(np.asarray(hs, dtype=np.int64)),
                         "w": pa.array(toks, pa.string()),
                         "one": pa.array(np.ones(len(hs), dtype=np.int64))})

    df = hash_aggregate(
        ds.map_batches(halves, batch_format="pyarrow"), ["half", "w"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "df"}).materialize()

    def docs_per_half(batch: pa.Table) -> pa.Table:
        from ontoray.extras.sketches import _md5_int60
        ids = batch.column("doc_id").to_pylist()
        hv = _md5_int60(ids) % 2
        return pa.table({
            "half": pa.array(hv.astype(np.int64)),
            "one": pa.array(np.ones(len(ids), dtype=np.int64))})

    sizes = {r["half"]: int(r["n"]) for r in hash_aggregate(
        ds.select_columns(["doc_id"]).map_batches(
            docs_per_half, batch_format="pyarrow"), ["half"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n"}, num_buckets=2).take_all()}
    na, nb = sizes.get(0, 0), sizes.get(1, 0)

    a = df.filter(expr="half == 0").map_batches(
        lambda b: pa.table({"w": b.column("w"), "df_a": b.column("df")}),
        batch_format="pyarrow")
    b = df.filter(expr="half == 1").map_batches(
        lambda t: pa.table({"wb": t.column("w"), "df_b": t.column("df")}),
        batch_format="pyarrow")
    j = hash_join(a, b, "w", "wb", how="full_outer", right_cols=["df_b"])

    def score(batch: pa.Table) -> pa.Table:
        da = pc.fill_null(batch.column("df_a"), 0)
        db_ = pc.fill_null(batch.column("df_b"), 0)
        s = pc.abs(pc.subtract(
            pc.multiply(da, pa.scalar(nb, pa.int64())),
            pc.multiply(db_, pa.scalar(na, pa.int64()))))
        return pa.table({"token": batch.column("w"), "df_a": da,
                         "df_b": db_, "score": s})

    return (j.map_batches(score, batch_format="pyarrow")
            .sort(["score", "token"], descending=[True, False]).limit(k))


def sql_docs_vocab_drift(k: int = 20) -> str:
    from ontoray.extras.sketches import sql_md5_int60
    h = f"({sql_md5_int60('CAST(doc_id AS VARCHAR)')} % 2)"
    return (
        f"WITH hd AS (SELECT doc_id, {h} AS half, text FROM documents), "
        "tok AS (SELECT DISTINCT half, doc_id, "
        "unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM hd), "
        "df AS (SELECT half, w, CAST(count(*) AS BIGINT) AS df "
        "FROM tok GROUP BY 1, 2), "
        "sz AS (SELECT half, CAST(count(*) AS BIGINT) AS n "
        "FROM hd GROUP BY 1), "
        "a AS (SELECT w, df AS df_a FROM df WHERE half = 0), "
        "b AS (SELECT w, df AS df_b FROM df WHERE half = 1), "
        "j AS (SELECT coalesce(a.w, b.w) AS token, "
        "coalesce(a.df_a, 0) AS df_a, coalesce(b.df_b, 0) AS df_b "
        "FROM a FULL OUTER JOIN b ON b.w = a.w) "
        "SELECT token, df_a, df_b, "
        "CAST(abs(df_a * (SELECT coalesce(max(n), 0) FROM sz WHERE half = 1)"
        " - df_b * (SELECT coalesce(max(n), 0) FROM sz WHERE half = 0)) "
        "AS BIGINT) AS score FROM j "
        f"ORDER BY score DESC, token LIMIT {k}")


# --- rolling windowed percentile ---------------------------------------------


def q_events_rolling_p90(sf_dir: str, window_days: int = 7):
    """Rolling p90 latency/value percentile per event type over a trailing
    7-day window — the SLO burn-down curve: for each (type, day), the exact
    discrete p90 of every raw value in days [d−6, d].

    Scale shape: raw values collapse to per-(type, day) CENTS HISTOGRAMS
    per batch, so the exchange carries (type × day × distinct-cents) rows,
    never events; each type's day-sorted histogram sequence merges its
    trailing window per day inside ONE map_groups (calendar-bounded).
    p90 = value at 1-based sorted rank ceil(0.9·n) — the repo's
    quantile_disc integer rank contract."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def derive(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({"event_type": batch.column("event_type"),
                         "d": d, "c": c,
                         "one": pa.array(np.ones(batch.num_rows,
                                                 dtype=np.int64))})

    hist = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["event_type", "d", "c"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n"},
        num_buckets=8)

    def roll(g: pa.Table) -> pa.Table:
        et = g.column("event_type")[0].as_py()
        d = g.column("d").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        by_day: dict[int, dict[int, int]] = {}
        for di, ci, ni in zip(d.tolist(), c.tolist(), n.tolist()):
            by_day.setdefault(di, {})[ci] = ni
        days = sorted(by_day)
        out_d, out_p = [], []
        for di in days:
            merged: dict[int, int] = {}
            for w in range(di - window_days + 1, di + 1):
                for ci, ni in by_day.get(w, {}).items():
                    merged[ci] = merged.get(ci, 0) + ni
            tot = sum(merged.values())
            rank = (9 * tot + 9) // 10            # ceil(0.9 * tot)
            acc = 0
            for ci in sorted(merged):
                acc += merged[ci]
                if acc >= rank:
                    out_d.append(di)
                    out_p.append(ci)
                    break
        return pa.table({
            "event_type": pa.array([et] * len(out_d), pa.string()),
            "d": pa.array(out_d, pa.int64()),
            "p90_cents": pa.array(out_p, pa.int64())})

    return hist.groupby("event_type").map_groups(roll,
                                                 batch_format="pyarrow")


SQL_EVENTS_ROLLING_P90 = (
    "WITH e AS (SELECT event_type, "
    "epoch_us(ts) // CAST(86400000000 AS BIGINT) AS d, "
    "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events) "
    "SELECT DISTINCT event_type, d, "
    "CAST(quantile_disc(c, 0.9) OVER (PARTITION BY event_type ORDER BY d "
    "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS p90_cents "
    "FROM e")


# --- kNN-classifier accuracy, reciprocal-rank fusion -------------------------


def q_embed_knn_acc(sf_dir: str, k: int = 5):
    """kNN-classifier evaluation over the labeled embedding table: each
    vector's label predicted by the majority of its k=5 exact-cosine
    neighbors (tie → smallest label), scored per TRUE label — the
    embedding-quality probe (low acc = labels not linearly clustered).

    Scale shape: the kNN graph is the knn_graph broadcast-matmul build
    (vocabulary-bounded contract); labels attach by partitioned join;
    mode = argmax-join-back on the (vec × label) grid; the verdict fold is
    label-vocabulary-bounded."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.extras.ann import knn_graph
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    labels = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "label"])

    def lab64(batch: pa.Table) -> pa.Table:
        return pa.table({"lv": batch.column("vec_id"),
                         "lab": pc.cast(batch.column("label"), pa.int64())})

    lab = labels.map_batches(lab64, batch_format="pyarrow").materialize()
    knn = knn_graph(emb, k=k)
    j = hash_join(knn.select_columns(["vec_id", "nbr_id"]), lab,
                  "nbr_id", "lv", right_cols=["lab"])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": batch.column("vec_id"), "lab": batch.column("lab"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    cnt = hash_aggregate(
        j.map_batches(ones, batch_format="pyarrow"), ["vec_id", "lab"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n"}).materialize()

    mx = hash_aggregate(
        cnt.map_batches(
            lambda b: pa.table({"vec_id": b.column("vec_id"),
                                "n": b.column("n")}),
            batch_format="pyarrow"), ["vec_id"],
        partial_aggs=[("n", "max")], aggs=[("n_max", "max")],
        rename={"n_max_max": "mx"})
    wm = hash_join(cnt, mx, "vec_id", "vec_id", right_cols=["mx"])

    def modes(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("n"), batch.column("mx")))
        return pa.table({"vec_id": t.column("vec_id"),
                         "lab": t.column("lab")})

    pred = hash_aggregate(
        wm.map_batches(modes, batch_format="pyarrow"), ["vec_id"],
        partial_aggs=[("lab", "min")], aggs=[("lab_min", "min")],
        rename={"lab_min_min": "pred"})

    pt = hash_join(pred, lab, "vec_id", "lv", right_cols=["lab"])

    def verdict(batch: pa.Table) -> pa.Table:
        ok = pc.cast(pc.equal(batch.column("pred"), batch.column("lab")),
                     pa.int64())
        return pa.table({
            "label": batch.column("lab"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "ok": ok})

    s = hash_aggregate(
        pt.map_batches(verdict, batch_format="pyarrow"), ["label"],
        partial_aggs=[("one", "sum"), ("ok", "sum")],
        aggs=[("one_sum", "sum"), ("ok_sum", "sum")],
        rename={"one_sum_sum": "n", "ok_sum_sum": "n_correct"},
        num_buckets=4)

    def ratio(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        c = batch.column("n_correct").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "acc_micro", pa.array(1_000_000 * c // n, pa.int64()))

    return s.map_batches(ratio, batch_format="pyarrow")


def sql_embed_knn_acc(k: int = 5) -> str:
    from ontoray.extras.ann import sql_knn_graph
    return (
        f"WITH knn AS ({sql_knn_graph(k)}), "
        "lb AS (SELECT vec_id, CAST(label AS BIGINT) AS lab "
        "FROM embeddings), "
        "v AS (SELECT knn.vec_id, l.lab FROM knn "
        "JOIN lb l ON l.vec_id = knn.nbr_id), "
        "c AS (SELECT vec_id, lab, CAST(count(*) AS BIGINT) AS n "
        "FROM v GROUP BY 1, 2), "
        "m AS (SELECT vec_id, max(n) AS mx FROM c GROUP BY 1), "
        "p AS (SELECT c.vec_id, min(c.lab) AS pred FROM c "
        "JOIN m ON m.vec_id = c.vec_id AND c.n = m.mx GROUP BY 1), "
        "e AS (SELECT t.lab AS label, "
        "CASE WHEN p.pred = t.lab THEN 1 ELSE 0 END AS ok "
        "FROM p JOIN lb t ON t.vec_id = p.vec_id) "
        "SELECT label, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(ok) AS BIGINT) AS n_correct, "
        "CAST(1000000 * sum(ok) // count(*) AS BIGINT) AS acc_micro "
        "FROM e GROUP BY 1")


def q_ann_rrf(sf_dir: str, k_in: int = 20, k_out: int = 10,
              rrf_k: int = 60):
    """Reciprocal-rank fusion of the two ANN retrievers (brute-force exact
    and IVF-probed): score = Σ 10^6 // (60 + rank) over the lists that
    returned the id — THE standard zero-tuning ensemble for mixed
    retrievers, in exact integers.

    Scale shape: both input rankings are k-bounded by construction (the
    distributed retrievers do the heavy work); fusion is a ≤2k-row driver
    epilogue by contract, like MMR's."""
    import ray.data as rd

    from ontoray.extras.ann import (brute_force_topk, ivf_topk_exact,
                                    query_vector)

    dim = _embedding_dim(sf_dir)
    q = query_vector(dim)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def ranks(rows) -> dict[int, int]:
        if not isinstance(rows, pa.Table):
            rows = pa.concat_tables(
                [b for b in rows.iter_batches(batch_format="pyarrow")])
        recs = sorted(zip(rows.column("cosine").to_pylist(),
                          rows.column("vec_id").to_pylist()),
                      key=lambda t: (-t[0], t[1]))
        return {v: i + 1 for i, (_c, v) in enumerate(recs)}

    rb = ranks(brute_force_topk(ds, q, k=k_in))
    ri = ranks(ivf_topk_exact(ds, q, k=k_in))
    fused = []
    for v in set(rb) | set(ri):
        s = 0
        if v in rb:
            s += 1_000_000 // (rrf_k + rb[v])
        if v in ri:
            s += 1_000_000 // (rrf_k + ri[v])
        fused.append((s, v))
    fused.sort(key=lambda t: (-t[0], t[1]))
    fused = fused[:k_out]
    return rd.from_arrow(pa.table({
        "rank": pa.array(list(range(1, len(fused) + 1)), pa.int64()),
        "vec_id": pa.array([v for _s, v in fused], pa.int64()),
        "rrf_micro": pa.array([s for s, _v in fused], pa.int64())}))


def sql_ann_rrf(sf_dir: str, k_in: int = 20, k_out: int = 10,
                rrf_k: int = 60) -> str:
    bt = sql_ann_topk(sf_dir, k=k_in)
    iv = sql_ann_ivf(sf_dir, k=k_in)
    return (
        f"WITH rb AS (SELECT vec_id, row_number() OVER ("
        f"ORDER BY cosine DESC, vec_id) AS rk FROM ({bt})), "
        f"ri AS (SELECT vec_id, row_number() OVER ("
        f"ORDER BY cosine DESC, vec_id) AS rk FROM ({iv})), "
        "f AS (SELECT coalesce(rb.vec_id, ri.vec_id) AS vec_id, "
        f"coalesce(1000000 // ({rrf_k} + rb.rk), 0) + "
        f"coalesce(1000000 // ({rrf_k} + ri.rk), 0) AS s "
        "FROM rb FULL OUTER JOIN ri ON ri.vec_id = rb.vec_id) "
        "SELECT CAST(row_number() OVER (ORDER BY s DESC, vec_id) AS BIGINT) "
        "AS rank, vec_id, CAST(s AS BIGINT) AS rrf_micro FROM f "
        f"ORDER BY s DESC, vec_id LIMIT {k_out}")


# --- within-session type affinity --------------------------------------------


def q_events_type_affinity(sf_dir: str, gap_s: int = 1800):
    """Within-session event-type affinity: lift of two types co-occurring
    in the same gap-based session (the basket-lift shape applied to the
    sessionizer's output) — the "users who do A in a session also do B"
    table.  lift_micro = 10^6 · n_pair · n_sessions // (n_a · n_b), division
    last; sessions split on >30-minute gaps under the (ts, event_id) order.

    Scale shape: ONE user-keyed exchange sessionizes and emits DISTINCT
    (session, type) rows with an in-group combiner; per-type and pair
    counts fold two-phase on the type vocabulary (pair expansion is
    |types-per-session|²-bounded); the lift grid is types²."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    gap_us = gap_s * 1_000_000

    def sessions(g: pa.Table) -> pa.Table:
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist())
        order = np.lexsort((eid, ts))
        ts, et = ts[order], et[order]
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new) - 1
        seen = sorted({(int(s), str(t)) for s, t in zip(sid, et)})
        return pa.table({
            "sid": pa.array([s for s, _t in seen], pa.int64()),
            "event_type": pa.array([t for _s, t in seen], pa.string()),
            "uid": pa.array([g.column("user_id")[0].as_py()] * len(seen),
                            pa.int64())})

    st = ds.groupby("user_id").map_groups(
        sessions, batch_format="pyarrow").materialize()

    n_sessions = hash_aggregate(
        st.map_batches(
            lambda b: pa.table({
                "uid": b.column("uid"), "sid": b.column("sid"),
                "one": pa.array([1] * b.num_rows, pa.int64())}),
            batch_format="pyarrow"), ["uid", "sid"],
        partial_aggs=[("one", "min")], aggs=[("one_min", "min")],
        rename={"one_min_min": "__o"}).count()

    na = {r["event_type"]: int(r["n"]) for r in hash_aggregate(
        st.map_batches(
            lambda b: pa.table({
                "event_type": b.column("event_type"),
                "one": pa.array([1] * b.num_rows, pa.int64())}),
            batch_format="pyarrow"), ["event_type"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n"}, num_buckets=4).take_all()}

    def pairs(g: pa.Table) -> pa.Table:
        ts = sorted(g.column("event_type").to_pylist())
        out_a, out_b = [], []
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                out_a.append(ts[i])
                out_b.append(ts[j])
        return pa.table({"ta": pa.array(out_a, pa.string()),
                         "tb": pa.array(out_b, pa.string()),
                         "one": pa.array([1] * len(out_a), pa.int64())})

    pc_grid = hash_aggregate(
        st.groupby(["uid", "sid"]).map_groups(pairs,
                                              batch_format="pyarrow"),
        ["ta", "tb"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_pair"},
        num_buckets=4)

    def lift(batch: pa.Table) -> pa.Table:
        ta = batch.column("ta").to_pylist()
        tb = batch.column("tb").to_pylist()
        np_ = batch.column("n_pair").to_pylist()
        lifts = [1_000_000 * int(n) * n_sessions // (na[a] * na[b])
                 for a, b, n in zip(ta, tb, np_)]   # Python bigints
        return pa.table({
            "ta": batch.column("ta"), "tb": batch.column("tb"),
            "n_pair": batch.column("n_pair"),
            "lift_micro": pa.array(lifts, pa.int64())})

    return pc_grid.map_batches(lift, batch_format="pyarrow")


SQL_EVENTS_TYPE_AFFINITY = (
    "WITH s AS (SELECT user_id, event_type, "
    "CAST(sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 "
    "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
    "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS sid FROM ("
    "SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, "
    "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
    "ORDER BY epoch_us(ts), event_id) AS prev FROM events)), "
    "d AS (SELECT DISTINCT user_id, sid, event_type FROM s), "
    "tot AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM ("
    "SELECT DISTINCT user_id, sid FROM d)), "
    "na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n "
    "FROM d GROUP BY 1), "
    "p AS (SELECT a.event_type AS ta, b.event_type AS tb, "
    "CAST(count(*) AS BIGINT) AS n_pair FROM d a "
    "JOIN d b ON b.user_id = a.user_id AND b.sid = a.sid "
    "AND a.event_type < b.event_type GROUP BY 1, 2) "
    "SELECT p.ta, p.tb, p.n_pair, "
    "CAST(CAST(1000000 AS HUGEINT) * p.n_pair * tot.ns "
    "// (xa.n * xb.n) AS BIGINT) AS lift_micro "
    "FROM p, tot JOIN na xa ON xa.event_type = p.ta "
    "JOIN na xb ON xb.event_type = p.tb")


# --- composite-key density expectation, tokenizer fertility ------------------


def q_lineitem_density_check(sf_dir: str):
    """Composite-key density expectation: within every order, line numbers
    must be exactly the dense sequence 1..n (no gaps, no dups) — the
    multi-row invariant a scan can't check.  Verdict row:
    (n_orders, n_violations, viol_ppm).

    The per-order check folds to three integers (count, distinct count via
    max-of-dense assumption replaced by an exact sum identity: a duplicate
    or gap breaks count == max AND sum == n(n+1)/2 — both spelled
    identically in SQL), ONE orderkey exchange."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ln = pc.cast(batch.column("l_linenumber"), pa.int64())
        return pa.table({
            "k": batch.column("l_orderkey"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "ln": ln})

    per = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"), ["k"],
        partial_aggs=[("one", "sum"), ("ln", "max"), ("ln", "sum")],
        aggs=[("one_sum", "sum"), ("ln_max", "max"), ("ln_sum", "sum")],
        rename={"one_sum_sum": "n", "ln_max_max": "mx",
                "ln_sum_sum": "s"})

    def verdict(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        bad = ((mx != n) | (2 * s != n * (n + 1))).astype(np.int64)
        return pa.table({
            "g": pa.array(["all"] * len(n), pa.string()),
            "one": pa.array(np.ones(len(n), dtype=np.int64)),
            "bad": pa.array(bad)})

    out = hash_aggregate(
        per.map_batches(verdict, batch_format="pyarrow"), ["g"],
        partial_aggs=[("one", "sum"), ("bad", "sum")],
        aggs=[("one_sum", "sum"), ("bad_sum", "sum")],
        rename={"one_sum_sum": "n_orders", "bad_sum_sum": "n_violations"},
        num_buckets=2)

    def ppm(batch: pa.Table) -> pa.Table:
        n = batch.column("n_orders").to_numpy(zero_copy_only=False)
        b = batch.column("n_violations").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_orders": batch.column("n_orders"),
            "n_violations": batch.column("n_violations"),
            "viol_ppm": pa.array(1_000_000 * b // n, pa.int64())})

    return out.map_batches(ppm, batch_format="pyarrow")


SQL_LINEITEM_DENSITY_CHECK = (
    "WITH per AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n, "
    "CAST(max(l_linenumber) AS BIGINT) AS mx, "
    "CAST(sum(l_linenumber) AS BIGINT) AS s FROM lineitem GROUP BY 1) "
    "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(sum(CASE WHEN mx <> n OR 2 * s <> n * (n + 1) THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_violations, "
    "CAST(1000000 * sum(CASE WHEN mx <> n OR 2 * s <> n * (n + 1) "
    "THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS viol_ppm FROM per")


def q_docs_fertility(sf_dir: str):
    """Tokenizer fertility per language: tokens per 100 bytes of utf-8 text
    (whitespace-regex token contract) — the budget planner's
    bytes-to-tokens conversion table, exact integer micro.

    Scale shape: one streaming pass folds (lang, n_tokens, n_bytes)
    partials onto the language vocabulary."""
    import re

    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    rx = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        toks = np.asarray([len(rx.findall(t or ""))
                           for t in batch.column("text").to_pylist()],
                          dtype=np.int64)
        byts = np.asarray([len((t or "").encode())
                           for t in batch.column("text").to_pylist()],
                          dtype=np.int64)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "n_tokens": pa.array(toks),
                         "n_bytes": pa.array(byts)})

    s = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["lang"],
        partial_aggs=[("n_tokens", "sum"), ("n_bytes", "sum")],
        aggs=[("n_tokens_sum", "sum"), ("n_bytes_sum", "sum")],
        rename={"n_tokens_sum_sum": "n_tokens",
                "n_bytes_sum_sum": "n_bytes"}, num_buckets=4)

    def rate(batch: pa.Table) -> pa.Table:
        t = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        b = batch.column("n_bytes").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "tok_per_100b_micro",
            pa.array(100_000_000 * t // np.maximum(b, 1), pa.int64()))

    return s.map_batches(rate, batch_format="pyarrow")


SQL_DOCS_FERTILITY = (
    "WITH p AS (SELECT lang, "
    "CAST(len(regexp_extract_all(coalesce(text, ''), '[a-z0-9]+')) "
    "AS BIGINT) AS t, "
    "CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS b "
    "FROM documents) "
    "SELECT lang, CAST(sum(t) AS BIGINT) AS n_tokens, "
    "CAST(sum(b) AS BIGINT) AS n_bytes, "
    "CAST(100000000 * sum(t) // greatest(sum(b), 1) AS BIGINT) "
    "AS tok_per_100b_micro FROM p GROUP BY 1")


# --- conversion latency, growth accounting ------------------------------------


def q_events_conversion_latency(sf_dir: str, from_type: str = "signup",
                                to_type: str = "purchase",
                                cap_hours: int = 168):
    """Conversion-latency histogram: whole hours from a user's FIRST
    ``from_type`` event to their FIRST ``to_type`` event at or after it,
    capped — the activation-funnel timing table.  Users without both
    events (or converting before signing up) drop out, the SQL mirror
    spelling the same predicate.

    Scale shape: per-(user, type) first-timestamps fold two-phase; the
    two sides join user-partitioned; the hour grid is cap-bounded."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def firsts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "us": pc.cast(batch.column("ts"), pa.int64())})

    fm = hash_aggregate(
        ds.map_batches(firsts, batch_format="pyarrow"),
        ["user_id", "event_type"], partial_aggs=[("us", "min")],
        aggs=[("us_min", "min")], rename={"us_min_min": "first_us"})\
        .materialize()

    a = fm.filter(expr=f"event_type == '{from_type}'").map_batches(
        lambda b: pa.table({"user_id": b.column("user_id"),
                            "a_us": b.column("first_us")}),
        batch_format="pyarrow")
    b = fm.filter(expr=f"event_type == '{to_type}'").map_batches(
        lambda t: pa.table({"ub": t.column("user_id"),
                            "b_us": t.column("first_us")}),
        batch_format="pyarrow")
    j = hash_join(a, b, "user_id", "ub", right_cols=["b_us"])

    def bucket(batch: pa.Table) -> pa.Table:
        au = batch.column("a_us").to_numpy(zero_copy_only=False)
        bu = batch.column("b_us").to_numpy(zero_copy_only=False)
        keep = bu >= au
        h = np.minimum((bu[keep] - au[keep]) // 3_600_000_000, cap_hours)
        return pa.table({
            "latency_h": pa.array(h.astype(np.int64)),
            "one": pa.array(np.ones(len(h), dtype=np.int64))})

    return hash_aggregate(
        j.map_batches(bucket, batch_format="pyarrow"), ["latency_h"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_users"}, num_buckets=4)


SQL_EVENTS_CONVERSION_LATENCY = (
    "WITH f AS (SELECT user_id, event_type, min(epoch_us(ts)) AS us "
    "FROM events GROUP BY 1, 2), "
    "a AS (SELECT user_id, us AS a_us FROM f WHERE event_type = 'signup'), "
    "b AS (SELECT user_id, us AS b_us FROM f WHERE event_type = 'purchase')"
    " SELECT CAST(least((b_us - a_us) // 3600000000, 168) AS BIGINT) "
    "AS latency_h, CAST(count(*) AS BIGINT) AS n_users "
    "FROM a JOIN b USING (user_id) WHERE b_us >= a_us GROUP BY 1")


def q_events_growth_accounting(sf_dir: str):
    """Daily growth accounting: active users split into NEW (first-ever
    activity today) and RETURNING — the new/retained/resurrected ledger
    every growth dashboard opens with (resurrection needs a churn horizon;
    the new/returning split is the exact part).

    Scale shape: the (user, day) universe collapses per batch before ONE
    distinct exchange; first-day per user is a second user-keyed fold;
    the daily grid join is calendar × user-vocabulary bounded."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def derive(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"user_id": batch.column("user_id"), "d": d})

    ud = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"), ["user_id", "d"],
        partial_aggs=[("d", "count")], aggs=[("d_count", "sum")],
        rename={"d_count_sum": "__n"}).select_columns(["user_id", "d"])\
        .materialize()

    first = hash_aggregate(
        ud, ["user_id"], partial_aggs=[("d", "min")],
        aggs=[("d_min", "min")], rename={"d_min_min": "fd"})

    j = hash_join(ud, first, "user_id", "user_id", right_cols=["fd"])

    def tally(batch: pa.Table) -> pa.Table:
        d = batch.column("d").to_numpy(zero_copy_only=False)
        fd = batch.column("fd").to_numpy(zero_copy_only=False)
        new = (d == fd).astype(np.int64)
        return pa.table({
            "d": batch.column("d"),
            "one": pa.array(np.ones(len(d), dtype=np.int64)),
            "new": pa.array(new)})

    out = hash_aggregate(
        j.map_batches(tally, batch_format="pyarrow"), ["d"],
        partial_aggs=[("one", "sum"), ("new", "sum")],
        aggs=[("one_sum", "sum"), ("new_sum", "sum")],
        rename={"one_sum_sum": "n_active", "new_sum_sum": "n_new"},
        num_buckets=4)

    def ret(batch: pa.Table) -> pa.Table:
        a = batch.column("n_active").to_numpy(zero_copy_only=False)
        n = batch.column("n_new").to_numpy(zero_copy_only=False)
        return batch.append_column("n_returning",
                                   pa.array((a - n).astype(np.int64)))

    return out.map_batches(ret, batch_format="pyarrow")


SQL_EVENTS_GROWTH_ACCOUNTING = (
    "WITH ud AS (SELECT DISTINCT user_id, "
    "epoch_us(ts) // CAST(86400000000 AS BIGINT) AS d FROM events), "
    "f AS (SELECT user_id, min(d) AS fd FROM ud GROUP BY 1) "
    "SELECT ud.d, CAST(count(*) AS BIGINT) AS n_active, "
    "CAST(sum(CASE WHEN ud.d = f.fd THEN 1 ELSE 0 END) AS BIGINT) AS n_new,"
    " CAST(count(*) - sum(CASE WHEN ud.d = f.fd THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_returning "
    "FROM ud JOIN f USING (user_id) GROUP BY 1")


# --- session-9 additions ------------------------------------------------------

def q_orders_nation_profit(sf_dir: str, part_like: str = "widget"):
    """TPC-H Q9 shape (product-type profit by nation × year): lineitem joins
    the ORDER HEADER for the year on the partitioned spine while PART
    (name-pattern filter) and SUPPLIER→NATION ride as broadcast lookups —
    the dimension paths are vocabulary-bounded, so only the fact⋈fact edge
    (lineitem⋈orders) exchanges corpus-scale rows.

    Profit uses the int64-cents contract (floor(x*100+0.5)) so distributed
    partial sums match DuckDB's single-pass sum bit-exactly."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"]).take_all()
    keep_parts = np.array(sorted(
        r["p_partkey"] for r in part if part_like in r["p_name"]),
        dtype=np.int64)
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]).take_all()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]).take_all()
    s_keys = np.array([r["s_suppkey"] for r in supp], dtype=np.int64)
    s_nat = np.array([r["s_nationkey"] for r in supp], dtype=np.int32)
    n_keys = np.array([r["n_nationkey"] for r in nation], dtype=np.int32)
    n_names = np.array([r["n_name"] for r in nation], dtype=object)
    side_ref = ray.put((keep_parts, s_keys, s_nat, n_keys, n_names))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    spine = hash_join(li, orders, "l_orderkey", "o_orderkey",
                      right_cols=["o_orderdate"])

    def local(batch: pa.Table) -> pa.Table:
        kp, sk, sn, nk, nn = ray.get(side_ref)
        pkeys = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kp, pkeys)
        pos[pos >= len(kp)] = 0
        mask = kp[pos] == pkeys if len(kp) else np.zeros(len(pkeys), bool)
        batch = batch.filter(pa.array(mask, pa.bool_()))
        idx = pc.index_in(batch.column("l_suppkey"),
                          value_set=pa.array(sk, pa.int64()))
        supp_nat = sn[idx.to_numpy(zero_copy_only=False)]
        nidx = pc.index_in(pa.array(supp_nat, pa.int32()),
                           value_set=pa.array(nk, pa.int32()))
        names = nn[nidx.to_numpy(zero_copy_only=False)]
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        rev_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(rev, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "n_name": pa.array(list(names), pa.string()),
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64()),
            "rev_c": rev_c,
        })

    out = hash_aggregate(
        spine.map_batches(local, batch_format="pyarrow"),
        ["n_name", "o_year"], partial_aggs=[("rev_c", "sum")],
        aggs=[("rev_c_sum", "sum")], rename={"rev_c_sum_sum": "rev_c"},
        num_buckets=8)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch.column("n_name"),
            "o_year": batch.column("o_year"),
            "profit": pc.divide(pc.cast(batch.column("rev_c"), pa.float64()),
                                pa.scalar(100.0)),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def sql_orders_nation_profit(part_like: str = "widget") -> str:
    cents = _CENTS.format(x="l_extendedprice * (1 - l_discount)")
    return (
        "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        f"sum({cents}) / 100.0 AS profit "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE p_name LIKE '%{part_like}%' GROUP BY 1, 2")


def q_lineitem_flag_priority(sf_dir: str,
                             lo: str = "1997-01-01", hi: str = "1998-01-01"):
    """TPC-H Q12 shape (shipping-class vs order-priority audit): the
    shipdate window filters map-side BEFORE the only exchange, the order
    header joins on the partitioned spine, and per-returnflag HIGH/LOW
    priority line counts fold two-phase (per-batch combiner → one
    vocabulary-bounded groupby)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    lo_us = int(pd.Timestamp(lo).value // 1_000)
    hi_us = int(pd.Timestamp(hi).value // 1_000)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def window(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("l_shipdate"), pa.int64())
        mask = pc.and_(pc.greater_equal(ts, pa.scalar(lo_us, pa.int64())),
                       pc.less(ts, pa.scalar(hi_us, pa.int64())))
        batch = batch.filter(mask)
        return batch.select(["l_orderkey", "l_returnflag"])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(li.map_batches(window, batch_format="pyarrow"), orders,
                  "l_orderkey", "o_orderkey",
                  right_cols=["o_orderpriority"])

    def flags(batch: pa.Table) -> pa.Table:
        pr = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        high = np.isin(pr, np.array(["1-URGENT", "2-HIGH"], dtype=object))
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "high": pa.array(high.astype(np.int64)),
            "low": pa.array((~high).astype(np.int64)),
        })

    return hash_aggregate(
        j.map_batches(flags, batch_format="pyarrow"), ["l_returnflag"],
        partial_aggs=[("high", "sum"), ("low", "sum")],
        aggs=[("high_sum", "sum"), ("low_sum", "sum")],
        rename={"high_sum_sum": "high_line_count",
                "low_sum_sum": "low_line_count"}, num_buckets=4)


def sql_lineitem_flag_priority(lo: str = "1997-01-01",
                               hi: str = "1998-01-01") -> str:
    return (
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE l_shipdate >= TIMESTAMP '{lo}' "
        f"AND l_shipdate < TIMESTAMP '{hi}' GROUP BY 1")


def q_fk_integrity(sf_dir: str):
    """Referential-integrity audit after SIMULATED partial dimension loss —
    the data-quality scan a 100-TB ingest runs before training-set
    assembly.  Each check drops a deterministic, attribute-dependent slice
    of the parent table (the child key alone cannot predict membership, so
    the engine must really join) and counts orphaned child rows through the
    Bloom-prefiltered exact anti-join: surviving-parent keys fold to one
    fixed-size bitmap, bloom-miss child rows shortcut the shuffle, and only
    the positive tail enters the partitioned ``left_anti`` hash join.

    Output: one (check_name, n_orphans) row per relationship."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.joins import bloom_anti_join

    def survives(key: str, attr: str, lost_value: str, mod: int):
        # parent survives unless (attr == lost_value AND key % mod == 0)
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy(zero_copy_only=False)
            a = batch.column(attr).to_numpy(zero_copy_only=False)
            lost = (a == lost_value) & (k % mod == 0)
            return batch.filter(pa.array(~lost, pa.bool_())).select([key])
        return fn

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey"])
    checks = []

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(survives("o_orderkey", "o_orderpriority", "5-LOW", 5),
                     batch_format="pyarrow")
    checks.append(("lineitem_orders", bloom_anti_join(
        li.select_columns(["l_orderkey"]), orders,
        "l_orderkey", "o_orderkey").count()))

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_type"]) \
        .map_batches(survives("p_partkey", "p_type", "PROMO", 3),
                     batch_format="pyarrow")
    checks.append(("lineitem_part", bloom_anti_join(
        li.select_columns(["l_partkey"]), parts,
        "l_partkey", "p_partkey").count()))

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]) \
        .filter(expr="s_nationkey >= 5").select_columns(["s_suppkey"])
    checks.append(("lineitem_supplier", bloom_anti_join(
        li.select_columns(["l_suppkey"]), supp,
        "l_suppkey", "s_suppkey").count()))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(survives("c_custkey", "c_mktsegment", "BUILDING", 3),
                     batch_format="pyarrow")
    ords = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
    checks.append(("orders_customer", bloom_anti_join(
        ords, cust, "o_custkey", "c_custkey").count()))

    return pa.table({
        "check_name": pa.array([c[0] for c in checks], pa.string()),
        "n_orphans": pa.array([int(c[1]) for c in checks], pa.int64()),
    })


SQL_FK_INTEGRITY = """
SELECT 'lineitem_orders' AS check_name, CAST(count(*) AS BIGINT) AS n_orphans
FROM lineitem WHERE l_orderkey NOT IN (
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority != '5-LOW' OR o_orderkey % 5 != 0)
UNION ALL
SELECT 'lineitem_part', CAST(count(*) AS BIGINT) FROM lineitem
WHERE l_partkey NOT IN (
    SELECT p_partkey FROM part WHERE p_type != 'PROMO' OR p_partkey % 3 != 0)
UNION ALL
SELECT 'lineitem_supplier', CAST(count(*) AS BIGINT) FROM lineitem
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_nationkey >= 5)
UNION ALL
SELECT 'orders_customer', CAST(count(*) AS BIGINT) FROM orders
WHERE o_custkey NOT IN (
    SELECT c_custkey FROM customer
    WHERE c_mktsegment != 'BUILDING' OR c_custkey % 3 != 0)
"""


def q_events_ewma(sf_dir: str):
    """Per-user binary-decay trailing-8 EWMA of event values — the
    feature-engineering primitive for recency-weighted user signals, in
    EXACT integer arithmetic: values quantize to int64 micros
    (floor(v*1e6+0.5)) and the decay weights are powers of two
    (newest×128 … 8th-newest×1), so the weighted sum is a bit-exact int64
    on both sides.

    Scale shape: one keyed exchange (groupby user), per-group vectorized
    lexsort by (ts, event_id) + eight shifted adds — no global sort, no
    Python row loop.  Partitioning assumption: one user's history fits one
    group (the ``grouped_lag`` contract)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import default_coalesce

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def derive(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        micro = np.floor(v * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "micro": pa.array(micro),
        })

    def ewma(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        micro = g.column("micro").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        m = micro[order]
        acc = np.zeros(len(m), dtype=np.int64)
        for k in range(8):
            w = np.int64(1) << (7 - k)
            if k == 0:
                acc += m * w
            else:
                acc[k:] += m[:-k] * w
        return pa.table({
            "event_id": pa.array(ids[order], pa.int64()),
            "user_id": pa.array(
                [g.column("user_id")[0].as_py()] * len(m),
                g.column("user_id").type),
            "ewma_w": pa.array(acc),
        })

    return (ds.map_batches(derive, batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby("user_id").map_groups(ewma, batch_format="pyarrow"))


SQL_EVENTS_EWMA = (
    "WITH m AS (SELECT user_id, event_id, ts, "
    "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro FROM events) "
    "SELECT event_id, user_id, "
    + " + ".join(
        f"COALESCE(lag(micro, {k}) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id), 0) * {1 << (7 - k)}"
        for k in range(8))
    + " AS ewma_w FROM m")


def q_docs_textrank(sf_dir: str, iters: int = 5):
    """TextRank keyword scores (Mihalcea & Tarau 2004): PageRank over the
    word co-occurrence graph — an edge per ADJACENT token pair within a
    document, symmetrized, self-loops dropped.  Reuses the exact int64
    fixed-point PageRank recurrence (stages/analytics.pagerank), so the
    unrolled-CTE mirror hash-checks bit-for-bit.

    Scale shape: edges collapse to the distinct pair vocabulary per batch
    before the one exchange; each iteration broadcasts the rank vector
    (word-vocabulary bounded) and folds contributions two-phase."""
    import ray.data as rd

    from ontoray.extras.textstats import TOKEN_RE
    from ontoray.stages.analytics import pagerank

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def adj(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for t in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(t or "")
            for a, b in zip(toks, toks[1:]):
                if a != b:
                    srcs.append(a); dsts.append(b)
                    srcs.append(b); dsts.append(a)
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    return pagerank(ds.map_batches(adj, batch_format="pyarrow"), iters=iters)


def sql_docs_textrank(iters: int = 5) -> str:
    ctes = [
        "t AS (SELECT regexp_extract_all(coalesce(text, ''), '[a-z0-9]+') "
        "AS l FROM documents)",
        "bg AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p "
        "FROM t WHERE len(l) >= 2)",
        "trip AS (SELECT DISTINCT src, dst FROM ("
        "SELECT p[1] AS src, p[2] AS dst FROM bg WHERE p[1] <> p[2] "
        "UNION ALL SELECT p[2], p[1] FROM bg WHERE p[1] <> p[2]))",
    ] + _sql_pagerank_chain(iters)
    return ("WITH " + ", ".join(ctes) +
            f" SELECT name, CAST(r AS BIGINT) AS rank FROM r{iters}")


def q_events_survival(sf_dir: str):
    """Kaplan-Meier-style counting-process table over user lifetimes: for
    every calendar day, users AT RISK (first activity <= d <= last
    activity), users CHURNING that day (last activity == d), and the exact
    integer hazard churn*10^6 // at_risk.

    Scale shape: ONE user-keyed exchange folds each user to a (first, last)
    span; spans emit difference-array deltas (+1 at first, -1 at last+1)
    and churn marks, which fold to the CALENDAR-bounded day table; the
    prefix sum over days is a driver fold of that tiny table."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def derive(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"user_id": batch.column("user_id"), "d": d})

    spans = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow"), ["user_id"],
        partial_aggs=[("d", "min"), ("d", "max")],
        aggs=[("d_min", "min"), ("d_max", "max")],
        rename={"d_min_min": "fd", "d_max_max": "ld"})

    def deltas(batch: pa.Table) -> pa.Table:
        fd = batch.column("fd").to_numpy(zero_copy_only=False)
        ld = batch.column("ld").to_numpy(zero_copy_only=False)
        # difference array: +1 at fd, -1 at ld+1; churn mark at ld
        d = np.concatenate([fd, ld + 1, ld])
        delta = np.concatenate([np.ones(len(fd), np.int64),
                                -np.ones(len(ld), np.int64),
                                np.zeros(len(ld), np.int64)])
        churn = np.concatenate([np.zeros(2 * len(fd), np.int64),
                                np.ones(len(ld), np.int64)])
        return pa.table({"d": pa.array(d), "delta": pa.array(delta),
                         "churn": pa.array(churn)})

    day_tbl = hash_aggregate(
        spans.map_batches(deltas, batch_format="pyarrow"), ["d"],
        partial_aggs=[("delta", "sum"), ("churn", "sum")],
        aggs=[("delta_sum", "sum"), ("churn_sum", "sum")],
        rename={"delta_sum_sum": "delta", "churn_sum_sum": "churn"},
        num_buckets=4).take_all()          # calendar-bounded

    by_day = {r["d"]: r for r in day_tbl}
    days = sorted(by_day)
    lo, hi = days[0], max(r["d"] for r in day_tbl if r["churn"] > 0
                          or r["delta"] > 0)
    out_d, out_r, out_c, out_h = [], [], [], []
    at_risk = 0
    for d in range(lo, hi + 1):
        row = by_day.get(d)
        at_risk += row["delta"] if row else 0
        churn = row["churn"] if row else 0
        if at_risk <= 0:
            continue
        out_d.append(d); out_r.append(at_risk); out_c.append(churn)
        out_h.append(churn * 1_000_000 // at_risk)
    return pa.table({
        "d": pa.array(out_d, pa.int64()),
        "n_at_risk": pa.array(out_r, pa.int64()),
        "n_churn": pa.array(out_c, pa.int64()),
        "hazard_micro": pa.array(out_h, pa.int64())})


SQL_EVENTS_SURVIVAL = """
WITH ud AS (SELECT user_id,
                   epoch_us(ts) // CAST(86400000000 AS BIGINT) AS d
            FROM events),
spans AS (SELECT user_id, min(d) AS fd, max(d) AS ld FROM ud GROUP BY 1),
grid AS (SELECT unnest(generate_series((SELECT min(fd) FROM spans),
                                       (SELECT max(ld) FROM spans))) AS d),
day AS (SELECT g.d,
               CAST(count(*) AS BIGINT) AS n_at_risk,
               CAST(sum(CASE WHEN s.ld = g.d THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_churn
        FROM grid g JOIN spans s ON s.fd <= g.d AND g.d <= s.ld
        GROUP BY g.d)
SELECT d, n_at_risk, n_churn,
       CAST(n_churn * 1000000 // n_at_risk AS BIGINT) AS hazard_micro
FROM day WHERE n_at_risk > 0
"""


def q_embed_rp(sf_dir: str, r: int = 8):
    """Johnson-Lindenstrauss sign random projection: every embedding down
    to ``r`` dimensions via a deterministic ±1 matrix (sign = parity of the
    md5-int60 of 'rp_{j}_{d}') over int64 micro-quantized coordinates —
    exact integer output, so the mirror hash-checks with no float-order
    hazard.

    Scale shape: the sign matrix is (r × dim) CONSTANT (built once per
    worker from the salt strings, never shipped); per batch the projection
    is one numpy matmul.  Output long form (vec_id, j, y_q)."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.sketches import _md5_int60

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    sign_cache: dict = {}

    def project(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column("embedding").to_pylist()).astype(
            np.float64)
        dim = emb.shape[1]
        if "S" not in sign_cache:
            keys = [f"rp_{j}_{d}" for j in range(r) for d in range(dim)]
            par = (_md5_int60(keys) % 2).astype(np.int64)
            sign_cache["S"] = (2 * par - 1).reshape(r, dim)
        S = sign_cache["S"]
        q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        y = q @ S.T                                   # (n, r) int64
        n = len(q)
        return pa.table({
            "vec_id": pa.array(np.repeat(
                batch.column("vec_id").to_numpy(zero_copy_only=False), r)),
            "j": pa.array(np.tile(np.arange(r, dtype=np.int64), n)),
            "y_q": pa.array(y.reshape(-1)),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def sql_embed_rp(r: int = 8, dim: int = 64) -> str:
    from ontoray.extras.sketches import sql_md5_int60
    parity = "((" + sql_md5_int60(
        "'rp_' || CAST(j AS VARCHAR) || '_' || CAST(d - 1 AS VARCHAR)"
    ) + ") % 2)"
    return f"""
    WITH coords AS (SELECT vec_id, d, CAST(floor(CAST(e AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS q
                    FROM (SELECT vec_id, unnest(embedding) AS e,
                                 generate_subscripts(embedding, 1) AS d
                          FROM embeddings)),
    signs AS (SELECT j, d, 2 * {parity} - 1 AS s
              FROM (SELECT unnest(generate_series(0, {r - 1})) AS j) jj
              CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS d) dd)
    SELECT c.vec_id, s.j, CAST(sum(c.q * s.s) AS BIGINT) AS y_q
    FROM coords c JOIN signs s ON s.d = c.d
    GROUP BY c.vec_id, s.j
    """


def q_hll_set_ops(sf_dir: str):
    """Sketch SET OPERATIONS: per unordered source pair, the distinct-token
    UNION estimated by merging the two sources' HLL registers (register-wise
    max — the HLL merge law) next to the EXACT union count as referee.
    This is the mergeability property that makes HLL the 100-TB tool: union
    cardinality needs only the two fixed-size sketches, never a re-scan.

    Scale shape: one exchange folds distinct (source, token) pairs; per-
    source registers fold two-phase to ≤ sources×4096 rows (driver-held);
    the exact referee folds token→source-BITMASK (token-vocabulary bounded)
    and counts pair hits inside a per-batch combiner — no pairwise token
    shuffle.  Output: (s1, s2, n_zero, harmonic_num, est, n_union_exact)."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.sketches import (HLL_M, _RHO_MAX, _hll_partial)
    from ontoray.extras.textstats import TOKEN_RE
    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])

    def toks(batch: pa.Table) -> pa.Table:
        srcs, tks = [], []
        for s, t in zip(batch.column("source").to_pylist(),
                        batch.column("text").to_pylist()):
            for tok in set(TOKEN_RE.findall(t or "")):
                srcs.append(s); tks.append(tok)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "tok": pa.array(tks, pa.string())})

    dt = hash_aggregate(
        ds.map_batches(toks, batch_format="pyarrow"), ["source", "tok"],
        partial_aggs=[("tok", "count")], aggs=[("tok_count", "sum")],
        rename={"tok_count_sum": "__n"}).select_columns(["source", "tok"]) \
        .materialize()

    reg_rows = hash_aggregate(
        dt.map_batches(lambda b: _hll_partial(b, "tok", "source"),
                       batch_format="pyarrow"),
        ["source", "j"], partial_aggs=[("reg", "max")],
        aggs=[("reg_max", "max")], rename={"reg_max_max": "reg"}).take_all()

    sources = sorted({r["source"] for r in reg_rows})
    sidx = {s: i for i, s in enumerate(sources)}
    pair_list = [(a, b) for i, a in enumerate(sources)
                 for b in sources[i + 1:]]

    def mask(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        m = np.array([1 << sidx[s] for s in src], dtype=np.int64)
        return pa.table({"tok": batch.column("tok"), "m": pa.array(m)})

    tok_mask = hash_aggregate(
        dt.map_batches(mask, batch_format="pyarrow"), ["tok"],
        partial_aggs=[("m", "sum")], aggs=[("m_sum", "sum")],
        rename={"m_sum_sum": "m"})

    pm = np.array([(1 << sidx[a]) | (1 << sidx[b]) for a, b in pair_list],
                  dtype=np.int64)

    def pair_counts(batch: pa.Table) -> pa.Table:
        m = batch.column("m").to_numpy(zero_copy_only=False)
        hits = ((m[:, None] & pm[None, :]) != 0).sum(axis=0).astype(np.int64)
        return pa.table({"p": pa.array(np.arange(len(pm), dtype=np.int64)),
                         "c": pa.array(hits)})

    exact_rows = hash_aggregate(
        tok_mask.map_batches(pair_counts, batch_format="pyarrow"), ["p"],
        partial_aggs=[("c", "sum")], aggs=[("c_sum", "sum")],
        rename={"c_sum_sum": "c"}, num_buckets=2).take_all()
    exact = {int(r["p"]): int(r["c"]) for r in exact_rows}

    regs_by_src: dict = {}
    for r in reg_rows:
        regs_by_src.setdefault(r["source"], {})[r["j"]] = r["reg"]

    import math
    out = {"s1": [], "s2": [], "n_zero": [], "harmonic_num": [],
           "est": [], "n_union_exact": []}
    for p, (a, b) in enumerate(pair_list):
        merged: dict = dict(regs_by_src.get(a, {}))
        for j, v in regs_by_src.get(b, {}).items():
            if v > merged.get(j, 0):
                merged[j] = v
        n_zero = HLL_M - len(merged)
        s_num = n_zero * (1 << _RHO_MAX) + sum(
            1 << (_RHO_MAX - v) for v in merged.values())
        alpha = 0.7213 / (1 + 1.079 / HLL_M)
        raw = alpha * HLL_M * HLL_M * float(1 << _RHO_MAX) / s_num
        if raw <= 2.5 * HLL_M and n_zero > 0:
            est = HLL_M * math.log(HLL_M / n_zero)
        else:
            est = raw
        out["s1"].append(a); out["s2"].append(b)
        out["n_zero"].append(n_zero); out["harmonic_num"].append(s_num)
        out["est"].append(round(est, 4))
        out["n_union_exact"].append(exact.get(p, 0))
    return pa.table({
        "s1": pa.array(out["s1"], pa.string()),
        "s2": pa.array(out["s2"], pa.string()),
        "n_zero": pa.array(out["n_zero"], pa.int64()),
        "harmonic_num": pa.array(out["harmonic_num"], pa.int64()),
        "est": pa.array(out["est"], pa.float64()),
        "n_union_exact": pa.array(out["n_union_exact"], pa.int64())})


def sql_hll_set_ops() -> str:
    from ontoray.extras.sketches import (HLL_M, _RHO_MAX, _W_BITS,
                                         sql_md5_int60)
    m, wb, rmax = HLL_M, _W_BITS, _RHO_MAX
    alpha = f"(0.7213 / (1 + 1.079 / {m}))"
    raw = f"({alpha} * {m} * {m} * {float(1 << rmax)!r} / harmonic_num)"
    return f"""
    WITH src AS (SELECT source,
                        unnest(regexp_extract_all(coalesce(text, ''),
                                                  '[a-z0-9]+')) AS tok
                 FROM documents),
    dt AS (SELECT DISTINCT source, tok FROM src),
    h AS (SELECT source, {sql_md5_int60('tok')} AS h FROM dt),
    r AS (SELECT source, h >> {wb} AS j,
                 CASE WHEN (h & {(1 << wb) - 1}) = 0 THEN {rmax}
                      ELSE {rmax} - length(bin(h & {(1 << wb) - 1})) END
                   AS rho
          FROM h),
    reg AS (SELECT source, j, max(rho) AS reg FROM r GROUP BY 1, 2),
    ss AS (SELECT DISTINCT source FROM dt),
    pr AS (SELECT a.source AS s1, b.source AS s2
           FROM ss a JOIN ss b ON a.source < b.source),
    mreg AS (SELECT p.s1, p.s2, r.j, max(r.reg) AS reg
             FROM pr p JOIN reg r ON r.source IN (p.s1, p.s2)
             GROUP BY 1, 2, 3),
    agg AS (SELECT s1, s2, count(*) AS n_used,
                   sum((1::BIGINT << ({rmax} - reg))::BIGINT)::BIGINT
                     AS s_used
            FROM mreg GROUP BY 1, 2),
    fin AS (SELECT s1, s2, ({m} - n_used) AS n_zero,
                   (({m} - n_used) * (1::BIGINT << {rmax}) + s_used)::BIGINT
                     AS harmonic_num
            FROM agg),
    ex AS (SELECT p.s1, p.s2, CAST(count(DISTINCT d.tok) AS BIGINT)
             AS n_union_exact
           FROM pr p JOIN dt d ON d.source IN (p.s1, p.s2)
           GROUP BY 1, 2)
    SELECT fin.s1, fin.s2, CAST(n_zero AS BIGINT) AS n_zero, harmonic_num,
           round(CASE WHEN {raw} <= 2.5 * {m} AND n_zero > 0
                      THEN {m} * ln({m}::DOUBLE / n_zero)
                      ELSE {raw} END, 4) AS est,
           ex.n_union_exact
    FROM fin JOIN ex ON fin.s1 = ex.s1 AND fin.s2 = ex.s2
    """


def q_docs_cdc_merge(sf_dir: str):
    """CDC MERGE (the upsert/delete half of incremental ingest, SURVEY C3's
    big sibling): a deterministic change feed — DELETE every doc_id%10==0,
    UPDATE (text || ' v2') every %10==5, INSERT doc_id+1000000 for %10==3 —
    applied to the base snapshot through ONE full-outer partitioned hash
    join, change-side wins.  Output (doc_id, text, op) where op tags how
    the row survived ('base', 'update', 'insert'); deletes vanish.

    Scale shape: the delta derives map-side from the same scan (in
    production it is a small side table); the merge is the one exchange;
    no driver materialization."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.joins import hash_join

    base = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()

    def delta(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        txt = batch.column("text").to_pylist()
        d_id, d_op, d_txt = [], [], []
        for i, t in zip(ids.tolist(), txt):
            m = i % 10
            if m == 0:
                d_id.append(i); d_op.append("delete"); d_txt.append("")
            elif m == 5:
                d_id.append(i); d_op.append("update")
                d_txt.append((t or "") + " v2")
            elif m == 3:
                d_id.append(i + 1_000_000); d_op.append("insert")
                d_txt.append("new doc " + str(i))
        return pa.table({"doc_id": pa.array(d_id, pa.int64()),
                         "op": pa.array(d_op, pa.string()),
                         "new_text": pa.array(d_txt, pa.string())})

    ch = base.map_batches(delta, batch_format="pyarrow")
    merged = hash_join(base, ch, "doc_id", "doc_id",
                       how="full_outer", right_cols=["op", "new_text"])

    def apply(batch: pa.Table) -> pa.Table:
        op = batch.column("op")
        keep = pc.or_kleene(pc.is_null(op), pc.not_equal(op, pa.scalar("delete")))
        batch = batch.filter(pc.fill_null(keep, True))
        op = batch.column("op")
        is_ch = pc.is_valid(op)
        text = pc.if_else(is_ch, batch.column("new_text"),
                          batch.column("text"))
        out_op = pc.fill_null(op, "base")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": text, "op": out_op})

    return merged.map_batches(apply, batch_format="pyarrow")


SQL_DOCS_CDC_MERGE = """
WITH ch AS (
    SELECT doc_id, 'delete' AS op, '' AS new_text FROM documents
    WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id, 'update', coalesce(text, '') || ' v2' FROM documents
    WHERE doc_id % 10 = 5
    UNION ALL
    SELECT doc_id + 1000000, 'insert', 'new doc ' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 10 = 3)
SELECT coalesce(b.doc_id, ch.doc_id) AS doc_id,
       CASE WHEN ch.op IS NOT NULL THEN ch.new_text ELSE b.text END AS text,
       coalesce(ch.op, 'base') AS op
FROM documents b FULL OUTER JOIN ch ON b.doc_id = ch.doc_id
WHERE coalesce(ch.op, 'base') != 'delete'
"""


def q_events_range_join(sf_dir: str, window_s: int = 7200,
                        type_a: str = "click", type_b: str = "purchase"):
    """Interval/range join: for every ``type_a`` event, how many ``type_b``
    events by the SAME user landed within ±``window_s`` seconds — the
    attribution-window primitive an as-of join cannot express (it wants ALL
    neighbors, not the latest).

    Scale shape: time-bucket co-location — each a-event keys to its
    ``window_s`` bucket, each b-event REPLICATES to its own and both
    neighbor buckets (3× the small side, no corpus sort), pairs verify the
    exact |Δt| inside vocabulary-sized (user, bucket) groups, and per-event
    counts fold two-phase.  Every a-event gets a row (zero-count rows
    included via a left join against the pair counts)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import default_coalesce, hash_aggregate
    from ontoray.stages.joins import hash_join

    w_us = window_s * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def split(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()) \
               .to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        b = ts // w_us
        a_m = et == type_a
        b_m = et == type_b
        # a-rows once in their own bucket; b-rows replicated to b-1, b, b+1
        out_uid = np.concatenate([uid[a_m]] + [uid[b_m]] * 3)
        out_bkt = np.concatenate([b[a_m], b[b_m] - 1, b[b_m], b[b_m] + 1])
        out_eid = np.concatenate([eid[a_m]] + [eid[b_m]] * 3)
        out_ts = np.concatenate([ts[a_m]] + [ts[b_m]] * 3)
        out_side = np.concatenate([np.zeros(int(a_m.sum()), np.int8),
                                   np.ones(3 * int(b_m.sum()), np.int8)])
        return pa.table({
            "user_id": pa.array(out_uid), "bkt": pa.array(out_bkt),
            "event_id": pa.array(out_eid), "ts_us": pa.array(out_ts),
            "side": pa.array(out_side)})

    def pairs(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        bkt = g.column("bkt").to_numpy(zero_copy_only=False)
        a = side == 0
        bm = ~a
        if not a.any() or not bm.any():
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        # count b-neighbors ONLY where the b-copy's bucket equals the
        # a-event's own bucket (each (a,b) pair meets in exactly one group:
        # the a-bucket — the b-side replication guarantees presence)
        ta, ea = ts[a], eid[a]
        tb = ts[bm]
        hit = (np.abs(ta[:, None] - tb[None, :]) <= w_us)
        c = hit.sum(axis=1).astype(np.int64)
        return pa.table({"event_id": pa.array(ea, pa.int64()),
                         "c": pa.array(c)})

    st = ds.map_batches(split, batch_format="pyarrow") \
           .repartition(default_coalesce())
    cnt = hash_aggregate(
        st.groupby(["user_id", "bkt"]).map_groups(
            pairs, batch_format="pyarrow"),
        ["event_id"], partial_aggs=[("c", "sum")],
        aggs=[("c_sum", "sum")], rename={"c_sum_sum": "n_near"})

    a_events = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"),
                                    pa.scalar(type_a)))
                   .select(["event_id", "user_id"]),
        batch_format="pyarrow")
    out = hash_join(a_events, cnt, "event_id", "event_id",
                    how="left", right_cols=["n_near"])

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "n_near": pc.fill_null(pc.cast(batch.column("n_near"),
                                           pa.int64()), 0)})

    return out.map_batches(fin, batch_format="pyarrow")


def sql_events_range_join(window_s: int = 7200, type_a: str = "click",
                          type_b: str = "purchase") -> str:
    w = window_s * 1_000_000
    return f"""
    WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
               WHERE event_type = '{type_a}'),
    b AS (SELECT user_id, epoch_us(ts) AS t FROM events
          WHERE event_type = '{type_b}')
    SELECT a.event_id, a.user_id,
           CAST(count(b.t) AS BIGINT) AS n_near
    FROM a LEFT JOIN b ON a.user_id = b.user_id
                      AND abs(a.t - b.t) <= {w}
    GROUP BY a.event_id, a.user_id
    """


def q_events_bounce(sf_dir: str, gap_s: int = 1800):
    """Per-entry-type session bounce rate: sessions open at a > ``gap_s``
    silence (the events_session contract), each session is labeled by its
    ENTRY event type (first event by (ts, event_id)), and a session bounces
    when it contains exactly one event.  Output (entry_type, n_sessions,
    n_bounce, bounce_micro) with the exact integer rate.

    Scale shape: one user-keyed exchange; sessions, entry labels and bounce
    flags all derive vectorized inside the per-user group; the per-type
    fold is a second, vocabulary-bounded two-phase aggregate."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    gap_us = gap_s * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "event_type": batch.column("event_type")})

    def sess(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        ts, et = ts[order], et[order]
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        n_sess = sid[-1] + 1
        n_events = np.bincount(sid, minlength=n_sess)
        entry_idx = np.flatnonzero(new)
        return pa.table({
            "entry_type": pa.array(et[entry_idx], pa.string()),
            "one": pa.array(np.ones(n_sess, np.int64)),
            "bounce": pa.array((n_events == 1).astype(np.int64))})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .repartition(default_coalesce())
           .groupby("user_id").map_groups(sess, batch_format="pyarrow"))

    out = hash_aggregate(
        per, ["entry_type"],
        partial_aggs=[("one", "sum"), ("bounce", "sum")],
        aggs=[("one_sum", "sum"), ("bounce_sum", "sum")],
        rename={"one_sum_sum": "n_sessions", "bounce_sum_sum": "n_bounce"},
        num_buckets=4)

    def fin(batch: pa.Table) -> pa.Table:
        s = batch.column("n_sessions").to_numpy(zero_copy_only=False)
        b = batch.column("n_bounce").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bounce_micro", pa.array(b * 1_000_000 // s, pa.int64()))

    return out.map_batches(fin, batch_format="pyarrow")


def sql_events_bounce(gap_s: int = 1800) -> str:
    gap_us = gap_s * 1_000_000
    return f"""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t
               FROM events),
    d AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                           OR t - lag(t) OVER w > {gap_us}
                         THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM d),
    per AS (SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY 1, 2),
    ent AS (SELECT user_id, sid, event_type AS entry_type FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                             ORDER BY t, event_id) AS rn
                FROM s) WHERE rn = 1)
    SELECT ent.entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN per.n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce,
           CAST(sum(CASE WHEN per.n_events = 1 THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS bounce_micro
    FROM ent JOIN per ON ent.user_id = per.user_id AND ent.sid = per.sid
    GROUP BY 1
    """


def q_lm_kn_bigram(sf_dir: str, min_count: int = 3):
    """Kneser-Ney-smoothed bigram LM (Kneser & Ney 1995; the KenLM
    default) with the discount d = 3/4 carried in EXACT integer
    arithmetic: p_KN(w2|w1) = (n - d)/n_w1 + d·f_w1/n_w1 · n1_w2/B is
    pinned as the SUM OF TWO FLOOR-DIVIDED micro terms —
    term1 = (4n-3)·10^6 // (4·n_w1) and
    term2 = 3·f_w1·n1_w2·10^6 // (4·n_w1·B) — so distributed fold order
    cannot move the result (documented contract: the two-floor sum, not
    one rational).

    f_w1 = distinct followers of w1, n1_w2 = distinct predecessors of w2
    (the continuation count that makes KN better than add-k), B = distinct
    bigram types.  Output rows with n >= ``min_count``.

    Scale shape: bigram counts fold two-phase (Counter combiner); follower/
    predecessor tables re-aggregate the vocabulary-bounded bigram table;
    both joins are partitioned hash joins on bigram-table keys; B is one
    scalar fold."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from collections import Counter

    from ontoray.extras.textstats import TOKEN_RE
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(t or "")
            cnt.update(zip(toks, toks[1:]))
        w1 = [k[0] for k in cnt]
        w2 = [k[1] for k in cnt]
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "n": pa.array(list(cnt.values()), pa.int64())})

    c = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["w1", "w2"],
        aggs=[("n", "sum")], rename={"n_sum": "n"}).materialize()

    B = c.count()

    def u_part(batch: pa.Table) -> pa.Table:
        return pa.table({"w1": batch.column("w1"),
                         "nn": batch.column("n"),
                         "f": pa.array(np.ones(len(batch), np.int64))})

    u = hash_aggregate(
        c.map_batches(u_part, batch_format="pyarrow"), ["w1"],
        partial_aggs=[("nn", "sum"), ("f", "sum")],
        aggs=[("nn_sum", "sum"), ("f_sum", "sum")],
        rename={"nn_sum_sum": "n_w1", "f_sum_sum": "f_w1"})

    def v_part(batch: pa.Table) -> pa.Table:
        return pa.table({"w2": batch.column("w2"),
                         "p": pa.array(np.ones(len(batch), np.int64))})

    v = hash_aggregate(
        c.map_batches(v_part, batch_format="pyarrow"), ["w2"],
        partial_aggs=[("p", "sum")], aggs=[("p_sum", "sum")],
        rename={"p_sum_sum": "n1_w2"})

    big = c.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("n"), pa.scalar(min_count, pa.int64()))),
        batch_format="pyarrow")
    j = hash_join(big, u, "w1", "w1", right_cols=["n_w1", "f_w1"])
    j = hash_join(j, v, "w2", "w2", right_cols=["n1_w2"])

    def score(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        n_w1 = batch.column("n_w1").to_numpy(zero_copy_only=False)
        f_w1 = batch.column("f_w1").to_numpy(zero_copy_only=False)
        n1 = batch.column("n1_w2").to_numpy(zero_copy_only=False)
        t1 = (4 * n - 3) * 1_000_000 // (4 * n_w1)
        t2 = 3 * f_w1 * n1 * 1_000_000 // (4 * n_w1 * B)
        return batch.append_column(
            "p_kn_micro", pa.array((t1 + t2).astype(np.int64)))

    return j.map_batches(score, batch_format="pyarrow")


def sql_lm_kn_bigram(min_count: int = 3) -> str:
    return f"""
    WITH t AS (SELECT regexp_extract_all(coalesce(text, ''), '[a-z0-9]+')
                 AS l FROM documents),
    bg AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
           FROM t WHERE len(l) >= 2),
    c AS (SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS n
          FROM bg GROUP BY 1, 2),
    u AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_w1,
                 CAST(count(*) AS BIGINT) AS f_w1 FROM c GROUP BY 1),
    v AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_w2 FROM c GROUP BY 1),
    bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM c)
    SELECT c.w1, c.w2, c.n, u.n_w1, u.f_w1, v.n1_w2,
           CAST((4 * c.n - 3) * 1000000 // (4 * u.n_w1)
                + 3 * u.f_w1 * v.n1_w2 * 1000000 // (4 * u.n_w1 * bb.b)
             AS BIGINT) AS p_kn_micro
    FROM c JOIN u USING (w1) JOIN v USING (w2) CROSS JOIN bb
    WHERE c.n >= {min_count}
    """


def q_embed_ivfpq(sf_dir: str, k: int = 10, m: int = 4, kc: int = 8,
                  kq: int = 8, nprobe: int = 2, iters: int = 2):
    """IVF+PQ composed ANN search (the FAISS IVFPQ plan, exact-arithmetic
    edition): a fixed-point k-means COARSE index prunes the scan to
    ``nprobe`` probed cells (integer cluster-sum probe cosine — the
    ann_ivf contract), and candidates rank by the ASYMMETRIC-DISTANCE
    integer surrogate: approx_dot(q, x) = Σ_subspace dot(q_sub, PQ
    centroid of x's code) — the query never meets a raw vector until the
    final cosine readout of the winners.

    All ranking arithmetic is int64 on KM_SCALE-quantized values, so the
    DuckDB mirror reproduces the probe set, the PQ codes and the ranking
    bit-for-bit; ties break on vec_id.  Output (vec_id, approx_dot,
    cosine) — cosine is the round-6 readout for recall inspection.

    Scale shape: both trainings are the kmeans_fixed k×dim partial folds;
    the scan recomputes coarse + PQ assignments per batch against
    broadcast centroids (no joins), keeps per-batch top-k, and the global
    merge is k-bounded."""
    import math

    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.extras.ann import query_vector
    from ontoray.extras.kmeans import KM_SCALE, _quantize, kmeans_fixed
    from ontoray.stages.agg import hash_aggregate
    from ontoray.util import column_lists

    dim = _embedding_dim(sf_dir)
    qv = query_vector(dim)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    _, coarse_C, dsm = kmeans_fixed(ds, k=kc, iters=iters, seed=42,
                                    return_centroids=True)
    cbc = ray.put(coarse_C)

    def cluster_sums(batch: pa.Table) -> pa.Table:
        C = ray.get(cbc)
        q = _quantize(batch, "embedding")
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        out_c, out_p, out_s = [], [], []
        for c in np.unique(cl):
            s = q[cl == c].sum(axis=0)
            out_c.extend([int(c)] * dim)
            out_p.extend(range(dim))
            out_s.extend(int(x) for x in s)
        return pa.table({"cl": pa.array(out_c, pa.int64()),
                         "pos": pa.array(out_p, pa.int64()),
                         "s": pa.array(out_s, pa.int64())})

    agg = column_lists(
        hash_aggregate(dsm.map_batches(cluster_sums, batch_format="pyarrow"),
                       ["cl", "pos"], partial_aggs=[("s", "sum")],
                       aggs=[("s_sum", "sum")], rename={"s_sum_sum": "s"},
                       num_buckets=8), ["cl", "pos", "s"])
    S: dict = {}
    for c, p, s in zip(agg["cl"], agg["pos"], agg["s"]):
        S.setdefault(c, [0] * dim)[p] = int(s)
    qq = [int(x) for x in np.floor(qv * KM_SCALE + 0.5).astype(np.int64)]
    n1 = sum(v * v for v in qq)
    scored = []
    for c, sv in S.items():
        dot = sum(a * b for a, b in zip(qq, sv))
        n2 = sum(v * v for v in sv)
        cos = float(dot) / math.sqrt(float(n2 * n1)) if n2 > 0 and n1 > 0 \
            else -2.0
        scored.append((-cos, c))
    probes = np.array(sorted(c for _n, c in sorted(scored)[:nprobe]),
                      dtype=np.int64)

    sub_C = []
    for mi in range(m):
        lo, hi = mi * dim // m, (mi + 1) * dim // m

        def slice_batch(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            vecs = np.array(batch.column("embedding").to_pylist(),
                            dtype=np.float64)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "embedding": pa.array(vecs[:, lo:hi].tolist(),
                                      pa.list_(pa.float64()))})

        _, C_mi, _ = kmeans_fixed(
            dsm.map_batches(slice_batch, batch_format="pyarrow"),
            k=kq, iters=iters, seed=142 + mi, return_centroids=True)
        sub_C.append(C_mi)

    qq_np = np.array(qq, dtype=np.int64)
    qdots = [sub_C[mi] @ qq_np[mi * dim // m:(mi + 1) * dim // m]
             for mi in range(m)]
    bc = ray.put((coarse_C, sub_C, probes, qdots, qv))

    def scan(batch: pa.Table) -> pa.Table:
        C, SC, pr, qd, qvf = ray.get(bc)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        q = np.floor(vecs * KM_SCALE + 0.5).astype(np.int64)
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        keep = np.isin(d2.argmin(axis=1), pr)
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "approx_dot": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids, vecs, q = ids[keep], vecs[keep], q[keep]
        approx = np.zeros(len(ids), dtype=np.int64)
        for mi in range(len(SC)):
            lo, hi = mi * q.shape[1] // len(SC), \
                (mi + 1) * q.shape[1] // len(SC)
            dd = ((q[:, None, lo:hi] - SC[mi][None, :, :]) ** 2).sum(axis=2)
            approx += qd[mi][dd.argmin(axis=1)]
        norms = np.linalg.norm(vecs, axis=1) * np.linalg.norm(qvf)
        norms[norms == 0] = 1.0
        cos = np.round((vecs @ qvf) / norms, 6)
        order = np.lexsort((ids, -approx))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "approx_dot": pa.array(approx[order], pa.int64()),
            "cosine": pa.array(cos[order], pa.float64())})

    rows = dsm.map_batches(scan, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["approx_dot"], r["vec_id"]))
    top = rows[:k]
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
        "approx_dot": pa.array([r["approx_dot"] for r in top], pa.int64()),
        "cosine": pa.array([r["cosine"] for r in top], pa.float64())})


def sql_embed_ivfpq(sf_dir: str, k: int = 10, m: int = 4, kc: int = 8,
                    kq: int = 8, nprobe: int = 2, iters: int = 2) -> str:
    """DuckDB mirror of q_embed_ivfpq: coarse kmeans CTE chain + probe
    cosine (sql_ann_ivf pattern), per-subspace kmeans chains renamed
    ``_s{mi}`` (sql_pq_codes pattern), ADC scores from the subspace
    centroid tables, identical (approx_dot DESC, vec_id) final order."""
    import re as _re

    import numpy as np

    from ontoray.extras.ann import query_vector
    from ontoray.extras.kmeans import KM_SCALE, sql_kmeans_ctes

    dim = _embedding_dim(sf_dir)
    qv = query_vector(dim)
    qq = [int(x) for x in np.floor(qv * KM_SCALE + 0.5).astype(np.int64)]
    n1 = sum(v * v for v in qq)
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    qq_vals = ", ".join(f"({i + 1}, CAST({v} AS HUGEINT))"
                        for i, v in enumerate(qq))

    ctes, final = sql_kmeans_ctes(kc, iters, 42, "embeddings")
    all_ctes = list(ctes)

    sub_finals = []
    for mi in range(m):
        lo, hi = mi * dim // m, (mi + 1) * dim // m
        sub = (f"(SELECT vec_id, embedding[{lo + 1}:{hi}] AS embedding "
               f"FROM embeddings)")
        sctes, sfinal = sql_kmeans_ctes(kq, iters, 142 + mi, table=sub)
        names = ["q", "sd"] + [f"{p}{t}" for t in range(iters + 1)
                               for p in ("c", "a", "cell", "cent")]
        for ci in range(len(sctes)):
            s = sctes[ci]
            for n in sorted(names, key=len, reverse=True):
                s = _re.sub(rf"\b{n}\b", f"{n}_s{mi}", s)
            sctes[ci] = s
        for n in sorted(names, key=len, reverse=True):
            sfinal = _re.sub(rf"\b{n}\b", f"{n}_s{mi}", sfinal)
        all_ctes.extend(sctes)
        sub_finals.append(sfinal)

    qd_ctes, qd_joins, qd_sum = [], [], []
    for mi in range(m):
        lo = mi * dim // m
        sub_q = "[" + ", ".join(
            f"CAST({qq[lo + i]} AS BIGINT)"
            for i in range(dim // m)) + "]"
        qd_ctes.append(
            f"qd_s{mi} AS (SELECT cl, CAST(list_sum(list_transform("
            f"list_zip(qv, {sub_q}), p -> p[1] * p[2])) AS BIGINT) AS v "
            f"FROM c{iters - 1}_s{mi})")
        qd_joins.append(
            f"JOIN {sub_finals[mi]} b{mi} ON b{mi}.vec_id = cand.vec_id "
            f"JOIN qd_s{mi} q{mi} ON q{mi}.cl = b{mi}.cl")
        qd_sum.append(f"q{mi}.v")

    return f"""
    WITH {", ".join(all_ctes)},
    qq(pos, v) AS (VALUES {qq_vals}),
    csum AS (SELECT a.cl, t.pos,
                    CAST(sum(CAST(q.qv[t.pos] AS HUGEINT)) AS HUGEINT) AS s
             FROM {final} a JOIN q USING (vec_id),
                  unnest(generate_series(1, len(q.qv))) AS t(pos)
             GROUP BY 1, 2),
    pr AS (SELECT c.cl, sum(c.s * qq.v) AS dot, sum(c.s * c.s) AS n2
           FROM csum c JOIN qq USING (pos) GROUP BY c.cl),
    probes AS (SELECT cl FROM (
        SELECT cl, CASE WHEN n2 > 0 THEN CAST(dot AS DOUBLE)
                                         / sqrt(CAST(n2 * {n1} AS DOUBLE))
                        ELSE -2.0 END AS cos
        FROM pr) ORDER BY cos DESC, cl LIMIT {nprobe}),
    cand AS (SELECT a.vec_id FROM {final} a JOIN probes p ON p.cl = a.cl),
    {", ".join(qd_ctes)},
    tot AS (SELECT cand.vec_id, {" + ".join(qd_sum)} AS approx_dot
            FROM cand {" ".join(qd_joins)})
    SELECT t.vec_id, t.approx_dot,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST({qlit} AS DOUBLE[])), 6)
             AS cosine
    FROM tot t JOIN embeddings e ON e.vec_id = t.vec_id
    ORDER BY t.approx_dot DESC, t.vec_id LIMIT {k}
    """


# --- containment dedup / filtered+refined ANN / session paths / argmax join -


def q_docs_containment(sf_dir: str, threshold: float = 0.5, k: int = 3):
    """Asymmetric CONTAINMENT near-dup pairs over documents (Broder's
    resemblance-vs-containment distinction): C = c/min(na, nb) catches the
    quote-inclusion / page-wraps-page duplication Jaccard misses.  Engine in
    ``extras/dedup.containment_pairs`` (shared inverted-shingle-index
    machinery with ``jaccard_pairs``)."""
    import ray.data as rd

    from ontoray.extras.dedup import containment_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return containment_pairs(ds, threshold=threshold, k=k)


def q_ann_filtered(sf_dir: str, k: int = 10, mod: int = 3):
    """FILTERED vector search (the vector-DB serving shape: top-k among
    vectors satisfying a metadata predicate, here label % ``mod`` == 0):
    the predicate is applied map-side per batch BEFORE any scoring, so
    non-matching vectors never cost a matmul row; with a reader-expressible
    predicate this filter belongs in the parquet read (row-group pruning) —
    map-side here because the modulo predicate is not a column statistic.
    Scoring/merge reuse the brute_force_topk contract (local top-k, tiny
    global merge, round-6 cosine, vec_id tie-break)."""
    import numpy as np
    import ray.data as rd

    from ontoray.extras.ann import brute_force_topk, query_vector

    dim = _embedding_dim(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def keep(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(lab % mod == 0)).drop_columns(["label"])

    return brute_force_topk(ds.map_batches(keep, batch_format="pyarrow"),
                            query_vector(dim), k=k)


def sql_ann_filtered(sf_dir: str, k: int = 10, mod: int = 3) -> str:
    from ontoray.extras.ann import query_vector
    dim = _embedding_dim(sf_dir)
    q = query_vector(dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in q) + "]"
    return (f"SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS "
            f"DOUBLE[]), CAST({qlit} AS DOUBLE[])), 6) AS cosine "
            f"FROM embeddings WHERE label % {mod} = 0 "
            f"ORDER BY cosine DESC, vec_id LIMIT {k}")


def q_ann_refine(sf_dir: str, k: int = 10, r: int = 50, m: int = 4,
                 kq: int = 8, iters: int = 2):
    """Two-stage PQ-ADC search with EXACT re-rank (the FAISS
    IndexRefineFlat plan): stage 1 ranks the WHOLE corpus by the integer
    asymmetric-distance surrogate approx_dot = Σ_subspace dot(q_sub, PQ
    centroid of x's code) and keeps the top ``r`` candidates; stage 2
    re-ranks those ``r`` by exact cosine and returns the top ``k``.  The
    refine step converts PQ's lossy ranking into near-exact recall at the
    cost of ``r`` exact distance evaluations — the standard
    billion-vector serving trade.

    All stage-1 arithmetic is int64 on KM_SCALE-quantized values (the
    embed_pq/embed_ivfpq contract) so the DuckDB mirror reproduces the
    candidate set bit-for-bit; ties break on vec_id at BOTH cuts; stage-2
    cosine is the round-6 readout.

    Scale shape: subspace trainings are kmeans_fixed k×(dim/m) partial
    folds; the scan recomputes PQ assignments per batch against broadcast
    sub-centroids, carries exact cosine in the same pass (no second corpus
    read), and keeps per-batch top-r — the global merge is r-bounded."""
    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.extras.ann import query_vector
    from ontoray.extras.kmeans import KM_SCALE, kmeans_fixed

    dim = _embedding_dim(sf_dir)
    qv = query_vector(dim)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    dsm = ds.materialize()

    sub_C = []
    for mi in range(m):
        lo, hi = mi * dim // m, (mi + 1) * dim // m

        def slice_batch(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            vecs = np.array(batch.column("embedding").to_pylist(),
                            dtype=np.float64)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "embedding": pa.array(vecs[:, lo:hi].tolist(),
                                      pa.list_(pa.float64()))})

        _, C_mi, _ = kmeans_fixed(
            dsm.map_batches(slice_batch, batch_format="pyarrow"),
            k=kq, iters=iters, seed=42 + mi, return_centroids=True)
        sub_C.append(C_mi)

    qq = np.floor(qv * KM_SCALE + 0.5).astype(np.int64)
    qdots = [sub_C[mi] @ qq[mi * dim // m:(mi + 1) * dim // m]
             for mi in range(m)]
    bc = ray.put((sub_C, qdots, qv))

    def scan(batch: pa.Table) -> pa.Table:
        SC, qd, qvf = ray.get(bc)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(),
                        dtype=np.float64)
        q = np.floor(vecs * KM_SCALE + 0.5).astype(np.int64)
        approx = np.zeros(len(ids), dtype=np.int64)
        for mi in range(len(SC)):
            lo = mi * q.shape[1] // len(SC)
            hi = (mi + 1) * q.shape[1] // len(SC)
            dd = ((q[:, None, lo:hi] - SC[mi][None, :, :]) ** 2).sum(axis=2)
            approx += qd[mi][dd.argmin(axis=1)]
        norms = np.linalg.norm(vecs, axis=1) * np.linalg.norm(qvf)
        norms[norms == 0] = 1.0
        cos = np.round((vecs @ qvf) / norms, 6)
        order = np.lexsort((ids, -approx))[:r]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "approx_dot": pa.array(approx[order], pa.int64()),
            "cosine": pa.array(cos[order], pa.float64())})

    rows = dsm.map_batches(scan, batch_format="pyarrow").take_all()
    rows.sort(key=lambda x: (-x["approx_dot"], x["vec_id"]))
    cand = rows[:r]
    cand.sort(key=lambda x: (-x["cosine"], x["vec_id"]))
    top = cand[:k]
    return pa.table({
        "vec_id": pa.array([x["vec_id"] for x in top], pa.int64()),
        "approx_dot": pa.array([x["approx_dot"] for x in top], pa.int64()),
        "cosine": pa.array([x["cosine"] for x in top], pa.float64())})


def sql_ann_refine(sf_dir: str, k: int = 10, r: int = 50, m: int = 4,
                   kq: int = 8, iters: int = 2) -> str:
    """DuckDB mirror of q_ann_refine: per-subspace kmeans chains
    (sql_pq_subspace_ctes), ADC scores from the subspace centroid tables,
    candidate cut (approx_dot DESC, vec_id LIMIT r), exact-cosine re-rank
    cut (cosine DESC, vec_id LIMIT k)."""
    import numpy as np

    from ontoray.extras.ann import query_vector
    from ontoray.extras.kmeans import KM_SCALE
    from ontoray.extras.pq import sql_pq_subspace_ctes

    dim = _embedding_dim(sf_dir)
    qv = query_vector(dim)
    qq = np.floor(qv * KM_SCALE + 0.5).astype(np.int64)
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"

    all_ctes, finals = sql_pq_subspace_ctes(m, kq, iters, 42, dim,
                                            "embeddings")
    qd_ctes, qd_joins, qd_sum = [], [], []
    for mi, final in finals:
        lo = mi * dim // m
        sub_q = "[" + ", ".join(
            f"CAST({int(qq[lo + i])} AS BIGINT)"
            for i in range(dim // m)) + "]"
        qd_ctes.append(
            f"qd_s{mi} AS (SELECT cl, CAST(list_sum(list_transform("
            f"list_zip(qv, {sub_q}), p -> p[1] * p[2])) AS BIGINT) AS v "
            f"FROM c{iters - 1}_s{mi})")
        qd_joins.append(
            f"JOIN {final} b{mi} ON b{mi}.vec_id = e.vec_id "
            f"JOIN qd_s{mi} q{mi} ON q{mi}.cl = b{mi}.cl")
        qd_sum.append(f"q{mi}.v")

    return f"""
    WITH {", ".join(all_ctes)},
    {", ".join(qd_ctes)},
    tot AS (SELECT e.vec_id, {" + ".join(qd_sum)} AS approx_dot
            FROM embeddings e {" ".join(qd_joins)}),
    cand AS (SELECT vec_id, approx_dot FROM tot
             ORDER BY approx_dot DESC, vec_id LIMIT {r})
    SELECT c.vec_id, c.approx_dot,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST({qlit} AS DOUBLE[])), 6)
             AS cosine
    FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
    ORDER BY cosine DESC, c.vec_id LIMIT {k}
    """


def q_events_paths(sf_dir: str, gap_s: int = 1800, depth: int = 3):
    """Top session ENTRY PATHS (product-analytics path analysis): sessions
    open at a > ``gap_s`` silence (the events_session contract), each
    session is labeled by its first up-to-``depth`` event types joined by
    '>', and the output is the full (path, n_sessions) distribution — the
    path vocabulary is bounded by |event types|^depth, so no top-k cut is
    needed.

    Scale shape: one user-keyed exchange; paths derive vectorized inside
    the per-user group (session boundaries by timestamp diff, a bounded
    per-session prefix slice); the per-path fold is a second,
    vocabulary-bounded two-phase aggregate."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    gap_us = gap_s * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "event_type": batch.column("event_type")})

    def sess(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        ts, et = ts[order], et[order]
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts))
        paths = [">".join(et[s:min(s + depth, e)])
                 for s, e in zip(starts, ends)]
        return pa.table({"path": pa.array(paths, pa.string()),
                         "one": pa.array(np.ones(len(paths), np.int64))})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .repartition(default_coalesce())
           .groupby("user_id").map_groups(sess, batch_format="pyarrow"))

    return hash_aggregate(
        per, ["path"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_sessions"},
        num_buckets=4)


def sql_events_paths(gap_s: int = 1800, depth: int = 3) -> str:
    gap_us = gap_s * 1_000_000
    return f"""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t
               FROM events),
    d AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                           OR t - lag(t) OVER w > {gap_us}
                         THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM d),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                       ORDER BY t, event_id) AS rn
          FROM s),
    p AS (SELECT user_id, sid,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= {depth} GROUP BY 1, 2)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1
    """


def q_custs_favorite_brand(sf_dir: str):
    """Per-customer FAVORITE part brand (grouped argmax over a 3-table
    join) rolled up to the brand distribution: favorite = the brand with
    the max total quantity across all the customer's lineitems, ties →
    lexicographically min brand.  Output (brand, n_customers).

    Scale shape: lineitem ⋈ orders is the partitioned spine; part is a
    dimension-bounded broadcast (ray.put once, index_in per batch); the
    (custkey, brand) totals fold two-phase; the argmax is the
    max-join-back idiom (customer-keyed max + equality filter + min-brand
    tie fold) — three customer-scale exchanges, never a sort."""
    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]).take_all()
    p_keys = np.array([x["p_partkey"] for x in part], dtype=np.int64)
    p_brand = np.array([x["p_brand"] for x in part], dtype=object)
    side = ray.put((p_keys, p_brand))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_quantity"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    spine = hash_join(li, orders, "l_orderkey", "o_orderkey", how="inner")

    def attach(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        pk, pb = ray.get(side)
        idx = pc.index_in(batch.column("l_partkey"),
                          value_set=pa.array(pk, pa.int64()))
        brand = pb[idx.to_numpy(zero_copy_only=False)]
        qty = batch.column("l_quantity").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ck": batch.column("o_custkey"),
            "brand": pa.array(brand, pa.string()),
            "qty": pa.array(qty, pa.int64())})

    per = hash_aggregate(
        spine.map_batches(attach, batch_format="pyarrow"),
        ["ck", "brand"], partial_aggs=[("qty", "sum")],
        aggs=[("qty_sum", "sum")], rename={"qty_sum_sum": "qty"})

    mx = hash_aggregate(per, ["ck"], aggs=[("qty", "max")],
                        rename={"qty_max": "qmax"})
    wm = hash_join(per, mx, "ck", "ck", how="inner")

    def winners(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch.column("qty"),
                                     batch.column("qmax")))

    fav = hash_aggregate(
        wm.map_batches(winners, batch_format="pyarrow"),
        ["ck"], aggs=[("brand", "min")], rename={"brand_min": "brand"})

    def ones(batch: pa.Table) -> pa.Table:
        import numpy as np
        return pa.table({"brand": batch.column("brand"),
                         "one": pa.array(np.ones(batch.num_rows, np.int64))})

    return hash_aggregate(
        fav.map_batches(ones, batch_format="pyarrow"), ["brand"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_customers"}, num_buckets=8)


def sql_custs_favorite_brand() -> str:
    return """
    WITH j AS (SELECT o.o_custkey AS ck, p.p_brand AS brand,
                      sum(CAST(l.l_quantity AS BIGINT)) AS qty
               FROM lineitem l
               JOIN orders o ON o.o_orderkey = l.l_orderkey
               JOIN part p ON p.p_partkey = l.l_partkey
               GROUP BY 1, 2),
    mx AS (SELECT ck, max(qty) AS qmax FROM j GROUP BY 1),
    fav AS (SELECT j.ck, min(j.brand) AS brand
            FROM j JOIN mx ON mx.ck = j.ck AND j.qty = mx.qmax
            GROUP BY 1)
    SELECT brand, CAST(count(*) AS BIGINT) AS n_customers
    FROM fav GROUP BY 1
    """


# --- bloom FPR referee / coreset sampling / OLS trend / sliding WAU ---------


def q_bloom_fpr_eval(sf_dir: str, m_bits: int = 65536, kh: int = 2,
                     n_probe: int = 5000):
    """Bloom-filter false-positive-rate REFEREE: build the SQL-expressible
    md5 bloom (h = md5-int60 of the key; Kirsch-Mitzenmacher positions
    (h>>30 + i·((h & 2^30-1)|1)) mod m) over the distinct order keys, probe
    it with ``n_probe`` keys guaranteed disjoint from the train universe
    ('probe-{j}' vs all-digit train keys), and report the MEASURED
    false-positive rate — the empirical check behind every bloom_anti_join
    sizing decision.  Output one row: (m_bits, k, n_train, n_bits_set,
    n_probe, n_fp, fpr_micro) with fpr_micro = n_fp·10^6 // n_probe.

    Scale shape: the train side folds to the distinct SET-BIT table
    (bounded by m_bits, never by corpus size) via per-batch distinct +
    one bounded exchange; the probe pass checks a broadcast bit-set
    vectorized.  (The production ``stages/joins.build_bloom`` uses the
    faster xxhash — this referee pins the md5 contract so DuckDB can
    replay the exact bitmap.)"""
    import numpy as np
    import ray
    import ray.data as rd

    from ontoray.extras.sketches import _md5_int60
    from ontoray.stages.agg import hash_aggregate

    mask30 = (1 << 30) - 1

    def positions(keys: list) -> np.ndarray:
        h = _md5_int60(keys)
        h1 = h >> 30
        h2 = (h & mask30) | 1
        i = np.arange(kh, dtype=np.int64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def to_pos(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch.column("o_orderkey").to_pylist()]
        pos = np.unique(positions(keys).ravel()) if keys else \
            np.array([], dtype=np.int64)
        return pa.table({"pos": pa.array(pos, pa.int64()),
                         "n": pa.array(np.ones(len(pos), np.int64))})

    setbits = hash_aggregate(
        ds.map_batches(to_pos, batch_format="pyarrow"), ["pos"],
        aggs=[("n", "sum")], rename={"n_sum": "cnt"}, num_buckets=8)
    bits = np.zeros(m_bits, dtype=bool)
    set_pos = np.array([r["pos"] for r in setbits.take_all()], dtype=np.int64)
    bits[set_pos] = True
    n_bits_set = int(bits.sum())
    n_train = ds.count()

    bref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = [f"probe-{int(v)}" for v in batch.column("id").to_pylist()]
        pos = positions(keys)
        fp = b[pos].all(axis=1)
        return pa.table({"fp": pa.array(np.array([int(fp.sum())]), pa.int64()),
                         "n": pa.array([len(keys)], pa.int64())})

    probes = rd.range(n_probe).map_batches(
        lambda b: pa.table({"id": pa.array(b["id"], pa.int64())}),
        batch_format="numpy").map_batches(probe, batch_format="pyarrow")
    tot = probes.to_pandas().sum()
    n_fp = int(tot["fp"])
    return pa.table({
        "m_bits": pa.array([m_bits], pa.int64()),
        "k": pa.array([kh], pa.int64()),
        "n_train": pa.array([n_train], pa.int64()),
        "n_bits_set": pa.array([n_bits_set], pa.int64()),
        "n_probe": pa.array([n_probe], pa.int64()),
        "n_fp": pa.array([n_fp], pa.int64()),
        "fpr_micro": pa.array([n_fp * 1_000_000 // n_probe], pa.int64())})


def sql_bloom_fpr_eval(m_bits: int = 65536, kh: int = 2,
                       n_probe: int = 5000) -> str:
    from ontoray.extras.sketches import sql_md5_int60
    h_train = sql_md5_int60("CAST(o_orderkey AS VARCHAR)")
    h_probe = sql_md5_int60("'probe-' || CAST(j AS VARCHAR)")
    mask30 = (1 << 30) - 1
    return f"""
    WITH ks AS (SELECT DISTINCT {h_train} AS h FROM orders),
    tpos AS (SELECT DISTINCT ((h >> 30) + i * ((h & {mask30}) | 1))
                             % {m_bits} AS pos
             FROM ks, unnest(generate_series(0, {kh - 1})) AS t(i)),
    pk AS (SELECT j, {h_probe} AS h
           FROM unnest(generate_series(0, {n_probe - 1})) AS s(j)),
    ppos AS (SELECT j, ((h >> 30) + i * ((h & {mask30}) | 1))
                       % {m_bits} AS pos
             FROM pk, unnest(generate_series(0, {kh - 1})) AS t(i)),
    hits AS (SELECT p.j, count(DISTINCT p.pos) AS n_hit
             FROM ppos p JOIN tpos t ON t.pos = p.pos GROUP BY 1),
    kpos AS (SELECT j, count(DISTINCT pos) AS n_pos FROM ppos GROUP BY 1),
    fp AS (SELECT count(*) AS n_fp
           FROM kpos k JOIN hits h ON h.j = k.j AND h.n_hit = k.n_pos)
    SELECT CAST({m_bits} AS BIGINT) AS m_bits, CAST({kh} AS BIGINT) AS k,
           (SELECT count(*) FROM orders) AS n_train,
           (SELECT count(*) FROM tpos) AS n_bits_set,
           CAST({n_probe} AS BIGINT) AS n_probe,
           CAST(fp.n_fp AS BIGINT) AS n_fp,
           CAST(fp.n_fp * 1000000 // {n_probe} AS BIGINT) AS fpr_micro
    FROM fp
    """


def q_embed_coreset(sf_dir: str, k: int = 8, cap: int = 20, iters: int = 2):
    """Cluster-stratified CORESET selection (the cluster-balanced
    data-selection step: at most ``cap`` vectors per k-means cell, chosen
    deterministically): composes the exact fixed-point distributed Lloyd
    (``kmeans_fixed``) with the md5-rank domain-cap sampler
    (``per_group_cap``) — the same keep-n-per-group contract used for
    host caps, applied to geometry cells.  Output (cluster, vec_id, rn).

    Scale shape: kmeans folds k×dim partials; the cap's per-batch combiner
    bounds the exchange at cap × cells × blocks rows."""
    import ray.data as rd

    from ontoray.extras.kmeans import kmeans_fixed
    from ontoray.extras.textstats import per_group_cap

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    asg = kmeans_fixed(ds, k=k, iters=iters, seed=42)
    return per_group_cap(asg, n=cap, key_col="cluster", id_col="vec_id",
                         salt="coreset1")


def sql_embed_coreset(k: int = 8, cap: int = 20, iters: int = 2) -> str:
    from ontoray.extras.kmeans import sql_kmeans_ctes
    ctes, final = sql_kmeans_ctes(k, iters, 42, "embeddings")
    return f"""
    WITH {", ".join(ctes)},
    ranked AS (
      SELECT cl AS cluster, vec_id,
             row_number() OVER (
               PARTITION BY cl
               ORDER BY md5('coreset1:' || CAST(cl AS VARCHAR) || ':'
                            || CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM {final})
    SELECT cluster, vec_id, rn FROM ranked WHERE rn <= {cap}
    """


def q_orders_trend(sf_dir: str, x0: int = 23904):
    """Per-nation REVENUE TREND: the OLS slope of monthly order revenue
    (int64 cents) over the month index x = year·12 + (month-1) − ``x0``
    (x0 = 1992·12 keeps every product within int64).  Slope =
    (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with all five moments folded as
    exact integers and ONE float64 division at the end — the
    grouped-regression shape (trend monitoring / forecasting features)
    where distributed sum order cannot move the result.  Output
    (n_name, n_months, num, den, slope).

    Scale shape: orders ⋈ customer is the partitioned spine; nation is a
    25-row broadcast; (nation, month) revenue folds two-phase; the moment
    fold runs over that vocabulary-bounded table."""
    import numpy as np
    import ray
    import ray.data as rd

    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]).take_all()
    n_keys = np.array([r["n_nationkey"] for r in nation], dtype=np.int32)
    n_names = np.array([r["n_name"] for r in nation], dtype=object)
    side = ray.put((n_keys, n_names))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice",
                                      "o_orderdate"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    spine = hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")

    def derive(batch: pa.Table) -> pa.Table:
        nk, nn = ray.get(side)
        idx = pc.index_in(batch.column("c_nationkey"),
                          value_set=pa.array(nk, pa.int32()))
        names = nn[idx.to_numpy(zero_copy_only=False)]
        x = pc.subtract(
            pc.add(pc.multiply(pc.cast(pc.year(batch.column("o_orderdate")),
                                       pa.int64()), 12),
                   pc.subtract(pc.cast(pc.month(batch.column("o_orderdate")),
                                       pa.int64()), 1)),
            x0)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            batch.column("o_totalprice"), 100), 0.5)), pa.int64())
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "x": x, "y": cents})

    monthly = hash_aggregate(
        spine.map_batches(derive, batch_format="pyarrow"),
        ["n_name", "x"], partial_aggs=[("y", "sum")],
        aggs=[("y_sum", "sum")], rename={"y_sum_sum": "y"}, num_buckets=8)

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table({"n_name": batch.column("n_name"),
                         "one": pa.array(np.ones(len(x), np.int64)),
                         "sx": pa.array(x, pa.int64()),
                         "sy": pa.array(y, pa.int64()),
                         "sxy": pa.array(x * y, pa.int64()),
                         "sxx": pa.array(x * x, pa.int64())})

    mom = hash_aggregate(
        monthly.map_batches(moments, batch_format="pyarrow"), ["n_name"],
        partial_aggs=[("one", "sum"), ("sx", "sum"), ("sy", "sum"),
                      ("sxy", "sum"), ("sxx", "sum")],
        aggs=[("one_sum", "sum"), ("sx_sum", "sum"), ("sy_sum", "sum"),
              ("sxy_sum", "sum"), ("sxx_sum", "sum")],
        rename={"one_sum_sum": "n_months", "sx_sum_sum": "sx",
                "sy_sum_sum": "sy", "sxy_sum_sum": "sxy",
                "sxx_sum_sum": "sxx"}, num_buckets=4)

    def fin(batch: pa.Table) -> pa.Table:
        n = batch.column("n_months").to_numpy(zero_copy_only=False)
        sx = batch.column("sx").to_numpy(zero_copy_only=False)
        sy = batch.column("sy").to_numpy(zero_copy_only=False)
        sxy = batch.column("sxy").to_numpy(zero_copy_only=False)
        sxx = batch.column("sxx").to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = np.where(den != 0, num / np.where(den != 0, den, 1), 0.0)
        return pa.table({"n_name": batch.column("n_name"),
                         "n_months": batch.column("n_months"),
                         "num": pa.array(num, pa.int64()),
                         "den": pa.array(den, pa.int64()),
                         "slope": pa.array(slope, pa.float64())})

    return mom.map_batches(fin, batch_format="pyarrow")


def sql_orders_trend(x0: int = 23904) -> str:
    return f"""
    WITH monthly AS (
      SELECT n.n_name,
             CAST(year(o.o_orderdate) * 12 + (month(o.o_orderdate) - 1)
                  - {x0} AS BIGINT) AS x,
             sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2),
    mom AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_months,
                   sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                   sum(x * x) AS sxx
            FROM monthly GROUP BY 1)
    SELECT n_name, n_months,
           CAST(n_months * sxy - sx * sy AS BIGINT) AS num,
           CAST(n_months * sxx - sx * sx AS BIGINT) AS den,
           CASE WHEN n_months * sxx - sx * sx != 0
                THEN CAST(n_months * sxy - sx * sy AS DOUBLE)
                     / CAST(n_months * sxx - sx * sx AS DOUBLE)
                ELSE 0.0 END AS slope
    FROM mom
    """


def q_events_wau(sf_dir: str):
    """Sliding 7-day ACTIVE USERS per day (WAU: distinct users in
    [d-6, d] for every observed day d): each distinct (user, day) pair is
    replicated to the 7 windows it feeds — a bounded ×7 replication of
    vocabulary-scale rows, the standard sliding-distinct plan when exact
    counts are required (the HLL route trades exactness for ×1
    replication).  Output (day, wau) for observed days only.

    Scale shape: per-batch (user, day) distinct → one exchange for the
    global distinct; the ×7 replication and second distinct run over
    user×day vocabulary rows, never raw events; observed-day filtering is
    a tiny broadcast."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def derive(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                              86_400_000_000), pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "d": d})
        return t.group_by(["user_id", "d"]).aggregate([]).select(
            ["user_id", "d"])

    ud = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow")
        .map_batches(lambda b: b.append_column(
            "one", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["user_id", "d"], aggs=[("one", "max")], rename={"one_max": "one"},
        num_buckets=8).materialize()

    days = sorted({r["d"] for r in ud.select_columns(["d"]).take_all()})
    dref = ray.put(np.array(days, dtype=np.int64))

    def replicate(batch: pa.Table) -> pa.Table:
        obs = ray.get(dref)
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        uu = np.repeat(u, 7)
        ww = (d[:, None] + np.arange(7)[None, :]).ravel()
        keep = np.isin(ww, obs)
        return pa.table({"user_id": pa.array(uu[keep], pa.int64()),
                         "w": pa.array(ww[keep], pa.int64()),
                         "one": pa.array(np.ones(int(keep.sum()), np.int64))})

    uw = hash_aggregate(
        ud.map_batches(replicate, batch_format="pyarrow"),
        ["user_id", "w"], aggs=[("one", "max")], rename={"one_max": "one"},
        num_buckets=8)

    return hash_aggregate(
        uw, ["w"], partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "wau"}, num_buckets=4
    ).map_batches(lambda b: b.rename_columns(["day", "wau"]),
                  batch_format="pyarrow")


def sql_events_wau() -> str:
    return """
    WITH ud AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS d
                FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    rep AS (SELECT DISTINCT user_id, ud.d + t.i AS w
            FROM ud, unnest(generate_series(0, 6)) AS t(i))
    SELECT CAST(rep.w AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS wau
    FROM rep JOIN days ON days.d = rep.w
    GROUP BY 1
    """


def q_docs_weighted_jaccard(sf_dir: str, threshold_micro: int = 300_000,
                            k: int = 3):
    """IDF-weighted near-dup pairs over documents — engine in
    ``extras/dedup.weighted_jaccard_pairs`` (integer 10^6//df shingle
    weights; rare shingles dominate, boilerplate contributes ~nothing)."""
    import ray.data as rd

    from ontoray.extras.dedup import weighted_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return weighted_jaccard_pairs(ds, threshold_micro=threshold_micro, k=k)


# --- personalized pagerank / dominant-supplier parts / rater agreement ------


def q_kg_ppr_from(triples_dedup_ds, n_seeds: int = 5, iters: int = 5):
    """Personalized PageRank over the concept graph, teleporting only to
    the ``n_seeds`` highest-degree hubs — engine in
    ``stages/analytics.personalized_pagerank`` (same int64 fixed-point
    recurrence as kg_pagerank, seed-restricted restart mass)."""
    from ontoray.stages.analytics import personalized_pagerank
    return personalized_pagerank(triples_dedup_ds, n_seeds=n_seeds,
                                 iters=iters, src_col="subj_norm",
                                 dst_col="obj_norm")


def sql_kg_ppr(n_seeds: int = 5, iters: int = 5) -> str:
    """DuckDB mirror of q_kg_ppr_from: identical seed pick (total degree
    desc, name asc) and the identical integer recurrence unrolled as
    chained CTEs — BIGINT floor division everywhere, both engines land on
    the same fixed-point scores."""
    scale = 10**12
    ctes = [
        "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst "
        "FROM tnorm)",
        "nodes AS (SELECT DISTINCT name FROM ("
        "SELECT src AS name FROM trip UNION ALL SELECT dst FROM trip))",
        "deg AS (SELECT src, count(*) AS od FROM trip GROUP BY src)",
        "tdeg AS (SELECT name, count(*) AS td FROM ("
        "SELECT src AS name FROM trip UNION ALL SELECT dst FROM trip) "
        "GROUP BY name)",
        f"seeds AS (SELECT name FROM (SELECT name, row_number() OVER "
        f"(ORDER BY td DESC, name) AS rn FROM tdeg) WHERE rn <= {n_seeds})",
        "scnt AS (SELECT count(*) AS s FROM seeds)",
        f"r0 AS (SELECT nd.name, CASE WHEN sd.name IS NOT NULL THEN "
        f"(SELECT {scale} // s FROM scnt) ELSE 0 END AS r "
        f"FROM nodes nd LEFT JOIN seeds sd ON sd.name = nd.name)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS (SELECT nd.name, "
            f"CASE WHEN sd.name IS NOT NULL THEN "
            f"(SELECT (15 * {scale}) // (100 * s) FROM scnt) ELSE 0 END "
            f"+ CAST((85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes nd LEFT JOIN seeds sd ON sd.name = nd.name "
            f"LEFT JOIN ("
            f"  SELECT t.dst AS name, sum(p.r // d.od) AS c "
            f"  FROM trip t JOIN r{k-1} p ON t.src = p.name "
            f"  JOIN deg d ON d.src = t.src GROUP BY t.dst) c "
            f"ON nd.name = c.name)")
    return (f"{_sql_triples_norm_ctes()}, " + ", ".join(ctes) +
            f" SELECT nd.name, CAST(r.r AS BIGINT) AS rank, "
            f"sd.name IS NOT NULL AS is_seed "
            f"FROM nodes nd JOIN r{iters} r ON r.name = nd.name "
            f"LEFT JOIN seeds sd ON sd.name = nd.name")


def q_supplier_dominant_parts(sf_dir: str):
    """LEAD-supplier census (TPC-H Q20-shaped over the shipped-quantity
    ledger; this corpus has no partsupp table): for every part, the lead
    supplier is the one with the MAXIMUM shipped quantity (exact int64
    cents; ties broken by the smaller suppkey), and the output
    (s_name, n_parts) counts how many parts each supplier leads — the
    supply-concentration signal behind single-source-risk review.  (A
    strict->50% majority rule is structurally vacuous here: ~26 suppliers
    serve each part, so the per-part ARGMAX is the non-degenerate form of
    the same question.)

    Scale shape: lineitem folds two-phase into the (part, supplier)
    quantity ledger (int64 cents, order-proof); per-part maxima fold from
    THAT vocabulary-scale table, never from lineitem again; the argmax
    join, tie-break fold, and supplier-name join are partitioned hash
    joins/aggregates — no corpus-scale broadcast anywhere."""
    import numpy as np
    import ray.data as rd

    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])

    def cents(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.floor(pc.add(pc.multiply(
            batch.column("l_quantity"), 100), 0.5)), pa.int64())
        return pa.table({"pk": batch.column("l_partkey"),
                         "sk": batch.column("l_suppkey"), "q": q})

    ps = hash_aggregate(
        li.map_batches(cents, batch_format="pyarrow"), ["pk", "sk"],
        partial_aggs=[("q", "sum")], aggs=[("q_sum", "sum")],
        rename={"q_sum_sum": "q"}, num_buckets=8).materialize()

    mx = hash_aggregate(
        ps.select_columns(["pk", "q"]), ["pk"],
        partial_aggs=[("q", "max")], aggs=[("q_max", "max")],
        rename={"q_max_max": "mq"}, num_buckets=8)

    joined = hash_join(ps, mx, "pk", "pk", how="inner")

    def tied_leads(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("q"), batch.column("mq")))
        return pa.table({"pk": t.column("pk"), "sk": t.column("sk")})

    # tie-break: the smallest suppkey among the per-part maxima
    lead = hash_aggregate(
        joined.map_batches(tied_leads, batch_format="pyarrow"), ["pk"],
        partial_aggs=[("sk", "min")], aggs=[("sk_min", "min")],
        rename={"sk_min_min": "sk"}, num_buckets=8)

    dom = hash_aggregate(
        lead.map_batches(
            lambda b: pa.table({
                "sk": b.column("sk"),
                "one": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"), ["sk"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n_parts"}, num_buckets=8)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    out = hash_join(dom, supp, "sk", "s_suppkey", how="inner")
    return out.map_batches(
        lambda b: b.select(["s_name", "n_parts"]), batch_format="pyarrow")


def sql_supplier_dominant_parts() -> str:
    return """
    WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                       sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                         AS q
                FROM lineitem GROUP BY 1, 2),
    mx AS (SELECT pk, max(q) AS mq FROM ps GROUP BY 1),
    lead AS (SELECT ps.pk, min(ps.sk) AS sk
             FROM ps JOIN mx ON mx.pk = ps.pk AND ps.q = mx.mq
             GROUP BY 1),
    dom AS (SELECT sk, count(*) AS n_parts FROM lead GROUP BY 1)
    SELECT s.s_name, CAST(d.n_parts AS BIGINT) AS n_parts
    FROM dom d JOIN supplier s ON s.s_suppkey = d.sk
    """


def q_docs_kappa(sf_dir: str, len_chars: int = 200, min_spaces: int = 45):
    """Cohen's kappa between two deterministic quality raters — rater A
    flags docs with >= ``len_chars`` characters, rater B flags docs with
    >= ``min_spaces`` literal spaces (a token-count surrogate).  Kappa is
    emitted EXACTLY: with the 2x2 confusion (a=both flag, b=A only,
    c=B only, d=neither), N = a+b+c+d, X = (a+b)(a+c) + (c+d)(b+d),
    po-pe = (N(a+d) - X)/N^2 and 1-pe = (N^2 - X)/N^2, so
    num = N(a+d) - X, den = N^2 - X, kappa = num/den in ONE float64
    division — the standard agreement check run before trusting any pair
    of heuristic quality filters.

    Scale shape: one streaming pass; each batch folds to FOUR ints, the
    driver sums a handful of partials — nothing shuffles."""
    import numpy as np
    import ray.data as rd

    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def confusion(batch: pa.Table) -> pa.Table:
        # NULL text counts as empty on BOTH engines (mirror coalesces too) —
        # a nullable boolean would otherwise poison the numpy fold below.
        t = pc.fill_null(batch.column("text"), "")
        la = pc.greater_equal(pc.utf8_length(t), len_chars)
        nb = pc.count_substring(t, " ")
        lb = pc.greater_equal(nb, min_spaces)
        a_np = la.to_numpy(zero_copy_only=False)
        b_np = lb.to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array([int(np.sum(a_np & b_np))], pa.int64()),
            "b": pa.array([int(np.sum(a_np & ~b_np))], pa.int64()),
            "c": pa.array([int(np.sum(~a_np & b_np))], pa.int64()),
            "d": pa.array([int(np.sum(~a_np & ~b_np))], pa.int64())})

    parts = ds.map_batches(confusion, batch_format="pyarrow").to_pandas()
    a, b, c, d = (int(parts["a"].sum()), int(parts["b"].sum()),
                  int(parts["c"].sum()), int(parts["d"].sum()))
    n = a + b + c + d
    x = (a + b) * (a + c) + (c + d) * (b + d)
    num = n * (a + d) - x
    den = n * n - x
    kappa = float(num) / float(den) if den != 0 else 0.0
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "both_pos": pa.array([a], pa.int64()),
        "a_only": pa.array([b], pa.int64()),
        "b_only": pa.array([c], pa.int64()),
        "both_neg": pa.array([d], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "kappa": pa.array([kappa], pa.float64())})


def sql_docs_kappa(len_chars: int = 200, min_spaces: int = 45) -> str:
    return f"""
    WITH lab AS (
      SELECT (length(coalesce(text, '')) >= {len_chars}) AS la,
             (length(coalesce(text, ''))
              - length(replace(coalesce(text, ''), ' ', ''))
              >= {min_spaces}) AS lb
      FROM documents),
    cm AS (SELECT
             CAST(sum(CASE WHEN la AND lb THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(sum(CASE WHEN la AND NOT lb THEN 1 ELSE 0 END) AS BIGINT)
               AS b,
             CAST(sum(CASE WHEN NOT la AND lb THEN 1 ELSE 0 END) AS BIGINT)
               AS c,
             CAST(sum(CASE WHEN NOT la AND NOT lb THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
           FROM lab)
    SELECT (a + b + c + d) AS n, a AS both_pos, b AS a_only, c AS b_only,
           d AS both_neg,
           (a+b+c+d) * (a+d) - ((a+b)*(a+c) + (c+d)*(b+d)) AS num,
           (a+b+c+d) * (a+b+c+d) - ((a+b)*(a+c) + (c+d)*(b+d)) AS den,
           CASE WHEN (a+b+c+d) * (a+b+c+d)
                     - ((a+b)*(a+c) + (c+d)*(b+d)) != 0
                THEN CAST((a+b+c+d) * (a+d)
                          - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE)
                     / CAST((a+b+c+d) * (a+b+c+d)
                            - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE)
                ELSE 0.0 END AS kappa
    FROM cm
    """


_TYPO_INJECT_RE_SRC = r"\b([a-z])([a-z])([a-z]{2,})\b"


def q_vocab_typo_pairs(sf_dir: str, min_freq: int = 5, min_len: int = 4):
    """Edit-distance-1 vocabulary pairs (typo/OCR-noise candidates) via
    SymSpell deletion-neighborhood blocking — engine in
    ``extras/dedup.typo_pairs`` (no all-pairs; candidates from one
    equi-join on deletion variants, exact lev==1 verify).  The synthetic
    corpus vocabulary is typo-free, so — same pattern as docs_pii_redact —
    every 7th doc gets a deterministic corruption first (second character
    of the first >=4-letter word deleted; first-match regexp_replace is
    identical in Python re and DuckDB RE2), which keeps the oracle check
    non-vacuous while the operator itself stays generic."""
    import re as _re

    import ray.data as rd

    from ontoray.extras.dedup import typo_pairs

    # re.ASCII pins \b to the ASCII word boundary DuckDB's RE2 uses — a
    # non-ASCII letter adjacent to a lowercase run must not shift the first
    # match between engines (no behavior change on the ASCII corpus).
    pat = _re.compile(_TYPO_INJECT_RE_SRC, _re.ASCII)

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        txts = batch.column("text").to_pylist()
        out = [pat.sub(r"\1\3", t or "", count=1) if d % 7 == 3 else t
               for d, t in zip(ids, txts)]
        return pa.table({"text": pa.array(out, pa.string())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return typo_pairs(ds.map_batches(inject, batch_format="pyarrow"),
                      min_freq=min_freq, min_len=min_len)


def sql_vocab_typo_pairs(min_freq: int = 5, min_len: int = 4) -> str:
    from ontoray.extras.dedup import sql_typo_pairs
    inj = ("(SELECT CASE WHEN doc_id % 7 = 3 THEN regexp_replace(text, "
           f"'{_TYPO_INJECT_RE_SRC}', '\\1\\3') ELSE text END AS text "
           "FROM documents) inj")
    return sql_typo_pairs(min_freq=min_freq, min_len=min_len, table=inj)


def q_docs_snm_pairs(sf_dir: str, window: int = 5, threshold: float = 0.5):
    """Sorted-neighborhood near-dup pairs — sort by text prefix, compare
    each doc to its window-1 sorted successors, exact-Jaccard verify;
    engine in ``extras/dedup.snm_pairs`` (rank-only sort, text joined back
    per candidate)."""
    import ray.data as rd

    from ontoray.extras.dedup import snm_pairs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return snm_pairs(ds, window=window, threshold=threshold)


def q_lineitem_zorder(sf_dir: str, block_rows: int = 512):
    """Z-order layout evaluation for lineitem clustered on
    (l_partkey, l_suppkey): per-block zone maps + scanned/pruned verdict
    for the lower-left probe rectangle — engine in
    ``extras/layout.zorder_layout`` (Morton interleave, z-bucketed
    distributed rank, block-bounded folds)."""
    import ray.data as rd

    import pyarrow.compute as pc

    from ontoray.extras.layout import zorder_layout

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"])

    def with_tie(batch: pa.Table) -> pa.Table:
        t = pc.add(pc.multiply(batch.column("l_orderkey"), 10),
                   pc.cast(batch.column("l_linenumber"), pa.int64()))
        return pa.table({"l_partkey": batch.column("l_partkey"),
                         "l_suppkey": batch.column("l_suppkey"),
                         "tie": pc.cast(t, pa.int64())})

    return zorder_layout(ds.map_batches(with_tie, batch_format="pyarrow"),
                         "l_partkey", "l_suppkey", "tie",
                         block_rows=block_rows)


def sql_lineitem_zorder(block_rows: int = 512) -> str:
    from ontoray.extras.layout import sql_zorder_layout
    return sql_zorder_layout(
        "lineitem", "l_partkey", "l_suppkey",
        "l_orderkey * 10 + l_linenumber", block_rows=block_rows)


def q_docs_source_lang_chi2(sf_dir: str):
    """Chi-squared independence screen for the source × declared-language
    contingency grid — the drift detector run before trusting per-source
    language mixes.  Every (source, lang) cell of the COMPLETE grid
    (unobserved cells included — they carry r*c/n expected mass) is emitted
    with exact integers: observed o, margins r_tot/c_tot, total n, and the
    pinned fixed-point cell statistic
      e_micro    = r*c*10^6 // n
      dev        = o*10^6 - e_micro
      chi2_milli = dev^2 // (max(e_micro, 1) * 10^3)
    (HUGEINT-safe to n ~ 10^12: r*c*10^6 <= 10^30, dev^2 <= 10^36; the
    max() guard only binds when n > 10^6 * r * c, identically on both
    engines).  Sum chi2_milli downstream for the test statistic.

    Scale shape: one per-batch combiner folds the corpus to
    |sources| x |langs| cell partials; margins and the grid completion are
    driver folds over that vocabulary-bounded table — nothing
    corpus-proportional moves."""
    import numpy as np
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])

    def combine(batch: pa.Table) -> pa.Table:
        # NULL source/lang rows drop on BOTH engines (mirror filters too):
        # a None key would crash the driver-side sorted() fold while SQL's
        # equi-join silently mishandles the NULL group.
        batch = batch.drop_null()
        g = batch.append_column(
            "one", pa.array(np.ones(batch.num_rows, np.int64)))
        return (g.group_by(["source", "lang"]).aggregate([("one", "sum")])
                .rename_columns(["source", "lang", "o"]))

    cells = hash_aggregate(
        ds.map_batches(combine, batch_format="pyarrow"),
        ["source", "lang"], partial_aggs=[("o", "sum")],
        aggs=[("o_sum", "sum")], rename={"o_sum_sum": "o"},
        num_buckets=4).take_all()           # |sources| x |langs| bounded

    obs = {(r["source"], r["lang"]): r["o"] for r in cells}
    r_tot, c_tot = {}, {}
    for (s, l), o in obs.items():
        r_tot[s] = r_tot.get(s, 0) + o
        c_tot[l] = c_tot.get(l, 0) + o
    n = sum(obs.values())

    rows = []
    for s in sorted(r_tot):
        for l in sorted(c_tot):
            o = obs.get((s, l), 0)
            r, c = r_tot[s], c_tot[l]
            e_micro = (r * c * 1_000_000) // n
            dev = o * 1_000_000 - e_micro
            chi2_milli = (dev * dev) // (max(e_micro, 1) * 1_000)
            rows.append({"source": s, "lang": l, "o": o, "r_tot": r,
                         "c_tot": c, "n": n, "chi2_milli": chi2_milli})
    return pa.Table.from_pylist(rows)


def sql_docs_source_lang_chi2() -> str:
    e = "(r.r::HUGEINT * c.c * 1000000) // n.n"
    dev = f"(coalesce(cl.o, 0) * 1000000 - {e})"
    return f"""
    WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
                   FROM documents
                   WHERE source IS NOT NULL AND lang IS NOT NULL
                   GROUP BY 1, 2),
    r AS (SELECT source, sum(o) AS r FROM cells GROUP BY 1),
    c AS (SELECT lang, sum(o) AS c FROM cells GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM cells)
    SELECT r.source, c.lang,
           CAST(coalesce(cl.o, 0) AS BIGINT) AS o,
           CAST(r.r AS BIGINT) AS r_tot,
           CAST(c.c AS BIGINT) AS c_tot,
           CAST(n.n AS BIGINT) AS n,
           CAST(({dev} * {dev})
                // (greatest({e}, 1) * 1000) AS BIGINT) AS chi2_milli
    FROM r CROSS JOIN c CROSS JOIN n
    LEFT JOIN cells cl ON cl.source = r.source AND cl.lang = c.lang
    """


# Benford expected first-digit probabilities log10(1 + 1/d), micro-quantized
# once as literals so no engine ever evaluates a log.
_BENFORD_MICRO = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                  6: 66947, 7: 57992, 8: 51153, 9: 45757}


def q_lineitem_benford(sf_dir: str):
    """Benford's-law first-digit audit over l_extendedprice — the classic
    fabricated-numbers screen for a money ledger.  Prices quantize to int64
    cents (the repo-wide exact contract); the first digit of the cents
    value folds to a 9-cell histogram per batch, and each digit row carries
    the same pinned fixed-point deviation statistic as
    ``docs_source_lang_chi2``:
      e_micro    = n * p_micro   (Benford micro-probability literal)
      dev        = o*10^6 - e_micro
      chi2_milli = dev^2 // (max(e_micro, 1) * 10^3)

    Scale shape: one streaming pass, each batch folds to <= 9 ints; the
    driver completes the fixed 9-row grid."""
    import numpy as np
    import ray.data as rd

    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])

    def digits(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        arr = cents.to_numpy(zero_copy_only=False)
        arr = arr[arr > 0]
        while arr.size and arr.max() >= 10:
            big = arr >= 10
            arr = np.where(big, arr // 10, arr)
            if not big.any():
                break
        d, o = np.unique(arr, return_counts=True)
        return pa.table({"digit": pa.array(d.astype(np.int64)),
                         "o": pa.array(o.astype(np.int64))})

    cells = hash_aggregate(
        ds.map_batches(digits, batch_format="pyarrow"), ["digit"],
        partial_aggs=[("o", "sum")], aggs=[("o_sum", "sum")],
        rename={"o_sum_sum": "o"}, num_buckets=4).take_all()  # <= 9 rows

    obs = {r["digit"]: r["o"] for r in cells}
    n = sum(obs.values())
    rows = []
    for d in range(1, 10):
        o = obs.get(d, 0)
        p_micro = _BENFORD_MICRO[d]
        e_micro = n * p_micro
        dev = o * 1_000_000 - e_micro
        chi2_milli = (dev * dev) // (max(e_micro, 1) * 1_000)
        rows.append({"digit": d, "o": o, "n": n, "p_micro": p_micro,
                     "chi2_milli": chi2_milli})
    return pa.Table.from_pylist(rows)


def sql_lineitem_benford() -> str:
    ben = ", ".join(f"({d}, {p})" for d, p in _BENFORD_MICRO.items())
    return f"""
    WITH cents AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     AS c FROM lineitem),
    fd AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM cents WHERE c > 0),
    cells AS (SELECT digit, CAST(count(*) AS BIGINT) AS o FROM fd GROUP BY 1),
    n AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS n FROM cells),
    ben(digit, p_micro) AS (VALUES {ben})
    SELECT b.digit, CAST(coalesce(cl.o, 0) AS BIGINT) AS o,
           n.n, CAST(b.p_micro AS BIGINT) AS p_micro,
           CAST(((coalesce(cl.o, 0) * 1000000 - n.n::HUGEINT * b.p_micro)
                 * (coalesce(cl.o, 0) * 1000000 - n.n::HUGEINT * b.p_micro))
                // (greatest(n.n::HUGEINT * b.p_micro, 1) * 1000) AS BIGINT)
             AS chi2_milli
    FROM ben b CROSS JOIN n LEFT JOIN cells cl ON cl.digit = b.digit
    """


def q_events_dow_hour(sf_dir: str):
    """Traffic-seasonality heatmap: event counts on the 7 x 24
    (day-of-week x hour) grid — the load-shape profile behind capacity
    planning and anomaly baselines.  dow follows DuckDB's convention
    (0 = Sunday; 1970-01-01 was a Thursday = 4), computed in pure integer
    microsecond arithmetic so both engines agree on naive-UTC timestamps.

    Scale shape: each batch folds to <= 168 cells; one vocabulary-bounded
    exchange."""
    import numpy as np
    import ray.data as rd

    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    us_day, us_hour = 86_400_000_000, 3_600_000_000

    def grid(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())\
                  .to_numpy(zero_copy_only=False)
        dow = (ts_us // us_day + 4) % 7
        hour = (ts_us // us_hour) % 24
        t = pa.table({"dow": pa.array(dow, pa.int64()),
                      "hour": pa.array(hour, pa.int64()),
                      "one": pa.array(np.ones(len(ts_us), np.int64))})
        return (t.group_by(["dow", "hour"]).aggregate([("one", "sum")])
                .rename_columns(["dow", "hour", "n"]))

    return hash_aggregate(
        ds.map_batches(grid, batch_format="pyarrow"), ["dow", "hour"],
        partial_aggs=[("n", "sum")], aggs=[("n_sum", "sum")],
        rename={"n_sum_sum": "n"}, num_buckets=4)


def sql_events_dow_hour() -> str:
    return """
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """
