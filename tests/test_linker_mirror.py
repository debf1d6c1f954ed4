"""Linker-family DuckDB mirror parity (no Ray).

Two layers:

* ``TestSqlRatio`` — the recursive-CTE ``difflib.SequenceMatcher.ratio``
  must be bit-equal to CPython's difflib on randomized + adversarial pairs
  (this is the piece that makes the fuzzy lexical matcher SQL-checkable).
* ``TestSqlLinkerDecision`` — the full decision chain (embedding cosine,
  lexical exact/fuzzy, surface aliases, technical specs, decision table,
  routing) over SYNTHETIC mention/props fixtures must reproduce
  ``LinkerActor`` row-for-row, column-for-column.
"""

import random
from difflib import SequenceMatcher

import duckdb
import pyarrow as pa

RATIO_WRAP = """
WITH RECURSIVE
lk_fpair AS (SELECT a, b, 0 AS ci, length(a) AS la, length(b) AS lb FROM my_pairs),{ratio_ctes}
SELECT a, b, ratio FROM lk_ratio
"""


def _sql_ratios(pairs):
    from ontoray.queries_linker import _RATIO_CTES
    con = duckdb.connect()
    con.execute("CREATE TABLE my_pairs(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO my_pairs VALUES (?, ?)", pairs)
    rows = con.execute(RATIO_WRAP.format(ratio_ctes=_RATIO_CTES)).fetchall()
    return {(r[0], r[1]): r[2] for r in rows}


class TestSqlRatio:
    def test_adversarial_pairs(self):
        pairs = [("antenna", "antena"), ("capacitor", "capacitors"),
                 ("chip antenna", "chipantenna"), ("abcabc", "cabcab"),
                 ("aaaa", "aa"), ("xyz", "abc"), ("resistor", "resistor"),
                 ("abab", "baba"), ("a-b c", "ab c"),
                 ("electroniccomponent", "electronic component"),
                 ("x", "thing"), ("integratedcircuit", "integrated circuit")]
        got = _sql_ratios(pairs)
        for a, b in pairs:
            assert got[(a, b)] == SequenceMatcher(None, a, b).ratio(), (a, b)

    def test_randomized_tie_heavy(self):
        rng = random.Random(29)
        pairs = []
        for alpha in ["ab", "abc", "abcdefgh -"]:
            for _ in range(150):
                a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 26)))
                b = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 20)))
                pairs.append((a, b))
        pairs = list(dict.fromkeys(pairs))
        got = _sql_ratios(pairs)
        for a, b in pairs:
            assert got[(a, b)] == SequenceMatcher(None, a, b).ratio(), (a, b)


DECISION_WRAP = """
WITH RECURSIVE
{const_ctes},
lk_ment AS (SELECT mention, n_mentions FROM my_ment),
lk_filt AS (SELECT subj, pred, obj, conf FROM my_filt),
{decision_ctes}
SELECT name, name_norm, decision, target, confidence, best_score,
       n_mentions, parent_class, status
FROM lk_entities ORDER BY name
"""

# (mention, n) fixtures spanning every match method and decision branch.
MENTIONS = [
    # exact baseline-name hits (embedding 1.0 + lexical exact)
    ("antenna", 5), ("resistor", 3), ("thing", 1), ("product", 2),
    # plural -> exact via the singularizer
    ("antennas", 4), ("capacitors", 7), ("transistors", 2),
    # surface aliases
    ("ic", 9), ("chip antenna", 2), ("electronic component", 1),
    # fuzzy (SequenceMatcher >= 0.8)
    ("antena", 1), ("resisto", 1), ("capacitr", 1), ("conector", 2),
    ("inductor x", 1),
    # embedding-similarity-only shapes
    ("antennax", 1), ("microantenna", 1), ("subantennae", 1),
    # technical-spec carriers (props injected below)
    ("wifi-module", 3), ("gps-module", 1), ("lora-radio", 2), ("badfreq", 1),
    # no-match vocabulary
    ("zzzq", 1), ("firmware", 6), ("datasheet", 2), ("qqq-part-77", 1),
]

# per-occurrence pattern-triple rows feeding collect_props (subj, pred, obj,
# conf) — incl. parser edge cases: exact range match, partial overlap, single
# value, impedance tolerance, unparseable multi-dot number
FILT = [
    ("wifi-module", "frequency", "2.4-5.8 ghz", 0.85),
    ("wifi-module", "impedance", "50", 0.85),
    ("gps-module", "frequency", "1.2-2.7 ghz", 0.85),
    ("gps-module", "impedance", "52", 0.85),
    ("lora-radio", "frequency", "868 mhz", 0.85),
    ("lora-radio", "impedance", "50", 0.85),
    ("badfreq", "frequency", "2.4.5 ghz", 0.85),
    ("badfreq", "impedance", "50", 0.85),
    ("wifi-module", "voltage", "3.3 v", 0.85),
]


def _engine_entities():
    from ontoray.aliases import build_alias_data
    from ontoray.config import PipelineConfig
    from ontoray.stages.linking import LinkerActor

    props: dict = {}
    for s, p, o, _c in FILT:
        if p in ("frequency", "impedance", "voltage"):
            cur = props.setdefault(s, {})
            cur[p] = min(cur[p], o) if p in cur else o
    actor = LinkerActor(build_alias_data(), PipelineConfig(), props)
    batch = pa.table({
        "mention": pa.array([m for m, _ in MENTIONS], pa.string()),
        "n_mentions": pa.array([n for _, n in MENTIONS], pa.int64()),
    })
    return actor(batch).to_pylist()


class TestSqlLinkerDecision:
    def test_synthetic_mentions_match_linker_actor(self):
        from ontoray.queries_linker import (sql_linker_const_ctes,
                                            sql_linker_decision_ctes)
        con = duckdb.connect()
        con.execute("CREATE TABLE my_ment(mention VARCHAR, n_mentions BIGINT)")
        con.executemany("INSERT INTO my_ment VALUES (?, ?)", MENTIONS)
        con.execute("CREATE TABLE my_filt(subj VARCHAR, pred VARCHAR, obj VARCHAR, conf DOUBLE)")
        con.executemany("INSERT INTO my_filt VALUES (?, ?, ?, ?)", FILT)
        sql = DECISION_WRAP.format(const_ctes=sql_linker_const_ctes(),
                                   decision_ctes=sql_linker_decision_ctes())
        got = {r[0]: r for r in con.execute(sql).fetchall()}

        want_rows = sorted(_engine_entities(), key=lambda r: r["name"])
        assert len(got) == len(want_rows)
        # every decision branch must actually be exercised by the fixture
        decisions = {r["decision"] for r in want_rows}
        assert decisions == {"map_to_existing_exact", "requires_manual_review",
                             "extend_ontology"}
        methods_hit = [r for r in want_rows if r["decision"] != "extend_ontology"]
        assert len(methods_hit) >= 8
        for w in want_rows:
            g = got[w["name"]]
            assert g == (w["name"], w["name_norm"], w["decision"], w["target"],
                         w["confidence"], w["best_score"], w["n_mentions"],
                         w["parent_class"], w["status"]), w["name"]

    def test_technical_branch_fires(self):
        """The spec-carrying mentions must route through the technical
        matcher (score > embedding/lexical) — guards against the tech CTEs
        silently short-circuiting to zero rows."""
        rows = {r["name"]: r for r in _engine_entities()}
        # exact freq range + exact impedance -> avg (1.0+1.0)/2 = 1.0 -> exact
        assert rows["wifi-module"]["decision"] == "map_to_existing_exact"
        assert rows["wifi-module"]["target"] == "ChipAntenna"
        assert rows["wifi-module"]["best_score"] >= 0.999
        # partial freq overlap + 4%-off impedance -> 0.7 < avg < 0.999 -> review
        assert rows["gps-module"]["decision"] == "requires_manual_review"
        assert rows["gps-module"]["target"] == "FPCAntenna"
        assert 0.7 <= rows["gps-module"]["best_score"] < 0.999


class TestSqlJsonLd:
    def test_string_exact_vs_json_dumps(self):
        """The SQL JSON-LD concat must equal json.dumps(obj, sort_keys=True)
        byte-for-byte across the productontology map order, the category
        heuristic, review/subclass optional keys and the filename chain."""
        import json

        import duckdb
        from ontoray.queries_linker import _sql_jsonld_ctes
        from ontoray.stages.export import entities_to_jsonld, sanitize_filename

        rows = [
            ("antenna", "extend_ontology", "RFComponent", "new"),
            ("chip antenna thing", "requires_manual_review", "ChipAntenna", "review"),
            ("microphone", "extend_ontology", "ElectronicComponent", "new"),   # 'ic' substring
            ("resistor-array", "extend_ontology", "Resistor", "new"),
            ("weird  double space", "requires_manual_review", "Thing", "review"),
            ("cable-and-connector", "extend_ontology", "Cable", "new"),
            ("zzz", "map_to_existing_exact", None, None),                      # filtered out
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE ents(name VARCHAR, decision VARCHAR, "
                    "parent_class VARCHAR, status VARCHAR)")
        con.executemany("INSERT INTO ents VALUES (?, ?, ?, ?)", rows)
        sql = ("WITH lk_entities AS (SELECT * FROM ents)," +
               _sql_jsonld_ctes() + " SELECT name, file, jsonld FROM lk_jld")
        got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}

        ents = [{"name": n, "decision": d, "parent_class": p, "status": s}
                for n, d, p, s in rows]
        want_objs = entities_to_jsonld(ents)
        assert len(got) == len(want_objs) == 6
        for o in want_objs:
            f, j = got[o["name"]]
            assert f == sanitize_filename(o["name"]) + ".jsonld"
            assert j == json.dumps(o, sort_keys=True), o["name"]
