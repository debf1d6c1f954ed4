"""Surface-form normalizers.

Two distinct normalizers, kept separate exactly as the reference does:

* ``normalize_concept_name`` — the canonicalization groupby key: lower, strip,
  singularize the final word (reference ``_normalize_concept_name``,
  src/ontology_extension_manager.py:49-57, which uses inflect.singular_noun).
  We reimplement the deterministic English-plural subset needed here instead
  of depending on inflect; engine and oracle share this function.

* ``normalize_eval`` — lower + strip ONLY (reference
  src/evaluation/gold_standard.py:9-13), used by the evaluation harness.
"""

from __future__ import annotations

_IRREGULAR = {
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "people": "person",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "analyses": "analysis", "antennae": "antenna",
}

_KEEP_S = ("ss", "us", "is")  # glass, bus -> handled by -es rule, basis...


def singular_noun(word: str) -> str | None:
    """Singular of ``word`` or None if it looks singular already
    (mirrors the inflect.singular_noun truthiness contract)."""
    w = word
    if len(w) < 3:
        return None
    if w in _IRREGULAR:
        return _IRREGULAR[w]
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("ves") and len(w) > 4:
        stem = w[:-3]
        if w[:-1].endswith(("knive", "wive", "live")):
            return stem + "fe"
        return stem + "f"
    if w.endswith("es") and len(w) > 3:
        stem = w[:-2]
        if stem.endswith(("s", "x", "z", "ch", "sh")):
            return stem
        return w[:-1]  # device[s] -> device
    if w.endswith("s") and not w.endswith(_KEEP_S):
        return w[:-1]
    return None


def normalize_concept_name(name: str) -> str:
    """lower().strip() then singularize the last token (reference M9)."""
    if not name:
        return ""
    name = name.lower().strip()
    parts = name.rsplit(" ", 1)
    last = parts[-1]
    sing = singular_noun(last)
    if sing:
        parts[-1] = sing
        return " ".join(parts)
    return name


def normalize_eval(s) -> str:
    """lower().strip() only (reference gold_standard._normalize_string)."""
    if not isinstance(s, str):
        s = str(s)
    return s.lower().strip()


def sql_singular_case(w: str) -> str:
    """ANSI-SQL CASE expression computing ``singular_noun(w)`` (NULL when the
    word looks singular) — generated from the same rule table so engine and
    DuckDB oracle share one source of truth.  ``w`` is a SQL expression."""
    irr = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(_IRREGULAR.items()))
    return (
        f"CASE"
        f" WHEN length({w}) < 3 THEN NULL"
        f" WHEN {w} IN ({', '.join(repr(k) for k in sorted(_IRREGULAR))})"
        f" THEN (CASE {w} {irr} END)"
        f" WHEN {w} LIKE '%ies' AND length({w}) > 4"
        f" THEN substr({w}, 1, length({w}) - 3) || 'y'"
        f" WHEN {w} LIKE '%ves' AND length({w}) > 4"
        f" THEN (CASE WHEN {w} LIKE '%knives' OR {w} LIKE '%wives' OR {w} LIKE '%lives'"
        f"       THEN substr({w}, 1, length({w}) - 3) || 'fe'"
        f"       ELSE substr({w}, 1, length({w}) - 3) || 'f' END)"
        f" WHEN {w} LIKE '%es' AND length({w}) > 3"
        f" THEN (CASE WHEN regexp_matches(substr({w}, 1, length({w}) - 2), '(s|x|z|ch|sh)$')"
        f"       THEN substr({w}, 1, length({w}) - 2)"
        f"       ELSE substr({w}, 1, length({w}) - 1) END)"
        f" WHEN {w} LIKE '%s' AND NOT ({w} LIKE '%ss' OR {w} LIKE '%us' OR {w} LIKE '%is')"
        f" THEN substr({w}, 1, length({w}) - 1)"
        f" ELSE NULL END"
    )


def sql_norm_expr(col: str) -> str:
    """ANSI-SQL expression for ``normalize_concept_name(col)``: lower+trim,
    then singularize the LAST space-separated token (reference M9)."""
    base = f"lower(trim({col}))"
    last = f"regexp_extract({base}, '([^ ]*)$', 1)"
    sing = sql_singular_case(last)
    head = f"substr({base}, 1, length({base}) - length({last}))"
    return (f"(CASE WHEN ({sing}) IS NULL THEN {base}"
            f" ELSE {head} || ({sing}) END)")
