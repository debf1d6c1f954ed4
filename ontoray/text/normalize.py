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
