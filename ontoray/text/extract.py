"""Deterministic mention and triple extraction over cleaned text.

Replaces the reference's per-chunk LLM calls (concept extraction
src/idea_extractor.py:63-103, relation extraction
src/relation_extractor.py:19-56) with deterministic pattern extractors while
keeping the reference's data contracts: the concept validity filter semantics
(``is_valid_concept`` is an exact port of ``_is_valid_concept``,
src/idea_extractor.py:49-61 with the stopword set at :22-29), and triples as
``(subj, pred, obj)`` with predicates drawn from the reference's observed
vocabulary (data/gold_standard.json types + non_taxonomic_relation_prompt).

These are pure per-document functions shared by the Ray actor stages and the
single-process oracle, so engine-vs-oracle P/R measures the distributed
dataflow (dedup, shuffles, linking), not extractor drift.

All patterns are RE2-compatible (no lookarounds/backrefs) so the SQL-checked
subset of queries can mirror them in DuckDB exactly.
"""

from __future__ import annotations

import re

from ontoray.config import CONCEPT_STOPWORDS

# --- concept validity filter (exact port of reference _is_valid_concept) ---

_HAS_ALPHA = re.compile(r"[a-zA-Z]")


def is_valid_concept(concept: str) -> bool:
    if not concept or not isinstance(concept, str):
        return False
    if concept.lower() in CONCEPT_STOPWORDS:
        return False
    if len(concept) < 3:
        return False
    if concept.isnumeric() or not _HAS_ALPHA.search(concept):
        return False
    if "/" in concept or "www." in concept or ".com" in concept:
        return False
    return True


# --- mention extraction -----------------------------------------------------

# Word tokens of length >= 3 starting with a letter (cleaned text is lowercase).
TOKEN_PATTERN = r"[a-z][a-z0-9-]{2,}"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def extract_mentions(clean_doc: str, gazetteer: tuple[str, ...] = ()) -> list[str]:
    """Distinct valid mentions in a cleaned document, sorted.

    Unigram tokens (TOKEN_PATTERN) filtered by ``is_valid_concept``, plus any
    multi-word gazetteer phrase present as a substring (dictionary-based
    mention detection; the broadcast alias dictionary supplies the phrases).
    """
    found = {t for t in _TOKEN_RE.findall(clean_doc) if is_valid_concept(t)}
    for phrase in gazetteer:
        if phrase in clean_doc:
            found.add(phrase)
    return sorted(found)


# --- triple extraction ------------------------------------------------------

_W = r"[a-z][a-z0-9-]*"

# (name, regex, triple-builder spec, extractor tag, confidence)
# builder spec: list of (subj_group, pred, obj_group); pred literal strings use
# the reference's relation vocabulary.
ISA_PATTERN = rf"({_W}) is an? ({_W})"

TRIPLE_PATTERNS: list[tuple[str, str, list[tuple[int, str, int]], str, float]] = [
    # Hearst-style hyponymy -> subclass_of
    ("isa", ISA_PATTERN, [(1, "subclass_of", 2)], "hearst", 0.90),
    ("such_as", rf"({_W}) such as ({_W})(?: and ({_W}))?",
     [(2, "subclass_of", 1), (3, "subclass_of", 1)], "hearst", 0.90),
    ("type_of", rf"({_W}), a type of ({_W})", [(1, "subclass_of", 2)], "hearst", 0.90),
    ("including", rf"({_W}) including ({_W})(?: and ({_W}))?",
     [(2, "subclass_of", 1), (3, "subclass_of", 1)], "hearst", 0.85),
    # SVO / non-taxonomic
    ("manufactured_by", rf"({_W}) is manufactured by ({_W})", [(1, "manufacturer", 2)], "svo", 0.85),
    ("contains", rf"({_W}) contains an? ({_W})", [(1, "hasPart", 2)], "svo", 0.80),
    ("part_of", rf"({_W}) is part of an? ({_W})", [(1, "partOf", 2)], "svo", 0.80),
    ("connects_to", rf"({_W}) connects to an? ({_W})", [(1, "connectedTo", 2)], "svo", 0.80),
    ("requires", rf"({_W}) requires an? ({_W})", [(1, "requires", 2)], "svo", 0.80),
    ("works_with", rf"({_W}) works with an? ({_W})", [(1, "worksWith", 2)], "svo", 0.80),
    ("instance_of", rf"({_W}), an instance of ({_W})", [(1, "instance_of", 2)], "svo", 0.85),
    ("conforms_to", rf"({_W}) conforms to ({_W})", [(1, "conformsTo", 2)], "svo", 0.85),
    # Technical-property patterns (reference M15/M22 spec parsers feed these)
    ("frequency", rf"({_W}) operates at ([0-9][0-9.]*(?:-[0-9][0-9.]*)? [gm]hz)",
     [(1, "frequency", 2)], "pattern", 0.85),
    ("impedance", rf"({_W}) has an impedance of ([0-9][0-9.]*) ohms",
     [(1, "impedance", 2)], "pattern", 0.85),
    ("voltage", rf"({_W}) has a supply voltage of ([0-9][0-9.]* ?v)\b",
     [(1, "voltage", 2)], "pattern", 0.85),
]

_COMPILED = [(re.compile(p), spec, tag, conf) for (_n, p, spec, tag, conf) in TRIPLE_PATTERNS]

# Required literal per pattern (same order as TRIPLE_PATTERNS): every string
# the pattern can match CONTAINS its literal (" is a" also covers " is an"),
# so `literal not in chunk` proves finditer would find nothing — a C
# substring scan (~15 us/chunk) replaces the regex pass for absent patterns
# (~2.8x faster triple extraction even on the pattern-dense bench corpus;
# equivalence vs the unfiltered scan is pytest-asserted).
_PREFILTER = [" is a", " such as ", ", a type of ", " including ",
              " is manufactured by ", " contains a", " is part of a",
              " connects to a", " requires a", " works with a",
              ", an instance of ", " conforms to ", " operates at ",
              " has an impedance of ", " has a supply voltage of "]
assert len(_PREFILTER) == len(TRIPLE_PATTERNS)

# Words that must not serve as a triple endpoint (articles/pronouns that the
# generic \w captures can pick up as subjects, e.g. "it operates at ...").
ENDPOINT_STOP = frozenset({"the", "a", "an", "it", "this", "that", "they", "these", "those",
                           "and", "or", "of", "is", "are", "was", "were"})


def extract_triples(clean_doc: str) -> list[tuple[str, str, str, str, float]]:
    """All pattern triples in a cleaned document.

    Returns (subj, pred, obj, extractor, conf) tuples in pattern-then-position
    order (callers dedup; set semantics downstream, reference
    src/relation_extractor.py:87-88).
    """
    out: list[tuple[str, str, str, str, float]] = []
    for (rx, spec, tag, conf), lit in zip(_COMPILED, _PREFILTER):
        if lit not in clean_doc:
            continue
        for m in rx.finditer(clean_doc):
            for sg, pred, og in spec:
                s, o = m.group(sg), m.group(og)
                if not s or not o:
                    continue
                if s in ENDPOINT_STOP or o in ENDPOINT_STOP:
                    continue
                out.append((s, pred, o, tag, conf))
    return out
