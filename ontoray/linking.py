"""Entity-linking core: similarity matching + extension-decision table.

Pure functions (no Ray) implementing the reference's hybrid decision engine —
embedding / lexical / technical / category matchers
(src/ontology_extension_manager.py:225-366), match dedup + top-10 ranking
(:489-499, :245-249), and the extension decision table (:368-421) with the LLM
branch disabled (enable_llm_validation=False ⇒ the high-similarity window
falls through to the medium-similarity check), optionally replaced by a
deterministic rule validator.

Shared by the single-process oracle and the Ray linker actor so that
engine-vs-oracle differences can only come from the distributed dataflow.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np

from ontoray.aliases import AliasData
from ontoray.config import DEFAULT_THRESHOLDS
from ontoray.text.embed import embed_counts
from ontoray.text.normalize import normalize_concept_name
from ontoray.text.specs import TECHNICAL_MATCHERS

# Decision labels (reference ExtensionDecision values, src/data_models.py:7-12).
EXTEND = "extend_ontology"
MAP_EXACT = "map_to_existing_exact"
MAP_SIMILAR = "map_to_existing_similar"
UNCERTAIN = "requires_manual_review"


def find_matches(name: str, alias: AliasData, *, name_norm: str | None = None,
                 props: dict | None = None, category: str = "",
                 thresholds: dict | None = None, enable_technical: bool = True,
                 embedding: np.ndarray | None = None) -> list[tuple[str, float, str, float]]:
    """Ranked candidate matches: (existing_name, score, match_type, confidence).

    Match-method order (embedding, lexical, technical, category), per-concept
    best-score dedup, stable sort by score desc, top 10 — mirroring
    _find_concept_matches (src/ontology_extension_manager.py:225-249).
    """
    th = thresholds or DEFAULT_THRESHOLDS
    nn = name_norm if name_norm is not None else normalize_concept_name(name)
    matches: list[tuple[str, float, str, float]] = []

    # 1. Embedding cosine vs every existing concept (J1: broadcast matrix,
    # vectorized dot product).  Exact-arithmetic path: int64 gram-count dots
    # and squared norms, cosine = dot / sqrt(n_m * n_a) in float64 — the
    # identical expression the DuckDB linker mirror evaluates, so scores are
    # bit-equal engine-vs-oracle (norm product formed in INTEGER arithmetic
    # before the cast, matching the SQL).
    vec = embedding if embedding is not None else embed_counts(name.lower(), alias.emb_counts.shape[1])
    vec = np.asarray(vec, dtype=np.int64)
    n_m = int(vec @ vec)
    if n_m > 0:
        dots = alias.emb_counts @ vec                      # exact int64
        denom = np.sqrt((alias.emb_sq * n_m).astype(np.float64))
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = np.where(alias.emb_sq > 0, dots.astype(np.float64) / denom, 0.0)
    else:
        sims = np.zeros(len(alias.names), dtype=np.float64)
    low = th["low_similarity"]
    for i in np.flatnonzero(sims >= low):
        matches.append((alias.names[int(i)], float(sims[int(i)]), "embedding", float(sims[int(i)])))

    # 2. Lexical on normalized names: exact (1.0) else SequenceMatcher >= 0.8.
    # Two true upper bounds prune the quadratic matcher: length ratio, then
    # the char-multiset bound (difflib quick_ratio).  ASCII fast path runs
    # both bounds as ONE vectorized np.minimum over the precomputed
    # (n_concepts, 256) byte-count matrix; only survivors hit SequenceMatcher.
    la = len(nn)
    if alias.char_mat is not None and alias.norm_index is not None and nn.isascii():
        for i in alias.norm_index.get(nn, ()):
            matches.append((alias.names[i], 1.0, "lexical_exact_normalized", 1.0))
        if la:
            lb = alias.norm_lens
            denom = la + lb
            ok = (2.0 * np.minimum(la, lb)) / denom >= 0.8
            if ok.any():
                v = np.bincount(np.frombuffer(nn.encode(), np.uint8),
                                minlength=256).astype(np.int32)
                common = np.minimum(alias.char_mat, v).sum(axis=1)
                ok &= (2.0 * common) / denom >= 0.8
            for i in np.flatnonzero(ok):
                existing_norm = alias.name_norms[int(i)]
                if existing_norm == nn:
                    continue
                r = SequenceMatcher(None, nn, existing_norm).ratio()
                if r >= 0.8:
                    matches.append((alias.names[int(i)], r, "lexical_similar_normalized", r))
    else:
        from collections import Counter
        nn_counts = Counter(nn)
        for i, existing_norm in enumerate(alias.name_norms):
            if nn == existing_norm:
                matches.append((alias.names[i], 1.0, "lexical_exact_normalized", 1.0))
                continue
            lb = len(existing_norm)
            if not la or not lb or (2.0 * min(la, lb)) / (la + lb) < 0.8:
                continue
            if alias.char_counts:
                ec = alias.char_counts[i]
                common = sum(min(c, ec.get(ch, 0)) for ch, c in nn_counts.items())
                if (2.0 * common) / (la + lb) < 0.8:
                    continue
            r = SequenceMatcher(None, nn, existing_norm).ratio()
            if r >= 0.8:
                matches.append((alias.names[i], r, "lexical_similar_normalized", r))
    # Surface-alias table: known alternate spellings map exactly.
    idx = alias.surface_map.get(nn)
    if idx is not None and alias.name_norms[idx] != nn:
        matches.append((alias.names[idx], 1.0, "lexical_exact_normalized", 1.0))

    # 3. Technical specs: sum of per-property similarities > 0.7 must reach 1.5.
    if enable_technical and props:
        for i, etech in enumerate(alias.tech):
            if not etech:
                continue
            total, details = 0.0, 0
            for prop, fn in TECHNICAL_MATCHERS.items():
                if props.get(prop) and etech.get(prop):
                    s = fn(props[prop], etech[prop])
                    if s > 0.7:
                        total += s
                        details += 1
            if total >= 1.5:
                avg = total / details
                matches.append((alias.names[i], avg, "technical_specs", avg))

    # 4. Category variants: same category and name ratio >= 0.4, conf x0.7.
    if category:
        cat = category.lower()
        nl = name.lower()
        for i, ecat in enumerate(alias.categories):
            if ecat.lower() == cat:
                r = SequenceMatcher(None, nl, alias.names[i].lower()).ratio()
                if r >= 0.4:
                    matches.append((alias.names[i], r, "category_variant", r * 0.7))

    # Dedup keeping best score per existing concept (insertion-order stable).
    best: dict[str, tuple[str, float, str, float]] = {}
    for m in matches:
        cur = best.get(m[0])
        if cur is None or m[1] > cur[1]:
            best[m[0]] = m
    ranked = sorted(best.values(), key=lambda m: -m[1])
    return ranked[:10]


def decide(name: str, matches: list[tuple[str, float, str, float]], *,
           thresholds: dict | None = None, enable_rule_validation: bool = False,
           validate_threshold: float = 0.92) -> tuple[str, str | None, float]:
    """Extension decision: (decision, target_concept, confidence).

    Exact port of _make_extension_decision (src/ontology_extension_manager.py:
    368-421) with the LLM validator replaced by a deterministic threshold rule
    (off by default, matching enable_llm_validation=False behavior).
    """
    th = thresholds or DEFAULT_THRESHOLDS
    if not matches:
        return (EXTEND, None, 0.9)
    existing, score, _mtype, conf = matches[0]
    if score >= 0.999:
        return (MAP_EXACT, existing, conf)
    if score >= th["high_similarity"] and enable_rule_validation:
        if score >= validate_threshold:
            return (MAP_SIMILAR, existing, score)
        return (UNCERTAIN, existing, 0.5)
    if score >= th["medium_similarity"]:
        return (UNCERTAIN, existing, 0.5)
    return (EXTEND, None, 0.8)


def route_task(decision: str, target: str | None,
               matches: list[tuple[str, float, str, float]]) -> tuple[str | None, str | None]:
    """(parent_class, status) for concepts that become ontology tasks, or
    (None, None) for mapped concepts — reference
    _route_concepts_based_on_decisions (src/integrated_schema_pipeline.py:182-216)."""
    if decision == EXTEND:
        parent = target or (matches[0][0] if matches else "ElectronicComponent")
        return parent, "new"
    if decision == UNCERTAIN:
        parent = target or (matches[0][0] if matches else "ElectronicComponent")
        return parent, "review"
    return None, None
