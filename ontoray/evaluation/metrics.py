"""Evaluation harness — gold-standard P/R/F1, top-k coverage, saturation.

Exact ports of the reference's evaluation math:
* ``calculate_metrics`` — src/evaluation/gold_standard.py:15-27 (incl. the
  round-to-4 behavior).
* ``evaluate_against_gold`` — concept-set and relation-set comparison with
  lower+strip normalization and the (name, 'subclass_of', parent) ∪
  non-taxonomic reconstruction (src/evaluation/gold_standard.py:29-112).
* ``topk_coverage`` — gold coverage within top-k by ranking column
  (src/evaluation/top_k_evaluation.py:42-76, confidence_k_evaluation.py).
* ``saturation_curve`` — seeded-shuffle new-vs-seen concept decay
  (src/evaluation/conceptual.py:61-127 — we seed the shuffle it leaves
  unseeded).
"""

from __future__ import annotations

from ontoray.text.normalize import normalize_eval


def calculate_metrics(tp: int, fp: int, fn: int) -> dict:
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = 2 * (precision * recall) / (precision + recall) if (precision + recall) > 0 else 0.0
    return {"precision": round(precision, 4), "recall": round(recall, 4),
            "f1_score": round(f1, 4), "TP": tp, "FP": fp, "FN": fn}


def tasks_to_relations(tasks: list[dict]) -> set[tuple[str, str, str]]:
    """Generated relation set from learned tasks — (name, subclass_of,
    parent) plus non-taxonomic (name, relation, target)."""
    rels: set[tuple[str, str, str]] = set()
    for t in tasks:
        source = normalize_eval(t.get("name", ""))
        if not source:
            continue
        parent = normalize_eval(t.get("parent_class") or "")
        if parent:
            rels.add((source, "subclass_of", parent))
        for r in t.get("non_taxonomic_relations") or []:
            target = normalize_eval(r.get("target") or "")
            rel_type = normalize_eval(r.get("relation") or "")
            if target and rel_type:
                rels.add((source, rel_type, target))
    return rels


def evaluate_against_gold(tasks: list[dict], gold: dict) -> dict:
    gen_concepts = {normalize_eval(t.get("name", "")) for t in tasks if t.get("name")}
    gold_concepts = {normalize_eval(c) for c in gold.get("concepts", []) if c}
    c_tp = len(gen_concepts & gold_concepts)
    c_fp = len(gen_concepts - gold_concepts)
    c_fn = len(gold_concepts - gen_concepts)

    gen_rel = tasks_to_relations(tasks)
    gold_rel = {(normalize_eval(r.get("source", "")), normalize_eval(r.get("type", "")),
                 normalize_eval(r.get("target", "")))
                for r in gold.get("relations", [])
                if r.get("source") and r.get("type") and r.get("target")}
    r_tp = len(gen_rel & gold_rel)
    r_fp = len(gen_rel - gold_rel)
    r_fn = len(gold_rel - gen_rel)

    return {"concept_evaluation": calculate_metrics(c_tp, c_fp, c_fn),
            "relation_evaluation": calculate_metrics(r_tp, r_fp, r_fn)}


def topk_coverage(ranked_names: list[str], gold_concepts: set[str],
                  ks: tuple[int, ...] = (25, 50, 100, 200)) -> dict:
    gold_norm = {normalize_eval(c) for c in gold_concepts}
    out = {}
    for k in ks:
        top = {normalize_eval(n) for n in ranked_names[:k]}
        found = len(top & gold_norm)
        out[k] = {"found": found,
                  "coverage": round(found / len(gold_norm), 4) if gold_norm else 0.0}
    return out


def md5_shuffle_order(keys: list[str], seed: int = 42) -> list[int]:
    """Deterministic shuffle order: rank by md5(key || ':' || seed), ties by
    key.  Unlike Fisher-Yates, this order is a pure per-row function, so it is
    (a) identical no matter how the rows were partitioned and (b) expressible
    in ANSI SQL (``ORDER BY md5(key || ':seed')``) — which is what lets the
    saturation query be hash-checked against the DuckDB oracle."""
    import hashlib
    return sorted(range(len(keys)),
                  key=lambda i: (hashlib.md5(f"{keys[i]}:{seed}".encode()).hexdigest(),
                                 keys[i]))


def saturation_curve(chunk_mentions: list[list[str]], batch_size: int = 10,
                     seed: int = 42, order: list[int] | None = None) -> list[dict]:
    """Shuffle chunks (seeded — or by an explicit precomputed ``order``, e.g.
    ``md5_shuffle_order``), scan in batches of ``batch_size``, track
    cumulative new-vs-seen mention counts."""
    if order is None:
        import random
        order = list(range(len(chunk_mentions)))
        random.Random(seed).shuffle(order)
    seen: set[str] = set()
    curve = []
    for start in range(0, len(order), batch_size):
        batch = order[start:start + batch_size]
        new = 0
        for i in batch:
            for m in chunk_mentions[i]:
                if m not in seen:
                    seen.add(m)
                    new += 1
        curve.append({"batch": start // batch_size, "new_concepts": new,
                      "total_seen": len(seen)})
    return curve
