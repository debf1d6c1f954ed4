"""Baseline ontology + broadcast alias dictionary.

The reference seeds Neo4j with a 23-class Schema.org-rooted hierarchy
(src/initialize_baseline.py:12-45) and the linker loads those classes plus any
:Product instances as its "existing ontology" (ontology_extension_manager
load_existing_ontology, :90-141).  Here the same data is a small in-memory
structure built once on the driver and broadcast via ``ray.put`` to every
linker actor (T2/J1 in SURVEY §2) — broadcast-small-side instead of a shuffle
join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ontoray.text.embed import embed_counts_many, embed_many
from ontoray.text.normalize import normalize_concept_name

# Child -> parent pairs, verbatim semantics of reference
# src/initialize_baseline.py:12-45 (root 'Thing' added below).
BASELINE_HIERARCHY: list[tuple[str, str]] = [
    ("Product", "Thing"),
    ("Organization", "Thing"),
    ("ElectronicComponent", "Product"),
    ("PassiveComponent", "ElectronicComponent"),
    ("ActiveComponent", "ElectronicComponent"),
    ("RFComponent", "ElectronicComponent"),
    ("Interconnect", "ElectronicComponent"),
    ("Electromechanical", "ElectronicComponent"),
    ("Sensor", "ElectronicComponent"),
    ("Resistor", "PassiveComponent"),
    ("Capacitor", "PassiveComponent"),
    ("Inductor", "PassiveComponent"),
    ("Diode", "ActiveComponent"),
    ("Transistor", "ActiveComponent"),
    ("IntegratedCircuit", "ActiveComponent"),
    ("Antenna", "RFComponent"),
    ("FPCAntenna", "Antenna"),
    ("ChipAntenna", "Antenna"),
    ("Connector", "Interconnect"),
    ("Cable", "Interconnect"),
]

# Instance-like entries with technical specs, standing in for the reference's
# :Product rows so the technical matchers (J3) have something to match.
PRODUCT_CONCEPTS: list[dict] = [
    {"name": "ChipAntenna", "frequency": "2.4-5.8 GHz", "impedance": "50 ohms"},
    {"name": "FPCAntenna", "frequency": "0.8-2.7 GHz", "impedance": "50 ohms"},
]

# Multi-word surface forms -> canonical class (FIXTURES.md §3 alias table).
SURFACE_ALIASES: list[tuple[str, str]] = [
    ("electronic component", "ElectronicComponent"),
    ("passive component", "PassiveComponent"),
    ("active component", "ActiveComponent"),
    ("rf component", "RFComponent"),
    ("chip antenna", "ChipAntenna"),
    ("fpc antenna", "FPCAntenna"),
    ("integrated circuit", "IntegratedCircuit"),
    ("ic", "IntegratedCircuit"),
]


def baseline_class_names() -> list[str]:
    names = ["Thing"]
    for child, parent in BASELINE_HIERARCHY:
        for n in (child, parent):
            if n not in names:
                names.append(n)
    return names


def baseline_concepts() -> list[dict]:
    """Existing-ontology concept dicts, as the reference loader shapes them
    (name / category 'Ontology Class' / description)."""
    specs = {c["name"]: c for c in PRODUCT_CONCEPTS}
    out = []
    for name in baseline_class_names():
        c = {
            "name": name,
            "category": "Ontology Class",
            "description": f"The ontological class representing {name}.",
        }
        c.update({k: v for k, v in specs.get(name, {}).items() if k != "name"})
        out.append(c)
    return out


@dataclass
class AliasData:
    """Broadcast payload for linker actors (picklable; embeddings as one
    contiguous float32 matrix for per-batch matmul)."""

    names: list[str]
    name_norms: list[str]
    categories: list[str]
    embeddings: np.ndarray            # (n_concepts, dim) L2-normalized float32
    tech: list[dict]                  # per-concept {frequency?, impedance?, voltage?, ...}
    # Exact-arithmetic twin of ``embeddings``: signed integer 3-gram count
    # vectors plus their squared L2 norms.  Dots on these are exact int64,
    # so the float64 cosine (dot / sqrt(n1*n2)) is bit-reproducible in SQL —
    # the contract the linker-family DuckDB mirrors hash-check against.
    emb_counts: np.ndarray | None = None   # (n_concepts, dim) int64
    emb_sq: np.ndarray | None = None       # (n_concepts,) int64 squared norms
    surface_map: dict = field(default_factory=dict)  # alias_norm -> concept index
    parent: dict = field(default_factory=dict)       # child name -> parent name
    # Per-concept char multisets of name_norms — a cheap true upper bound on
    # SequenceMatcher.ratio (quick_ratio) prunes the fuzzy-match loop.
    char_counts: list = field(default_factory=list)
    # Vectorized forms of the same pruning data: (n, 256) byte-count matrix
    # and norm lengths — one np.minimum per MENTION instead of a Python loop
    # over concepts (ASCII fast path; char_counts stays as the fallback).
    char_mat: np.ndarray | None = None
    norm_lens: np.ndarray | None = None
    norm_index: dict = field(default_factory=dict)   # name_norm -> [indices]

    def exact_index(self, name_norm: str):
        idx = self.surface_map.get(name_norm)
        return idx


def build_alias_data(dim: int = 64, extra_concepts: list[dict] | None = None) -> AliasData:
    concepts = baseline_concepts()
    if extra_concepts:
        have = {c["name"] for c in concepts}
        concepts += [c for c in extra_concepts if c["name"] not in have]
    names = [c["name"] for c in concepts]
    name_norms = [normalize_concept_name(n) for n in names]
    categories = [c.get("category", "") for c in concepts]
    tech = [{k: c[k] for k in ("frequency", "impedance", "voltage", "connector", "mounting") if c.get(k)}
            for c in concepts]
    # Embed the bare name: reference embeds _create_concept_text of the new
    # concept ({'name': x} -> just the name); matching representation here.
    embeddings = embed_many([n.lower() for n in names], dim=dim)
    emb_counts = embed_counts_many([n.lower() for n in names], dim=dim)
    emb_sq = (emb_counts * emb_counts).sum(axis=1)

    surface_map = {nn: i for i, nn in enumerate(name_norms)}
    for alias, canonical in SURFACE_ALIASES:
        if canonical in names:
            surface_map.setdefault(normalize_concept_name(alias), names.index(canonical))

    parent = {"Thing": None}
    for child, par in BASELINE_HIERARCHY:
        parent[child] = par
    from collections import Counter
    char_counts = [Counter(nn) for nn in name_norms]
    char_mat = np.zeros((len(name_norms), 256), dtype=np.int32)
    for i, nn in enumerate(name_norms):
        if nn.isascii():
            char_mat[i] = np.bincount(np.frombuffer(nn.encode(), np.uint8),
                                      minlength=256)
    norm_lens = np.array([len(nn) for nn in name_norms], dtype=np.int64)
    norm_index: dict[str, list[int]] = {}
    for i, nn in enumerate(name_norms):
        norm_index.setdefault(nn, []).append(i)
    return AliasData(names=names, name_norms=name_norms, categories=categories,
                     embeddings=embeddings, tech=tech,
                     emb_counts=emb_counts, emb_sq=emb_sq,
                     surface_map=surface_map,
                     parent=parent, char_counts=char_counts, char_mat=char_mat,
                     norm_lens=norm_lens, norm_index=norm_index)


def gazetteer_phrases(alias: AliasData) -> tuple[str, ...]:
    """Multi-word lowercase phrases for dictionary-based mention detection."""
    phrases = {a for a, _ in SURFACE_ALIASES if " " in a}
    return tuple(sorted(phrases))
