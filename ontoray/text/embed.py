"""Deterministic text embeddings — char-n-gram feature hashing.

Replaces the reference's OpenAI ada-002 embedding client
(src/embedder.py:59-114, src/ontology_extension_manager.py:144-189) with a
deterministic local vectorizer: every character 3-gram of the lowercased text
is hashed (crc32 — stable across processes, unlike Python's ``hash``) into one
of ``dim`` signed buckets; the result is L2-normalized.  Cosine similarity on
these vectors plays the role the ada-002 cosine plays in the linker (J1).
"""

from __future__ import annotations

import zlib

import numpy as np

DEFAULT_DIM = 64
_N = 3


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float32)
    t = " " + text.lower() + " "
    for i in range(len(t) - _N + 1):
        h = zlib.crc32(t[i:i + _N].encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 17) & 1 else -1.0
        v[idx] += sign
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return v


def embed_many(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """(len(texts), dim) float32 matrix of embed_text rows."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = embed_text(t, dim)
    return out


def concept_text(concept: dict) -> str:
    """Text representation for embedding — reference ``_create_concept_text``
    (src/ontology_extension_manager.py:501-514)."""
    parts = [concept.get("name", "")]
    if concept.get("category"):
        parts.append(f"Category: {concept['category']}")
    if concept.get("description"):
        parts.append(f"Description: {concept['description'][:200]}")
    if concept.get("frequency"):
        parts.append(f"Frequency: {concept['frequency']}")
    if concept.get("impedance"):
        parts.append(f"Impedance: {concept['impedance']}")
    return ". ".join(parts)
