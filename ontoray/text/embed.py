"""Deterministic text embeddings — char-n-gram feature hashing.

Replaces the reference's OpenAI ada-002 embedding client
(src/embedder.py:59-114, src/ontology_extension_manager.py:144-189) with a
deterministic local vectorizer: every character 3-gram of the lowercased text
is hashed into one of ``dim`` signed INTEGER buckets; cosine similarity on
the (unnormalized) count vectors plays the role the ada-002 cosine plays in
the linker (J1).

Hash contract (SQL-mirrorable, same md5-int60 convention as
ontoray/extras/sketches.py): ``h = int(md5(utf8(gram)).hexdigest()[:15], 16)``
— 60 bits, reproducible in DuckDB as
``CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)``.  Bucket
``h % dim``, sign from bit 17.  The raw bucket vector is INTEGER, so
distributed dot products are exact; cosine is computed in float64 as
``dot / sqrt(n1 * n2)`` with the norm product formed in integer arithmetic —
the identical expression evaluates bit-equal in numpy and DuckDB, which is
what lets the entity-linking family be hash-checked against a SQL oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_DIM = 64
_N = 3


def _gram_hash(gram: str) -> int:
    """md5-int60 of the gram's UTF-8 bytes (DuckDB-expressible)."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)


def embed_counts(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Unnormalized signed 3-gram count vector (int64)."""
    v = np.zeros(dim, dtype=np.int64)
    t = " " + text.lower() + " "
    for i in range(len(t) - _N + 1):
        h = _gram_hash(t[i:i + _N])
        idx = h % dim
        v[idx] += 1 if (h >> 17) & 1 else -1
    return v


def embed_counts_many(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """(len(texts), dim) int64 matrix of embed_counts rows — one vectorized
    exact-md5 pass over every gram in the batch (fastmd5), identical values
    to the per-row loop (pytest: test_embed_counts_many_matches_single)."""
    from ontoray.extras.fastmd5 import md5_int60
    out = np.zeros((len(texts), dim), dtype=np.int64)
    grams: list[bytes] = []
    n_per: list[int] = []
    for t in texts:
        t = " " + t.lower() + " "
        n = max(len(t) - _N + 1, 0)
        grams.extend(t[j:j + _N].encode("utf-8") for j in range(n))
        n_per.append(n)
    if not grams:
        return out
    h = md5_int60(grams)
    idx = (h % dim).astype(np.int64)
    sign = np.where((h >> 17) & 1 == 1, 1, -1).astype(np.int64)
    row = np.repeat(np.arange(len(texts)), n_per)
    np.add.at(out, (row, idx), sign)
    return out


def cosine_exact(dot: int, n1: int, n2: int) -> float:
    """float64 cosine from exact integer dot and squared norms — the
    SQL-mirrored expression (dot::DOUBLE / sqrt((n1*n2)::DOUBLE))."""
    if n1 == 0 or n2 == 0:
        return 0.0
    return float(np.float64(dot) / np.sqrt(np.float64(n1 * n2)))


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """L2-normalized float32 embedding (cosine-compatible convenience API)."""
    v = embed_counts(text, dim).astype(np.float32)
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
