"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
* exact — content-hash per batch (vectorized crc/sha) then a two-phase
  groupby on the HASH (small fixed-width key) instead of shuffling full text.
* MinHash-LSH — shingle → 64 minhashes → band rows (band_id, band_hash,
  doc_id) → groupby bands → candidate pairs → Jaccard verify.  Only band
  rows shuffle; full shingle sets never leave their batch except for
  candidate verification.
* SimHash — 64-bit signature per doc; banded on 4×16-bit chunks for
  candidate generation.
* embedding near-dup — sign-projection LSH buckets → within-bucket cosine.

All hashes are crc32/fixed-seed (process-stable).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# --- exact dedup ------------------------------------------------------------


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(min id, n_copies) per distinct content — groupby on sha1(text)."""
    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha1(t.encode()).hexdigest() for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col), "__h": pa.array(hs, pa.string())})

    from ontoray.stages.agg import hash_aggregate
    return hash_aggregate(
        ds.map_batches(add_hash, batch_format="pyarrow"), ["__h"],
        partial_aggs=[(id_col, "min"), (id_col, "count")],
        aggs=[(f"{id_col}_min", "min"), (f"{id_col}_count", "sum")],
        rename={f"{id_col}_min_min": "doc_id", f"{id_col}_count_sum": "n_copies"},
    ).select_columns(["doc_id", "n_copies"])


# --- MinHash + LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_M61 = np.uint64(_MERSENNE)


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE - 1, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE - 1, size=num_hashes, dtype=np.int64)
    return a, b


def _mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Exact (a[:,None] * x[None,:]) mod 2^61-1 for a < 2^61-1, x < 2^32.

    The naive int64/uint64 product wraps mod 2^64 (a*x is up to 2^93), which
    silently breaks the universal-hash family (ADVICE r1).  Split a into
    32-bit halves and use the Mersenne fold 2^61 ≡ 1 (mod p), all in uint64:
      a*x = a_hi*x*2^32 + a_lo*x, with a_hi*x < p and a_lo*x < 2^64."""
    a = a.astype(np.uint64)
    x = x.astype(np.uint64)
    a_hi = a >> np.uint64(32)                 # < 2^29
    a_lo = a & np.uint64(0xFFFFFFFF)
    m = a_hi[:, None] * x[None, :]            # < 2^61 - 1 = p
    # m * 2^32 mod p: m = m_hi*2^29 + m_lo  =>  m*2^32 ≡ m_hi + m_lo*2^32.
    m = (m >> np.uint64(29)) + ((m & np.uint64((1 << 29) - 1)) << np.uint64(32))
    m = np.where(m >= _M61, m - _M61, m)
    lo = a_lo[:, None] * x[None, :]           # < 2^64, exact in uint64
    lo = (lo >> np.uint64(61)) + (lo & _M61)  # fold once, < p + 8
    r = m + lo                                # < 2^62
    r = (r >> np.uint64(61)) + (r & _M61)
    return np.where(r >= _M61, r - _M61, r)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _TOKEN_RE.findall(text)
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.int64))


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    sh = _shingles(text, k)
    # (num_hashes, n_shingles) permutation hashes — vectorized, exact mod-p.
    vals = _mulmod61(a, sh) + b.astype(np.uint64)[:, None]   # < 2p, fits uint64
    vals = np.where(vals >= _M61, vals - _M61, vals)
    return vals.min(axis=1).astype(np.int64)


class MinHashBands:
    """documents -> (band_id, band_hash, doc_id) rows; params built per actor."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, k: int = 3, seed: int = 7):
        assert num_hashes % bands == 0
        self.a, self.b = _minhash_params(num_hashes, seed)
        self.bands = bands
        self.rows = num_hashes // bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = minhash_signature(text, self.a, self.b, self.k)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows:(bi + 1) * self.rows]
                band_ids.append(bi)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
                doc_ids.append(did)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingles(text_a, k).tolist()), set(_shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(ds, num_hashes: int = 64, bands: int = 16, k: int = 3,
                            seed: int = 7, concurrency: int = 4):
    """Distinct candidate (doc_a < doc_b) pairs sharing >= 1 LSH band."""
    import pandas as pd

    band_rows = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashBands, fn_constructor_args=(num_hashes, bands, k, seed),
        batch_format="pyarrow", concurrency=(1, concurrency)).materialize()

    # Almost every (band, hash) bucket is a singleton; count first and keep
    # only colliding buckets so the per-group pair expansion never touches
    # the long tail.
    from ontoray.stages.agg import hash_aggregate
    colliding = hash_aggregate(
        band_rows.select_columns(["band_id", "band_hash"]), ["band_id", "band_hash"],
        partial_aggs=[("band_hash", "count")],
        aggs=[("band_hash_count", "sum")], rename={"band_hash_count_sum": "n"},
    ).filter(expr="n >= 2")
    keep = {(r["band_id"], r["band_hash"]) for r in colliding.take_all()}
    keep_hashes = pa.array(sorted({h for _b, h in keep}), pa.int64())

    def only_colliding(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch.column("band_hash"), value_set=keep_hashes))

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": pd.array(out_a, dtype="int64"),
                             "doc_b": pd.array(out_b, dtype="int64")})

    pairs = (band_rows.map_batches(only_colliding, batch_format="pyarrow")
             .groupby(["band_id", "band_hash"]).map_groups(pairs_of, batch_format="pandas"))
    # Distinct pairs (a pair can collide in several bands).
    return hash_aggregate(pairs, ["doc_a", "doc_b"],
                          partial_aggs=[("doc_a", "count")],
                          aggs=[("doc_a_count", "sum")],
                          rename={"doc_a_count_sum": "n_bands"})


def minhash_dedup(ds, threshold: float = 0.8, num_hashes: int = 64, bands: int = 16,
                  k: int = 3, seed: int = 7, concurrency: int = 4):
    """Verified near-duplicate pairs: LSH candidates with true Jaccard >= t.

    Verification joins candidate pairs back to texts via broadcast of the
    candidate id set (candidates are a tiny fraction of the corpus)."""
    import ray

    cand = minhash_candidate_pairs(ds, num_hashes, bands, k, seed, concurrency).take_all()
    need_ids = sorted({r["doc_a"] for r in cand} | {r["doc_b"] for r in cand})
    id_set = set(need_ids)

    def keep_needed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch.column("doc_id"), value_set=pa.array(need_ids, pa.int64()))
        return batch.filter(mask)

    texts = {}
    if need_ids:
        small = ds.select_columns(["doc_id", "text"]).map_batches(
            keep_needed, batch_format="pyarrow")
        for r in small.take_all():
            if r["doc_id"] in id_set:
                texts[r["doc_id"]] = r["text"]

    rows = []
    for r in cand:
        a, b = r["doc_a"], r["doc_b"]
        j = jaccard(texts.get(a, ""), texts.get(b, ""), k)
        if j >= threshold:
            rows.append({"doc_a": a, "doc_b": b, "jaccard": round(j, 6)})
    rows.sort(key=lambda r: (r["doc_a"], r["doc_b"]))
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())})


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = _TOKEN_RE.findall(text)
    acc = np.zeros(64, dtype=np.int64)
    for w in toks:
        h = zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8),
                             bitorder="little")
        acc += np.where(bits == 1, 1, -1)
    sig = 0
    for i in range(64):
        if acc[i] > 0:
            sig |= (1 << i)
    return sig - (1 << 64) if sig >= (1 << 63) else sig  # two's-complement int64


def simhash_batch(batch: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array([simhash64(t) for t in batch.column("text").to_pylist()],
                            pa.int64()),
    })


# --- embedding near-dup -----------------------------------------------------


class SignLSH:
    """embeddings -> (bucket, vec_id, embedding) via seeded sign random
    projection — planes built once per actor."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float64)
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        signs = (vecs @ self.planes) > 0
        buckets = signs.dot(self.weights).astype(np.int64)
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "vec_id": batch.column("vec_id"),
            "embedding": batch.column("embedding"),
        })


def embedding_neardup(ds, dim: int, threshold: float = 0.95, n_planes: int = 12,
                      seed: int = 11, concurrency: int = 4):
    """Cosine near-duplicate pairs within sign-LSH buckets."""
    import pandas as pd

    with_bucket = ds.map_batches(
        SignLSH, fn_constructor_args=(dim, n_planes, seed),
        batch_format="pyarrow", concurrency=(1, concurrency))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].tolist()
        vecs = np.array(g["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vn = vecs / norms[:, None]
        sims = vn @ vn.T
        out_a, out_b, out_s = [], [], []
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                s = sims[i, j]
                if s >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_s.append(round(float(s), 6))
        return pd.DataFrame({"vec_a": pd.array(out_a, dtype="int64"),
                             "vec_b": pd.array(out_b, dtype="int64"),
                             "cosine": pd.array(out_s, dtype="float64")})

    return with_bucket.groupby("bucket").map_groups(verify, batch_format="pandas")
