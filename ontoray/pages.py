"""The ``pages`` input table (url, warc_ts, html, text, lang).

Two deterministic producers:

* ``pages_from_documents`` — derives a pages-shaped table from the driver's
  ``documents.parquet`` (doc_id, text, lang, source, n_chars), deterministically
  augmenting each row from ``doc_id`` with sentences that exercise the cleaner,
  the Hearst/SVO/property extractors, and the canonicalization pairs.  The
  identical derivation is expressible in ANSI SQL (``sql_pages_cte``), which is
  what makes the extraction pipeline DuckDB-oracle-checkable end to end.

* ``make_pages_corpus`` — the FIXTURES.md synthetic Common-Crawl-style corpus
  (seeded, Zipf-skewed hosts with one deliberately hot host, duplicate urls
  with distinct warc_ts, empty-text rows forcing html derivation) used by the
  KG pytest suite and the scaling bench.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# --- deterministic augmentation vocab (1-indexed in SQL, % in both) --------
ENT = ["Capacitor", "Resistor", "Inductor", "Diode", "Transistor", "Antenna",
       "Connector", "Sensor"]
PARW = ["Component", "Device", "Module", "Part", "Element"]
CAT = ["Devices", "Components", "Modules", "Parts"]
MFR = ["Acmecorp", "Globex", "Initech"]
FRQ = ["2.4-5.8", "0.8-2.7", "1.5"]

BOILER = " Copyright © 2024 Texas Instruments Incorporated submit document feedback"
MD_NOISE = " ![{e} diagram](img/{e}.png) see [datasheet](http://x.example/d) for details"


def augment_text(doc_id: int, text: str) -> str:
    """Deterministic per-doc augmentation (mirrored by ``sql_aug_expr``)."""
    e1 = ENT[doc_id % 8]
    p1 = PARW[doc_id % 5]
    c1 = CAT[doc_id % 4]
    e2 = ENT[(doc_id + 1) % 8]
    e3 = ENT[(doc_id + 2) % 8]
    m1 = MFR[doc_id % 3]
    f1 = FRQ[doc_id % 3]
    s = (f"{text} The {e1} is a {p1}. {c1} such as {e2} and {e3} are common."
         f" The {e1} is manufactured by {m1}. The {e1} operates at {f1} GHz."
         f" The {e1} has an impedance of 50 ohms.")
    if doc_id % 3 == 0:
        s += f" Many {e1}s are used here."
    if doc_id % 4 == 0:
        s += " It is a passive component."
    if doc_id % 7 == 0:
        s += BOILER
    if doc_id % 5 == 0:
        s += MD_NOISE.format(e=e1)
    return s


def _sql_list(items: list[str]) -> str:
    inner = ", ".join("'" + i.replace("'", "''") + "'" for i in items)
    return f"[{inner}]"


def sql_aug_expr(doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB expression equal to ``augment_text(doc_id, text)``."""
    ent, parw, cat, mfr, frq = map(_sql_list, (ENT, PARW, CAT, MFR, FRQ))
    e1 = f"({ent})[1 + {doc_id} % 8]"
    p1 = f"({parw})[1 + {doc_id} % 5]"
    c1 = f"({cat})[1 + {doc_id} % 4]"
    e2 = f"({ent})[1 + ({doc_id} + 1) % 8]"
    e3 = f"({ent})[1 + ({doc_id} + 2) % 8]"
    m1 = f"({mfr})[1 + {doc_id} % 3]"
    f1 = f"({frq})[1 + {doc_id} % 3]"
    base = (f"{text} || ' The ' || {e1} || ' is a ' || {p1} || '. ' || {c1}"
            f" || ' such as ' || {e2} || ' and ' || {e3} || ' are common.'"
            f" || ' The ' || {e1} || ' is manufactured by ' || {m1} || '.'"
            f" || ' The ' || {e1} || ' operates at ' || {f1} || ' GHz.'"
            f" || ' The ' || {e1} || ' has an impedance of 50 ohms.'")
    base = (f"({base}) || (CASE WHEN {doc_id} % 3 = 0 THEN ' Many ' || {e1} || 's are used here.' ELSE '' END)"
            f" || (CASE WHEN {doc_id} % 4 = 0 THEN ' It is a passive component.' ELSE '' END)"
            f" || (CASE WHEN {doc_id} % 7 = 0 THEN '{BOILER.replace(chr(39), chr(39) * 2)}' ELSE '' END)"
            f" || (CASE WHEN {doc_id} % 5 = 0 THEN ' ![' || {e1} || ' diagram](img/' || {e1} || '.png)"
            f" see [datasheet](http://x.example/d) for details' ELSE '' END)")
    return base


def sql_pages_cte(table: str = "documents") -> str:
    """CTE body: SELECT producing the derived pages rows from ``documents``."""
    aug = sql_aug_expr("doc_id", "text")
    return (f"SELECT doc_id, 'https://' || source || '.example.org/doc-' || doc_id AS url, "
            f"{aug} AS text, lang FROM {table}")


def augment_documents_batch(batch: pa.Table) -> pa.Table:
    """Ray map_batches fn: documents rows -> derived pages rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    urls = [f"https://{s}.example.org/doc-{d}" for s, d in zip(sources, doc_ids)]
    aug = [augment_text(d, t) for d, t in zip(doc_ids, texts)]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "text": pa.array(aug, pa.string()),
        "lang": batch.column("lang"),
    })


def pages_from_documents(sf_dir: str):
    """ray.data.Dataset of derived pages from ``{sf_dir}/documents.parquet``."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(augment_documents_batch, batch_format="pyarrow")


# --- synthetic Common-Crawl-style corpus (FIXTURES.md §1-2) -----------------

HOT_HOST = "wiki.example.org"

_TEMPLATES = [
    "The {E1} is a {P1}.",
    "{C1} such as {E2} and {E3} are common.",
    "The {E1} is manufactured by {M1}.",
    "{E2}, a type of {P1}, is widely used.",
    "The {E1} contains a {E2}.",
    "The {E1} connects to a {E2}.",
    "The {E2} requires a {E3}.",
    "The {E1} works with a {E2}.",
    "The {E1} conforms to {S1}.",
    "{E3}, an instance of {P1}, ships in volume.",
    "The {E1} operates at {F1} GHz.",
    "The {E1} has an impedance of {I1} ohms.",
    "The {E1} has a supply voltage of {V1} v.",
    "Many {E1}s are used here.",
    "It is a passive component with an sma connector.",
]

_NOISE = [
    " ![{E1} diagram](img/{E1}.png)",
    " see [the datasheet](http://www.example.com/x) for details",
    " Copyright © 2024 Texas Instruments Incorporated",
    " www.ti.com submit document feedback",
    " `*#_ important notice and disclaimer",
    " figure 3 table 7 january 12 Texas 94",
]

_STD = ["IEEE802-11", "RoHS", "REACH"]
_IMP = ["50", "75", "300"]
_VLT = ["3.3", "5.0", "12"]


def _page_text(rng: np.random.Generator, ent_idx: np.ndarray, pn_space: int) -> str:
    n_sent = int(rng.integers(3, 9))
    parts = []
    for _ in range(n_sent):
        t = _TEMPLATES[int(rng.integers(0, len(_TEMPLATES)))]
        parts.append(t.format(
            E1=ENT[int(ent_idx[int(rng.integers(0, len(ent_idx)))])],
            E2=ENT[int(rng.integers(0, len(ENT)))],
            E3=ENT[int(rng.integers(0, len(ENT)))],
            P1=PARW[int(rng.integers(0, len(PARW)))],
            C1=CAT[int(rng.integers(0, len(CAT)))],
            M1=MFR[int(rng.integers(0, len(MFR)))],
            S1=_STD[int(rng.integers(0, len(_STD)))],
            F1=FRQ[int(rng.integers(0, len(FRQ)))],
            I1=_IMP[int(rng.integers(0, len(_IMP)))],
            V1=_VLT[int(rng.integers(0, len(_VLT)))],
        ))
    # Part-number entities: an open vocabulary that scales with corpus size
    # (a web corpus's entity space is unbounded; a fixed 8-entity vocabulary
    # would make the canonicalization stages trivially constant-time).
    if rng.random() < 0.7:
        pn = f"pn{int(rng.integers(0, pn_space)):06d}"
        e = ENT[int(rng.integers(0, len(ENT)))]
        m = MFR[int(rng.integers(0, len(MFR)))]
        parts.append(f"The {pn} is a {e}. The {pn} is manufactured by {m}.")
    if rng.random() < 0.4:
        parts.append(_NOISE[int(rng.integers(0, len(_NOISE)))].format(E1=ENT[0]))
    return " ".join(parts)


def make_pages_corpus(n_rows: int, seed: int = 42, shard: int = 0,
                      pn_space: int | None = None) -> pa.Table:
    """Deterministic pages table: Zipf-skewed hosts (HOT_HOST ~20%), Zipf
    entity skew (ENT[0] hot), ~2% duplicate urls, 10% empty text (derive from
    html), 10% non-en rows.

    ``shard`` namespaces urls and the RNG stream so large corpora can be
    generated as independent deterministic shards in parallel; when sharding,
    pass the GLOBAL ``pn_space`` (total_rows // 3) so the open part-number
    vocabulary scales with the whole corpus, not per shard."""
    rng = np.random.default_rng([seed, shard])
    hosts = [HOT_HOST] + [f"host{i:02d}.example.net" for i in range(49)]
    host_p = np.array([0.20] + [0.80 / 49] * 49)
    # Zipf-ish entity exposure: ENT[0] appears in ~15% of docs' candidate pool.
    ent_w = 1.0 / np.arange(1, len(ENT) + 1)
    ent_w /= ent_w.sum()

    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    pn_space = pn_space if pn_space is not None else max(16, n_rows // 3)
    for i in range(n_rows):
        host = hosts[int(rng.choice(len(hosts), p=host_p))]
        url = f"https://{host}/s{shard:03d}-page-{i:06d}"
        ent_idx = rng.choice(len(ENT), size=3, p=ent_w)
        body = _page_text(rng, ent_idx, pn_space)
        lang = "en" if rng.random() < 0.9 else ("de" if rng.random() < 0.5 else "fr")
        ts = base_ts + np.timedelta64(int(rng.integers(0, 365 * 24 * 3600)), "s")
        html = (f"<html><head><title>page {i}</title>"
                f"<style>p{{margin:0}}</style></head>"
                f"<body><p>{body}</p></body></html>").encode()
        text = "" if rng.random() < 0.10 else body
        urls.append(url); tss.append(ts); htmls.append(html)
        texts.append(text); langs.append(lang)
        if rng.random() < 0.02:  # duplicate url, later crawl ts
            urls.append(url)
            tss.append(ts + np.timedelta64(int(rng.integers(1, 10_000)), "s"))
            htmls.append(html); texts.append(text); langs.append(lang)

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]"),
                            pa.timestamp("us", tz="UTC")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
