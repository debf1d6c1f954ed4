"""Chunking stage: docs → chunks (1→N flat map inside map_batches).

Reference: RecursiveCharacterTextSplitter(chunk_size=1000, chunk_overlap=100)
applied after cleaning (src/data_loader.py:65,83; params src/config.py:83-84).
"""

from __future__ import annotations

import pyarrow as pa

from ontoray.text.chunk import split_text


def chunk_batch(batch: pa.Table, chunk_size: int = 1000, chunk_overlap: int = 100) -> pa.Table:
    urls_out, ids_out, texts_out = [], [], []
    urls = batch.column("url").to_pylist()
    docs = batch.column("doc_text").to_pylist()
    for url, doc in zip(urls, docs):
        for i, c in enumerate(split_text(doc, chunk_size, chunk_overlap)):
            urls_out.append(url)
            ids_out.append(i)
            texts_out.append(c)
    return pa.table({
        "url": pa.array(urls_out, pa.string()),
        "chunk_id": pa.array(ids_out, pa.int32()),
        "chunk_text": pa.array(texts_out, pa.string()),
    })


def make_chunks(docs_ds, chunk_size: int = 1000, chunk_overlap: int = 100):
    return docs_ds.map_batches(
        chunk_batch, batch_format="pyarrow",
        fn_kwargs={"chunk_size": chunk_size, "chunk_overlap": chunk_overlap})
