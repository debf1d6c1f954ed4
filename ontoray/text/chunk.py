"""Deterministic recursive character chunker.

Reimplements the published LangChain ``RecursiveCharacterTextSplitter``
algorithm (public knowledge; the reference invokes it with chunk_size=1000,
chunk_overlap=100 at src/data_loader.py:65 / src/config.py:83-84) so chunk
boundaries match the reference given the same parameters.  Separators are
tried in order ["\\n\\n", "\\n", " ", ""]; splits longer than ``chunk_size``
recurse into finer separators; adjacent splits are merged greedily up to
``chunk_size`` with a trailing ``chunk_overlap`` carried into the next chunk.

Note: because the cleaner collapses all whitespace to single spaces, post-clean
text contains no newlines and the splitter effectively splits on " " — but the
general algorithm is implemented for raw-text use.
"""

from __future__ import annotations

SEPARATORS = ["\n\n", "\n", " ", ""]


def _join_docs(docs: list[str], separator: str) -> str | None:
    text = separator.join(docs).strip()
    return text if text else None


def _merge_splits(splits: list[str], separator: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    sep_len = len(separator)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for d in splits:
        dlen = len(d)
        if total + dlen + (sep_len if current else 0) > chunk_size:
            if current:
                doc = _join_docs(current, separator)
                if doc is not None:
                    docs.append(doc)
                # Pop from the front until we are within the overlap budget.
                while total > chunk_overlap or (
                    total + dlen + (sep_len if current else 0) > chunk_size and total > 0
                ):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current.pop(0)
        current.append(d)
        total += dlen + (sep_len if len(current) > 1 else 0)
    doc = _join_docs(current, separator)
    if doc is not None:
        docs.append(doc)
    return docs


def split_text(text: str, chunk_size: int = 1000, chunk_overlap: int = 100,
               separators: list[str] | None = None) -> list[str]:
    """Recursive split; returns the ordered list of chunk strings."""
    seps = separators if separators is not None else SEPARATORS
    # Pick the first separator present in the text (or the final "").
    separator = seps[-1]
    new_separators: list[str] = []
    for i, s in enumerate(seps):
        if s == "":
            separator = s
            break
        if s in text:
            separator = s
            new_separators = seps[i + 1:]
            break

    splits = [s for s in (text.split(separator) if separator else list(text)) if s != ""]

    final_chunks: list[str] = []
    good_splits: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good_splits.append(s)
        else:
            if good_splits:
                final_chunks.extend(_merge_splits(good_splits, separator, chunk_size, chunk_overlap))
                good_splits = []
            if not new_separators:
                final_chunks.append(s)
            else:
                final_chunks.extend(split_text(s, chunk_size, chunk_overlap, new_separators))
    if good_splits:
        final_chunks.extend(_merge_splits(good_splits, separator, chunk_size, chunk_overlap))
    return final_chunks
