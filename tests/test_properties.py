"""Property-based invariants (hypothesis) for the pure text layer.

These pin the cross-engine equivalences the correctness gates rely on:
the Python-re cleaner vs its DuckDB RE2 mirror, chunker coverage, and
normalizer idempotence.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ontoray.text.chunk import split_text
from ontoray.text.clean import clean_text, sql_clean_expr
from ontoray.text.normalize import normalize_concept_name
from ontoray.text.extract import extract_triples

# ASCII corpus-like text: words, markdown noise, boilerplate fragments.
_ascii_text = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
        + list(" \t\n.,;:!?()[]#*_`-/©")
    ),
    max_size=400,
)


class TestCleanerProperties:
    @settings(max_examples=200, deadline=None)
    @given(_ascii_text)
    def test_python_re_matches_duckdb_re2_on_ascii(self, s):
        con = duckdb.connect()
        sql = f"SELECT {sql_clean_expr('?')} "
        # Parameter placeholder inside the generated expression chain:
        expr = sql_clean_expr("t")
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [s]).fetchone()[0]
        assert got == clean_text(s)

    @settings(max_examples=100, deadline=None)
    @given(_ascii_text)
    def test_idempotent(self, s):
        c = clean_text(s)
        assert clean_text(c) == c

    @settings(max_examples=100, deadline=None)
    @given(_ascii_text)
    def test_output_whitespace_normalized(self, s):
        c = clean_text(s)
        assert "  " not in c and c == c.strip()


class TestChunkerProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet=list("ab \n"), min_size=0, max_size=3000),
           st.integers(min_value=50, max_value=500))
    def test_chunks_within_size_and_cover_content(self, s, size):
        chunks = split_text(s, size, size // 10)
        # No chunk exceeds the size unless it is a single unsplittable run.
        for c in chunks:
            assert len(c) <= size
        # All non-whitespace content is covered (overlap may duplicate).
        import re
        orig_tokens = re.findall(r"[ab]+", s)
        covered = "".join(chunks)
        assert sum(map(len, orig_tokens)) <= sum(
            len(t) for t in re.findall(r"[ab]+", covered))

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet=list("xyz "), max_size=2000))
    def test_deterministic(self, s):
        assert split_text(s, 200, 20) == split_text(s, 200, 20)


class TestNormalizerProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=list("abcdefghijklmnopqrstuvwxyz "), max_size=30))
    def test_idempotent(self, s):
        n = normalize_concept_name(s)
        assert normalize_concept_name(n) == n


class TestExtractionProperties:
    @settings(max_examples=100, deadline=None)
    @given(_ascii_text)
    def test_no_stop_endpoints(self, s):
        from ontoray.text.extract import ENDPOINT_STOP
        for subj, _p, obj, _t, _c in extract_triples(s.lower()):
            assert subj not in ENDPOINT_STOP and obj not in ENDPOINT_STOP
