"""DuckDB-mirror parity tests (no Ray): the SQL strings served by
``oracle_sql()`` must reproduce the shared Python kernels bit-for-bit on
adversarial fixtures — this is what makes the driver's hash gate meaningful."""

import random

import duckdb
import pytest

CHUNK_SQL = """
WITH RECURSIVE
cleaned AS (SELECT doc_id, ct FROM my_docs),
{chunk_ctes}
SELECT doc_id, chunk_id, chunk_text FROM chunks ORDER BY doc_id, chunk_id
"""


def _run_chunk_sql(docs):
    from ontoray.queries import _CHUNK_CTES
    con = duckdb.connect()
    con.execute("CREATE TABLE my_docs(doc_id BIGINT, ct VARCHAR)")
    con.executemany("INSERT INTO my_docs VALUES (?, ?)", docs)
    rows = con.execute(CHUNK_SQL.format(chunk_ctes=_CHUNK_CTES)).fetchall()
    out = {}
    for did, cid, txt in rows:
        out.setdefault(did, []).append((cid, txt))
    return {k: sorted(v) for k, v in out.items()}


class TestSqlChunker:
    def test_randomized_docs(self):
        from ontoray.text.chunk import split_text
        rng = random.Random(7)
        vocab = ["capacitor", "resistor", "x", "antenna", "microcontroller",
                 "a" * 50, "b" * 99, "c" * 150, "word", "of", "the"]
        docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 500))))
                for i in range(30)]
        docs += [(100, ""), (101, "single"), (102, "d" * 999),
                 (103, "e" * 999 + " tail words here")]
        got = _run_chunk_sql(docs)
        for did, ct in docs:
            want = list(enumerate(split_text(ct, 1000, 100)))
            assert got.get(did, []) == want, did

    def test_overlap_boundaries(self):
        """Word lengths around the 100-char overlap and 899/999-char
        second-clause boundaries of the pop loop."""
        from ontoray.text.chunk import split_text
        rng = random.Random(11)
        sizes = [1, 2, 3, 50, 99, 100, 101, 120, 450, 500, 890, 899, 900, 950, 998, 999]
        docs = [(i, " ".join("w" * rng.choice(sizes)
                             for _ in range(rng.randint(1, 25))))
                for i in range(40)]
        got = _run_chunk_sql(docs)
        for did, ct in docs:
            assert got.get(did, []) == list(enumerate(split_text(ct, 1000, 100))), did


class TestSqlNormalizer:
    def test_matches_python(self):
        from ontoray.text.normalize import normalize_concept_name, sql_norm_expr
        con = duckdb.connect()
        expr = sql_norm_expr("w")
        words = ["capacitors", "Resistors ", "chip antennas", "glasses", "knives",
                 "wives", "Antennae", "bus", "buses", "glass", "analysis", "analyses",
                 "matrices", "people", "men", "dies", "device", "devices", "boxes",
                 "churches", "dishes", "is", "as", "flies", "a b c resistors",
                 "basis", "lives", "waves", "caves", "es", "ies", "ves", "ss", "x",
                 "", "  spaced out parts  ", "foo bars", "quizzes", "double  spaces"]
        for w in words:
            got = con.execute(f"SELECT {expr} FROM (SELECT ? AS w)", [w]).fetchone()[0]
            assert got == normalize_concept_name(w), w

    def test_singular_rules_hypothesis_style(self):
        from ontoray.text.normalize import normalize_concept_name, sql_norm_expr
        rng = random.Random(3)
        con = duckdb.connect()
        expr = sql_norm_expr("w")
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        suffixes = ["s", "es", "ies", "ves", "ss", "us", "is", "xes", "ches", "shes", ""]
        for _ in range(300):
            stem = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
            w = stem + rng.choice(suffixes)
            got = con.execute(f"SELECT {expr} FROM (SELECT ? AS w)", [w]).fetchone()[0]
            assert got == normalize_concept_name(w), w


class TestSqlLangId:
    def test_matches_python_classifier(self):
        from ontoray.extras.textstats import STOP_PROFILES, TOKEN_RE
        from ontoray.queries import SQL_TEXT_LANGID
        texts = [
            "the cat and the dog of it", "der hund und die katze ist ein tier",
            "le chat est un animal et la porte", "el perro y la casa es una cosa",
            "zzz qqq www", "", "de la the und",  # cross-language ties
            "the der le el", "und the",
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(texts)))
        sql = dict(con.execute(SQL_TEXT_LANGID).fetchall())
        for i, t in enumerate(texts):
            toks = TOKEN_RE.findall(t)
            best, best_n = "und", 0
            for lang in sorted(STOP_PROFILES):
                n = sum(1 for w in toks if w in STOP_PROFILES[lang])
                if n > best_n:
                    best, best_n = lang, n
            assert sql[i] == best, (i, t, sql[i], best)


class TestSqlMinhash:
    def test_pairs_match_engine_semantics(self):
        """sql_minhash_pairs vs an in-process replay of the engine's exact
        semantics (md5-32 shingles, mod-p signatures, banded candidates,
        unrounded Jaccard) on a fixture with near-dups, empties, ties."""
        import numpy as np
        from ontoray.extras.dedup import (_minhash_params, jaccard,
                                          minhash_signature, sql_minhash_pairs)
        rng = random.Random(3)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
                 "theta", "iota", "kappa"]
        docs = []
        for i in range(40):
            base = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
            docs.append((i, " ".join(base)))
            if rng.random() < 0.5:
                mut = list(base)
                for _ in range(rng.randint(0, 3)):
                    if mut:
                        mut[rng.randrange(len(mut))] = rng.choice(vocab)
                docs.append((100 + i, " ".join(mut)))
        docs += [(900, ""), (901, "one"), (902, "one two"), (903, "one two"),
                 (904, "UPPER CASE only"), (905, "")]

        a, b = _minhash_params(64, 7)
        sigs = {d: minhash_signature(t, a, b, 3) for d, t in docs}
        ids = [d for d, _ in docs]
        cands = set()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                da, db = sorted((ids[x], ids[y]))
                sa, sb = sigs[da], sigs[db]
                if any(np.array_equal(sa[bi * 4:(bi + 1) * 4],
                                      sb[bi * 4:(bi + 1) * 4])
                       for bi in range(16)):
                    cands.add((da, db))
        texts = dict(docs)
        eng = {}
        for da, db in cands:
            j = jaccard(texts[da], texts[db], 3)
            if j >= 0.5:
                eng[(da, db)] = j

        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?,?)", docs)
        got = {(r[0], r[1]): r[2]
               for r in con.execute(sql_minhash_pairs(threshold=0.5)).fetchall()}
        assert got == eng
        assert len(got) > 10  # fixture actually exercises the near-dup path


class TestSqlEmbeddingNeardup:
    def test_pairs_match_engine_replay(self):
        """sql_embedding_neardup vs a numpy replay of BandedSignLSH + cosine
        verify on a fixture with PLANTED near-duplicates (the sf tables are
        near-orthogonal, so this is where the non-empty path is proven)."""
        import numpy as np
        from ontoray.extras.dedup import sql_embedding_neardup
        dim, n_planes, bands, seed, th = 16, 8, 4, 11, 0.9
        rng = np.random.default_rng(5)
        base = rng.standard_normal((30, dim))
        rows = [(i, base[i]) for i in range(30)]
        for j in range(8):            # planted near-dups of vecs 0..7
            rows.append((100 + j, base[j] + 0.05 * rng.standard_normal(dim)))
        rows.append((200, np.zeros(dim)))  # zero vector (norm guard)
        ids = np.array([r[0] for r in rows])
        v = np.array([r[1] for r in rows], dtype=np.float64)

        prng = np.random.default_rng(seed)
        planes = [prng.standard_normal((dim, n_planes)) for _ in range(bands)]
        w = 1 << np.arange(n_planes)

        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
        con.executemany("INSERT INTO embeddings VALUES (?, ?)",
                        [(int(i), [float(np.float32(x)) for x in vec])
                         for i, vec in rows])
        # engine replay: reads float32 parquet, so quantize before the math
        v32 = np.array([[np.float32(x) for x in vec] for _, vec in rows],
                       dtype=np.float64)
        norms = np.linalg.norm(v32, axis=1)
        norms[norms == 0] = 1.0
        vn = v32 / norms[:, None]
        sims = vn @ vn.T
        eng = {}
        for P in planes:
            buckets = ((v32 @ P) > 0).dot(w)
            for bk in np.unique(buckets):
                idx = np.flatnonzero(buckets == bk)
                for x in range(len(idx)):
                    for y in range(x + 1, len(idx)):
                        i, j = idx[x], idx[y]
                        if sims[i, j] >= th:
                            a, b = sorted((int(ids[i]), int(ids[j])))
                            eng[(a, b)] = round(float(sims[i, j]), 6)
        sql = sql_embedding_neardup(dim=dim, threshold=th, n_planes=n_planes,
                                    bands=bands, seed=seed)
        got = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
        assert set(got) == set(eng)
        for k in got:
            assert abs(got[k] - eng[k]) < 2e-6, (k, got[k], eng[k])
        assert len(got) >= 6   # planted dups actually found


class TestSqlUrlCanon:
    def test_adversarial_urls(self):
        import pyarrow as pa
        from ontoray.text.urlnorm import canonicalize_url_column, sql_canon_expr
        urls = [
            "https://Example.COM/Path?id=3&utm_source=x&utm_campaign=abc#frag",
            "HTTP://WWW.HOST.ORG:80/a?utm_x=1",
            "https://www.host.org:443/",
            "http://host:80",
            "https://h/p?utm_a=1&utm_b=2",
            "https://h/p?utm_a=1&real=2",
            "https://h/p?a=1&fbclid=zzz",
            "https://h/p?gclid=1",
            "ftp://WeIrD/KeepCase?utm_q=1",
            "not a url #frag",
            "https://h/p?utm_a=1&utm_b=2&c=3#x",
            "http://www.a.b:80/?utm_z=9",
            "HTTPS://H:443/x",
            "http://h:8080/x",
            "https://h/p?utm_source=#y",
            "",
            # Adversarial: tracked names as SUBSTRINGS of other param names
            # must survive untouched (r2 ADVICE: unanchored rule spliced
            # '?xgclid=1&page=2' into '?xpage=2').
            "https://h/p?xgclid=1&page=2",
            "https://h/p?myfbclid=5&id=2",
            "https://h/p?a=1&xutm_source=2",
            # Consecutive tracked runs (single-pass global replace must not
            # leave survivors).
            "https://h/p?utm_a=1&utm_b=2&utm_c=3&x=4",
            "https://h/p?utm_a=1&utm_b=2&utm_c=3",
            "https://h/p?a=1&fbclid=x&gclid=y&b=2",
        ]
        got = canonicalize_url_column(pa.array(urls, pa.string())).to_pylist()
        con = duckdb.connect()
        con.register("t", pa.table({"u": pa.array(urls)}))
        want = [r[0] for r in con.execute(
            f"SELECT {sql_canon_expr('u')} FROM t").fetchall()]
        assert got == want
        # the rules actually fire: lowered host, stripped www/port/utm/frag
        assert got[0] == "https://example.com/Path?id=3"
        assert got[1] == "http://host.org/a"
        assert got[3] == "http://host"
        # substring-named params untouched, consecutive runs fully stripped
        assert got[16] == "https://h/p?xgclid=1&page=2"
        assert got[17] == "https://h/p?myfbclid=5&id=2"
        assert got[18] == "https://h/p?a=1&xutm_source=2"
        assert got[19] == "https://h/p?x=4"
        assert got[20] == "https://h/p"
        assert got[21] == "https://h/p?a=1&b=2"


class TestSqlHllRawBranch:
    def test_raw_estimate_parity_at_60k(self):
        """Beyond the linear-counting regime (all registers hit) the raw HLL
        formula's float evaluation must still match DuckDB bit-for-bit after
        round(.,4) — the rounding-parity risk area of the mirror."""
        import math

        import pyarrow as pa
        from ontoray.extras.sketches import (HLL_M, _RHO_MAX, _hll_partial,
                                             sql_hll_estimate)
        vals = [f"key-{i}" for i in range(60000)]
        t = pa.table({"grp": pa.array(["g"] * len(vals)),
                      "key": pa.array(vals)})
        part = _hll_partial(t, "key", "grp")
        regs: dict = {}
        for j, r in zip(part.column("j").to_pylist(),
                        part.column("reg").to_pylist()):
            regs[j] = max(regs.get(j, 0), r)
        n_zero = HLL_M - len(regs)
        s = n_zero * (1 << _RHO_MAX) + sum(1 << (_RHO_MAX - r)
                                           for r in regs.values())
        alpha = 0.7213 / (1 + 1.079 / HLL_M)
        raw = alpha * HLL_M * HLL_M * float(1 << _RHO_MAX) / s
        est = (HLL_M * math.log(HLL_M / n_zero)
               if raw <= 2.5 * HLL_M and n_zero > 0 else raw)
        assert raw > 2.5 * HLL_M                   # actually the raw branch
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(sql_hll_estimate(
            "SELECT grp, key FROM t", "key", group_col="grp")).fetchall()[0]
        assert ("g", HLL_M, n_zero, s, round(est, 4)) == want
        assert abs(est - 60000) / 60000 < 0.03     # ~1.6% typical at b=12
