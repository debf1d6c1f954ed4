"""Unit tests for the pure text layer: cleaner byte-identity semantics,
chunker, normalizer, validity filter, spec parsers, embeddings."""

import numpy as np
import pytest

from ontoray.text.chunk import split_text
from ontoray.text.clean import clean_text
from ontoray.text.embed import embed_text
from ontoray.text.extract import extract_mentions, extract_triples, is_valid_concept
from ontoray.text.html import html_to_text
from ontoray.text.normalize import normalize_concept_name, normalize_eval, singular_noun
from ontoray.text.specs import (extract_freq_range, match_connector, match_frequency,
                                match_impedance, match_mounting, match_voltage)


class TestCleaner:
    """Reference _preprocess_text semantics (src/data_loader.py:13-47)."""

    def test_lowercase_and_whitespace(self):
        assert clean_text("Hello   WORLD\n\tfoo") == "hello world foo"

    def test_markdown_image_keeps_alt(self):
        assert clean_text("see ![Chip Antenna](img/x.png) here") == "see chip antenna here"

    def test_markdown_link_keeps_text(self):
        assert clean_text("see [the datasheet](http://x) now") == "see the datasheet now"

    def test_image_before_link_order(self):
        # The image rule must fire first or "!alt" would survive.
        assert clean_text("![a](b) [c](d)") == "a c"

    def test_boilerplate_removed_case_insensitive(self):
        s = "x Copyright © 2024 Texas Instruments Incorporated y WWW.TI.COM z"
        assert clean_text(s) == "x y z"

    def test_johanson_lines(self):
        s = ("Johanson Technology, Inc. reserves the right to make design changes "
             "without notice. ok")
        assert clean_text(s) == "ok"

    def test_markdown_chars_stripped(self):
        assert clean_text("a `*#_` b **bold** #h _i_") == "a b bold h i"

    def test_unicode_whitespace_collapsed(self):
        # Python \s is unicode-aware: NBSP and LINE SEPARATOR collapse too.
        assert clean_text("a\u00a0b\u2028c") == "a b c"

    def test_empty(self):
        assert clean_text("") == ""

    def test_idempotent(self):
        s = clean_text("Some **Test** with ![img](u) and [l](v)  spaces")
        assert clean_text(s) == s


class TestHtml:
    def test_basic(self):
        out = html_to_text(b"<html><head><title>t</title><style>p{}</style></head>"
                           b"<body><p>Hello <b>World</b></p></body></html>")
        assert "Hello" in out and "World" in out
        assert "style" not in out and "{}" not in out

    def test_clean_shortcuts_byte_identical(self):
        """Literal shortcuts in the cleaner are pure no-op skips: identical
        bytes vs the plain regex chain on markdown/boilerplate/noise texts."""
        import re as _re
        from ontoray.text.clean import (_BOILERPLATE, _MD_CHARS, _MD_IMAGE,
                                        _MD_LINK, _WS, clean_many, clean_text)

        def plain(t: str) -> str:
            t = t.lower()
            t = _MD_IMAGE.sub(r"\1", t)
            t = _MD_LINK.sub(r"\1", t)
            for pat in _BOILERPLATE:
                t = pat.sub("", t)
            t = _MD_CHARS.sub("", t)
            return _WS.sub(" ", t).strip()

        texts = [
            "", "plain words only",
            "an ![alt text](http://x/y.png) image",
            "a [link text](http://x) here",
            "Copyright © 2023 Texas Instruments Incorporated tail",
            "WWW.TI.COM and more",
            "Submit Document Feedback\nImportant Notice and Disclaimer",
            "johanson technology, inc. reserves the right to make design changes without notice. x",
            "all sales are subject to johanson technology, inc. terms and conditions. y",
            "mark `code` and *bold* and #tag and _under_",
            "a  b\t\tc\n\nd", "[only bracket", "![ partial",
        ]
        assert [clean_text(t) for t in texts] == [plain(t) for t in texts]
        assert clean_many(texts) == [plain(t) for t in texts]

    def test_prefilter_equivalent_to_full_scan(self):
        """The literal prefilter must be a pure shortcut: identical triples
        vs an unfiltered scan over pattern-bearing, noisy and adversarial
        near-miss texts (e.g. ' is a' at string start, hyphen words)."""
        import random
        from ontoray.text.extract import _COMPILED, ENDPOINT_STOP, extract_triples

        def full_scan(doc):
            out = []
            for rx, spec, tag, conf in _COMPILED:
                for m in rx.finditer(doc):
                    for sg, pred, og in spec:
                        s, o = m.group(sg), m.group(og)
                        if not s or not o:
                            continue
                        if s in ENDPOINT_STOP or o in ENDPOINT_STOP:
                            continue
                        out.append((s, pred, o, tag, conf))
            return out

        rng = random.Random(5)
        words = ["capacitor", "is", "a", "an", "such", "as", "type", "of",
                 "including", "manufactured", "by", "contains", "part",
                 "connects", "to", "requires", "works", "with", "instance",
                 "conforms", "operates", "at", "2.4 ghz", "impedance",
                 "supply", "voltage", "x-1", "the", ",", "antenna"]
        docs = ["a capacitor is a component", "r1 is an antenna",
                "parts such as resistors and capacitors",
                "x7, a type of sensor", "boards including chips and leds",
                "m1 is manufactured by acme", "box contains a widget",
                "it operates at 2.4-5.8 ghz", "q has an impedance of 50 ohms",
                "z has a supply voltage of 3.3 v today", ""]
        for _ in range(200):
            docs.append(" ".join(rng.choice(words) for _ in range(rng.randint(0, 30))))
        for d in docs:
            assert extract_triples(d) == full_scan(d), d

    def test_entities(self):
        assert "a & b" in html_to_text("<p>a &amp; b</p>")

    def test_script_dropped(self):
        assert "evil" not in html_to_text("<script>evil()</script><p>ok</p>")


class TestChunker:
    def test_short_text_single_chunk(self):
        assert split_text("hello world", 1000, 100) == ["hello world"]

    def test_splits_on_spaces_with_overlap(self):
        words = " ".join(f"w{i:03d}" for i in range(600))  # 5-char words
        chunks = split_text(words, 100, 20)
        assert all(len(c) <= 100 for c in chunks)
        # Overlap: chunk N's tail reappears at the head of chunk N+1.
        assert chunks[0].split()[-1] in chunks[1].split()[:6]
        # Every word is covered.
        covered = set(w for c in chunks for w in c.split())
        assert covered == set(words.split())

    def test_paragraph_separator_preferred(self):
        text = ("a" * 400 + "\n\n" + "b" * 400)
        chunks = split_text(text, 500, 50)
        assert chunks == ["a" * 400, "b" * 400]

    def test_oversized_unsplittable_run(self):
        text = "x" * 2500
        chunks = split_text(text, 1000, 100)
        assert sum(len(c) for c in chunks) >= 2500 - 200
        assert all(len(c) <= 1000 for c in chunks)

    def test_deterministic(self):
        t = " ".join(f"tok{i}" for i in range(500))
        assert split_text(t, 300, 30) == split_text(t, 300, 30)


class TestValidityFilter:
    """Exact port of _is_valid_concept (src/idea_extractor.py:49-61)."""

    @pytest.mark.parametrize("bad", [
        "", "ab", "12", "123456", "Figure", "TABLE", "january", "Texas",
        "a/b", "www.example", "site.com", "!!!", "12.5",
    ])
    def test_rejects(self, bad):
        assert not is_valid_concept(bad)

    @pytest.mark.parametrize("good", ["capacitor", "RF4", "chip antenna", "a1b"])
    def test_accepts(self, good):
        assert is_valid_concept(good)


class TestNormalizer:
    def test_eval_normalizer_is_lower_strip_only(self):
        assert normalize_eval("  Capacitors ") == "capacitors"  # NO singularization

    def test_concept_normalizer_singularizes(self):
        assert normalize_concept_name("  Capacitors ") == "capacitor"
        assert normalize_concept_name("Devices") == "device"
        assert normalize_concept_name("passive components") == "passive component"
        assert normalize_concept_name("antenna") == "antenna"

    @pytest.mark.parametrize("plural,singular", [
        ("capacitors", "capacitor"), ("batteries", "battery"), ("boxes", "box"),
        ("buses", "bus"), ("devices", "device"), ("antennas", "antenna"),
        ("children", "child"), ("glasses", "glass"),
    ])
    def test_singular_rules(self, plural, singular):
        assert singular_noun(plural) == singular

    @pytest.mark.parametrize("already", ["capacitor", "bus", "glass", "basis"])
    def test_singular_passthrough(self, already):
        assert singular_noun(already) is None


class TestSpecs:
    """Reference technical matchers (src/ontology_extension_manager.py:517-650)."""

    def test_freq_range(self):
        assert extract_freq_range("2.4-5.8 GHz") == (2400.0, 5800.0)
        assert extract_freq_range("900 MHz") == (900.0, 900.0)
        assert extract_freq_range("no units") is None

    def test_freq_overlap(self):
        assert match_frequency("2.4-5.8 GHz", "2.4-5.8 GHz") == 1.0
        assert match_frequency("1-2 GHz", "3-4 GHz") == 0.0
        assert 0 < match_frequency("1-3 GHz", "2-4 GHz") < 1

    def test_impedance(self):
        assert match_impedance("50 ohms", "50") == 1.0
        assert match_impedance("50", "52") == 0.9      # within 10%
        assert match_impedance("50", "75") == 0.0

    def test_voltage(self):
        assert match_voltage("3.3V", "3.3 v") == 1.0
        assert match_voltage("3.3", "3.5") == 0.8      # within 10%

    def test_connector_synonyms(self):
        assert match_connector("SMA", "sub miniature a") == 1.0
        assert match_mounting("SMD", "surface mount") == 1.0


class TestEmbeddings:
    def test_deterministic_and_normalized(self):
        v1, v2 = embed_text("capacitor"), embed_text("capacitor")
        assert np.allclose(v1, v2)
        assert abs(np.linalg.norm(v1) - 1.0) < 1e-5

    def test_similar_strings_closer(self):
        a, b, c = embed_text("capacitor"), embed_text("capacitors"), embed_text("window")
        assert float(a @ b) > float(a @ c)


class TestExtraction:
    def test_mentions_filtered_and_sorted(self):
        ms = extract_mentions("the capacitor and figure 3 of www.x.com table",
                              ("passive component",))
        assert "capacitor" in ms
        assert "figure" not in ms and "table" not in ms
        assert ms == sorted(ms)

    def test_gazetteer_phrase(self):
        ms = extract_mentions("it is a passive component here", ("passive component",))
        assert "passive component" in ms

    def test_hearst_isa(self):
        ts = extract_triples("the capacitor is a component.")
        assert ("capacitor", "subclass_of", "component", "hearst", 0.9) in ts

    def test_hearst_such_as_two_args(self):
        ts = extract_triples("devices such as resistor and inductor are common.")
        preds = {(t[0], t[1], t[2]) for t in ts}
        assert ("resistor", "subclass_of", "devices") in preds
        assert ("inductor", "subclass_of", "devices") in preds

    def test_svo_manufacturer(self):
        ts = extract_triples("the antenna is manufactured by acmecorp.")
        assert any(t[:3] == ("antenna", "manufacturer", "acmecorp") for t in ts)

    def test_property_patterns(self):
        ts = extract_triples("the antenna operates at 2.4-5.8 ghz. "
                             "the antenna has an impedance of 50 ohms.")
        kinds = {(t[0], t[1], t[2]) for t in ts}
        assert ("antenna", "frequency", "2.4-5.8 ghz") in kinds
        assert ("antenna", "impedance", "50") in kinds

    def test_pronoun_subjects_dropped(self):
        assert not any(t[0] == "it" for t in extract_triples("it is a capacitor."))
