"""JSON-LD structured-data extraction: MIME gating, salvage, @graph
flattening, and the fixture's branch contract."""

import pytest

from service1_text_extraction_ray.functions.structured import extract_jsonld
from service1_text_extraction_ray.functions.synth import make_jsonld_page


class TestExtractJsonld:
    def test_bare_object_and_name_fallback_to_headline(self):
        html = (
            b'<script type="application/ld+json">'
            b'{"@type": "Article", "headline": "H"}</script>'
        )
        assert extract_jsonld(html) == [
            {"entity_type": "Article", "name": "H", "word_count": None}
        ]

    def test_name_wins_over_headline(self):
        html = (
            b'<script type="application/ld+json">'
            b'{"@type": "Article", "name": "N", "headline": "H"}</script>'
        )
        assert extract_jsonld(html)[0]["name"] == "N"

    def test_top_level_array_and_graph_flatten(self):
        html = (
            b'<script type="application/ld+json">'
            b'[{"@type": "A", "name": "a"}, {"@type": "B", "name": "b"}]'
            b"</script>"
            b'<script type="application/ld+json">'
            b'{"@graph": [{"@type": "C", "name": "c"}, 7, {"name": "untyped"}]}'
            b"</script>"
        )
        got = extract_jsonld(html)
        assert [(e["entity_type"], e["name"]) for e in got] == [
            ("A", "a"), ("B", "b"), ("C", "c"),
        ]  # non-dict and untyped @graph nodes skipped

    def test_mime_gate_ignores_other_scripts(self):
        html = (
            b'<script>var x = {"@type": "Movie", "name": "NOPE"};</script>'
            b'<script type="text/javascript">{"@type": "Book"}</script>'
            b'<script type="APPLICATION/LD+JSON; charset=utf-8">'
            b'{"@type": "Event", "name": "E"}</script>'
        )
        got = extract_jsonld(html)
        assert got == [{"entity_type": "Event", "name": "E", "word_count": None}]

    def test_trailing_comma_salvaged_missing_comma_yields_no_entity(self):
        ok = b'<script type="application/ld+json">{"@type": "T", "name": "n",}</script>'
        # the sanitizer's quote-escape repair turns the missing-comma block
        # into a VALID object whose @type key is swallowed into the previous
        # value — an untyped node, skipped (the fixture's %13 branch relies
        # on @context coming first for exactly this reason)
        bad = (
            b'<script type="application/ld+json">'
            b'{"@context": "https://schema.org" "@type": "T", "name": "n"}'
            b"</script>"
        )
        assert extract_jsonld(ok) == [
            {"entity_type": "T", "name": "n", "word_count": None}
        ]
        assert extract_jsonld(bad) == []

    def test_wordcount_must_be_int(self):
        html = (
            b'<script type="application/ld+json">'
            b'{"@type": "A", "name": "x", "wordCount": "12"}</script>'
            b'<script type="application/ld+json">'
            b'{"@type": "B", "name": "y", "wordCount": true}</script>'
        )
        assert [e["word_count"] for e in extract_jsonld(html)] == [None, None]

    @pytest.mark.parametrize("doc_id,n_entities", [
        (1, 1),      # article only
        (5, 3),      # article + 2 graph nodes
        (7, 1),      # trailing comma salvaged
        (13, 0),     # beyond salvage
        (65, 2),     # 13*5: article lost, graph survives
        (91, 0),     # 7*13: unparseable wins over salvageable
    ])
    def test_fixture_branch_contract(self, doc_id, n_entities):
        html, url = make_jsonld_page(doc_id, "src1", "en", 100)
        got = extract_jsonld(html)
        assert len(got) == n_entities
        assert url == f"https://src1.example.com/a/{doc_id}"
        if doc_id % 13 != 0:
            assert got[0] == {
                "entity_type": "Article", "name": f"Doc {doc_id}",
                "word_count": 100,
            }


class TestExtractMicrodata:
    def test_scopes_values_and_drops(self):
        from service1_text_extraction_ray.functions.structured import (
            extract_microdata,
        )

        html = (
            b'<div itemscope itemtype="https://schema.org/Product">'
            b'<span itemprop="name">Widget  X</span>'
            b'<img itemprop="image" src="/w.jpg">'
            b'<meta itemprop="sku" content="SKU-1">'
            b'<div itemscope itemtype="https://schema.org/Offer">'
            b'<span itemprop="price">9.99</span></div>'
            b'<time itemprop="released" datetime="2020-01-02">Jan 2</time>'
            b"</div>"
            b'<span itemprop="orphan">no scope</span>'
            b'<meta itemprop="empty" content="">'
            b'<script>var x=\'<span itemprop="name">NOPE</span>\';</script>'
        )
        got = extract_microdata(html)
        assert got == [
            {"entity": 1, "itemtype": "https://schema.org/Product",
             "prop": "name", "value": "Widget X"},
            {"entity": 1, "itemtype": "https://schema.org/Product",
             "prop": "image", "value": "/w.jpg"},
            {"entity": 1, "itemtype": "https://schema.org/Product",
             "prop": "sku", "value": "SKU-1"},
            {"entity": 2, "itemtype": "https://schema.org/Offer",
             "prop": "price", "value": "9.99"},
            {"entity": 1, "itemtype": "https://schema.org/Product",
             "prop": "released", "value": "2020-01-02"},
        ]

    def test_truncation_flushes_open_prop(self):
        from service1_text_extraction_ray.functions.structured import (
            extract_microdata,
        )

        html = (
            b'<div itemscope itemtype="T"><span itemprop="p">dangling text'
        )
        assert extract_microdata(html) == [
            {"entity": 1, "itemtype": "T", "prop": "p", "value": "dangling text"}
        ]
