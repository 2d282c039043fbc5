"""RSS/Atom feed parsing: dispatch, timestamp normalization, decoy links,
and the fixture branch contract."""

import pytest

from service1_text_extraction_ray.functions.feeds import detect_feed, parse_feed
from service1_text_extraction_ray.functions.synth import (
    FEED_EPOCH_BASE,
    make_feed_page,
)


class TestDetectFeed:
    @pytest.mark.parametrize("payload,kind", [
        (b'<?xml version="1.0"?><rss version="2.0"></rss>', "rss"),
        (b'<feed xmlns="http://www.w3.org/2005/Atom"></feed>', "atom"),
        (b"\xef\xbb\xbf<?xml version=\"1.0\"?>\n<!-- c --><rss></rss>", "rss"),
        (b"<html><body>rss feed</body></html>", None),
        (b"%PDF-1.4", None),
        (b"", None),
        (None, None),
    ])
    def test_root_tag_dispatch(self, payload, kind):
        assert detect_feed(payload) == kind


class TestParseFeed:
    def test_rss_rfc822_pubdate_to_epoch(self):
        xml = (
            b'<rss version="2.0"><channel><title>T</title>'
            b"<item><title>a</title><link>https://x/1</link>"
            b"<pubDate>Sun, 13 Sep 2020 12:26:40 GMT</pubDate></item>"
            b"</channel></rss>"
        )
        feed = parse_feed(xml)
        assert feed["kind"] == "rss"
        assert feed["items"][0]["pub_epoch"] == 1_600_000_000

    def test_atom_self_link_loses_to_alternate(self):
        ns = 'xmlns="http://www.w3.org/2005/Atom"'
        xml = (
            f'<feed {ns}><title>T</title><entry><title>a</title>'
            f'<link rel="self" href="https://x/feed"/>'
            f'<link href="https://x/post"/>'
            f"<updated>2020-09-13T12:26:40Z</updated></entry></feed>"
        ).encode()
        feed = parse_feed(xml)
        assert feed["items"][0]["link"] == "https://x/post"
        assert feed["items"][0]["pub_epoch"] == 1_600_000_000

    def test_missing_fields_emit_none_not_exception(self):
        xml = b'<rss><channel><title>T</title><item></item></channel></rss>'
        feed = parse_feed(xml)
        assert feed["items"] == [
            {"item_title": None, "link": None, "pub_epoch": None}
        ]

    def test_malformed_and_nonfeed_return_none(self):
        assert parse_feed(b"<rss><channel>") is None
        assert parse_feed(b"<html></html>") is None
        assert parse_feed(b'<rss version="2.0"></rss>') is None  # no channel

    def test_bad_dates_are_none(self):
        xml = (
            b"<rss><channel><title>T</title><item><title>a</title>"
            b"<pubDate>not a date</pubDate></item></channel></rss>"
        )
        assert parse_feed(xml)["items"][0]["pub_epoch"] is None


class TestFeedFixture:
    @pytest.mark.parametrize("doc_id", [2, 3, 4, 7, 11, 22, 15])
    def test_branch_contract(self, doc_id):
        xml, url = make_feed_page(doc_id, "srcX", "en")
        feed = parse_feed(xml)
        if doc_id % 11 == 0:
            assert feed is None
            return
        assert feed["kind"] == ("rss" if doc_id % 2 == 0 else "atom")
        assert feed["feed_title"] == f"Feed srcX {doc_id}"
        assert len(feed["items"]) == 1 + doc_id % 3
        for i, it in enumerate(feed["items"]):
            assert it["item_title"] == f"Item {doc_id}-{i}"
            assert it["link"] == f"https://srcX.example.com/post/{doc_id}/{i}"
            assert it["pub_epoch"] == FEED_EPOCH_BASE + doc_id * 3600 + i * 60
        assert not any("NOPE" in (it["item_title"] or "") for it in feed["items"])


class TestFeedDispatch:
    """Feeds as a first-class content kind in the extraction engine."""

    def test_sniff_scalar_classifies_feeds(self):
        from service1_text_extraction_ray.functions.sniff import (
            KIND_FEED,
            KIND_HTML,
            sniff_payload,
        )

        assert sniff_payload(b'<rss version="2.0"></rss>') == KIND_FEED
        assert sniff_payload(
            b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom"/>'
        ) == KIND_FEED
        # XHTML with an XML declaration stays html (root tag decides)
        assert sniff_payload(b'<?xml version="1.0"?><html></html>') == KIND_HTML
        assert sniff_payload(b"<!DOCTYPE html><html></html>") == KIND_HTML
        # BOM + whitespace prefixed feed
        assert sniff_payload(b"\xef\xbb\xbf  <rss></rss>") == KIND_FEED

    def test_sniff_table_matches_scalar(self):
        import pyarrow as pa

        from service1_text_extraction_ray.functions.sniff import (
            sniff_payload,
            sniff_table,
        )

        payloads = [
            b'<rss version="2.0"><channel/></rss>',
            b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom"/>',
            b'<?xml version="1.0"?><html></html>',
            b"<!DOCTYPE html><html></html>",
            b"\xef\xbb\xbf<rss/>",
            b"  \n<feed/>",
            b"%PDF-1.4 x",
            b"plain text",
            b"",
            None,
        ]
        t = pa.table({
            "url": [f"u{i}" for i in range(len(payloads))],
            "html": pa.array(payloads, pa.binary()),
        })
        got = sniff_table(t, (4096, 65536, 1_048_576))["content_kind"].to_pylist()
        assert got == [sniff_payload(p) for p in payloads]

    def test_extract_document_feed_semantics(self):
        from service1_text_extraction_ray.functions.extract import (
            METHOD_FEED,
            ExtractConfig,
            extract_document,
        )
        from service1_text_extraction_ray.functions.synth import make_feed_page

        xml, url = make_feed_page(3, "srcZ", "en")
        r = extract_document(url, xml, ExtractConfig())
        assert (r["status"], r["content_kind"]) == ("ok", "feed")
        assert r["pages"][0]["method"] == METHOD_FEED
        # listings bypass the 250-char article gate
        assert 0 < r["doc_chars"] < 250
        assert "Item 3-0 <https://srcZ.example.com/post/3/0>" in r["doc_text"]

        bad, url2 = make_feed_page(11, "srcZ", "en")  # truncated XML
        r2 = extract_document(url2, bad, ExtractConfig())
        assert (r2["status"], r2["content_kind"]) == ("parse_failure", "feed")

    def test_feed_corpus_extracts_deterministically_e2e(
        self, ray_session, tmp_path
    ):
        import pyarrow as pa
        import ray.data as rd

        from service1_text_extraction_ray.functions.synth import (
            EPOCH_US,
            make_feed_page,
        )
        from service1_text_extraction_ray.pipelines.extract_pipeline import (
            extract_dataset,
        )

        rows = []
        for d in range(40):
            xml, url = make_feed_page(d, f"src{d % 3}", "en")
            rows.append({
                "url": url,
                "warc_ts": EPOCH_US + d,
                "html": xml,
                "text": "",
                "lang": "en",
            })
        t = pa.table({
            "url": pa.array([r["url"] for r in rows]),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows]),
            "lang": pa.array([r["lang"] for r in rows]),
        })

        def snap(ds):
            out = extract_dataset(ds).select_columns(
                ["url", "content_kind", "status", "content_hash"]
            )
            return sorted(map(tuple, out.to_pandas().to_numpy()))

        a = snap(rd.from_arrow(t).repartition(8))
        b = snap(rd.from_arrow(t).repartition(3))
        assert a == b                                     # parallelism-invariant
        kinds = {r[1] for r in a}
        assert kinds == {"feed"}
        failures = [r for r in a if r[2] == "parse_failure"]
        assert len(failures) == len([d for d in range(40) if d % 11 == 0])
