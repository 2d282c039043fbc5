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
