"""Dispatcher-level tests: acceptance ladder, failure isolation, counters,
and frozen-golden regression for the 64-row unit corpus."""

import hashlib
import json
import os
import random

from service1_text_extraction_ray.functions.extract import (
    ExtractConfig,
    extract_document,
    run_oracle,
)
from service1_text_extraction_ray.functions.synth import (
    gen_pages_table,
    make_article_html,
    make_garbage_html,
    make_paragraphs,
    make_pdf,
    make_short_html,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CFG = ExtractConfig()


def rng():
    return random.Random(11)


def test_html_accept_path():
    paras = make_paragraphs(rng(), 8)
    payload = make_article_html("A title here", paras, rng())
    res = extract_document("u", payload, CFG)
    assert res["status"] == "ok"
    assert res["pages"][0]["method"] == "dom"
    assert res["doc_text"].startswith("--- PAGE 1 ---\nA title here")
    for p in paras:
        assert p in res["doc_text"]


def test_short_html_fails_gate():
    # Under the 250-char production gate -> method failed, empty text
    # (reference no-OCR branch, core_pdf_processor.py:410-416).
    res = extract_document("u", make_short_html(rng()), CFG)
    assert res["status"] == "ok"
    assert res["pages"][0]["method"] == "failed"
    assert res["doc_text"] == ""
    assert res["n_pages_ok"] == 0


def test_garbage_html_fails_gate():
    res = extract_document("u", make_garbage_html(rng(), clause=0), CFG)
    assert res["pages"][0]["method"] == "failed"
    assert res["doc_text"] == ""


def test_pdf_accept_path():
    lines = [f"A reasonably long pdf line number {i} with words." for i in range(30)]
    payload = make_pdf([lines, lines], rng())
    res = extract_document("u", payload, CFG)
    assert res["status"] == "ok"
    assert [p["method"] for p in res["pages"]] == ["pdf_text", "pdf_text"]
    assert "--- PAGE 2 ---" in res["doc_text"]


def test_pdf_short_page_isolates():
    long_lines = [f"A reasonably long pdf line number {i} with words." for i in range(30)]
    payload = make_pdf([long_lines, ["tiny"]], rng())
    res = extract_document("u", payload, CFG)
    assert [p["method"] for p in res["pages"]] == ["pdf_text", "failed"]
    assert res["n_pages"] == 2 and res["n_pages_ok"] == 1
    assert "--- PAGE 2 ---" not in res["doc_text"]


def test_malformed_pdf_is_parse_failure_row():
    res = extract_document("u", b"%PDF-1.4\nnot really", CFG)
    assert res["status"] == "parse_failure"
    assert res["pages"] == [] and res["doc_text"] == ""


def test_unknown_kind_is_parse_failure():
    res = extract_document("u", b"\x00\x01\x02", CFG)
    assert res["status"] == "parse_failure"


def test_truncation_guard():
    paras = make_paragraphs(rng(), 3000, words_per_sentence=(8, 14), sentences=(5, 8))
    payload = make_article_html("Giant", paras, rng())
    assert len(payload) > CFG.max_payload_bytes
    res = extract_document("u", payload, CFG)
    assert res["truncated"] is True
    assert res["status"] == "ok"  # truncated HTML still parses


def test_max_pages_config():
    lines = [f"A reasonably long pdf line number {i} with words." for i in range(30)]
    payload = make_pdf([lines] * 4, rng())
    res = extract_document("u", payload, ExtractConfig(max_pages=2))
    assert res["n_pages"] == 2


def test_page_md_format():
    lines = [f"A reasonably long pdf line number {i} with words." for i in range(30)]
    res = extract_document("u", make_pdf([lines], rng()), CFG)
    md = res["pages"][0]["page_md"]
    assert md.startswith("# Page 1 - PDF_TEXT\n\n")
    assert md.endswith(res["pages"][0]["text"])


def test_frozen_goldens_sf_unit():
    """Regression gate: the 64-row unit corpus must extract to the frozen
    hashes — catches any semantic drift in the shared pure functions."""
    with open(os.path.join(GOLDEN_DIR, "sf_unit_hashes.json")) as f:
        golden = json.load(f)
    rows = gen_pages_table(64, seed=42).to_pylist()
    results = run_oracle(rows, CFG)
    assert len(results) == len(golden) == 64
    for row, res in zip(rows, results):
        g = golden[row["url"]]
        assert hashlib.sha256(res["doc_text"].encode()).hexdigest() == g["doc_text_sha256"], row["url"]
        assert res["status"] == g["status"]
        assert res["content_kind"] == g["content_kind"]
        assert res["n_pages"] == g["n_pages"]
        assert res["n_pages_ok"] == g["n_pages_ok"]


def test_frozen_golden_samples():
    with open(os.path.join(GOLDEN_DIR, "sf_unit_samples.json")) as f:
        samples = json.load(f)
    rows = {r["url"]: r for r in gen_pages_table(64, seed=42).to_pylist()}
    for url, s in samples.items():
        res = extract_document(url, rows[url]["html"], CFG)
        assert res["doc_text"][:2000] == s["doc_text_head"]
        got_md = res["pages"][0]["page_md"][:500] if res["pages"] else ""
        assert got_md == s["page_md_head"]
