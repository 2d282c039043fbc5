"""Property-based robustness: the extraction core must never raise, always
emit a schema-conforming result, and be deterministic — for ARBITRARY
payload bytes, not just the fixture mix. (The distributed job relies on
this: a poison document must become a `parse_failure` row, never a dead
task — SURVEY.md §4.1 error-isolation row.)"""

from hypothesis import given, settings, strategies as st

from service1_text_extraction_ray.functions.extract import (
    METHOD_DOM,
    METHOD_FAILED,
    METHOD_PDF,
    ExtractConfig,
    extract_document,
)
from service1_text_extraction_ray.functions.sniff import sniff_payload

CFG = ExtractConfig()

VALID_STATUSES = {"ok", "parse_failure"}


def _check_doc_result(res):
    assert res["status"] in VALID_STATUSES
    assert isinstance(res["doc_text"], str)
    assert res["doc_chars"] == len(res["doc_text"])
    assert isinstance(res["n_pages"], int) and res["n_pages"] >= 0
    assert 0 <= res["n_pages_ok"] <= res["n_pages"]
    assert isinstance(res["pages"], list) and len(res["pages"]) == res["n_pages"]
    for p in res["pages"]:
        assert isinstance(p["text"], str)
        assert p["method"] in {METHOD_DOM, METHOD_PDF, METHOD_FAILED}


@settings(max_examples=200, deadline=None)
@given(payload=st.one_of(st.none(), st.binary(max_size=4096)))
def test_extract_document_total_on_arbitrary_bytes(payload):
    res = extract_document("u://fuzz", payload, CFG)
    _check_doc_result(res)
    # determinism: same input -> identical result
    assert extract_document("u://fuzz", payload, CFG) == res


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(min_size=1, max_size=4096).map(lambda b: b"%PDF-1.4\n" + b))
def test_pdf_parser_total_on_corrupt_pdfs(payload):
    res = extract_document("u://fuzz-pdf", payload, CFG)
    _check_doc_result(res)


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=2048))
def test_html_parser_total_on_arbitrary_markup(text):
    payload = ("<html><body>" + text + "</body></html>").encode("utf-8", "surrogatepass")
    res = extract_document("u://fuzz-html", payload, CFG)
    _check_doc_result(res)


@settings(max_examples=200, deadline=None)
@given(payload=st.one_of(st.none(), st.binary(max_size=256)))
def test_sniff_total_and_deterministic(payload):
    kind = sniff_payload(payload)
    assert kind in {"html", "pdf", "other"}
    assert sniff_payload(payload) == kind
