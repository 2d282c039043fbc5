"""A2/J2 parity: ordered password-candidate chain + actor-local cache."""

from service1_text_extraction_ray.functions.passwords import (
    MAX_ATTEMPTS,
    PasswordBook,
    password_candidates,
)


class TestCandidateChain:
    def test_full_order(self):
        got = password_candidates(
            "u://d1",
            provided="prov",
            saved={"u://d1": "sav"},
            cache={"u://d1": "cach"},
            default="dflt",
        )
        assert got == ["prov", "sav", "cach", "dflt", None]

    def test_dedup_keeps_first_occurrence(self):
        got = password_candidates(
            "u://d1",
            provided="same",
            saved={"u://d1": "same"},
            cache={"u://d1": "other"},
            default="same",
        )
        assert got == ["same", "other", None]

    def test_none_tail_always_present(self):
        assert password_candidates("u://d1") == [None]

    def test_missing_sources_skipped(self):
        got = password_candidates("u://d1", saved={"u://other": "x"}, default="d")
        assert got == ["d", None]


class TestPasswordBook:
    def test_attempt_cap(self):
        book = PasswordBook(saved={"k": "a"}, default="b")
        cands = book.candidates_for("k", provided="c")
        assert len(cands) == MAX_ATTEMPTS
        assert cands == ["c", "a", "b"]  # None dropped by the cap, like the
        #                                  reference's 3-attempt enhanced path

    def test_success_cache_feeds_next_lookup(self):
        book = PasswordBook(default="dflt")
        assert book.candidates_for("k") == ["dflt", None]
        book.record_success("k", "winner")
        assert book.candidates_for("k") == ["winner", "dflt", None]

    def test_none_success_not_cached(self):
        book = PasswordBook()
        book.record_success("k", None)
        assert book.cache == {}
