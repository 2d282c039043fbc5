"""Operator-level tests: dedup (constructed near-duplicates), similarity
search recall, multimodal plumbing, and query determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from service1_text_extraction_ray.pipelines.queries import (
    _minhash_sig,
    _query_vector,
    _shingles,
    _simhash64,
)
from service1_text_extraction_ray.stages.multimodal import (
    FEATURE_DIM,
    DecoderStub,
    MediaFeatureExtractor,
    RealDecoderUnavailable,
)


class TestMinHash:
    def test_identical_texts_identical_signatures(self):
        t = "the quick brown fox jumps over the lazy dog again and again"
        assert np.array_equal(_minhash_sig(_shingles(t)), _minhash_sig(_shingles(t)))

    def test_near_duplicates_share_most_of_signature(self):
        a = " ".join(f"word{i}" for i in range(200))
        b = a + " tail extra"  # tiny edit
        sa, sb = _minhash_sig(_shingles(a)), _minhash_sig(_shingles(b))
        agreement = (sa == sb).mean()
        assert agreement > 0.85  # est. Jaccard of near-dups

    def test_unrelated_texts_low_agreement(self):
        a = " ".join(f"alpha{i}" for i in range(100))
        b = " ".join(f"beta{i}" for i in range(100))
        sa, sb = _minhash_sig(_shingles(a)), _minhash_sig(_shingles(b))
        assert (sa == sb).mean() < 0.2

    def test_lsh_pipeline_finds_planted_duplicates(self, ray_session, tmp_path):
        """Plant near-duplicate docs in a documents.parquet and check the
        full MinHash+LSH query surfaces exactly the planted pairs."""
        import pyarrow.parquet as pq

        from service1_text_extraction_ray.pipelines.queries import q_dedup_minhash_lsh

        base = " ".join(f"token{i % 37} filler{i % 11}" for i in range(300))
        rows = []
        for i in range(30):
            rows.append({"doc_id": i, "text": f"unique doc {i} " + " ".join(f"w{i}x{j}" for j in range(150)), "lang": "en"})
        rows.append({"doc_id": 100, "text": base, "lang": "en"})
        rows.append({"doc_id": 101, "text": base + " tiny tail", "lang": "en"})
        rows.append({"doc_id": 102, "text": base, "lang": "en"})  # exact dup of 100
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))

        pairs = q_dedup_minhash_lsh(str(d))
        got = {tuple(p) for p in pairs[["doc_id_a", "doc_id_b"]].itertuples(index=False)}
        assert (100, 101) in got
        assert (100, 102) in got
        assert (101, 102) in got
        # no false positives among the unique docs
        assert all(a >= 100 and b >= 100 for a, b in got)


class TestSimHash:
    def test_deterministic(self):
        t = "some stable text for hashing purposes"
        assert _simhash64(t) == _simhash64(t)

    def test_near_duplicates_small_hamming_distance(self):
        a = " ".join(f"word{i}" for i in range(100))
        b = a + " extra"
        d = bin(_simhash64(a) ^ _simhash64(b)).count("1")
        assert d <= 6

    def test_unrelated_large_hamming_distance(self):
        a = " ".join(f"alpha{i}" for i in range(100))
        b = " ".join(f"beta{i}" for i in range(100))
        d = bin(_simhash64(a) ^ _simhash64(b)).count("1")
        assert d >= 20


class TestSimilaritySearch:
    def test_ann_recall_vs_brute_force(self, ray_session, tmp_path):
        """LSH-bucketed ANN must recover a decent fraction of the true top-k
        on a corpus with planted near-query vectors."""
        import pyarrow.parquet as pq

        from service1_text_extraction_ray.pipelines.queries import q_ann_lsh, q_knn_cosine

        rs = np.random.RandomState(7)
        q = _query_vector()
        vecs = rs.standard_normal((400, 64)).astype(np.float32)
        # plant 10 vectors very close to the query
        for i in range(10):
            vecs[i] = (q + rs.standard_normal(64) * 0.05).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(400), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 400, pa.int32()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "embeddings.parquet"))

        exact = set(q_knn_cosine(str(d))["vec_id"])
        approx = set(q_ann_lsh(str(d))["vec_id"])
        assert exact == set(range(10))  # brute force finds the planted ones
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5  # hyperplane LSH with 1-bit probing


class TestMultimodal:
    def _batch(self):
        return pa.Table.from_pylist(
            [
                {"media_id": 1, "media_type": "image", "media": b"\x89PNG fake bytes"},
                {"media_id": 2, "media_type": "audio", "media": b"RIFF fake wav"},
                {"media_id": 3, "media_type": "video", "media": None},
            ],
            schema=pa.schema(
                [("media_id", pa.int64()), ("media_type", pa.string()), ("media", pa.binary())]
            ),
        )

    def test_stub_decoder_deterministic(self):
        ex = MediaFeatureExtractor()
        out1, out2 = ex(self._batch()), ex(self._batch())
        assert out1.equals(out2)
        assert out1["sha256"].to_pylist()[0] == out1["sha256"].to_pylist()[0]
        feats = out1["features"].to_pylist()[0]
        assert len(feats) == FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in feats)

    def test_audio_gets_duration_image_does_not(self):
        out = MediaFeatureExtractor()(self._batch())
        rows = out.to_pylist()
        assert rows[0]["duration_ms"] == 0      # image
        assert rows[1]["duration_ms"] > 0        # audio

    def test_real_decoder_unavailable_raises(self):
        ex = MediaFeatureExtractor(decoder=RealDecoderUnavailable())
        with pytest.raises(NotImplementedError):
            ex(self._batch())

    def test_decode_failure_isolates(self):
        class Flaky:
            def decode(self, payload, media_type):
                if not payload:
                    raise ValueError("empty")
                return DecoderStub().decode(payload, media_type)

        out = MediaFeatureExtractor(decoder=Flaky())(self._batch())
        rows = out.to_pylist()
        assert rows[0]["decode_ok"] is True
        assert rows[2]["decode_ok"] is False  # None payload -> isolated failure
