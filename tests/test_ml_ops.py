"""Unit tests for the training-data ops (dedup / similarity / textstats /
multimodal) beyond the DuckDB gate coverage."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "en", "the quick brown fox jumps over the lazy dog"),
        ("d2", "en", "the quick brown fox jumps over the lazy dog"),  # exact dup
        ("d3", "en", "the quick brown fox jumps over a lazy dog"),    # near dup
        ("d4", "en", "completely different words entirely here now"),
        ("d5", "de", "der hund ist nicht da und die katze schläft"),
    ]
    return spark.createDataFrame(rows, "id string, lang string, text string")


def test_exact_dedup(spark, docs):
    from lucille_spark.ml.dedup import dedupe_exact, exact_duplicates

    groups = exact_duplicates(docs, "id", "text").collect()
    dup = [g for g in groups if g["n_docs"] > 1]
    assert len(dup) == 1 and dup[0]["keeper_id"] == "d1"
    kept = dedupe_exact(docs, "id", "text")
    assert kept.count() == 4
    assert "d2" not in {r["id"] for r in kept.collect()}


def test_minhash_lsh_finds_near_dup(spark, docs):
    from lucille_spark.ml.dedup import (
        lsh_candidate_pairs, minhash_signatures,
    )

    sigs = minhash_signatures(docs, "id", "text", n_hashes=8)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in lsh_candidate_pairs(sigs, 8, band_size=2).collect()}
    assert ("d1", "d2") in pairs          # identical docs always collide
    assert ("d1", "d3") in pairs or ("d2", "d3") in pairs  # near dup
    assert ("d1", "d4") not in pairs      # unrelated docs don't


def test_simhash_near_dup_close(spark, docs):
    from lucille_spark.ml.dedup import simhash

    h = {r["doc_id"]: r["simhash"] for r in
         simhash(docs, "id", "text", bits=16).collect()}
    assert h["d1"] == h["d2"]
    dist_near = bin(h["d1"] ^ h["d3"]).count("1")
    dist_far = bin(h["d1"] ^ h["d4"]).count("1")
    assert dist_near < dist_far


def test_ngram_jaccard(spark, docs):
    from lucille_spark.ml.dedup import ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "id", "text", "lang", n=3,
                                 threshold=0.0).collect()}
    assert pairs[("d1", "d2")] == 1.0
    assert 0.2 < pairs[("d1", "d3")] < 1.0
    assert pairs[("d1", "d4")] == 0.0
    assert ("d1", "d5") not in pairs  # blocked by lang


def test_cosine_topk_and_lsh_recall(spark):
    from lucille_spark.ml.similarity import cosine_topk, cosine_topk_lsh

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(float)
    vecs[7] = vecs[3] * 0.9 + 0.01  # near-neighbor pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[3]]
    exact = cosine_topk(df.filter("vec_id != 3"), q, "vec_id", "embedding", 5)
    top = exact.collect()
    assert top[0]["vec_id"] == 7 and top[0]["cosine"] > 0.99
    approx = cosine_topk_lsh(df.filter("vec_id != 3"), q, "vec_id",
                             "embedding", 5, n_planes=6)
    assert approx.collect()[0]["vec_id"] == 7  # LSH keeps the near-dup


def test_textstats(spark, docs):
    from lucille_spark.ml.textstats import (
        fingerprints, language_scores, quality_scores, token_counts,
    )

    tc = {r["doc_id"]: r for r in token_counts(docs, "id", "text").collect()}
    assert tc["d1"]["n_tokens"] == 9
    q = {r["doc_id"]: r for r in quality_scores(docs, "id", "text").collect()}
    assert q["d1"]["stopword_ratio"] > 0.2  # 'the' x2, 'over' not a stopword
    fp = {r["doc_id"]: r["fingerprint"]
          for r in fingerprints(docs, "id", "text").collect()}
    assert fp["d1"] == fp["d2"] and fp["d1"] != fp["d3"]  # order-sensitive
    langs = {r["doc_id"]: r["predicted"]
             for r in language_scores(docs, "id", "text").collect()}
    assert langs["d1"] == "en" and langs["d5"] == "de"


def test_multimodal_plumbing(spark):
    from lucille_spark.ml.multimodal import (
        decode_and_featurize, frame_sample, synthetic_media_df,
    )

    media = synthetic_media_df(spark, 20, "video", partitions=4)
    assert media.count() == 20
    feats = decode_and_featurize(media, codec="fake").collect()
    assert len(feats) == 20
    f0 = [f for f in feats if f["doc_id"] == 0][0]
    assert len(f0["feature"]) == 16 and f0["n_frames"] == 4
    assert sum(f0["histogram"]) == 32 * 32 * 4
    # determinism across runs
    feats2 = decode_and_featurize(
        synthetic_media_df(spark, 20, "video", partitions=2),
        codec="fake").collect()
    assert {f["doc_id"]: f["feature"] for f in feats} == \
        {f["doc_id"]: f["feature"] for f in feats2}

    frames = frame_sample(media, every_k=2).collect()
    assert len(frames) == 20 * 2  # 4 frames, every 2nd
    assert len(frames[0]["frame"]) == 32 * 32


def test_multimodal_real_codec_is_stubbed(spark):
    from lucille_spark.ml.multimodal import (
        decode_and_featurize, synthetic_media_df,
    )
    import pyspark.errors

    media = synthetic_media_df(spark, 2, "image", partitions=1)
    with pytest.raises(Exception, match="NotImplementedError|real decoders"):
        decode_and_featurize(media, codec="real").collect()
