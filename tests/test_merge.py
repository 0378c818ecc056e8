"""Incremental merge (upsert/delete) contract — SolrIndexer sendToIndex
semantics on the from-scratch index (indexer/SolrIndexer.java:151-245)."""

import math

import pytest


@pytest.fixture()
def base_corpus(spark):
    from lucille_spark.corpus import corpus_df

    return corpus_df(spark, 600, partitions=5)


def _build(spark, corpus, out):
    from lucille_spark.index.builder import build_index

    build_index(corpus, out, fields=("content",), block_size=32,
                docs_per_salt=64)
    return out


def test_pure_add_merge_rank_identical_to_rebuild(spark, base_corpus,
                                                  tmp_path):
    from lucille_spark.corpus import corpus_df
    from lucille_spark.index.merge import merge_index
    from lucille_spark.query.searcher import IndexSearcher

    inc = _build(spark, base_corpus, str(tmp_path / "inc"))
    extra = corpus_df(spark, 800, partitions=3).filter("repo like 'org1/%'") \
        .limit(150)
    # make the delta disjoint from base by renaming repos
    from pyspark.sql import functions as F

    extra = extra.withColumn("repo", F.concat(F.lit("new/"), F.col("repo")))
    res = merge_index(extra, inc, fields=("content",), block_size=32,
                      docs_per_salt=64)
    assert res["added"] > 0 and res["tombstoned"] == 0

    # ground truth: one fresh build over the union
    full = _build(spark, base_corpus.unionByName(extra),
                  str(tmp_path / "full"))
    # Contract: identical scores; identical doc sets within each tie group.
    # (Exact-tie ORDER may differ between an incrementally-merged index and
    # a fresh rebuild because ordinal assignment differs — the same way
    # Lucene docIDs depend on segment history.)
    si, sf = IndexSearcher(inc), IndexSearcher(full)
    for q in ["content:test OR content:giraffe",
              "content:return AND content:import",
              "content:if", "content:term30 OR content:term100"]:
        got, want = si.search(q, 10), sf.search(q, 10)
        gs = [round(s, 9) for _, s in got]
        ws = [round(s, 9) for _, s in want]
        assert gs == ws, q
        from collections import defaultdict

        def groups(hits):
            g = defaultdict(set)
            for d, s in hits:
                g[round(s, 9)].add(d)
            return g

        gg, wg = groups(got), groups(want)
        for score in gg:
            if len(gg[score]) == len(wg[score]):
                assert gg[score] == wg[score], (q, score)
            # boundary tie group truncated by k: subset relation suffices


def test_upsert_and_delete(spark, base_corpus, tmp_path):
    from pyspark.sql import functions as F

    from lucille_spark.index.builder import add_doc_identity
    from lucille_spark.index.merge import merge_index
    from lucille_spark.query.searcher import IndexSearcher

    idx = _build(spark, base_corpus, str(tmp_path / "idx"))
    ident = add_doc_identity(base_corpus)
    victim = ident.select("repo", "path", "commit", "lang", "doc_id") \
        .orderBy("doc_id").limit(2).collect()

    # upsert: same (repo,path,commit) => same doc_id, new content with a
    # marker term; delete: second victim gone entirely
    up = spark.createDataFrame(
        [(victim[0]["repo"], victim[0]["path"], victim[0]["commit"],
          victim[0]["lang"], "zzzupdated content only words")],
        "repo string, path string, commit string, lang string, content string")
    dels = spark.createDataFrame([(victim[1]["doc_id"],)], "doc_id string")
    res = merge_index(up, idx, fields=("content",), deletes=dels,
                      block_size=32, docs_per_salt=64)
    assert res["added"] == 1 and res["tombstoned"] == 2

    s = IndexSearcher(idx)
    # new content searchable, attributed to the SAME doc_id
    hits = s.search("content:zzzupdated", 5)
    assert len(hits) == 1 and hits[0][0] == victim[0]["doc_id"]
    # deleted doc never comes back for anything
    for q in ["content:test", "content:if", "content:return OR content:import"]:
        assert victim[1]["doc_id"] not in {d for d, _ in s.search(q, 1000)}
    # boolean match path also excludes tombstones
    assert victim[1]["doc_id"] not in s.match("content:if")


def test_avgdl_drift_keeps_wand_exact(spark, tmp_path):
    """Merge a batch of much LONGER docs (avgdl grows => stored block-max
    bounds would under-estimate without the bound_avgdl scaling) and check
    WAND stays rank-identical to exhaustive scoring."""
    import numpy as np
    import pandas as pd

    from lucille_spark.index.builder import build_index
    from lucille_spark.index.merge import merge_index
    from lucille_spark.query.searcher import IndexSearcher

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(15)]

    def mk(n, lo, hi, tag):
        rows = []
        for i in range(n):
            ln = int(rng.integers(lo, hi))
            toks = [vocab[int(min(x, 14))]
                    for x in rng.exponential(3, ln).astype(int)]
            rows.append((f"r/{tag}", f"f{tag}{i}.py", "c0", "py",
                         " ".join(toks)))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                        "content"]))

    idx = str(tmp_path / "drift")
    build_index(mk(300, 8, 20, "short"), idx, fields=("content",),
                block_size=16, docs_per_salt=48)
    merge_index(mk(200, 200, 400, "long"), idx, fields=("content",),
                block_size=16, docs_per_salt=48)

    s = IndexSearcher(idx)
    for q in ["content:w0 OR content:w1", "content:w2 OR content:w5",
              "content:w0 AND content:w3",
              "content:w1 OR content:w4 OR content:w7"]:
        for k in (3, 10, 25):
            got = s.search(q, k)
            want = s.search_exhaustive(q, k)
            assert got == want, (q, k)
