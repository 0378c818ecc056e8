"""Round-5 fixes: unconditional fuzzy bag-distance bound, corpus_stats
mid-rewrite empty-read retry, sampling threshold rounding, percolator
multi-term queries (VERDICT r4 next-round items + ADVICE r4)."""

import os
import shutil

import pytest


# --------------------------------- fuzzy: non-ASCII query bypasses prefilter
def test_fuzzy_nonascii_query_not_pruned(index_dir):
    """ADVICE r4: byte-level bag distance over-counts multi-byte QUERY
    chars — 'réturn'~1 vs dictionary term 'return' has char edit distance
    1 but byte bag distance 2, so the prefilter would wrongly prune it.
    Non-ASCII queries must skip the prefilter and still find the term."""
    from lucille_spark.index.reader import IndexReader

    rd = IndexReader(index_dir)
    # sanity: ASCII path still works and prefilters
    got = rd.terms_fuzzy("content", "return", max_edits=1, limit=50)
    assert "return" in got
    assert rd._fuzzy_stats["bag_survivors"] <= rd._fuzzy_stats["banded"]

    got = rd.terms_fuzzy("content", "réturn", max_edits=1, limit=50)
    assert "return" in got, "non-ASCII query wrongly pruned an edit-1 term"
    # prefilter bypassed: every banded candidate reaches the DP
    assert rd._fuzzy_stats["bag_survivors"] == rd._fuzzy_stats["banded"]


# ------------------------- corpus_stats mid-rewrite reads as empty -> retry
def test_reader_rejects_empty_corpus_stats(index_dir, tmp_path):
    """ADVICE r4 (medium): between write_small_parquet's rmtree and the
    atomic rename, corpus_stats exists containing only a dot-prefixed temp
    file — the dataset reads as an EMPTY table. The reader must treat that
    as a retryable mid-rewrite state (and ultimately raise), never
    silently construct with stats == {}."""
    import pyarrow.dataset as ds

    from lucille_spark.index.reader import IndexReader

    idx = str(tmp_path / "idx")
    shutil.copytree(index_dir, idx)
    cs = os.path.join(idx, "corpus_stats")
    tmp_file = None
    for f in os.listdir(cs):
        if not f.startswith((".", "_")):
            tmp_file = os.path.join(cs, "." + f + ".tmp")
            os.rename(os.path.join(cs, f), tmp_file)
    assert tmp_file is not None
    # the dataset API itself happily yields an empty, field-less table
    assert ds.dataset(cs, ignore_prefixes=[".", "_"]).to_table().num_rows == 0

    with pytest.raises(FileNotFoundError):
        IndexReader(idx)

    # once the writer's rename completes, construction succeeds again
    os.rename(tmp_file, os.path.join(cs, os.path.basename(tmp_file)[1:-4]))
    rd = IndexReader(idx)
    assert rd.stats and "content" in rd.stats


# ----------------------------------------- sampling threshold is round()ed
def test_sampling_threshold_rounding(spark):
    """ADVICE r4: int(rate * 10000) truncates float error (0.57 * 10000
    == 5699.999... on this platform), under-sampling by a bucket;
    round() gives the exact threshold an oracle computes."""
    from lucille_spark.ml.sampling import (_BUCKETS, _bucket,
                                           deterministic_sample)

    assert int(0.57 * _BUCKETS) == 5699          # the trap being fixed
    assert round(0.57 * _BUCKETS) == 5700
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = deterministic_sample(df, "doc_id", 0.57).count()
    want = df.filter(_bucket("doc_id") < 5700).count()
    assert got == want
    # every 4-decimal rate now yields the exact threshold
    assert all(round((i / 10000) * _BUCKETS) == i for i in range(10001))
    # nested-sample property survives: rate r1 < r2 -> subset
    ids_29 = {r.doc_id for r in
              deterministic_sample(df, "doc_id", 0.29).collect()}
    ids_50 = {r.doc_id for r in
              deterministic_sample(df, "doc_id", 0.50).collect()}
    assert ids_29 <= ids_50


# --------------------------------------- percolator multi-term query nodes
def test_matchquery_multiterm_nodes(spark):
    """ADVICE r4: the parser accepts Prefix/Wildcard/TermRange/Fuzzy but
    MatchQuery raised a bare TypeError at apply time. Doc-level semantics
    ('some token of this doc matches') is one F.exists over the token
    array — implement, don't reject."""
    from lucille_spark.pipeline.stages import MatchQuery

    df = spark.createDataFrame(
        [("1", "test alpha"), ("2", "text beta"), ("3", "toast gamma"),
         ("4", "zulu omega"), ("5", None), ("6", "xtest protest")],
        "id string, content string")
    st = MatchQuery(queries={
        "wild": "content:te?t",            # test, text
        "pre": "content:t*",               # test, text, toast
        "rng": "content:[alpha TO gamma]", # alpha, beta, gamma
        "rngx": "content:{alpha TO gamma}",  # beta only
        "fz": "content:tost~1",            # toast (ins), test (sub)
        "boolcombo": "content:te?t AND content:beta",
    })
    out = {r.id: set(r.matched_queries) for r in st.apply(df).collect()}
    assert out["1"] == {"wild", "pre", "rng", "fz"}
    assert out["2"] == {"wild", "pre", "rng", "rngx", "boolcombo"}
    assert out["3"] == {"pre", "rng", "fz"}
    assert out["4"] == set()
    assert out["5"] == set()
    # rlike find-semantics trap: the wildcard/prefix must match the WHOLE
    # token — 'xtest'/'protest' contain 'test' but match nothing
    assert out["6"] == set()


def test_matchquery_multiterm_agrees_with_oracle(spark):
    """The percolator's doc-level multi-term semantics must equal the
    index plane's expand-then-OR semantics (OracleIndex.match_query)."""
    from lucille_spark.pipeline.stages import MatchQuery
    from lucille_spark.query.oracle import OracleIndex

    rows = [("1", "return value from function"),
            ("2", "returns a tuple"), ("3", "rcturn typo here"),
            ("4", "zebra xylophone"), ("5", "ret retro return")]
    queries = ["content:ret*", "content:return~1", "content:r?turn",
               "content:[ret TO rf]"]
    oi = OracleIndex([{"id": r[0], "content": r[1]} for r in rows],
                     fields=("content",))
    df = spark.createDataFrame(rows, "id string, content string")
    st = MatchQuery(queries={q: q for q in queries})
    hits = {q: set() for q in queries}
    for r in st.apply(df).collect():
        for q in r.matched_queries:
            hits[q].add(r.id)
    for q in queries:
        assert hits[q] == set(oi.match_query(q)), q


# ------------------------------------- facet: doc-values route, scale-safe
def test_facet_docvalues_high_cardinality(index_dir, tiny_corpus_pdf):
    """VERDICT r4 'What's wrong' #1: IndexSearcher.facet must not iterate
    the facet field's whole lexicon for stored fields. Facet on the
    high-cardinality `path`/`repo` columns routes through the doc-values
    sidecar (doc_stats projected range read + unique-count over matches) —
    test-asserted: terms_in_range is never called."""
    from lucille_spark.analysis import tokenize_py
    from lucille_spark.query.searcher import IndexSearcher

    s = IndexSearcher(index_dir, "content")

    def _boom(*a, **k):
        raise AssertionError("facet fell back to the full-lexicon loop")

    s.reader.terms_in_range = _boom

    # brute-force expectation from the corpus itself
    pdf = tiny_corpus_pdf
    mask = pdf["content"].map(lambda c: "return" in tokenize_py(c))
    for field in ("repo", "path"):
        counts = pdf.loc[mask, field].value_counts()
        want = sorted(((v, int(c)) for v, c in counts.items()),
                      key=lambda kv: (-kv[1], kv[0]))[:10]
        got = s.facet("content:return", field, size=10)
        assert got == want, field
    # high-cardinality sanity: every path is unique, so all counts are 1
    assert all(c == 1 for _, c in s.facet("content:return", "path", 10))


def test_facet_docvalues_agrees_with_enum_route(index_dir):
    """`lang` is BOTH stored and indexed: the doc-values route must return
    exactly what the postings-enum route returned (r4 behavior)."""
    import numpy as np

    from lucille_spark.query.searcher import IndexSearcher

    s = IndexSearcher(index_dir, "content")
    q = "content:return OR content:import"
    dv = s.facet(q, "lang", size=10)

    # force the enum route by hiding the stored column
    orig = s.reader.doc_values
    s.reader.doc_values = lambda field, ords: None
    enum = s.facet(q, "lang", size=10)
    s.reader.doc_values = orig
    assert dv == enum and sum(n for _, n in dv) > 0


# ---------------------------------------------- multi-fragment highlighting
def test_snippets_multi_df(spark):
    """VERDICT r4 next-round #4: up to N fragments per doc covering all
    occurrences of all matched terms (Solr hl.snippets analogue), sorted
    by (position, term list order), non-overlapping left-to-right scan."""
    from lucille_spark.query.executor_df import (snippets_df,
                                                 snippets_multi_df)

    rows = [(1, "merge then merge again and a vector too"),
            (2, "vector vector"),
            (3, "nothing relevant"),
            (4, "mergemerge back to back")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_id, r.frag): (r.matched_term, r.offset, r.snippet)
           for r in snippets_multi_df(df, "doc_id", "text",
                                      ["merge", "vector"], window=5,
                                      n_frags=3).collect()}
    assert out[(1, 1)] == ("merge", 0, "merge then merg")
    assert out[(1, 2)][0:2] == ("merge", 11)
    assert out[(1, 3)][0:2] == ("vector", 29)
    # all occurrences, capped at n_frags
    assert out[(2, 1)][0:2] == ("vector", 0)
    assert out[(2, 2)][0:2] == ("vector", 7)
    # back-to-back occurrences both found (split-scan, non-overlapping)
    assert out[(4, 1)][0:2] == ("merge", 0)
    assert out[(4, 2)][0:2] == ("merge", 5)
    assert (3, 1) not in out
    # frag 1 must agree with the single-fragment fast path
    single = {r.doc_id: (r.matched_term, r.offset)
              for r in snippets_df(df, "doc_id", "text",
                                   ["merge", "vector"], window=5).collect()}
    for doc_id, frag in out:
        if frag == 1:
            assert single[doc_id] == out[(doc_id, 1)][0:2]


# ------------------------------------ Latin-script language-ID breadth (r5)
NEW_LATIN_FIXTURES = [
    ("Det er ikke til at se om det er godt og det er som af dem", "da"),
    ("Det er ikke av dem som og er til det", "no"),
    ("Se on mutta ei ja joka on se", "fi"),
    ("To je ale jako se na to jsem", "cs"),
    ("Az egy van nem hogy meg mint az", "hu"),
    ("Nu este pentru care de la cu el", "ro"),
    ("Bu bir ne ile daha ve olarak bu", "tr"),
    ("Je li to kao da su i u se", "hr"),
    ("El que per amb la de i el que", "ca"),
    ("Ta oli see et ja on ei see", "et"),
]


def test_latin_langid_breadth(spark):
    """VERDICT r4 next-round #5: the ~10 next Latin-script stopword
    profiles (da/no/fi/cs/hu/ro/tr/hr/ca/et). Each fixture sentence must
    classify to its language in BOTH language_scores and the
    DetectLanguage stage."""
    from lucille_spark.ml.textstats import language_scores
    from lucille_spark.pipeline.stages import DetectLanguage

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(NEW_LATIN_FIXTURES)],
        "doc_id long, text string")
    got = {r.doc_id: r.predicted
           for r in language_scores(df, "doc_id", "text").collect()}
    for i, (_, want) in enumerate(NEW_LATIN_FIXTURES):
        assert got[i] == want, (i, got[i], want)

    out = DetectLanguage(source="text", min_length=5).apply(df)
    got_stage = {r.doc_id: r.language for r in out.collect()}
    for i, (_, want) in enumerate(NEW_LATIN_FIXTURES):
        assert got_stage[i] == want, (i, got_stage[i], want)


def test_latin_langid_old_profiles_unaffected(spark):
    """English/German/French prose must still classify as before with the
    widened profile table (no new-profile word shadows the old set)."""
    from lucille_spark.ml.textstats import language_scores

    rows = [(0, "the cat sat on a mat and it is one of the best"),
            (1, "der hund und die katze das ist nicht gut"),
            (2, "le chien et le chat est dans la maison de que")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.predicted
           for r in language_scores(df, "doc_id", "text").collect()}
    assert got == {0: "en", 1: "de", 2: "fr"}


# ---------------------------------------- ApplyHTML sibling combinators
def test_html_sibling_combinators():
    """VERDICT r4 next-round #8: jsoup's `+` (adjacent sibling) and `~`
    (general sibling). Goldens mirror jsoup semantics: element siblings
    only (text nodes don't break adjacency), composition with child/
    descendant steps, implicit-close sibling detection."""
    from lucille_spark.pipeline.htmlsel import parse_selector, select_html

    html = ('<div><h1>Title</h1><p>first</p><p>second</p><span>x</span>'
            '<ul><li>a</li><li>b<em>bb</em></li><li>c</li></ul>'
            '<div class="a"></div><p>after</p></div>')
    assert select_html(html, "h1 + p") == ["first"]
    assert select_html(html, "h1 ~ p") == ["first", "second", "after"]
    assert select_html(html, "p + p") == ["second"]
    assert select_html(html, "li + li") == ["bbb", "c"]
    assert select_html(html, "li + li em") == ["bb"]     # sibling then descend
    assert select_html(html, "div.a + p") == ["after"]
    assert select_html(html, "h1 + span") is None        # p intervenes
    assert select_html(html, "ul ~ p") == ["after"]
    # root-level siblings and implicit-close (<li>a<li>b) siblings
    assert select_html("<i>x</i><b>y</b>", "i + b") == ["y"]
    assert select_html("<li>a<li>b<li>c", "li + li") == ["b", "c"]
    # text between siblings doesn't break adjacency (CSS element siblings)
    assert select_html("<h1>t</h1>mid text<p>p1</p>", "h1 + p") == ["p1"]
    # `~` inside attribute brackets is NOT a combinator
    chain = parse_selector("a[rel~=nofollow] + p")
    assert chain[0][0][3] == [("rel", "~=", "nofollow")]
    assert chain[1][1] == "adjacent"
    # errors: doubled/dangling combinators
    import pytest as _pt
    for bad in ("a + + b", "a ~", "+ a", "a > + b"):
        with _pt.raises(ValueError):
            parse_selector(bad)


def test_html_sibling_with_child_chain():
    """Mixed chains with backtracking: `ul > li + li` must bind both li
    steps under the SAME ul parent; `A ~ B > C` descends from a
    general-sibling match."""
    from lucille_spark.pipeline.htmlsel import select_html

    html = ('<ul><li>u1a</li></ul>'
            '<ul><li>u2a</li><li>u2b</li></ul>'
            '<h2>head</h2><div><p>inside</p></div>')
    assert select_html(html, "ul > li + li") == ["u2b"]
    assert select_html(html, "h2 ~ div > p") == ["inside"]
    # adjacency is per-container: u1a and u2a are NOT siblings
    assert select_html(html, "li + li") == ["u2b"]


def test_html_structural_pseudo_classes():
    """r5 extra: the streaming-decidable pseudo-classes (:first-child,
    :nth-child An+B/odd/even/k, :first-of-type, :nth-of-type) over the
    same sibling history; non-structural pseudos and (r6) finalized
    pseudos on a NON-subject step stay rejected."""
    from lucille_spark.pipeline.htmlsel import parse_selector, select_html

    html = ('<ul><li>a</li><li>b</li><li>c</li><li>d</li><li>e</li></ul>'
            '<div><h2>t</h2><p>p1</p><p>p2</p><span>s</span><p>p3</p></div>')
    assert select_html(html, "li:first-child") == ["a"]
    assert select_html(html, "li:nth-child(2)") == ["b"]
    assert select_html(html, "li:nth-child(odd)") == ["a", "c", "e"]
    assert select_html(html, "li:nth-child(even)") == ["b", "d"]
    assert select_html(html, "li:nth-child(2n+1)") == ["a", "c", "e"]
    assert select_html(html, "li:nth-child(-n+2)") == ["a", "b"]
    # -of-type counts same-tag siblings only: p3 is child 5 but p #3
    assert select_html(html, "p:first-of-type") == ["p1"]
    assert select_html(html, "p:nth-of-type(3)") == ["p3"]
    assert select_html(html, "p:nth-child(5)") == ["p3"]
    # composition with child/sibling combinators
    assert select_html(html, "div > p:nth-of-type(2)") == ["p2"]
    assert select_html(html, "h2 ~ p:nth-of-type(2)") == ["p2"]
    assert select_html(html, "ul li:nth-child(2)") == ["b"]
    import pytest as _pt
    for bad in ("a:hover", "p:nth-child(foo)",
                "li:last-child em", "div:only-child > p"):
        with _pt.raises(ValueError):
            parse_selector(bad)


# --------------------------------------- pack_sequences auto-shard path
def test_pack_sequences_auto_shards(spark):
    """VERDICT r4 scale residue: pack_sequences without part_col was a
    global one-partition window. auto_shards=N derives a deterministic
    hash-of-id shard, so packing stays per-shard (one shuffle, no global
    sort) with no natural key. The shard must be stable under
    repartitioning and exclusive with part_col."""
    import pytest as _pt

    from lucille_spark.ml.textstats import pack_sequences

    rows = [(f"d{i:03d}", "tok " * (5 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = pack_sequences(df, "doc_id", "text", budget_tokens=20,
                         auto_shards=4)
    got = {r.doc_id: (r.part, r.pack_id) for r in out.collect()}
    assert len(got) == 60
    assert {p for p, _ in got.values()} <= {0, 1, 2, 3}
    # per-shard cumsum honors id order: recompute expectation in python
    from lucille_spark.analysis import tokenize_py
    import collections
    by_shard = collections.defaultdict(list)
    for doc_id, text in rows:
        by_shard[got[doc_id][0]].append((doc_id, len(tokenize_py(text))))
    for shard, docs in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs):
            assert got[doc_id] == (shard, cum // 20), doc_id
            cum += n
    # stability under repartitioning
    got2 = {r.doc_id: (r.part, r.pack_id)
            for r in pack_sequences(df.repartition(7), "doc_id", "text",
                                    budget_tokens=20,
                                    auto_shards=4).collect()}
    assert got == got2
    with _pt.raises(ValueError):
        pack_sequences(df, "doc_id", "text", 20, part_col="x",
                       auto_shards=4)


# ------------------------------------------- benchmark decontamination
def test_decontaminate_and_clean(spark):
    """r5: the GPT-3/PaLM n-gram collision recipe. Docs sharing an
    n-gram with the benchmark flag (and only those); clean() is the
    broadcast left-anti twin; the corpus side must not shuffle documents
    (broadcast hash join in the plan)."""
    from lucille_spark.ml.decontam import clean, decontaminate

    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma delta epsilon"),
         ("d2", "beta gamma delta zeta eta"),      # shares 3-gram w/ d1? no
         ("d3", "totally unrelated words here now"),
         ("d4", "alpha beta gamma delta other")],  # shares 3-gram w/ bench
        "doc_id string, text string")
    bench = spark.createDataFrame(
        [("q1", "x alpha beta gamma y")], "qid string, q string")
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(docs, "doc_id", "text",
                                  bench, "q", n=3).collect()}
    # bench 3-grams: {x alpha beta, alpha beta gamma, beta gamma y}
    assert out["d1"] == (1, True)      # alpha beta gamma
    assert out["d2"] == (0, False)     # beta gamma delta not in bench
    assert out["d3"] == (0, False)
    assert out["d4"] == (1, True)
    kept = {r.doc_id for r in clean(docs, "doc_id", "text",
                                    bench, "q", n=3).collect()}
    assert kept == {"d2", "d3"}
    plan = decontaminate(docs, "doc_id", "text", bench, "q", n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------- Solr result grouping
def test_search_grouped(index_dir):
    """r5: IndexSearcher.search_grouped — groups ranked by best-doc
    score, docs ranked within group, keys via doc-values."""
    import pytest as _pt

    from lucille_spark.query.searcher import IndexSearcher

    s = IndexSearcher(index_dir, "content")
    q = "content:return OR content:import"
    grouped = s.search_grouped(q, "lang", k_groups=3, docs_per_group=2)
    assert 0 < len(grouped) <= 3
    # best doc of the best group == overall top hit
    top_doc, top_score = s.search(q, k=1)[0]
    assert grouped[0][1][0] == (top_doc, top_score)
    # groups ranked by best score desc; docs desc within each group
    bests = [docs[0][1] for _, docs in grouped]
    assert bests == sorted(bests, reverse=True)
    for _, docs in grouped:
        assert len(docs) <= 2
        assert [sc for _, sc in docs] == sorted(
            (sc for _, sc in docs), reverse=True)
    # each group's docs actually carry that group's field value
    pdf_vals = {g for g, _ in grouped}
    assert pdf_vals <= {"python", "java", "go", "rust", "javascript"}
    with _pt.raises(ValueError):
        s.search_grouped(q, "content", 3, 2)   # not a stored field


# ----------------------------------------------------- spellcheck suggest
def test_suggest(index_dir):
    """r5: Solr SpellCheckComponent analogue over the bounded fuzzy
    expansion — correct words return themselves; typos return
    closest-first dictionary terms."""
    from lucille_spark.query.searcher import IndexSearcher

    s = IndexSearcher(index_dir, "content")
    assert s.suggest("return") == ["return"]
    sug = s.suggest("retur", k=5)
    assert sug and sug[0] == "return"
    assert s.suggest("zzzzqqqq") == []


# ------------------------------- script-layer breadth: new blocks + markers
def test_script_langid_breadth(spark):
    """r5: six new script blocks (hi/bn/ta/th/hy/ka) and
    marker-disambiguated uk-over-Cyrillic and fa/ur-over-Arabic — same
    argmax shape as the kana rule; confidence comes from real in-script
    chars so marker bonuses can't push it past 1.0."""
    from lucille_spark.pipeline.stages import DetectLanguage

    fixtures = [
        (0, "Це її рідна мова і текст для перевірки", "uk"),
        (1, "Это русский документ для тестирования", "ru"),
        (2, "این یک متن فارسی است با گچ و پنیر", "fa"),
        (3, "هذا مستند باللغة العربية للاختبار", "ar"),
        (4, "یہ اردو زبان کا ایک متن ہے", "ur"),
        (5, "यह हिंदी भाषा का एक वाक्य है", "hi"),
        (6, "এটি একটি বাংলা বাক্য", "bn"),
        (7, "இது ஒரு தமிழ் வாக்கியம்", "ta"),
        (8, "นี่คือประโยคภาษาไทย", "th"),
        (9, "Սա հայերեն նախադասություն է", "hy"),
        (10, "ეს ქართული წინადადებაა", "ka"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in fixtures],
                               "doc_id long, text string")
    out = DetectLanguage(source="text", min_length=5).apply(df)
    got = {r.doc_id: (r.language, r.language_confidence)
           for r in out.collect()}
    for i, _, want in fixtures:
        lang, conf = got[i]
        assert lang == want, (i, lang, want)
        assert conf is not None and 0.0 < conf <= 1.0, (i, conf)


# ----------------------- snippets occurrence-scan property (vs Python ref)
def test_snippets_multi_property(spark):
    """Property: the JVM split-scan prefix sum enumerates exactly the
    left-to-right non-overlapping occurrences str.find would — for
    randomized texts over a tiny alphabet that forces overlaps,
    repeats, and adjacency."""
    import random

    rng = random.Random(20260817)
    terms = ["ab", "aba", "b"]
    rows = []
    for i in range(80):
        rows.append((i, "".join(rng.choice("ab ") for _ in range(
            rng.randint(0, 40)))))

    def py_occurrences(text, term):
        out, start = [], 0
        low = text.lower()
        while True:
            p = low.find(term, start)
            if p < 0:
                return out
            out.append(p)
            start = p + len(term)

    want = {}
    for i, text in rows:
        occ = sorted(
            (p, ord_, t)
            for ord_, t in enumerate(terms)
            for p in py_occurrences(text, t))
        for frag, (p, _, t) in enumerate(occ[:4], 1):
            want[(i, frag)] = (t, p)

    from lucille_spark.query.executor_df import snippets_multi_df

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.frag): (r.matched_term, r.offset)
           for r in snippets_multi_df(df, "doc_id", "text", terms,
                                      window=5, n_frags=4).collect()}
    assert got == want
