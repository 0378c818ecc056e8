"""Round-2 stage coverage: ApplyJSONata, FetchUri, AddRandomDate,
AddRandomNestedField, completed ChunkText (overlap/merge/limits), and the
hardened phrase predicates (quote/metachar-safe)."""

import base64
import json
import threading

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ ApplyJSONata

def test_jsonata_source_mode(spark):
    """fieldAccessValue.conf: expression field.value over a JSON column."""
    from lucille_spark.pipeline.stages import ApplyJSONata

    df = spark.createDataFrame(
        [("d1", '{"field": {"value": 8.2}}'),
         ("d2", '{"other": 1}'),
         ("d3", None)],
        "id string, source string")
    out = ApplyJSONata(expression="field.value", source="source",
                       destination="dest").apply(df)
    rows = {r["id"]: r["dest"] for r in out.collect()}
    assert json.loads(rows["d1"]) == 8.2
    assert rows["d2"] == rows["d3"] is None


def test_jsonata_object_constructor_and_keys(spark):
    """fullValid.conf: {"id": id, "keys": $keys()} over the whole doc."""
    from lucille_spark.pipeline.stages import ApplyJSONata

    df = spark.createDataFrame([("abc123", "bar")], "id string, foo string")
    st = ApplyJSONata(
        expression='{"doc_id": id, "keys": $string($keys())}',
        source=None, extra_columns=("doc_id", "keys"))
    out = st.apply(df)
    r = out.collect()[0]
    assert r["doc_id"] == "abc123"
    assert json.loads(r["keys"]) == ["id", "foo"]
    assert r["id"] == "abc123"   # reserved field untouched


def test_jsonata_conditional(spark):
    """conditionallyAccessFieldValue.conf: $exists ? $number : null."""
    from lucille_spark.pipeline.stages import ApplyJSONata

    df = spark.createDataFrame(
        [("a", '{"field": {"value": "3"}}'), ("b", '{"x": 1}')],
        "id string, source string")
    out = ApplyJSONata(
        expression="$exists(field.value) ? $number(field.value) : null",
        source="source", destination="dest").apply(df)
    rows = {r["id"]: r["dest"] for r in out.collect()}
    assert json.loads(rows["a"]) == 3
    assert json.loads(rows["b"]) is None


def test_jsonata_invalid_expression_raises():
    from lucille_spark.pipeline.stages import ApplyJSONata

    with pytest.raises(Exception):
        ApplyJSONata(expression="||", source="s")


def test_jsonata_bad_evaluation_skips_doc(spark):
    """badEvaluation.conf: $invalidFunction -> warn-and-skip (unchanged)."""
    from lucille_spark.pipeline.stages import ApplyJSONata

    df = spark.createDataFrame([("a", '{"field": 1}')],
                               "id string, source string")
    out = ApplyJSONata(expression="$invalidFunction(field)",
                       source="source").apply(df)
    assert out.collect()[0]["source"] == '{"field": 1}'


# ---------------------------------------------------------------- FetchUri

@pytest.fixture(scope="module")
def http_server():
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        calls = {}

        def do_GET(self):
            H.calls[self.path] = H.calls.get(self.path, 0) + 1
            if self.path == "/ok":
                body = b"hello fetch"
                self.send_response(200)
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/flaky" and H.calls[self.path] < 3:
                self.send_response(503)
                self.end_headers()
            elif self.path == "/flaky":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"finally")
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_uri(spark, http_server):
    from lucille_spark.pipeline.stages import FetchUri

    df = spark.createDataFrame(
        [("a", f"{http_server}/ok"),
         ("b", f"{http_server}/missing"),
         ("c", None)],
        "id string, url string").coalesce(1)
    out = FetchUri(source="url", dest="data", max_retries=0).apply(df)
    rows = {r["id"]: r for r in out.collect()}
    assert base64.b64decode(rows["a"]["data"]) == b"hello fetch"
    assert rows["a"]["url_status_code"] == 200
    assert rows["a"]["url_size"] == 11
    assert rows["a"]["url_error"] is None
    assert rows["b"]["url_status_code"] == 404
    assert rows["b"]["data"] is None and rows["b"]["url_error"]
    assert rows["c"]["data"] is None and rows["c"]["url_status_code"] is None


def test_fetch_uri_retries_and_max_size(spark, http_server):
    from lucille_spark.pipeline.stages import FetchUri

    df = spark.createDataFrame([("f", f"{http_server}/flaky")],
                               "id string, url string").coalesce(1)
    out = FetchUri(source="url", dest="data", max_retries=4,
                   initial_expiry_ms=10,
                   status_code_retry_list=(503,)).apply(df)
    r = out.collect()[0]
    assert base64.b64decode(r["data"]) == b"finally"
    assert r["url_status_code"] == 200

    df2 = spark.createDataFrame([("a", f"{http_server}/ok")],
                                "id string, url string").coalesce(1)
    r2 = FetchUri(source="url", dest="data", max_size=5).apply(df2).collect()[0]
    assert base64.b64decode(r2["data"]) == b"hello"
    assert r2["url_size"] == 5


# ----------------------------------------------------------- AddRandomDate

def test_add_random_date_deterministic_in_range(spark):
    from lucille_spark.pipeline.stages import AddRandomDate

    df = spark.createDataFrame([(f"d{i}",) for i in range(50)], "id string")
    st = AddRandomDate(dest="data", range_start="2020-01-01",
                       range_end="2021-01-01")
    a = {r["id"]: r["data"] for r in st.apply(df).collect()}
    b = {r["id"]: r["data"] for r in st.apply(df).collect()}
    assert a == b  # seeded-deterministic
    import datetime

    lo = datetime.datetime(2020, 1, 1)
    hi = datetime.datetime(2021, 1, 1)
    assert all(lo <= v < hi for v in a.values())
    assert len(set(a.values())) > 10  # actually varies

    with pytest.raises(ValueError):
        AddRandomDate(range_start="2022-01-01",
                      range_end="2021-01-01").apply(df)


# ---------------------------------------------------- AddRandomNestedField

def test_add_random_nested_field(spark):
    from lucille_spark.pipeline.stages import AddRandomNestedField

    df = spark.createDataFrame([("d1", "alice"), ("d2", "bob")],
                               "id string, name string")
    st = AddRandomNestedField(
        target_field="nested",
        entries={"user.name": "name", "user.score": "gen_score"},
        num_objects=3,
        generators={"gen_score": {"type": "int", "min": 0, "max": 100}})
    out = {r["id"]: json.loads(r["nested"]) for r in st.apply(df).collect()}
    for doc_id, arr in out.items():
        assert len(arr) == 3
        names = {o["user"]["name"] for o in arr}
        assert len(names) == 1  # source column: same value every object
        scores = [o["user"]["score"] for o in arr]
        assert all(0 <= s < 100 for s in scores)
    # generator values vary across object index (reference: fresh draw per
    # object) and are deterministic across runs
    arr1 = out["d1"]
    assert len({o["user"]["score"] for o in arr1}) > 1
    out2 = {r["id"]: json.loads(r["nested"]) for r in st.apply(df).collect()}
    assert out == out2


def test_add_random_nested_field_validation():
    from lucille_spark.pipeline.stages import AddRandomNestedField

    with pytest.raises(ValueError):
        AddRandomNestedField(target_field="t", entries={})
    with pytest.raises(ValueError):
        AddRandomNestedField(target_field="t", entries={"a..b": "x"})
    with pytest.raises(ValueError):
        AddRandomNestedField(target_field="t", entries={"a": "x"},
                             min_num_objects=2)
    with pytest.raises(ValueError):
        AddRandomNestedField(target_field="t", entries={"a": "x"},
                             num_objects=0)


def test_add_random_nested_field_range_n(spark):
    from lucille_spark.pipeline.stages import AddRandomNestedField

    df = spark.createDataFrame([(f"d{i}", "v") for i in range(30)],
                               "id string, val string")
    st = AddRandomNestedField(
        target_field="nested", entries={"v": "val"},
        min_num_objects=1, max_num_objects=4)
    sizes = {len(json.loads(r["nested"]))
             for r in st.apply(df).collect()}
    assert sizes <= {1, 2, 3, 4} and len(sizes) > 1


# ----------------------------------------------------- ChunkText completion

def _chunks(spark, stage, text):
    from lucille_spark.pipeline.conditions import CHILDREN

    df = spark.createDataFrame([("p1", text)], "id string, text string")
    row = stage.apply(df).select(CHILDREN).collect()[0][0]
    return [c["chunk_text"] for c in row], row


def test_chunk_merge_k(spark):
    from lucille_spark.pipeline.stages import ChunkText

    text = "a b c d e f g h i j"
    got, _ = _chunks(spark, ChunkText(source="text", mode="fixed",
                                      chunk_size=2, merge_k=2), text)
    # 5 fixed chunks of 2 tokens, merged in pairs -> 3 chunks
    assert got == ["a b c d", "e f g h", "i j"]


def test_chunk_merge_and_overlap(spark):
    from lucille_spark.pipeline.stages import ChunkText

    text = "a b c d e f g h i j"
    got, row = _chunks(spark, ChunkText(source="text", mode="fixed",
                                        chunk_size=2, merge_k=2,
                                        overlap_k=1), text)
    # windows of 2 chunks at stride 1 over 5 chunks -> 4 windows
    assert got == ["a b c d", "c d e f", "e f g h", "g h i j"]
    # children metadata intact
    assert [c["chunk_number"] for c in row] == [1, 2, 3, 4]
    assert all(c["total_chunks"] == 4 for c in row)
    # offsets are cumulative lengths of the final chunks
    assert [c["offset"] for c in row] == [0, 7, 14, 21]


def test_chunk_overlap_pct(spark):
    from lucille_spark.pipeline.stages import ChunkText

    text = "aaaa bbbb cccc"
    got, _ = _chunks(spark, ChunkText(source="text", mode="fixed",
                                      chunk_size=1, overlap_pct=50), text)
    # 50% of 4 chars = 2 chars of context from each neighbour
    assert got == ["aaaa bb", "aa bbbb cc", "bb cccc"]


def test_chunk_pre_merge_min_and_char_limit(spark):
    from lucille_spark.pipeline.stages import ChunkText

    text = "aa. bb. a very much longer sentence here. cc."
    st = ChunkText(source="text", mode="sentence", pre_merge_min=8)
    got, _ = _chunks(spark, st, text)
    # "aa." + "bb." merge to reach 8 chars; trailing "cc." (below min)
    # appends to the last chunk
    assert got[0] == "aa. bb."
    assert got[-1].endswith("cc.")
    st2 = ChunkText(source="text", mode="sentence", char_limit=10)
    got2, _ = _chunks(spark, st2, text)
    assert all(len(c) <= 10 for c in got2)


def test_chunk_fixed_chars_mode(spark):
    from lucille_spark.pipeline.stages import ChunkText

    got, _ = _chunks(spark, ChunkText(source="text", mode="fixed_chars",
                                      chunk_size=4), "abcdefghij")
    assert got == ["abcd", "efgh", "ij"]


def test_chunk_validation():
    from lucille_spark.pipeline.stages import ChunkText

    with pytest.raises(ValueError):
        ChunkText(merge_k=0)
    with pytest.raises(ValueError):
        ChunkText(merge_k=2, overlap_k=1, overlap_pct=10)
    with pytest.raises(ValueError):
        ChunkText(merge_k=2, overlap_k=2)


# ------------------------------------- hardened phrase predicates (quotes)

def test_phrase_pred_quote_and_metachar_safe(spark):
    from lucille_spark.pipeline.stages import ExtractEntities, MatchQuery

    df = spark.createDataFrame(
        [("d1", "the o'brien parser works"),
         ("d2", "nothing here")],
        "id string, content string")
    # a dictionary entry containing a quote must not break the expression
    st = ExtractEntities(source="content",
                         dictionary={"o'brien parser": "PERSON",
                                     "100% safe": "CLAIM"})
    rows = {r["id"]: r["entities"] for r in st.apply(df).collect()}
    assert rows["d1"] == ["PERSON"]
    assert rows["d2"] == []

    mq = MatchQuery(queries={"q1": 'content:"brien parser"'},
                    fields=("content",))
    got = {r["id"]: r["matched_queries"] for r in mq.apply(df).collect()}
    assert got["d1"] == ["q1"] and got["d2"] == []


# ------------------------------------------- ExtractEntities option matrix

def test_extract_entities_options(spark):
    from lucille_spark.pipeline.stages import ExtractEntities

    df = spark.createDataFrame(
        [("d1", "The New York Giants played in New York today"),
         ("d2", "giants live in NEW york"),
         ("d3", "unrelated text")],
        "id string, content string")
    base = dict(source="content",
                dictionary={"new york": "NY",
                            "new york giants": "TEAM",
                            "giants": "G"})

    # overlaps allowed (default): all matching entries reported
    rows = {r["id"]: set(r["entities"]) for r in
            ExtractEntities(**base).apply(df).collect()}
    assert rows["d1"] == {"NY", "TEAM", "G"}
    assert rows["d2"] == {"NY", "G"}
    assert rows["d3"] == set()

    # ignore_overlaps: 'new york' and 'giants' suppressed where the longer
    # 'new york giants' matched... but d1 ALSO has a standalone 'New York'
    # — doc-level approximation keeps the longest only
    rows = {r["id"]: set(r["entities"]) for r in
            ExtractEntities(**base, ignore_overlaps=True).apply(df).collect()}
    assert rows["d1"] == {"TEAM"}
    assert rows["d2"] == {"NY", "G"}

    # stop_on_hit: first dictionary entry only
    rows = {r["id"]: r["entities"] for r in
            ExtractEntities(**base, stop_on_hit=True).apply(df).collect()}
    assert rows["d1"] == ["NY"]

    # use_payloads=False emits the entry text
    rows = {r["id"]: set(r["entities"]) for r in
            ExtractEntities(**base, use_payloads=False).apply(df).collect()}
    assert rows["d2"] == {"new york", "giants"}

    # case-sensitive: 'NEW york' no longer matches 'New York'-cased entry
    cs = ExtractEntities(source="content",
                         dictionary={"New York": "NY"},
                         ignore_case=False)
    rows = {r["id"]: set(r["entities"]) for r in cs.apply(df).collect()}
    assert rows["d1"] == {"NY"}
    assert rows["d2"] == set()

    # substring mode (only_whole_words=False)
    sub = ExtractEntities(source="content", dictionary={"relat": "R"},
                          only_whole_words=False)
    rows = {r["id"]: set(r["entities"]) for r in sub.apply(df).collect()}
    assert rows["d3"] == {"R"}
    assert rows["d1"] == set()


# --------------------------------------------------- nested JSON path ops

def test_jsonpath_unit():
    from lucille_spark.pipeline.jsonpath import (get_path, parse_segments,
                                                 remove_in_json, set_in_json)

    assert parse_segments("a.b[2].c") == ["a", "b", 2, "c"]
    assert parse_segments("a.b.2.c") == ["a", "b", 2, "c"]
    with pytest.raises(ValueError):
        parse_segments("a..b")

    out = set_in_json("null", "a.b[1].c", 5)
    assert json.loads(out) == {"a": {"b": [None, {"c": 5}]}}
    out2 = set_in_json(out, "a.b[0]", "x")
    assert json.loads(out2)["a"]["b"][0] == "x"
    out3 = remove_in_json(out2, "a.b[0]")
    assert json.loads(out3) == {"a": {"b": [{"c": 5}]}}   # shifted
    assert json.loads(remove_in_json(out3, "a.nope.deep")) \
        == json.loads(out3)  # no-op
    assert get_path(json.loads(out3), parse_segments("a.b.0.c")) == 5


def test_set_remove_nested_field_stages(spark):
    from lucille_spark.pipeline.stages import RemoveNestedField, SetNestedField

    df = spark.createDataFrame(
        [("d1", '{"user": {"name": "ann"}}', "42"),
         ("d2", None, "7")],
        "id string, meta string, score string")
    out = SetNestedField(source="meta", path="user.scores[0]",
                         value_field="score").apply(df)
    out = SetNestedField(source="meta", path="tag", value="v1").apply(out)
    rows = {r["id"]: json.loads(r["meta"]) for r in out.collect()}
    assert rows["d1"] == {"user": {"name": "ann", "scores": [42]},
                          "tag": "v1"}
    assert rows["d2"] == {"user": {"scores": [7]}, "tag": "v1"}

    out2 = RemoveNestedField(source="meta", path="user.name").apply(out)
    rows2 = {r["id"]: json.loads(r["meta"]) for r in out2.collect()}
    assert rows2["d1"]["user"] == {"scores": [42]}


# ------------------------------------------------- valuesPath conditions

def test_condition_values_path(spark, tmp_path):
    from lucille_spark.pipeline.conditions import Condition
    from lucille_spark.pipeline.stages import SetStaticValues

    vals = tmp_path / "allowed.txt"
    vals.write_text("en\nfr\n")
    df = spark.createDataFrame(
        [("a", "en"), ("b", "de")], "id string, lang string")
    st = SetStaticValues(values={"tagged": "yes"},
                         conditions=[Condition(fields=["lang"],
                                               values_path=str(vals))])
    rows = {r["id"]: r["tagged"] for r in st.apply(df).collect()}
    assert rows == {"a": "yes", "b": None}


# ----------------------------------------------------- langid 10 languages

def test_langid_ten_languages(spark):
    from lucille_spark.ml.textstats import LANG_PROFILES, language_scores

    assert len(LANG_PROFILES) == 28   # r2: 10; r5 +10; r6 +8 Latin-script
    df = spark.createDataFrame(
        [("nl", "de het een en van niet fiets"),
         ("it", "il di che e non per strada"),
         ("id", "yang dan di itu dengan untuk jalan")],
        "doc_id string, text string")
    out = {r["doc_id"]: r["predicted"]
           for r in language_scores(df, "doc_id", "text").collect()}
    assert out == {"nl": "nl", "it": "it", "id": "id"}
