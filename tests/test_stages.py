"""Stage-layer goldens (FIXTURES.md F5; modeled on the reference's per-stage
unit tests, e.g. lucille-core/src/test/java/.../stage/*Test.java)."""

import pytest
from pyspark.sql import functions as F

from lucille_spark.pipeline import Condition, Pipeline
from lucille_spark.pipeline.stages import (
    ApplyRegex, Base64Decode, ChunkText, CollapseChildrenDocuments,
    Concatenate, Contains, CopyFields, CreateStaticTeaser, DeleteFields,
    DetectLanguage, DictionaryLookup, DropDocument, DropValues,
    EmitNestedChildren, ExtractFirstCharacter, HashFieldValueToBucket,
    Length, NormalizeText, ParseDate, ParseFilePath, ParseFloats, ParseJson,
    RemoveDiacritics, RemoveDuplicateValues, RenameFields, ReplacePatterns,
    SetStaticValues, SkipDocument, SplitFieldValues, TrimWhitespace,
    TruncateField,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("d1", "Hello World Foo", "en", " padded ", "a,b , c", '{"k": 7}',
         "/data/in/file.TXT", "café naïve", "2024-03-05"),
        ("d2", "Bonjour tout le monde", "fr", "x", "z", '{"k": 9}',
         "rel/path/x.csv", "plain", "03/07/2024"),
    ]
    return spark.createDataFrame(
        rows, "id string, text string, lang string, padded string, "
              "csvish string, js string, fp string, accented string, "
              "datestr string")


def rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy("id").collect()]


def test_copy_rename_delete(df):
    out = CopyFields(mapping={"text": "text2"}).apply(df)
    out = RenameFields(mapping={"text2": "body"}).apply(out)
    out = DeleteFields(fields=["padded"]).apply(out)
    assert "body" in out.columns and "padded" not in out.columns
    assert rows(out, "body") == rows(df, "text")


def test_concatenate_with_defaults(df):
    out = Concatenate(dest="c", format_string="{id}: {text} ({missing})",
                      default_inputs={"missing": "?"}).apply(df)
    assert rows(out, "c")[0][0] == "d1: Hello World Foo (?)"


def test_split_trim_dedup_dropvalues(df):
    out = SplitFieldValues(fields=["csvish"], delimiter=",").apply(df)
    assert rows(out, "csvish")[0][0] == ["a", "b", "c"]
    out2 = DropValues(fields=["csvish"], values=["b"]).apply(out)
    assert rows(out2, "csvish")[0][0] == ["a", "c"]
    out3 = RemoveDuplicateValues(fields=["csvish"]).apply(out)
    assert rows(out3, "csvish")[0][0] == ["a", "b", "c"]


def test_trim_truncate_normalize(df):
    out = TrimWhitespace(fields=["padded"]).apply(df)
    assert rows(out, "padded")[0][0] == "padded"
    out = TruncateField(source="text", dest="t5", max_size=5).apply(df)
    assert rows(out, "t5")[0][0] == "Hello"
    out = NormalizeText(source="text", dest="up", mode="uppercase").apply(df)
    assert rows(out, "up")[0][0] == "HELLO WORLD FOO"
    out = NormalizeText(source="text", dest="sc", mode="sentence_case").apply(df)
    assert rows(out, "sc")[0][0] == "Hello world foo"


def test_diacritics_vectorized(df):
    out = RemoveDiacritics(source="accented", dest="clean").apply(df)
    assert rows(out, "clean")[0][0] == "cafe naive"


def test_regex_extract_replace(df):
    out = ApplyRegex(source="text", dest="first",
                     regex=r"^(\w+)").apply(df)
    assert rows(out, "first")[0][0] == "Hello"
    out = ReplacePatterns(fields=["text"], patterns=["o"],
                          replacement="0").apply(df)
    assert rows(out, "text")[0][0] == "Hell0 W0rld F00"


def test_firstchar_length_teaser(df):
    out = ExtractFirstCharacter(source="text", dest="fc").apply(df)
    assert rows(out, "fc")[0][0] == "H"
    out = ExtractFirstCharacter(source="datestr", dest="fc").apply(df)
    assert rows(out, "fc")[0][0] == "nonalpha"
    out = CreateStaticTeaser(source="text", dest="teaser",
                             max_length=8).apply(df)
    assert rows(out, "teaser")[0][0] == "Hello"
    out = SplitFieldValues(fields=["csvish"], delimiter=",").apply(df)
    out = Length(source="csvish", dest="n").apply(out)
    assert rows(out, "n")[0][0] == 3


def test_base64_and_hash_bucket(spark):
    import base64

    df = spark.createDataFrame(
        [("d1", base64.b64encode(b"hi").decode())], "id string, b string")
    out = Base64Decode(source="b", dest="raw").apply(df)
    assert bytes(out.collect()[0]["raw"]) == b"hi"
    out = HashFieldValueToBucket(source="id", dest="bucket",
                                 buckets=["x", "y", "z"]).apply(df)
    assert out.collect()[0]["bucket"] in {"x", "y", "z"}


def test_parse_date_multiformat(df):
    out = ParseDate(fields=["datestr"],
                    formats=["yyyy-MM-dd", "MM/dd/yyyy"]).apply(df)
    got = [str(r[0])[:10] for r in rows(out, "datestr")]
    assert got == ["2024-03-05", "2024-03-07"]


def test_parse_json_floats(spark, df):
    out = ParseJson(source="js", mapping={"k": "$.k"}).apply(df)
    assert rows(out, "k") == [("7",), ("9",)]
    fdf = spark.createDataFrame([("d1", "[1.5, 2.5]")], "id string, v string")
    out = ParseFloats(source="v").apply(fdf)
    assert out.collect()[0]["v"] == [1.5, 2.5]


def test_parse_file_path(df):
    out = ParseFilePath(source="fp").apply(df)
    r = rows(out, "filename", "folder", "file_extension", "file_paths")
    assert r[0] == ("file.TXT", "/data/in", "txt",
                    ["/data", "/data/in", "/data/in/file.TXT"])
    assert r[1][0] == "x.csv" and r[1][1] == "rel/path"


def test_dictionary_lookup_and_contains(df):
    out = DictionaryLookup(source="lang", dest="lang_name",
                           dictionary={"en": "English", "fr": "French"}
                           ).apply(df)
    assert rows(out, "lang_name") == [("English",), ("French",)]
    out = Contains(fields=["text"], values=["World", "nothere"],
                   dest="tag").apply(df)
    assert rows(out, "tag") == [("match",), (None,)]


def test_detect_language_heuristic(spark):
    df = spark.createDataFrame(
        [("d1", "the cat and the dog is in a house"),
         ("d2", "der hund ist nicht da und die katze")],
        "id string, body string")
    out = DetectLanguage(source="body", min_length=0).apply(df)
    got = rows(out, "language")
    assert got == [("en",), ("de",)]


def test_detect_language_options(spark):
    df = spark.createDataFrame(
        [("d1", "the cat and the dog is in a house with the mouse and the"),
         ("d2", "too short"),
         ("d3", "der hund ist nicht da und die katze ist auch nicht hier")],
        "id string, body string")
    # min_length (ref default 50): d2 skipped -> null fields
    out = DetectLanguage(source="body").apply(df)
    assert rows(out, "language") == [("en",), (None,), ("de",)]
    # min_probability: confidence floored to 2 decimals, thresholded
    out = DetectLanguage(source="body", min_probability=0.99).apply(df)
    assert rows(out, "language") == [(None,), (None,), (None,)]
    confs = rows(DetectLanguage(source="body").apply(df),
                 "language_confidence")
    assert confs[0][0] is not None and 0 < confs[0][0] <= 1
    assert round(confs[0][0] * 100) == int(confs[0][0] * 100)  # floored
    # max_length truncation: clipping to 10 chars leaves too few stopwords
    out = DetectLanguage(source="body", min_length=0, max_length=10).apply(df)
    l0 = rows(out, "language")[0][0]
    assert l0 in (None, "en")
    # multi-source concatenation
    df2 = spark.createDataFrame(
        [("d1", "the cat and the dog", " is in a house with the mouse")],
        "id string, a string, b string")
    out = DetectLanguage(source=["a", "b"], min_length=40).apply(df2)
    assert rows(out, "language") == [("en",)]


def test_conditions_gate_stage(df):
    cond = [Condition(fields=["lang"], values=["en"])]
    out = NormalizeText(source="text", dest="text", mode="uppercase",
                        conditions=cond).apply(df)
    got = rows(out, "text")
    assert got[0][0] == "HELLO WORLD FOO"          # en row transformed
    assert got[1][0] == "Bonjour tout le monde"    # fr row untouched


def test_drop_skip_semantics(df):
    p = Pipeline([
        SkipDocument(conditions=[Condition(fields=["lang"], values=["fr"])]),
        # this stage must not touch the skipped row
        NormalizeText(source="text", dest="text", mode="uppercase"),
        DropDocument(conditions=[Condition(fields=["lang"], values=["de"])]),
    ])
    out = p.finish(df)
    got = rows(out, "id", "text")
    assert got == [("d1", "HELLO WORLD FOO"),
                   ("d2", "Bonjour tout le monde")]  # skipped: not uppercased


def test_set_static_and_update_modes(df):
    out = SetStaticValues(values={"source_tag": "webcrawl"}).apply(df)
    assert rows(out, "source_tag") == [("webcrawl",), ("webcrawl",)]
    st = CopyFields(mapping={"lang": "text"}, update_mode="append")
    out = st.apply(df)
    assert rows(out, "text")[0][0] == ["Hello World Foo", "en"]
    st = CopyFields(mapping={"lang": "text"}, update_mode="skip")
    out = st.apply(df)
    assert rows(out, "text")[0][0] == "Hello World Foo"


def test_chunk_and_children_roundtrip(spark):
    df = spark.createDataFrame(
        [("p1", "one two three four five six seven")], "id string, text string")
    chunked = ChunkText(source="text", id_col="id", mode="fixed",
                        chunk_size=3).apply(df)
    emitted = EmitNestedChildren(drop_parents=True,
                                 copy_fields=["id"]).apply(chunked)
    # EmitNestedChildren copies parent id; child struct id lands in "id" too —
    # select struct fields explicitly
    got = emitted.select("chunk_text", "chunk_number", "total_chunks") \
                 .orderBy("chunk_number").collect()
    assert [r["chunk_text"] for r in got] == [
        "one two three", "four five six", "seven"]
    assert [r["total_chunks"] for r in got] == [3, 3, 3]

    collapsed = CollapseChildrenDocuments(fields=["chunk_text"]).apply(chunked)
    assert collapsed.collect()[0]["child_chunk_text"] == [
        "one two three", "four five six", "seven"]


def test_pipeline_from_config_and_validate():
    cfg = {"stages": [
        {"class": "NormalizeText", "source": "text", "mode": "lowercase"},
        {"class": "ApplyRegex", "source": "text", "dest": "w",
         "regex": "(x)"},
    ]}
    p = Pipeline.from_config(cfg)
    assert len(p.stages) == 2
    bad = {"stages": [{"class": "Nope"},
                      {"class": "NormalizeText", "bogus": 1}]}
    errs = Pipeline.validate(bad)
    assert len(errs) == 2 and "unknown stage" in errs[0]
