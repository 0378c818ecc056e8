"""The stage library: Lucille's per-document enrichment stages re-expressed
as declarative DataFrame column transformations (SURVEY.md §2.3-§2.4).

Every stage cites the reference implementation it matches. Stages are pure
``DataFrame -> DataFrame`` functions built from ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd); Python appears only in the explicitly
vectorized pandas-UDF stages (RemoveDiacritics). Conditional execution uses
``F.when(guard, new).otherwise(old)`` per conditions.py.

Multi-valued fields are ArrayType columns; ``update_mode`` follows
core/UpdateMode.java (OVERWRITE / APPEND / SKIP).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence

import pandas

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from lucille_spark.pipeline.conditions import (
    CHILDREN, DROPPED, SKIPPED, Condition, guard_column,
)

STAGES: Dict[str, type] = {}


def register_stage(cls):
    STAGES[cls.__name__] = cls
    return cls


@dataclass
class Stage:
    conditions: Optional[List[Condition]] = None

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _has_guard(self, df: DataFrame) -> bool:
        return bool(self.conditions) or DROPPED in df.columns \
            or SKIPPED in df.columns

    # helper: conditionally set a column. Note: a *conditional* stage must be
    # type-preserving (when/otherwise needs both branches the same type);
    # unconditional stages may change the column type freely.
    def _set(self, df: DataFrame, dest: str, value: Column) -> DataFrame:
        if not self._has_guard(df):
            return df.withColumn(dest, value)
        guard = guard_column(df, self.conditions)
        if dest in df.columns:
            return df.withColumn(dest, F.when(guard, value).otherwise(F.col(dest)))
        return df.withColumn(dest, F.when(guard, value))

    def _update(self, df: DataFrame, dest: str, value: Column,
                update_mode: str = "overwrite") -> DataFrame:
        """core/UpdateMode.java semantics on (possibly multi-valued) fields:
        OVERWRITE replaces, SKIP keeps existing, APPEND promotes to array and
        appends (duplicates kept, like Document.addToField)."""
        if dest not in df.columns or update_mode == "overwrite":
            return self._set(df, dest, value)
        if update_mode == "skip":
            return df.withColumn(
                dest, F.when(F.col(dest).isNull(), value).otherwise(F.col(dest)))
        if update_mode == "append":
            dtype = dict(df.dtypes).get(dest, "")
            base = (F.col(dest) if dtype.startswith("array")
                    else F.array(F.col(dest)))
            return df.withColumn(
                dest,
                F.when(F.col(dest).isNull(), F.array(value))
                .otherwise(F.concat(base, F.array(value))))
        raise ValueError(f"unknown update_mode {update_mode}")


# ---------------------------------------------------------------- field ops

@register_stage
@dataclass
class CopyFields(Stage):
    """stage/CopyFields.java:1-25 — copy source fields to destinations."""
    mapping: Dict[str, str] = dc_field(default_factory=dict)
    update_mode: str = "overwrite"

    def apply(self, df):
        for src, dest in self.mapping.items():
            df = self._update(df, dest, F.col(src), self.update_mode)
        return df


@register_stage
@dataclass
class RenameFields(Stage):
    """stage/RenameFields.java:1-75 — rename fields."""
    mapping: Dict[str, str] = dc_field(default_factory=dict)

    def apply(self, df):
        for src, dest in self.mapping.items():
            df = df.withColumnRenamed(src, dest)
        return df


@register_stage
@dataclass
class DeleteFields(Stage):
    """stage/DeleteFields.java:1-40 — drop listed fields."""
    fields: Sequence[str] = ()

    def apply(self, df):
        return df.drop(*[f for f in self.fields if f in df.columns])


@register_stage
@dataclass
class Concatenate(Stage):
    """stage/Concatenate.java:1-20 — format-string {field} substitution."""
    dest: str = "concatenated"
    format_string: str = ""
    default_inputs: Dict[str, str] = dc_field(default_factory=dict)

    def apply(self, df):
        import re

        parts: List[Column] = []
        pos = 0
        for m in re.finditer(r"\{([^}]+)\}", self.format_string):
            if m.start() > pos:
                parts.append(F.lit(self.format_string[pos:m.start()]))
            name = m.group(1)
            if name in df.columns:
                col = F.col(name).cast("string")
                if name in self.default_inputs:
                    col = F.coalesce(col, F.lit(self.default_inputs[name]))
            else:
                col = F.lit(self.default_inputs.get(name, ""))
            parts.append(col)
            pos = m.end()
        if pos < len(self.format_string):
            parts.append(F.lit(self.format_string[pos:]))
        return self._set(df, self.dest, F.concat(*parts))


@register_stage
@dataclass
class SetStaticValues(Stage):
    """stage/SetStaticValues.java:1-14 — set literal values."""
    values: Dict[str, object] = dc_field(default_factory=dict)

    def apply(self, df):
        for dest, v in self.values.items():
            df = self._set(df, dest, F.lit(v))
        return df


@register_stage
@dataclass
class SplitFieldValues(Stage):
    """stage/SplitFieldValues.java:1-12 — split on delimiter, optional trim."""
    fields: Sequence[str] = ()
    delimiter: str = ","
    trim: bool = True

    def apply(self, df):
        import re

        pat = re.escape(self.delimiter)
        for f_name in self.fields:
            col = F.split(F.col(f_name), pat)
            if self.trim:
                col = F.transform(col, lambda x: F.trim(x))
            df = self._set(df, f_name, col)
        return df


@register_stage
@dataclass
class TrimWhitespace(Stage):
    """stage/TrimWhitespace.java:1-9."""
    fields: Sequence[str] = ()

    def apply(self, df):
        for f_name in self.fields:
            df = self._set(df, f_name, F.trim(F.col(f_name)))
        return df


@register_stage
@dataclass
class TruncateField(Stage):
    """stage/TruncateField.java:1-16 — substring to max_size."""
    source: str = ""
    dest: Optional[str] = None
    max_size: int = 100

    def apply(self, df):
        return self._set(df, self.dest or self.source,
                         F.substring(F.col(self.source), 1, self.max_size))


@register_stage
@dataclass
class NormalizeText(Stage):
    """stage/NormalizeText.java:1-30,79-91 — lowercase/uppercase/title/sentence."""
    source: str = ""
    dest: Optional[str] = None
    mode: str = "lowercase"

    def apply(self, df):
        col = F.col(self.source)
        if self.mode == "lowercase":
            out = F.lower(col)
        elif self.mode == "uppercase":
            out = F.upper(col)
        elif self.mode == "title_case":
            out = F.initcap(col)
        elif self.mode == "sentence_case":
            out = F.concat(F.upper(F.substring(col, 1, 1)),
                           F.lower(F.expr(f"substring({self.source}, 2)")))
        else:
            raise ValueError(self.mode)
        return self._set(df, self.dest or self.source, out)


@register_stage
@dataclass
class RemoveDiacritics(Stage):
    """stage/RemoveDiacritics.java:1-11 — NFD accent strip (pandas UDF,
    Arrow-vectorized; the one stage that genuinely needs Python)."""
    source: str = ""
    dest: Optional[str] = None

    def apply(self, df):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def strip_accents(s: pandas.Series) -> pandas.Series:
            import unicodedata

            return s.map(lambda x: None if x is None else "".join(
                c for c in unicodedata.normalize("NFD", x)
                if not unicodedata.combining(c)))

        return self._set(df, self.dest or self.source,
                         strip_accents(F.col(self.source)))


@register_stage
@dataclass
class ApplyRegex(Stage):
    """stage/ApplyRegex.java:1-35 — regex extract (group 1) src→dest."""
    source: str = ""
    dest: str = ""
    regex: str = ""

    def apply(self, df):
        return self._set(df, self.dest,
                         F.regexp_extract(F.col(self.source), self.regex, 1))


@register_stage
@dataclass
class ReplacePatterns(Stage):
    """stage/ReplacePatterns.java:1-40 — regex replace list."""
    fields: Sequence[str] = ()
    patterns: Sequence[str] = ()
    replacement: str = ""

    def apply(self, df):
        for f_name in self.fields:
            col = F.col(f_name)
            for p in self.patterns:
                col = F.regexp_replace(col, p, self.replacement)
            df = self._set(df, f_name, col)
        return df


@register_stage
@dataclass
class ExtractFirstCharacter(Stage):
    """stage/ExtractFirstCharacter.java:1-13 — first char or 'nonalpha'."""
    source: str = ""
    dest: str = ""

    def apply(self, df):
        first = F.substring(F.col(self.source), 1, 1)
        return self._set(df, self.dest,
                         F.when(first.rlike("[A-Za-z]"), first)
                         .otherwise(F.lit("nonalpha")))


@register_stage
@dataclass
class Length(Stage):
    """stage/Length.java:1-9 — value count of a (possibly array) field."""
    source: str = ""
    dest: str = ""

    def apply(self, df):
        dtype = dict(df.dtypes).get(self.source, "string")
        if dtype.startswith("array"):
            out = F.size(F.col(self.source))
        else:
            out = F.when(F.col(self.source).isNull(), 0).otherwise(1)
        return self._set(df, self.dest, out.cast("int"))


@register_stage
@dataclass
class ComputeFieldSize(Stage):
    """stage/ComputeFieldSize.java:1-40 — byte size of a binary field."""
    source: str = ""
    dest: str = ""

    def apply(self, df):
        return self._set(df, self.dest,
                         F.length(F.col(self.source)).cast("int"))


@register_stage
@dataclass
class Base64Decode(Stage):
    """stage/Base64Decode.java:1-10."""
    source: str = ""
    dest: str = ""

    def apply(self, df):
        return self._set(df, self.dest, F.unbase64(F.col(self.source)))


@register_stage
@dataclass
class CreateStaticTeaser(Stage):
    """stage/CreateStaticTeaser.java:1-18 — prefix teaser at word boundary."""
    source: str = ""
    dest: str = ""
    max_length: int = 100

    def apply(self, df):
        pat = "^.{0,%d}\\b" % self.max_length
        teaser = F.regexp_extract(F.col(self.source), pat, 0)
        return self._set(df, self.dest, F.rtrim(teaser))


@register_stage
@dataclass
class Timestamp(Stage):
    """stage/Timestamp.java:1-9 — current timestamp into dest."""
    dest: str = "timestamp"

    def apply(self, df):
        return self._set(df, self.dest, F.current_timestamp())


@register_stage
@dataclass
class RemoveDuplicateValues(Stage):
    """stage/RemoveDuplicateValues.java:1-9 — dedup multivalued field."""
    fields: Sequence[str] = ()

    def apply(self, df):
        for f_name in self.fields:
            df = self._set(df, f_name, F.array_distinct(F.col(f_name)))
        return df


@register_stage
@dataclass
class DropValues(Stage):
    """stage/DropValues.java:1-11 — remove exact values from arrays."""
    fields: Sequence[str] = ()
    values: Sequence[str] = ()

    def apply(self, df):
        lit_vals = F.array(*[F.lit(v) for v in self.values])
        for f_name in self.fields:
            df = self._set(df, f_name, F.array_except(F.col(f_name), lit_vals))
        return df


@register_stage
@dataclass
class HashFieldValueToBucket(Stage):
    """stage/HashFieldValueToBucket.java:1-13 — stable hash → bucket label."""
    source: str = ""
    dest: str = ""
    buckets: Sequence[str] = ()

    def apply(self, df):
        n = len(self.buckets)
        idx = F.pmod(F.crc32(F.col(self.source).cast("binary")), F.lit(n))
        labels = F.array(*[F.lit(b) for b in self.buckets])
        return self._set(df, self.dest,
                         F.element_at(labels, (idx + 1).cast("int")))


# ------------------------------------------------------------ date / numeric

@register_stage
@dataclass
class ParseDate(Stage):
    """stage/ParseDate.java:1-40 + dateformatters/* — multi-format parse.

    Tries each pattern with to_timestamp, coalescing the first success;
    'epoch' handles unix-seconds strings (dateformatters/*.java)."""
    fields: Sequence[str] = ()
    formats: Sequence[str] = ("yyyy-MM-dd", "MM/dd/yyyy", "MMMM d, yyyy")
    dest_suffix: str = ""

    def apply(self, df):
        for f_name in self.fields:
            attempts = []
            for fmt in self.formats:
                if fmt == "epoch":
                    attempts.append(
                        F.when(F.col(f_name).rlike("^[0-9]{9,11}$"),
                               F.to_timestamp(F.from_unixtime(
                                   F.col(f_name).cast("long")))))
                else:
                    attempts.append(F.try_to_timestamp(F.col(f_name),
                                                       F.lit(fmt)))
            df = self._set(df, f_name + self.dest_suffix,
                           F.coalesce(*attempts))
        return df


@register_stage
@dataclass
class ParseFloats(Stage):
    """stage/ParseFloats.java:1-10 — JSON float-array string → array<float>."""
    source: str = ""
    dest: Optional[str] = None

    def apply(self, df):
        return self._set(df, self.dest or self.source,
                         F.from_json(F.col(self.source), "array<float>"))


# ----------------------------------------------------- semi-structured paths

@register_stage
@dataclass
class ParseJson(Stage):
    """stage/ParseJson.java:1-20 — JSONPath-ish extraction to fields."""
    source: str = ""
    mapping: Dict[str, str] = dc_field(default_factory=dict)  # dest -> $.path

    def apply(self, df):
        for dest, path in self.mapping.items():
            df = self._set(df, dest, F.get_json_object(F.col(self.source), path))
        return df


@register_stage
@dataclass
class XPathExtractor(Stage):
    """stage/XPathExtractor.java:1-10 — XPath over an XML field (built-in)."""
    source: str = ""
    mapping: Dict[str, str] = dc_field(default_factory=dict)  # dest -> xpath

    def apply(self, df):
        for dest, xp in self.mapping.items():
            df = self._set(df, dest, F.xpath_string(F.col(self.source),
                                                    F.lit(xp)))
        return df


@register_stage
@dataclass
class ParseFilePath(Stage):
    """stage/ParseFilePath.java:1-22 — filename/folder/extension/hierarchy."""
    source: str = "file_path"
    include_hierarchy: bool = True

    def apply(self, df):
        col = F.col(self.source)
        df = self._set(df, "filename", F.regexp_extract(col, r"([^/\\]+)$", 1))
        df = self._set(df, "folder", F.regexp_extract(col, r"^(.*)[/\\][^/\\]*$", 1))
        df = self._set(df, "file_extension",
                       F.lower(F.regexp_extract(col, r"\.([^.\\/]+)$", 1)))
        if self.include_hierarchy:
            df = self._set(df, "file_paths", F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.split(col, "[/\\\\]"))),
                    lambda i: F.array_join(
                        F.slice(F.split(col, "[/\\\\]"), 1, i), "/")),
                lambda x: x != F.lit("")))
        return df


# ----------------------------------------------------- dictionary / matching

@register_stage
@dataclass
class DictionaryLookup(Stage):
    """stage/DictionaryLookup.java:1-35 — exact term lookup with payloads.

    The dictionary becomes a broadcast map expression; set_only mode emits
    a boolean (all values in dict), matching the reference's setOnly."""
    source: str = ""
    dest: str = ""
    dictionary: Dict[str, str] = dc_field(default_factory=dict)
    set_only: bool = False

    def apply(self, df):
        keys = F.array(*[F.lit(k) for k in self.dictionary])
        kv = F.create_map(*[F.lit(x) for pair in self.dictionary.items()
                            for x in pair])
        dtype = dict(df.dtypes).get(self.source, "string")
        col = F.col(self.source)
        if self.set_only:
            src_arr = col if dtype.startswith("array") else F.array(col)
            return self._set(df, self.dest,
                             F.forall(src_arr, lambda x: F.array_contains(keys, x)))
        if dtype.startswith("array"):
            out = F.filter(F.transform(col, lambda x: kv[x]),
                           lambda x: x.isNotNull())
        else:
            out = kv[col]
        return self._set(df, self.dest, out)


@register_stage
@dataclass
class Contains(Stage):
    """stage/Contains.java:1-15 — whole-word any-match tagging (the
    reference builds an Aho-Corasick trie; an alternation rlike compiles to
    the same DFA inside the JVM regex engine for moderate dictionaries)."""
    fields: Sequence[str] = ()
    values: Sequence[str] = ()
    dest: str = "contains"
    output_value: str = "match"

    def apply(self, df):
        import re as _re

        pat = r"\b(" + "|".join(_re.escape(v) for v in self.values) + r")\b"
        pred = None
        for f_name in self.fields:
            c = F.col(f_name).rlike(pat)
            pred = c if pred is None else (pred | c)
        return self._set(df, self.dest,
                         F.when(pred, F.lit(self.output_value)))


@register_stage
@dataclass
class DetectLanguage(Stage):
    """stage/DetectLanguage.java:1-25 — stopword-profile language heuristic
    (the reference uses cybozu langdetect; same output contract:
    language code + confidence)."""
    source: str = ""
    lang_dest: str = "language"
    conf_dest: str = "language_confidence"
    profiles: Dict[str, Sequence[str]] = dc_field(default_factory=lambda: {
        "en": ("the", "a", "of", "and", "to", "in", "is"),
        "de": ("der", "die", "das", "und", "ist", "nicht"),
        "es": ("el", "la", "de", "que", "y", "es"),
        "fr": ("le", "la", "de", "et", "est", "que"),
    })

    def apply(self, df):
        from lucille_spark.analysis import tokenize_col

        toks = F.array_distinct(tokenize_col(F.col(self.source)))
        hits = []
        for lang, words in self.profiles.items():
            arr = F.array(*[F.lit(w) for w in words])
            hits.append(F.struct(
                F.size(F.array_intersect(toks, arr)).alias("hits"),
                F.lit(lang).alias("lang"),
                F.lit(len(words)).alias("n")))
        best = F.array_max(F.array(*hits))
        df = self._set(df, self.lang_dest,
                       F.when(best["hits"] > 0, best["lang"]))
        return self._set(df, self.conf_dest,
                         F.round(best["hits"] / best["n"], 4))


# -------------------------------------------------------- drop/skip control

@register_stage
@dataclass
class DropDocument(Stage):
    """stage/DropDocument.java — mark dropped; terminal filter removes."""
    def apply(self, df):
        guard = guard_column(df, self.conditions)
        prev = F.col(DROPPED) if DROPPED in df.columns else F.lit(False)
        return df.withColumn(DROPPED, prev | guard)


@register_stage
@dataclass
class SkipDocument(Stage):
    """stage/SkipDocument.java — skip later stages, still indexed."""
    def apply(self, df):
        guard = guard_column(df, self.conditions)
        prev = F.col(SKIPPED) if SKIPPED in df.columns else F.lit(False)
        return df.withColumn(SKIPPED, prev | guard)


@register_stage
@dataclass
class RemoveEmptyFields(Stage):
    """stage/RemoveEmptyFields.java — null out empty strings/arrays."""
    fields: Sequence[str] = ()

    def apply(self, df):
        for f_name in self.fields:
            dtype = dict(df.dtypes).get(f_name, "string")
            if dtype.startswith("array"):
                cond = F.size(F.col(f_name)) > 0
            else:
                cond = F.length(F.col(f_name)) > 0
            df = df.withColumn(f_name, F.when(cond, F.col(f_name)))
        return df


# ------------------------------------------------------- children / chunking

CHUNK_CHILD_SCHEMA = ("array<struct<id:string,chunk_text:string,offset:int,"
                      "length:int,chunk_number:int,total_chunks:int>>")


@register_stage
@dataclass
class ChunkText(Stage):
    """stage/ChunkText.java:137-206 — split text into chunks emitted as
    attached children with id=parent-chunkN, offset/length/chunk_number/
    total_chunks (javadoc contract at ChunkText.java:172-179).

    chunk modes: 'fixed' (N tokens per chunk), 'paragraph' (\\n\\n+),
    'sentence' ([.!?] boundaries)."""
    source: str = "text"
    id_col: str = "id"
    mode: str = "fixed"
    chunk_size: int = 100         # tokens per chunk (fixed mode)
    separator_regex: str = r"\n\n+"

    def apply(self, df):
        if self.mode == "fixed":
            toks = F.split(F.col(self.source), r"\s+")
            n_chunks = F.ceil(F.size(toks) / F.lit(self.chunk_size)).cast("int")
            pieces = F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * self.chunk_size + 1, self.chunk_size),
                    " "))
        else:
            pat = self.separator_regex if self.mode == "paragraph" \
                else r"(?<=[.!?])\s+"
            pieces = F.filter(F.split(F.col(self.source), pat),
                              lambda x: F.trim(x) != F.lit(""))
            n_chunks = F.size(pieces)
        children = F.transform(
            pieces,
            lambda x, i: F.struct(
                F.concat(F.col(self.id_col).cast("string"), F.lit("-chunk"),
                         (i + 1).cast("string")).alias("id"),
                x.alias("chunk_text"),
                F.lit(None).cast("int").alias("offset"),
                F.length(x).cast("int").alias("length"),
                (i + 1).cast("int").alias("chunk_number"),
                n_chunks.cast("int").alias("total_chunks")))
        guard = guard_column(df, self.conditions)
        return df.withColumn(
            CHILDREN, F.when(guard, children.cast(CHUNK_CHILD_SCHEMA)))


@register_stage
@dataclass
class EmitNestedChildren(Stage):
    """stage/EmitNestedChildren.java:1-13 — detach children to standalone
    rows; optionally drop parents; copy selected parent fields down."""
    drop_parents: bool = False
    copy_fields: Sequence[str] = ()

    def apply(self, df):
        child_rows = (
            df.filter(F.col(CHILDREN).isNotNull())
            .select(*[F.col(c) for c in self.copy_fields],
                    F.explode(CHILDREN).alias("_child"))
            .select(*self.copy_fields, "_child.*"))
        parents = df.drop(CHILDREN)
        if self.drop_parents:
            return child_rows
        # align schemas: parent rows get null child columns and vice versa
        for c in parents.columns:
            if c not in child_rows.columns:
                child_rows = child_rows.withColumn(c, F.lit(None))
        for c in child_rows.columns:
            if c not in parents.columns:
                parents = parents.withColumn(c, F.lit(None))
        return parents.unionByName(child_rows.select(parents.columns))


@register_stage
@dataclass
class CollapseChildrenDocuments(Stage):
    """stage/CollapseChildrenDocuments.java:1-13 — pull child fields up as
    multivalued arrays; optionally drop the children."""
    fields: Sequence[str] = ()
    drop_children: bool = True

    def apply(self, df):
        for f_name in self.fields:
            df = df.withColumn(
                f"child_{f_name}",
                F.transform(F.col(CHILDREN), lambda c: c[f_name]))
        return df.drop(CHILDREN) if self.drop_children else df


@register_stage
@dataclass
class Print(Stage):
    """stage/Print.java:1-22 — debug visibility (no-op transform)."""
    n: int = 5

    def apply(self, df):
        df.show(self.n, truncate=80)
        return df


@register_stage
@dataclass
class MatchQuery(Stage):
    """stage/MatchQuery.java:39-123 — the Lucene percolator stage: named
    boolean queries are parsed once and every document is tagged with the
    names of the queries it matches (appended to ``dest``).

    Here the parsed ASTs compile to JVM boolean Column expressions over the
    tokenized fields (arrays_overlap / array_contains / phrase windows) —
    the percolation of ALL queries happens in one codegen'd pass, no Python.
    """
    queries: Dict[str, str] = dc_field(default_factory=dict)
    fields: Sequence[str] = ("content",)
    dest: str = "matched_queries"
    default_field: str = "content"

    def _node_pred(self, node, df):
        from lucille_spark.analysis import tokenize_col
        from lucille_spark.query.parser import And, Not, Or, Phrase, Term

        def toks(fld):
            if fld not in df.columns:
                return None
            return tokenize_col(F.col(fld))

        if isinstance(node, Term):
            t = toks(node.field)
            if t is None:
                return F.lit(False)
            # coalesce: a NULL field must read as "no match", not SQL NULL
            # (three-valued logic would otherwise poison NOT/AND above)
            return F.coalesce(F.array_contains(t, node.text), F.lit(False))
        if isinstance(node, Phrase):
            t = toks(node.field)
            if t is None:
                return F.lit(False)
            n = len(node.terms)
            toks_sql = (f"regexp_extract_all(lower({node.field}),"
                        " '[a-z0-9_]+', 0)")
            conds = " and ".join(
                f"element_at({toks_sql}, cast(i as int) + {off + 1}) = '{x}'"
                for off, x in enumerate(node.terms))
            return F.coalesce(
                (F.size(t) >= n) & F.expr(
                    f"exists(sequence(0, size({toks_sql}) - {n}), i -> {conds})"),
                F.lit(False))
        if isinstance(node, Not):
            return ~self._node_pred(node.child, df)
        if isinstance(node, And):
            out = None
            for c in node.children:
                p = self._node_pred(c, df)
                out = p if out is None else (out & p)
            return out
        if isinstance(node, Or):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c for c in node.children if isinstance(c, Not)]
            out = F.lit(False)
            for c in pos:
                out = out | self._node_pred(c, df)
            for c in neg:
                out = out & ~self._node_pred(c.child, df)
            return out
        raise TypeError(f"unknown node {node!r}")

    def apply(self, df):
        from lucille_spark.query.parser import parse

        tags = []
        for name, q in self.queries.items():
            pred = self._node_pred(parse(q, self.default_field), df)
            tags.append(F.when(pred, F.lit(name)))
        matched = F.filter(F.array(*tags), lambda x: x.isNotNull())
        return self._set(df, self.dest, matched)


# ------------------------------------------------- generators / entity extract

def _seeded_u01(seed_col: Column, salt: int) -> Column:
    """Deterministic per-row uniform [0,1) from a stable hash of a column —
    the reference's AddRandom* stages exist to build test fixtures, which
    must be reproducible, so 'random' here is seeded by the row id
    (stage/AddRandomBoolean.java etc., SURVEY.md §2.4 generators)."""
    h = F.conv(F.substring(F.sha2(seed_col.cast("binary"), 256), 1, 15),
               16, 10).cast("decimal(20,0)").cast("double")
    return (h + F.lit(float(salt) * 2654435761.0)) % 281474976710656.0 \
        / 281474976710656.0


@register_stage
@dataclass
class AddRandomBoolean(Stage):
    """stage/AddRandomBoolean.java:1-10 (seeded-deterministic)."""
    dest: str = "bool"
    seed_field: str = "id"
    percent_true: float = 0.5

    def apply(self, df):
        return self._set(df, self.dest,
                         _seeded_u01(F.col(self.seed_field), 1)
                         < self.percent_true)


@register_stage
@dataclass
class AddRandomInt(Stage):
    """stage/AddRandomInt.java (seeded-deterministic)."""
    dest: str = "num"
    seed_field: str = "id"
    min_value: int = 0
    max_value: int = 100

    def apply(self, df):
        span = self.max_value - self.min_value
        return self._set(df, self.dest,
                         (F.floor(_seeded_u01(F.col(self.seed_field), 2)
                                  * span) + self.min_value).cast("int"))


@register_stage
@dataclass
class AddRandomDouble(Stage):
    """stage/AddRandomDouble.java (seeded-deterministic)."""
    dest: str = "dbl"
    seed_field: str = "id"

    def apply(self, df):
        return self._set(df, self.dest, _seeded_u01(F.col(self.seed_field), 3))


@register_stage
@dataclass
class AddRandomString(Stage):
    """stage/AddRandomString.java:1-30 — draw from a word list."""
    dest: str = "word"
    seed_field: str = "id"
    words: Sequence[str] = ("alpha", "beta", "gamma", "delta")

    def apply(self, df):
        arr = F.array(*[F.lit(w) for w in self.words])
        idx = F.floor(_seeded_u01(F.col(self.seed_field), 4)
                      * len(self.words)).cast("int")
        return self._set(df, self.dest, F.element_at(arr, idx + 1))


@register_stage
@dataclass
class RandomVector(Stage):
    """stage/RandomVector.java — deterministic pseudo-random float vector."""
    dest: str = "vector"
    seed_field: str = "id"
    dim: int = 16

    def apply(self, df):
        comps = [
            (_seeded_u01(F.col(self.seed_field), 100 + j) * 2 - 1
             ).cast("float") for j in range(self.dim)]
        return self._set(df, self.dest, F.array(*comps))


@register_stage
@dataclass
class ExtractEntities(Stage):
    """stage/ExtractEntities.java:1-30 / ExtractEntitiesFST.java — dictionary
    entity extraction with payloads. The reference builds an Aho-Corasick
    trie / Lucene FST; over tokenized text the equivalent JVM-side plan is:
    single-word entries via array_intersect + map lookup, multi-word entries
    via consecutive-token window checks (one codegen'd pass, dictionary
    broadcast as literals; at very large dictionaries switch to a broadcast
    join on the exploded tokens)."""
    source: str = ""
    dest: str = "entities"
    dictionary: Dict[str, str] = dc_field(default_factory=dict)  # term->payload

    def apply(self, df):
        from lucille_spark.analysis import tokenize_col, tokenize_py

        toks = tokenize_col(F.col(self.source))
        hits = []
        for entry, payload in self.dictionary.items():
            terms = tokenize_py(entry)
            if len(terms) == 1:
                pred = F.array_contains(toks, terms[0])
            else:
                from lucille_spark.query.executor_df import phrase_pred

                n = len(terms)
                toks_sql = (f"regexp_extract_all(lower({self.source}),"
                            " '[a-z0-9_]+', 0)")
                conds = " and ".join(
                    f"element_at({toks_sql}, cast(i as int) + {off + 1}) = '{t}'"
                    for off, t in enumerate(terms))
                pred = (F.size(toks) >= n) & F.expr(
                    f"exists(sequence(0, size({toks_sql}) - {n}), i -> {conds})")
            hits.append(F.when(F.coalesce(pred, F.lit(False)),
                               F.lit(payload)))
        matched = F.array_distinct(
            F.filter(F.array(*hits), lambda x: x.isNotNull()))
        return self._set(df, self.dest, matched)


@register_stage
@dataclass
class FetchFileContent(Stage):
    """stage/FetchFileContent.java:1-14 — path field -> byte[] content.
    The per-doc fetch loop becomes a broadcast-able join against a
    binaryFile read of the docs' root (util/FileContentFetcher.java)."""
    path_field: str = "file_path"
    dest: str = "content"
    root: str = ""

    def apply(self, df):
        spark = df.sparkSession
        files = (spark.read.format("binaryFile")
                 .option("recursiveFileLookup", "true").load(self.root)
                 .select(F.col("path").alias("__p"),
                         F.col("content").alias(self.dest)))
        # file paths from binaryFile are file:-prefixed URIs
        joined = df.join(
            files,
            F.regexp_replace(files["__p"], "^file:", "")
            == F.col(self.path_field), "left")
        return joined.drop("__p")


@register_stage
@dataclass
class NormalizeFieldNames(Stage):
    """stage/NormalizeFieldNames.java:1-10 — rewrite field NAMES
    (spaces / non-alphanumerics -> delimiter), computed once from the
    schema."""
    delimiter: str = "_"

    def apply(self, df):
        import re

        for c in list(df.columns):
            clean = re.sub(r"[^0-9A-Za-z]+", self.delimiter, c).strip(
                self.delimiter)
            if clean and clean != c:
                df = df.withColumnRenamed(c, clean)
        return df


@register_stage
@dataclass
class CreateChildrenStage(Stage):
    """stage/CreateChildrenStage.java:1-16 — emit N synthetic children
    (testing); children land in ___children like ChunkText."""
    num_children: int = 2
    id_col: str = "id"
    drop_parent: bool = False

    def apply(self, df):
        children = F.transform(
            F.sequence(F.lit(1), F.lit(self.num_children)),
            lambda i: F.struct(
                F.concat(F.col(self.id_col).cast("string"), F.lit("-child"),
                         i.cast("string")).alias("id")))
        out = df.withColumn(CHILDREN, children)
        if self.drop_parent:
            out = out.withColumn(DROPPED, F.lit(True))
        return out


@register_stage
@dataclass
class PythonUDF(Stage):
    """The UDF escape hatch replacing EmbeddedPython / ExternalPython
    (stage/EmbeddedPython.java:581-597, stage/ExternalPython.java:599-706):
    the user supplies a vectorized ``fn(pd.DataFrame) -> pd.DataFrame``
    applied via mapInPandas (Arrow batches — never row-at-a-time)."""
    fn: object = None
    schema: str = ""

    def apply(self, df):
        assert callable(self.fn) and self.schema, "fn + output schema required"
        fn = self.fn

        def runner(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(runner, schema=self.schema)


@register_stage
@dataclass
class ApplyHTML(Stage):
    """stage/ApplyJSoup.java:1-45 — CSS-selector extraction from an HTML
    field. The reference uses jsoup; this container has no bs4/lxml, so the
    selector subset (tag names, optional #id / .class) is implemented on
    python's stdlib html.parser inside an Arrow-vectorized pandas UDF."""
    source: str = ""
    mapping: Dict[str, str] = dc_field(default_factory=dict)  # dest -> selector

    @staticmethod
    def _make_extract(selector: str):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def extract(col: pandas.Series) -> pandas.Series:
            from html.parser import HTMLParser

            tag, _, rest = selector.partition(".")
            want_cls = rest or None
            tag, _, want_id = tag.partition("#")

            class P(HTMLParser):
                def __init__(self):
                    super().__init__()
                    self.depth = 0
                    self.out = []

                def handle_starttag(self, t, attrs):
                    a = dict(attrs)
                    if self.depth:
                        self.depth += 1
                    elif t == tag \
                            and (not want_id or a.get("id") == want_id) \
                            and (not want_cls
                                 or want_cls in (a.get("class") or "").split()):
                        self.depth = 1

                def handle_endtag(self, t):
                    if self.depth:
                        self.depth -= 1

                def handle_data(self, d):
                    if self.depth:
                        self.out.append(d)

            def run(html):
                if html is None:
                    return None
                p = P()
                p.feed(html)
                return " ".join("".join(p.out).split()) or None

            return col.map(run)

        return extract

    def apply(self, df):
        for dest, selector in self.mapping.items():
            df = self._set(df, dest,
                           self._make_extract(selector)(F.col(self.source)))
        return df


@register_stage
@dataclass
class ApplyFileHandlers(Stage):
    """stage/ApplyFileHandlers.java:1-30 — each document references a file;
    the file is parsed by a CSV/JSONL handler and its rows become children
    of the referencing document.

    Spark-first: instead of per-doc parsing, ALL referenced files are read
    in one distributed pass (the handler source), then joined back to
    parents on the file name — the N+1 loop becomes one scan + one join."""
    path_field: str = "file_path"
    handler: str = "csv"          # csv | jsonl
    handler_options: Dict[str, object] = dc_field(default_factory=dict)

    def apply(self, df):
        spark = df.sparkSession
        paths = [r[0] for r in df.select(self.path_field).distinct().collect()]
        if not paths:
            return df.withColumn(CHILDREN, F.lit(None))
        if self.handler == "csv":
            from lucille_spark.sources import read_csv_docs

            children = read_csv_docs(spark, paths, **self.handler_options)
        elif self.handler == "jsonl":
            from lucille_spark.sources import read_jsonl_docs

            children = read_jsonl_docs(spark, paths, **self.handler_options)
        else:
            raise ValueError(self.handler)
        if "source" not in children.columns:
            children = children.withColumn(
                "source", F.regexp_extract(F.input_file_name(),
                                           r"([^/]+)$", 1))
        rolled = (children
                  .withColumn("_child", F.struct(*[
                      F.col(c) for c in children.columns if c != "source"]))
                  .groupBy("source")
                  .agg(F.collect_list("_child").alias(CHILDREN)))
        parent_file = F.regexp_extract(F.col(self.path_field), r"([^/]+)$", 1)
        return (df.withColumn("_pfile", parent_file)
                .join(rolled, F.col("_pfile") == rolled["source"], "left")
                .drop("_pfile", "source"))
