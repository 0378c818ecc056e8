"""Driver-side index reader: lexicon lookups + lazily-decoded block cursors.

Reads the parquet tables written by ``builder.build_index`` through
pyarrow.dataset with predicate pushdown (term-sorted layout → row-group
pruning), so a single-query lookup touches only the row groups holding the
query's terms — no Spark job, millisecond-scale latency. This is the moral
equivalent of Lucene's term dictionary + skip lists, which the reference
gets by delegating to Solr/ES (SURVEY.md §2.9).
"""

from __future__ import annotations

import math
import os
import re
from typing import Dict, List, Optional

import numpy as np
import pyarrow.dataset as ds

from lucille_spark import BM25_B, BM25_K1
from lucille_spark.index import codecs

SENTINEL = 1 << 62


def recover_lexicon(index_dir: str) -> None:
    """WRITER-ONLY recovery from a crash mid lexicon swap (merge_index
    writes aside as ``lexicon_old`` before renaming the new dir in): if
    ``lexicon`` is missing but ``lexicon_old`` exists, restore it; a
    leftover ``lexicon_old`` NEXT TO a live ``lexicon`` is post-swap
    debris and is dropped. Only merge_index (which holds the write role)
    may call this — readers must never mutate the index dir, or a reader
    opening during a live merge's swap window would rename lexicon_old
    back and break the merge's final rename (ENOTEMPTY with the delta
    terms already on disk). Renames are guarded: a concurrent writer may
    have completed the same step first."""
    import shutil

    lex_dir = os.path.join(index_dir, "lexicon")
    lex_old = lex_dir + "_old"
    if not os.path.exists(lex_old):
        return
    if os.path.exists(lex_dir):
        shutil.rmtree(lex_old, ignore_errors=True)
    else:
        try:
            os.rename(lex_old, lex_dir)
        except OSError:
            # another recovery finished the rename between our existence
            # check and the rename — the lexicon is live either way
            if not os.path.exists(lex_dir):
                raise
    shutil.rmtree(lex_dir + "_tmp", ignore_errors=True)


def _open_lexicon_readonly(index_dir: str):
    """Open the lexicon WITHOUT mutating the directory. Normally just
    ``lexicon/``; if a merge crashed (or is mid-swap) the live data may sit
    in ``lexicon_old`` — fall back to reading that aside copy in place,
    retrying once to ride out the nanoseconds-wide rename window of a live
    merge. Recovery renames stay writer-only (merge_index)."""
    import time

    import pyarrow as pa

    lex_dir = os.path.join(index_dir, "lexicon")
    lex_old = lex_dir + "_old"
    for attempt in range(3):
        for cand in (lex_dir, lex_old):
            if os.path.isdir(cand):
                try:
                    return ds.dataset(cand, ignore_prefixes=[".", "_"])
                except (FileNotFoundError, pa.lib.ArrowInvalid):
                    continue  # swept out from under us mid-open; retry
        time.sleep(0.05 * (attempt + 1))
    # final attempt surfaces the real error
    return ds.dataset(lex_dir, ignore_prefixes=[".", "_"])


def _retry_fnf(fn, attempts: int = 4, base_sleep: float = 0.05):
    """Run ``fn`` retrying on FileNotFoundError and ArrowInvalid — rides
    out the milliseconds-wide windows where a concurrent merge rewrites a
    tiny metadata dir (write_small_parquet: rmtree -> atomic-rename write)
    or swaps the lexicon; ArrowInvalid covers a dataset whose discovered
    file list went stale mid-rewrite. Never masks a genuinely missing or
    corrupt table: the final attempt's error propagates."""
    import time

    import pyarrow as pa

    for a in range(attempts - 1):
        try:
            return fn()
        except (FileNotFoundError, pa.lib.ArrowInvalid):
            time.sleep(base_sleep * (a + 1))
    return fn()


def read_meta(index_dir: str) -> Optional[dict]:
    """Read the 1-row ``_meta`` table (ord_span, version, updated_at);
    None when absent (pre-round-2 index layout). Retries mid-rewrite
    races; only a truly absent table returns None."""
    path = os.path.join(index_dir, "_meta")

    def _read():
        rows = ds.dataset(path).to_table().to_pylist()
        if not rows:
            # dir exists but reads empty: the writer's dot-prefixed temp
            # file is the only content (mid-rewrite window) — retryable,
            # same rule as corpus_stats; a truly absent table raises
            # FileNotFoundError from ds.dataset above instead
            raise FileNotFoundError("_meta mid-rewrite (empty read)")
        # several appends may exist; the newest updated_at wins
        return max(rows, key=lambda r: r.get("updated_at", 0.0))

    try:
        return _retry_fnf(_read)
    except Exception:
        return None


class IndexReader:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        # every dataset open retries: discovery can race a concurrent
        # merge's in-flight Spark append (a vanishing _temporary commit
        # dir raises FileNotFoundError mid-listing); ignore_prefixes
        # keeps half-written dot/underscore files out of the file list
        self._postings = _retry_fnf(lambda: ds.dataset(
            os.path.join(index_dir, "postings"),
            ignore_prefixes=[".", "_"]))
        # a crash mid lexicon swap (merge_index) may have left the live
        # lexicon aside as lexicon_old — open it read-only; actual
        # recovery renames are writer-only (merge_index calls
        # recover_lexicon), so concurrent readers can't race a live merge
        self._lexicon = _open_lexicon_readonly(index_dir)
        self._doc_stats = _retry_fnf(lambda: ds.dataset(
            os.path.join(index_dir, "doc_stats"),
            ignore_prefixes=[".", "_"]))
        # corpus_stats is driver-rewritten by merges (rmtree -> write);
        # ride out the window instead of failing construction. The window
        # has TWO shapes: the dir is briefly absent (FileNotFoundError,
        # handled by _retry_fnf) or it exists holding only the writer's
        # dot-prefixed temp file, in which case the dataset reads as an
        # EMPTY/field-less table — treat that as retryable too, or the
        # reader silently constructs with stats == {} and every later
        # n_docs/idf/avgdl lookup raises KeyError
        def _read_corpus_stats():
            t = ds.dataset(
                os.path.join(index_dir, "corpus_stats"),
                ignore_prefixes=[".", "_"]).to_table()
            if t.num_rows == 0 or "field" not in t.schema.names:
                raise FileNotFoundError(
                    "corpus_stats mid-rewrite (empty/field-less read)")
            return t

        stats = _retry_fnf(_read_corpus_stats)
        self.stats = {
            r["field"]: r for r in stats.to_pylist()
        }
        self._term_cache: Dict = {}
        self._decode_cache: Dict = {}
        self._fuzzy_stats: Dict = {}
        # deleted docs (incremental upserts/deletes): ordinals to exclude.
        # Stored as a SORTED int64 array, not a Python set: at 10^9 docs with
        # 1% deletes a set of ints is ~GBs; the array is 8B/entry and
        # membership is one searchsorted.
        tomb_dir = os.path.join(index_dir, "_tombstones")
        if os.path.isdir(tomb_dir):
            # dir exists -> the table is real; retry mid-rewrite races
            # rather than silently serving EMPTY tombstones (which would
            # resurrect deleted docs)
            t = _retry_fnf(lambda: ds.dataset(
                tomb_dir, ignore_prefixes=[".", "_"]).to_table(
                columns=["doc_ord"]))
            arr = np.unique(np.asarray(t["doc_ord"].to_pylist(),
                                       dtype=np.int64))
        else:
            arr = np.empty(0, dtype=np.int64)
        self.tombstones = arr
        # _meta carries the ordinal SPAN (max doc_ord + 1, including
        # tombstoned ordinals) and a version stamp for cache invalidation.
        # Written by build_index/merge_index; legacy indexes fall back to a
        # single-column doc_stats scan (driver-side, projected read).
        self._meta = read_meta(index_dir)
        if self._meta is None:
            t = self._doc_stats.to_table(columns=["doc_ord"])
            col = t["doc_ord"]
            mx = -1 if len(col) == 0 else int(
                max(c for c in col.to_pylist()))
            self._meta = {"ord_span": mx + 1, "version": "legacy"}

    def _lex_table(self, flt, columns=None):
        """Lexicon read that survives a concurrent merge's directory swap:
        a pyarrow dataset resolves file PATHS lazily, so a swap between
        dataset discovery and to_table() raises FileNotFoundError — on
        that, reopen the lexicon (current dir or aside copy, read-only)
        and retry. Postings/doc_stats/tombstones are append-only, so only
        the lexicon needs this."""
        import time

        import pyarrow as pa

        for attempt in range(3):
            try:
                return self._lexicon.to_table(filter=flt, columns=columns)
            except (FileNotFoundError, pa.lib.ArrowInvalid):
                time.sleep(0.05 * (attempt + 1))
                self._lexicon = _open_lexicon_readonly(self.index_dir)
        return self._lexicon.to_table(filter=flt, columns=columns)

    # --- stats -----------------------------------------------------------
    def n_docs(self, field: str = "content") -> int:
        return int(self.stats[field]["n_docs"])

    def ord_span(self) -> int:
        """max doc_ord + 1 — the NOT-complement universe. This is NOT
        n_docs: after merges, live count < span (tombstoned ordinals)."""
        return int(self._meta["ord_span"])

    def version(self) -> str:
        return str(self._meta.get("version", "legacy"))

    def has_tombstone(self, doc_ord: int) -> bool:
        t = self.tombstones
        if t.size == 0:
            return False
        i = int(np.searchsorted(t, doc_ord))
        return i < t.size and int(t[i]) == doc_ord

    def avgdl(self, field: str = "content") -> float:
        return float(self.stats[field]["avgdl"])

    def term_info(self, field: str, term: str) -> Optional[dict]:
        key = (field, term)
        if key not in self._term_cache:
            t = self._lex_table(
                (ds.field("field") == field) & (ds.field("term") == term))
            rows = t.to_pylist()
            self._term_cache[key] = rows[0] if rows else None
        return self._term_cache[key]

    def terms_with_prefix(self, field: str, prefix: str,
                          limit: int = 1024) -> List[str]:
        """Dictionary terms starting with ``prefix``, ascending, capped.
        The lexicon is term-sorted parquet, so the range predicate
        [prefix, prefix+0x7F) prunes to the row groups covering the prefix
        — the skip-list seek of Lucene's TermsEnum (analyzer alphabet is
        ASCII, so 0x7F upper-bounds every continuation)."""
        t = self._lex_table(
            (ds.field("field") == field)
            & (ds.field("term") >= prefix)
            & (ds.field("term") < prefix + "\x7f"),
            columns=["term"])
        terms = sorted(x for x in t["term"].to_pylist()
                       if x.startswith(prefix))
        return terms[:limit]

    def terms_in_range(self, field: str, lower: Optional[str],
                       upper: Optional[str], include_lower: bool = True,
                       include_upper: bool = True,
                       limit: int = 1024) -> List[str]:
        """Dictionary terms in the lexicographic range, ascending, capped
        — TermRangeQuery's expansion. The bounds push straight into the
        Arrow scan over the term-sorted lexicon (row-group pruning), the
        same seek the prefix scan does."""
        f = ds.field("term")
        cond = ds.field("field") == field
        if lower is not None:
            cond = cond & (f >= lower if include_lower else f > lower)
        if upper is not None:
            cond = cond & (f <= upper if include_upper else f < upper)
        t = self._lex_table(cond, columns=["term"])
        return sorted(t["term"].to_pylist())[:limit]

    def terms_wildcard(self, field: str, pattern: str,
                       limit: int = 1024) -> List[str]:
        """Dictionary terms matching a `?`/`*` wildcard pattern,
        ascending, capped — WildcardQuery's expansion. The literal prefix
        before the first wildcard prunes the scan to its range (same
        seek as terms_with_prefix); the residual match is one compiled
        regex over the banded candidates. A LEADING wildcard scans the
        field's whole dictionary — Lucene documents the same cost."""
        import fnmatch

        i = min((pattern.index(c) for c in "*?" if c in pattern),
                default=len(pattern))
        prefix = pattern[:i]
        cond = ds.field("field") == field
        if prefix:
            cond = (cond & (ds.field("term") >= prefix)
                    & (ds.field("term") < prefix + "\x7f"))
        t = self._lex_table(cond, columns=["term"])
        rx = re.compile(fnmatch.translate(pattern))
        return sorted(x for x in t["term"].to_pylist()
                      if rx.match(x))[:limit]

    def terms_fuzzy(self, field: str, text: str, max_edits: int = 2,
                    limit: int = 50) -> List[str]:
        """Dictionary terms within ``max_edits`` Levenshtein of ``text``,
        closest-first (tie: term asc), capped — FuzzyQuery's top-terms
        selection (Lucene caps at 50 too; Lucene walks a Levenshtein
        automaton over the FST, the upgrade path for a 10^9-term vocab).

        The expansion is bounded in three sound stages, so the per-term
        Python DP runs on a tiny survivor set instead of the whole
        dictionary:
          1. length band |len(t) - len(q)| <= max_edits evaluated INSIDE
             the Arrow scan (utf8_length expression filter — vectorized
             C++, nothing outside the band is materialized to Python);
          2. bag-distance lower bound (multiset character diff <= lev,
             Navarro 2001) computed as one NumPy 128-bin histogram matmul
             over the banded candidates;
          3. exact banded Levenshtein only on bag-distance survivors.
        ``_fuzzy_stats`` records (banded, bag_survivors) per call so tests
        can assert the DP touches a small fraction of the dictionary."""
        import pyarrow.compute as pc

        from lucille_spark.query.parser import levenshtein

        qlen = len(text)
        t = self._lex_table(
            (ds.field("field") == field)
            & (pc.utf8_length(ds.field("term")) >= qlen - max_edits)
            & (pc.utf8_length(ds.field("term")) <= qlen + max_edits),
            columns=["term"])
        terms = t["term"].to_pylist()
        survivors = terms
        # byte-level bag distance is only a valid lower bound when the
        # QUERY is pure ASCII: a multi-byte query char inflates the query
        # histogram and could wrongly prune an ASCII term within the edit
        # bound (e.g. 'café'~1 vs dictionary 'cafe': char lev 1, byte bag
        # 2). Skip the prefilter entirely for non-ASCII queries and run
        # the banded DP on all length-band survivors.
        if terms and text.isascii():
            # bag distance: count chars into 128 ASCII bins (analyzer
            # alphabet is ASCII; anything else folds into bin 127), then
            # lev >= max(sum(pos diff), sum(neg diff)) per term
            qv = np.frombuffer(text.encode("utf-8", "replace"),
                               dtype=np.uint8)
            qh = np.bincount(np.minimum(qv, 127), minlength=128)
            enc = [s.encode("utf-8", "replace") for s in terms]
            lens = np.array([len(e) for e in enc], dtype=np.int64)
            arr = np.frombuffer(b"".join(enc), dtype=np.uint8)
            row = np.repeat(np.arange(len(terms)), lens)
            chars = np.minimum(arr, 127).astype(np.int64)
            hist = np.zeros((len(terms), 128), dtype=np.int64)
            np.add.at(hist, (row, chars), 1)
            diff = hist - qh[None, :]
            bag = np.maximum(np.where(diff > 0, diff, 0).sum(axis=1),
                             np.where(diff < 0, -diff, 0).sum(axis=1))
            # byte-level bag distance over-counts multi-byte chars in the
            # TERM direction too, so non-ASCII terms bypass the prefilter
            # (with the ASCII-query guard above, the bound is now
            # unconditionally sound)
            survivors = [s for s, b in zip(terms, bag)
                         if b <= max_edits or not s.isascii()]
        self._fuzzy_stats = {"banded": len(terms),
                             "bag_survivors": len(survivors)}
        scored = []
        for term in survivors:
            d = levenshtein(text, term, cap=max_edits)
            if d <= max_edits:
                scored.append((d, term))
        scored.sort()
        return [term for _, term in scored[:limit]]

    def idf(self, field: str, term: str) -> float:
        info = self.term_info(field, term)
        df = info["df"] if info else 0
        n = self.n_docs(field)
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    # --- postings ---------------------------------------------------------
    def blocks(self, field: str, term: str, columns: Optional[List[str]] = None):
        """All block rows for a term, ordered by first_doc (salt ranges are
        disjoint in doc_ord, so (salt, block_seq) order == first_doc order)."""
        cols = columns or ["salt", "block_seq", "first_doc", "last_doc",
                           "n_docs", "doc_gaps", "tfs", "dls", "positions",
                           "block_max_tf", "block_max_tfnorm", "bound_avgdl"]
        t = self._postings.to_table(
            filter=(ds.field("field") == field) & (ds.field("term") == term),
            columns=cols)
        pdf = t.to_pandas()
        return pdf.sort_values(["first_doc"]).reset_index(drop=True)

    def decode_term(self, field: str, term: str, positions: bool = False):
        """Full uncompressed postings: (doc_ords, tfs, dls[, positions])."""
        if positions:
            docs, tfs, dls, flat, lens = self.decode_term_flat(field, term)
            return docs, tfs, dls, np.split(flat, np.cumsum(lens)[:-1])
        docs, tfs, dls, _, _ = self.decode_term_flat(field, term,
                                                     positions=False)
        return docs, tfs, dls

    def decode_term_flat(self, field: str, term: str, positions: bool = True):
        """(doc_ords, tfs, dls, flat_positions, lens) — decoded with ONE
        vbyte pass per column: every payload format in this index is
        block-concatenable by construction (gap streams restart with an
        absolute value per block, undone by a grouped cumsum; tf/dl/positions
        streams are self-delimiting), so a term's whole posting list decodes
        in ~4 NumPy calls regardless of block count."""
        key = (field, term, positions)
        if key in self._decode_cache:
            return self._decode_cache[key]
        pdf = self.blocks(field, term)
        empty = np.empty(0, dtype=np.uint64)
        if pdf.empty:
            out = (empty, empty, empty, empty, np.empty(0, np.int64))
        else:
            counts = pdf["n_docs"].to_numpy(dtype=np.int64)
            gaps = codecs.vbyte_decode(b"".join(pdf["doc_gaps"]))
            abs_ = np.cumsum(gaps, dtype=np.uint64)
            starts = np.cumsum(counts) - counts
            corr = np.repeat(abs_[starts] - gaps[starts], counts)
            docs = abs_ - corr
            tfs = codecs.vbyte_decode(b"".join(pdf["tfs"]))
            dls = codecs.vbyte_decode(b"".join(pdf["dls"]))
            if positions and pdf["positions"].iloc[0] is not None:
                # the positions stream's per-doc lengths ARE the tfs just
                # decoded — pass them so the marker walk is one cumsum
                # instead of a per-doc Python loop
                flat, lens = codecs.decode_positions_flat(
                    b"".join(pdf["positions"]), int(counts.sum()),
                    lens=tfs.astype(np.int64))
            else:
                flat, lens = empty, np.empty(0, np.int64)
            out = (docs, tfs, dls, flat, lens)
        if len(self._decode_cache) > 16:
            self._decode_cache.clear()
        self._decode_cache[key] = out
        return out

    def doc_values(self, field: str,
                   ords: np.ndarray) -> Optional[np.ndarray]:
        """Doc-values analogue (Lucene SortedDocValues): the stored
        single-valued field column for the given SORTED doc ords,
        POSITIONALLY aligned to them — always ``ords.size`` entries,
        with None at positions whose ord has no doc_stats row, so
        callers may zip(ords, vals) safely. doc_stats is written in
        doc_ord order, so the range filter prunes to the row groups
        covering the match span — one projected sequential read of two
        columns, never a per-term posting decode. Returns None when the
        field isn't stored (the caller falls back to postings)."""
        if ords.size == 0:
            return np.empty(0, dtype=object)
        if field not in self._doc_stats.schema.names:
            return None
        lo, hi = int(ords[0]), int(ords[-1])
        t = _retry_fnf(lambda: self._doc_stats.to_table(
            filter=(ds.field("doc_ord") >= lo)
            & (ds.field("doc_ord") <= hi),
            columns=["doc_ord", field]))
        do = np.asarray(t["doc_ord"].to_pylist(), dtype=np.int64)
        out = np.full(ords.size, None, dtype=object)
        if do.size == 0:
            return out
        order = np.argsort(do, kind="stable")
        do = do[order]
        vals = np.asarray(t[field].to_pylist(), dtype=object)[order]
        pos = np.searchsorted(do, ords)
        pos_c = np.minimum(pos, do.size - 1)
        ok = (pos < do.size) & (do[pos_c] == ords)
        out[ok] = vals[pos_c[ok]]
        return out

    def doc_ids_for_ords(self, ords: List[int]) -> Dict[int, str]:
        if not ords:
            return {}
        t = self._doc_stats.to_table(
            filter=ds.field("doc_ord").isin([int(o) for o in ords]),
            columns=["doc_ord", "doc_id"])
        return dict(zip(t["doc_ord"].to_pylist(), t["doc_id"].to_pylist()))


class TermCursor:
    """Block-at-a-time cursor with skipping: blocks are only decoded when the
    cursor actually lands in them (next_geq skips whole blocks via the
    first_doc/last_doc fences, the skip-list equivalent)."""

    def __init__(self, reader: IndexReader, field: str, term: str,
                 need_positions: bool = False, boost: float = 1.0):
        self.field, self.term = field, term
        # clause boost folds into idf: score(), max_score and the
        # block-max bounds all scale together, so WAND stays exact
        self.idf = reader.idf(field, term) * boost
        info = reader.term_info(field, term)
        self.df = info["df"] if info else 0
        self.avgdl = reader.avgdl(field)
        # Score bounds were computed with the avgdl at encode time. If the
        # corpus avgdl has since GROWN (incremental merges with longer
        # docs), actual tfnorms can exceed stored bounds by at most
        # avgdl_now/avgdl_bound (mediant inequality on
        # tf/(tf + k1(1-b+b*dl/a))), so scale bounds up by that factor;
        # a shrunken avgdl only makes stored bounds looser (still valid).
        lex_scale = 1.0
        if info and info.get("bound_avgdl"):
            lex_scale = max(1.0, self.avgdl / float(info["bound_avgdl"]))
        self.max_score = (self.idf * float(info["max_tfnorm"]) * lex_scale
                          if info else 0.0)
        self._blocks = reader.blocks(field, term)
        self._nblocks = len(self._blocks)
        self._first = self._blocks["first_doc"].to_numpy() if self._nblocks else np.empty(0)
        self._last = self._blocks["last_doc"].to_numpy() if self._nblocks else np.empty(0)
        if self._nblocks:
            bavg = self._blocks["bound_avgdl"].to_numpy()
            scale = np.maximum(1.0, self.avgdl / bavg)
            self._bmax = self._blocks["block_max_tfnorm"].to_numpy() * scale
        else:
            self._bmax = np.empty(0)
        self.bi = -1
        self.pos = 0
        self._docs = self._tfs = self._dls = None
        self.doc = SENTINEL
        if self._nblocks:
            self._load(0)

    def _load(self, bi: int):
        self.bi = bi
        row = self._blocks.iloc[bi]
        self._docs = codecs.decode_block_docs(row["doc_gaps"]).astype(np.int64)
        self._tfs = codecs.vbyte_decode(row["tfs"]).astype(np.int64)
        self._dls = codecs.vbyte_decode(row["dls"]).astype(np.int64)
        self._poss = None  # positions decoded lazily per block
        self.pos = 0
        self.doc = int(self._docs[0])

    def positions(self) -> np.ndarray:
        """Positions of the current doc (block-lazily decoded)."""
        if self._poss is None:
            raw = self._blocks.iloc[self.bi]["positions"]
            self._poss = codecs.decode_positions(raw, len(self._docs),
                                                 lens=self._tfs)
        return self._poss[self.pos]

    def next(self):
        if self.doc == SENTINEL:
            return SENTINEL
        self.pos += 1
        if self.pos < len(self._docs):
            self.doc = int(self._docs[self.pos])
        elif self.bi + 1 < self._nblocks:
            self._load(self.bi + 1)
        else:
            self.doc = SENTINEL
        return self.doc

    def next_geq(self, target: int):
        if self.doc >= target:
            return self.doc
        # skip whole blocks using fences (no decode)
        if self._last[self.bi] < target:
            nxt = int(np.searchsorted(self._last, target, side="left"))
            if nxt >= self._nblocks:
                self.doc = SENTINEL
                return SENTINEL
            self._load(nxt)
        # binary search within the (now decoded) block
        i = int(np.searchsorted(self._docs, target, side="left", sorter=None))
        if i >= len(self._docs):  # can't happen given fences, but be safe
            return self.next_geq(target + 1)
        self.pos = i
        self.doc = int(self._docs[i])
        return self.doc

    def score(self) -> float:
        tf = float(self._tfs[self.pos])
        dl = float(self._dls[self.pos])
        return self.idf * (tf / (tf + BM25_K1 * (1.0 - BM25_B
                                                 + BM25_B * dl / self.avgdl)))

    def block_max_score_at(self, target: int) -> float:
        """Upper bound on score for any doc >= current in the block covering
        target (shallow pointer move — metadata only, no decode)."""
        if self.doc == SENTINEL:
            return 0.0
        bi = self.bi
        if self._last[bi] < target:
            bi = int(np.searchsorted(self._last, target, side="left"))
            if bi >= self._nblocks:
                return 0.0
        return self.idf * float(self._bmax[bi])

    def block_last_at(self, target: int) -> int:
        """last_doc fence of the block that covers/follows target."""
        bi = self.bi
        if self._last[bi] < target:
            bi = int(np.searchsorted(self._last, target, side="left"))
            if bi >= self._nblocks:
                return SENTINEL
        return int(self._last[bi])
