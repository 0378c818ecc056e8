"""Deduplication for large-scale training-data pipelines.

All variants are pure DataFrame plans (no Python in the hot path) designed
for the 100 TB case:

- exact:     sha256 hash-groupBy (one shuffle on the hash — uniform keys).
- MinHash:   shingle → arithmetic min-hash signature → banded LSH →
             bucket-join for candidate pairs (the classic
             Broder/LSH construction). Hashing is plain integer arithmetic
             over dictionary token ids so it is reproducible anywhere
             (including the DuckDB oracle).
- SimHash:   bitwise majority of per-token hashes weighted by tf.
- n-gram Jaccard: exact pairwise verification within a blocking key.

Token ids default to the INLINE hash path (``hash_ids=True``): tid is a
pure function of the term (Rabin-Karp polynomial hash mod 2^31-1), so no
token dictionary exists anywhere in the plan — no global sort, no join, no
broadcast. That is the 100 TB recipe AND the oracle-verified one: the hash
is exact integer arithmetic DuckDB reproduces step-for-step. The dense
sorted-dictionary variant (``hash_ids=False``) remains for corpora that
want compact ids (e.g. feeding an embedding table).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucille_spark.analysis import tokenize_col

MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
HASH_R = 1000003  # polynomial-hash radix (prime, > any code point)


def _splitmix(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _hash_params(n_hashes: int):
    """Deterministic affine-hash coefficients. The multipliers must be
    large relative to P so (a*tid + b) mod P actually wraps — small
    multipliers make min() monotone in tid and every hash degenerates to
    'smallest token id'. Constants stay < 2^31 so a*tid fits int64 even at
    10^9-term vocabularies."""
    return [((_splitmix(2 * j + 1) % (MINHASH_P - 1)) + 1,
             _splitmix(2 * j + 2) % MINHASH_P)
            for j in range(n_hashes)]


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(content_sha256, n_docs, keeper_id) per duplicate group (n>1 = dups)."""
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha256"))
    return hashed.groupBy("content_sha256").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("keeper_id"))


def dedupe_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group."""
    w = Window.partitionBy(
        F.sha2(F.col(text_col).cast("binary"), 256)).orderBy(id_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def token_dictionary(df: DataFrame, text_col: str,
                     hash_ids: bool = False) -> DataFrame:
    """(term, tid) — dense ids by sorted term, or hashed ids.

    ``hash_ids=True`` is the scale path: tid = polynomial hash of the term
    (:func:`_inline_tid`) — no global single-partition rank sort anywhere
    in the plan, and downstream consumers don't even need this table (they
    compute the tid inline). The dense sorted variant exists for consumers
    that want compact contiguous ids; it is NOT the dedup default.
    """
    terms = (df.select(F.explode(tokenize_col(F.col(text_col))).alias("term"))
             .distinct())
    if hash_ids:
        # bounded to [0, P) so the downstream (a*tid + b) stays in int64;
        # same value as the joinless _inline_tid used by the scale path
        return terms.withColumn("tid", _inline_tid(F.col("term")))
    w = Window.orderBy("term")
    return terms.withColumn("tid", F.row_number().over(w).cast("long"))


def _inline_tid(term_col):
    """The hash_ids token id computed INLINE (identical to
    token_dictionary(hash_ids=True) values): no dictionary table, no join,
    no broadcast — the 100-TB recipe. A 10^9-term vocabulary neither sorts
    globally nor fits a broadcast; with hashed ids the id is a pure
    function of the term so the dictionary disappears from the plan.

    The hash is a Rabin-Karp polynomial over code points,
    ``acc = (acc * R + code) mod P`` (P = 2^31-1, R = 1000003), reduced
    mod P at every step so intermediates stay < 2^62 (int64-safe, no ANSI
    overflow). Chosen over xxhash64 because the arithmetic is plain
    integer SQL the DuckDB oracles replay exactly — the scale path is
    oracle-verified, not just tested-equivalent. Whole-stage-codegen
    JVM-side (sequence + aggregate + ascii/substring lambdas)."""
    acc = F.aggregate(
        F.sequence(F.lit(1), F.length(term_col)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * F.lit(HASH_R)
                        + F.ascii(F.substring(term_col, i, F.lit(1))))
        % F.lit(MINHASH_P))
    # Spark's sequence(1, 0) yields [1, 0] (auto step -1), so guard the
    # empty string explicitly (tokenizers never emit it, but stay total)
    return F.when(F.length(term_col) == 0, F.lit(0).cast("long")) \
            .otherwise(acc)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_hashes: int = 8,
                       tokdict: Optional[DataFrame] = None,
                       hash_ids: bool = True) -> DataFrame:
    """(doc_id, h_0..h_{n-1}) — min over distinct tokens of (a*tid+b) mod P.

    Default ``hash_ids=True``: token ids come from :func:`_inline_tid`
    with NO dictionary join at all — the scale path, and the one the
    DuckDB gate oracles verify (the polynomial tid is exact integer
    arithmetic both engines compute identically). ``hash_ids=False`` uses
    dense sorted-dictionary ids; near-dup verdicts are the same either
    way (tests/test_round3_fixes.py)."""
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_col(F.col(text_col)))).alias("term"))
    if tokdict is not None:
        joined = ex.join(F.broadcast(tokdict), "term")
    elif hash_ids:
        joined = ex.withColumn("tid", _inline_tid(F.col("term")))
    else:
        joined = ex.join(F.broadcast(token_dictionary(df, text_col)), "term")
    aggs = [
        F.min((F.lit(a) * F.col("tid") + F.lit(b)) % F.lit(MINHASH_P))
        .cast("long").alias(f"h_{j}")
        for j, (a, b) in enumerate(_hash_params(n_hashes))
    ]
    return joined.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, n_hashes: int = 8,
                        band_size: int = 2,
                        max_bucket_size: Optional[int] = None) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    The band-bucket join is the scale move: instead of O(n^2) comparisons,
    one shuffle on (band_id, band_key).

    ``max_bucket_size`` is the hot-bucket guard for real corpora: one
    degenerate bucket (e.g. every doc carrying the same license boilerplate
    signature band) makes the self-join quadratic. Buckets larger than the
    cap are DROPPED from candidate generation and the drop is logged —
    their members are better caught by exact dedup or a dedicated
    boilerplate pass than by an n^2 explosion. Default None = exact (the
    oracle-matched gate path)."""
    n_bands = n_hashes // band_size
    bands = signatures.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws("_", *[F.col(f"h_{b * band_size + r}")
                                   for r in range(band_size)]).alias("band_key"))
            for b in range(n_bands)
        ])).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    if max_bucket_size is not None:
        counts = (bands.groupBy("band_id", "band_key")
                  .agg(F.count("*").alias("_n")))
        hot = counts.filter(F.col("_n") > max_bucket_size)
        n_hot = hot.count()
        if n_hot:
            import logging

            biggest = hot.agg(F.max("_n")).collect()[0][0]
            logging.getLogger(__name__).warning(
                "lsh_candidate_pairs: dropping %d hot bucket(s) over cap "
                "%d (largest=%d docs) from candidate generation",
                n_hot, max_bucket_size, biggest)
            bands = bands.join(F.broadcast(hot.select("band_id", "band_key")),
                               ["band_id", "band_key"], "left_anti")
    left = bands.alias("l")
    right = bands.alias("r")
    return (left.join(right, ["band_id", "band_key"])
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16,
            tokdict: Optional[DataFrame] = None,
            hash_ids: bool = True) -> DataFrame:
    """(doc_id, simhash) — tf-weighted bit-majority fingerprint.

    Bit j of a token hash v is floor(v / 2^j) mod 2 (pure arithmetic, so the
    DuckDB oracle reproduces it); v = (tid * 2654435761) mod 2^bits.
    Default ``hash_ids=True`` = inline hashed token ids (:func:`_inline_tid`),
    no dictionary join — the oracle-verified scale path."""
    ex = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokenize_col(F.col(text_col))).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf")))
    if tokdict is not None:
        joined = ex.join(F.broadcast(tokdict), "term")
    elif hash_ids:
        joined = ex.withColumn("tid", _inline_tid(F.col("term")))
    else:
        joined = ex.join(F.broadcast(token_dictionary(df, text_col)), "term")
    joined = joined.withColumn(
        "v", (F.col("tid") * F.lit(2654435761)) % F.lit(2 ** bits))
    bit_sums = joined.groupBy("doc_id").agg(*[
        F.sum(F.col("tf") * (2 * (F.floor(F.col("v") / F.lit(2 ** j)) % 2) - 1)
              ).alias(f"s_{j}")
        for j in range(bits)
    ])
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.col(f"s_{j}") > 0, F.lit(2 ** j)).otherwise(0)
    return bit_sums.select("doc_id", out.alias("simhash"))


def shingles_col(text_col: str, n: int = 3):
    """Array of n-gram token shingles (strings), JVM-side."""
    toks = tokenize_col(F.col(text_col))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(n)]))
    ).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_col: str, n: int = 3,
                        threshold: float = 0.0) -> DataFrame:
    """Exact pairwise n-gram Jaccard within a blocking key.

    (doc_a, doc_b, jaccard) for pairs above threshold. The blocking column
    bounds the quadratic term; for unblocked corpora use
    minhash + lsh_candidate_pairs first and this as the verify step."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(block_col).alias("block"),
                     F.array_distinct(shingles_col(text_col, n)).alias("sh"))
    a, b = base.alias("a"), base.alias("b")
    pairs = (a.join(b, "block")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b")))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (pairs.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def verify_candidate_pairs(df: DataFrame, pairs: DataFrame, id_col: str,
                           text_col: str, n: int = 3,
                           threshold: float = 0.0) -> DataFrame:
    """The verify step after LSH: exact n-gram Jaccard computed ONLY for
    the candidate pairs (doc_a, doc_b) — two hash joins against the
    shingle table instead of any quadratic blow-up. This is the full
    MinHash→LSH→verify near-dup pipeline's final stage; at 100 TB the
    shingle table is computed once and reused for both joins."""
    sh = df.select(F.col(id_col).alias("_vid"),
                   F.array_distinct(shingles_col(text_col, n)).alias("_sh"))
    out = (pairs
           .join(sh.select(F.col("_vid").alias("doc_a"),
                           F.col("_sh").alias("sh_a")), "doc_a")
           .join(sh.select(F.col("_vid").alias("doc_b"),
                           F.col("_sh").alias("sh_b")), "doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (out.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def near_dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_id) connected components over verified near-dup
    pairs — the transitive step every real dedup run needs (chains A-B,
    B-C are ONE cluster; pairwise keep-one gets them wrong).

    Iterative min-label propagation: every node starts labelled with its
    own id; each round, a node's label becomes the min of its own and all
    neighbours' labels; converged when no label changes. cluster_id is
    therefore the MIN doc_id in the component — the same keeper
    convention as :func:`dedupe_exact`.

    Scale shape: each round is one hash-partitioned join (edges x labels,
    both keyed on doc id) + one min-groupBy — no collect, no driver-side
    graph. Rounds needed = component diameter, and near-dup components
    are shallow (dup clusters are quasi-cliques: LSH emits most in-pair
    edges directly), so the loop converges in a handful of rounds;
    ``max_iter`` bounds it and the convergence check is a count of
    changed labels. Labels are localCheckpoint()ed each round so the
    plan doesn't grow with iterations (and AQE can't re-lay partitions
    under the self-referencing lineage)."""
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst")))
             .distinct())
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        prop = (edges.join(labels,
                           edges["src"] == labels["doc_id"])
                .select(F.col("dst").alias("doc_id"), "cluster_id"))
        new_labels = (prop.unionByName(labels)
                      .groupBy("doc_id")
                      .agg(F.min("cluster_id").alias("cluster_id"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                   .count())
        # release the PREVIOUS round's checkpointed label table: without
        # this, up to max_iter label snapshots pile up in executor
        # storage for the lifetime of the job (ADVICE r6)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedupe_near(df: DataFrame, id_col: str, text_col: str,
                threshold: float = 0.7, n: int = 3, n_hashes: int = 8,
                band_size: int = 2,
                max_bucket_size: Optional[int] = None) -> DataFrame:
    """Keep one doc per near-duplicate cluster: the full MinHash → banded
    LSH → exact-Jaccard verify → connected components → keep-min-id
    pipeline as one call (the near-dup twin of :func:`dedupe_exact`).

    Keeper = min doc_id per cluster (== cluster_id from
    :func:`near_dup_clusters`); everything else in a cluster is dropped
    via one left-anti join — the corpus never does anything quadratic:
    LSH bounds candidates, verify runs only on candidates, and the
    closure runs only on verified pairs (tiny relative to the corpus)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes)
    cands = lsh_candidate_pairs(sigs, n_hashes=n_hashes,
                                band_size=band_size,
                                max_bucket_size=max_bucket_size)
    verified = verify_candidate_pairs(df, cands, id_col, text_col, n=n,
                                      threshold=threshold)
    clusters = near_dup_clusters(verified.select("doc_a", "doc_b"))
    drop = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
            .select(F.col("doc_id").alias(id_col)))
    return df.join(drop, id_col, "left_anti")
