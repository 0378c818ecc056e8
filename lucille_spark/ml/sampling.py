"""Deterministic corpus sampling and mixing for training-data pipelines.

Random sampling (df.sample) is irreproducible across runs/planners, which
is poison for dataset curation: re-running the pipeline must select the
SAME documents. These operators decide membership from a pure function of
the document id — the Rabin-Karp polynomial hash the dedup plane already
uses (ml/dedup._inline_tid) — so sampling is reproducible anywhere,
embarrassingly parallel (no shuffle: the filter is narrow), stable under
repartitioning, and EXACTLY replayable by the DuckDB gate oracles.

The hash maps ids ~uniformly onto [0, P); membership is
``hash(id) mod 10_000 < rate * 10_000``, so realized rates converge to
the requested rate (law of large numbers over ids) and a sample at rate
r1 is a SUBSET of the sample at r2 > r1 — nested samples for scaling-law
runs come for free.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucille_spark.ml.dedup import _inline_tid

_BUCKETS = 10_000
# Lehmer/MINSTD multiplier: one multiplicative avalanche step mod P after
# the polynomial hash. The raw polynomial is nearly linear in the LAST
# character, so short sequential ids ("0","1","2",...) land in adjacent
# buckets and realized rates skew (observed 0.30 for a requested 0.20);
# multiplying by 48271 mod 2^31-1 scatters consecutive values ~uniformly
# (measured 0.202/0.504 for 0.2/0.5 on 2k sequential ids) while staying
# exact integer arithmetic the SQL oracle replays.
_MIX = 48271
_P = 2147483647


def _bucket(id_col_name: str):
    """Deterministic bucket in [0, 10000) from the id column (any type —
    cast through string so int and string ids hash identically to their
    textual form, which the SQL oracle reproduces with CAST AS VARCHAR)."""
    return (_inline_tid(F.col(id_col_name).cast("string"))
            * F.lit(_MIX)) % F.lit(_P) % F.lit(_BUCKETS)


def deterministic_sample(df: DataFrame, id_col: str,
                         rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, decided purely by hash(id) — reproducible,
    shuffle-free, nested across rates."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    # round(), not int(): float error makes 0.29 * 10000 == 2899.999...,
    # and truncation would under-sample by one bucket (and disagree with
    # any oracle that computes the threshold exactly)
    return df.filter(_bucket(id_col) < round(rate * _BUCKETS))


def weighted_sample(df: DataFrame, id_col: str, part_col: str,
                    weights: Dict[str, float],
                    default_rate: float = 0.0) -> DataFrame:
    """Per-stratum sampling rates — the dataset-mixing primitive: one
    pass assembles a training mix like {python: 1.0, markdown: 0.2}.
    Rows whose ``part_col`` value is not in ``weights`` use
    ``default_rate`` (0.0 = drop). Pure narrow filter, no shuffle; the
    same id keeps/drops identically in every run and at every
    parallelism."""
    for k, v in weights.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"weight for {k!r} must be in [0, 1], got {v}")
    rate = F.lit(round(default_rate * _BUCKETS))
    for k in sorted(weights):
        rate = F.when(F.col(part_col) == F.lit(k),
                      F.lit(round(weights[k] * _BUCKETS))).otherwise(rate)
    return df.filter(_bucket(id_col) < rate)
