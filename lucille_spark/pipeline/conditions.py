"""Per-stage conditional execution (reference: core/Condition.java:17-143,
merged in core/Stage.java:72-93, gated at core/Stage.java:141-146).

A Condition tests one or more fields against a value set with must /
must_not polarity; a stage runs on a row only when all its conditions pass
(``all``) or any does (``any``). In Spark this is a boolean Column the stage
uses in ``F.when(cond, transformed).otherwise(original)`` — zero cost on
non-matching rows, and Catalyst folds it away when there are no conditions.

Dropped/skipped rows are always excluded (core/Stage.java:142-144).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DROPPED = "___dropped"
SKIPPED = "___skipped"
CHILDREN = "___children"
RESERVED = (DROPPED, SKIPPED, CHILDREN)


@dataclass
class Condition:
    fields: Sequence[str]
    values: Sequence[str] = ()
    operator: str = "must"      # must | must_not
    policy: str = "any"         # any field matches | all fields match
    # valuesPath (core/Condition.java:62-75): load the value set from a
    # file, one value per line — resolved once at plan time on the driver
    values_path: Optional[str] = None

    def _value_set(self) -> Sequence[str]:
        if self.values_path:
            with open(self.values_path) as fh:
                return [line.rstrip("\n") for line in fh
                        if line.rstrip("\n")]
        return list(self.values)

    def column(self, df: DataFrame) -> Column:
        values = self._value_set()
        per_field = []
        for f_name in self.fields:
            if f_name not in df.columns:
                per_field.append(F.lit(False))
                continue
            col = F.col(f_name)
            if values:
                c = col.isin(values)
            else:
                c = col.isNotNull()
            per_field.append(c)
        combined = per_field[0]
        for c in per_field[1:]:
            combined = (combined | c) if self.policy == "any" else (combined & c)
        return ~combined if self.operator == "must_not" else combined


def guard_column(df: DataFrame, conditions: Optional[List[Condition]]) -> Column:
    """True where the stage should run: conditions pass, row not dropped/skipped."""
    cond = F.lit(True)
    for c in conditions or []:
        cond = cond & c.column(df)
    if DROPPED in df.columns:
        cond = cond & ~F.coalesce(F.col(DROPPED), F.lit(False))
    if SKIPPED in df.columns:
        cond = cond & ~F.coalesce(F.col(SKIPPED), F.lit(False))
    return cond
