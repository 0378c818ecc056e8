"""Declarative pipeline: config → composed DataFrame transformation chain.

The reference builds its pipeline from HOCON ``pipelines[].stages[]``
(core/Pipeline.java:84-122, reflective stage construction at
core/Stage.java:342-360) and runs documents through it one at a time
(core/Pipeline.java:151-159). Here the config builds a *logical plan*: each
stage contributes column expressions, Catalyst fuses the whole chain into
one codegen'd pass — the vectorized equivalent of Lucille's iterator chain.

Config shape (dict / parsed YAML-or-HOCON-lite):

    {"stages": [
        {"class": "NormalizeText", "source": "title", "mode": "lowercase",
         "conditions": [{"fields": ["lang"], "values": ["en"]}]},
        ...
    ]}

Terminal semantics (core/Worker.java:124-139): ``finish()`` drops rows
marked ``___dropped`` (dropped docs are never indexed); rows marked
``___skipped`` pass through to the sink but skip intermediate stages.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucille_spark.pipeline.conditions import DROPPED, Condition
from lucille_spark.pipeline.stages import STAGES, Stage


class Pipeline:
    def __init__(self, stages: Sequence[Stage]):
        self.stages = list(stages)

    @classmethod
    def from_config(cls, config: Dict) -> "Pipeline":
        stages: List[Stage] = []
        for spec in config.get("stages", []):
            spec = dict(spec)
            name = spec.pop("class", None) or spec.pop("name")
            if name not in STAGES:
                raise ValueError(
                    f"unknown stage {name!r}; known: {sorted(STAGES)}")
            conds = [Condition(**c) for c in spec.pop("conditions", [])]
            stage_cls = STAGES[name]
            fields = {f.name for f in dataclasses.fields(stage_cls)}
            unknown = set(spec) - fields
            if unknown:
                raise ValueError(
                    f"stage {name}: unknown config {sorted(unknown)} "
                    f"(legal: {sorted(fields - {'conditions'})})")
            stages.append(stage_cls(conditions=conds or None, **spec))
        return cls(stages)

    @classmethod
    def validate(cls, config: Dict) -> List[str]:
        """Config validation mode (reference Runner.java:177-209 -validate):
        returns a list of errors instead of raising."""
        errors = []
        for i, spec in enumerate(config.get("stages", [])):
            try:
                cls.from_config({"stages": [spec]})
            except Exception as e:
                errors.append(f"stage[{i}]: {e}")
        return errors

    def apply(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage.apply(df)
        return df

    def finish(self, df: DataFrame) -> DataFrame:
        """Terminal filter: dropped docs never reach the sink
        (core/Worker.java:134-135)."""
        out = self.apply(df)
        if DROPPED in out.columns:
            out = out.filter(
                ~F.coalesce(F.col(DROPPED), F.lit(False))).drop(DROPPED)
        return out
