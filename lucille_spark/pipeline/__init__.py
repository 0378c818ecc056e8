from lucille_spark.pipeline.pipeline import Pipeline
from lucille_spark.pipeline.conditions import Condition

__all__ = ["Pipeline", "Condition"]
