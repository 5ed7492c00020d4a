"""Pure-Python extraction core (no Spark imports — executor-shippable)."""

from cl_readability_spark.core.extract import ExtractResult, extract
from cl_readability_spark.core.readerable import is_readerable

__all__ = ["ExtractResult", "extract", "is_readerable"]
