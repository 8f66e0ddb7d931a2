from bqetl_spark.operators.joins import LookupDescription, apply_lookups, inner_join, lookup
from bqetl_spark.operators.nest import nest, split_repeated
from bqetl_spark.operators.project import project_to_schema

__all__ = [
    "inner_join",
    "lookup",
    "LookupDescription",
    "apply_lookups",
    "nest",
    "split_repeated",
    "project_to_schema",
]
