from bqetl_spark.plans.etl_nested import bqetl_nested, nested_output_schema
from bqetl_spark.plans.etl_simple import bqetl_simple, simple_output_schema

__all__ = ["bqetl_simple", "simple_output_schema",
           "bqetl_nested", "nested_output_schema"]
