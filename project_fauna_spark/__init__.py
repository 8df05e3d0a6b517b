"""project_fauna_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine exposing the query and data-processing
capabilities of the reference ETL pipeline (``meghna0593/Project-Fauna``,
a 4-stage extract/transform/load dataflow), re-expressed as DataFrame /
Catalyst plans, plus the full relational + LLM-data-pipeline operator
surface (joins, aggregations, windows, dedup, similarity search, text
analysis, streaming windows) designed for 100 TB scale.

Everything here is built on the public Apache Spark / PySpark API.
"""

from project_fauna_spark.session import get_spark, configure_session
from project_fauna_spark.io import TABLES, load_table, load_all

__all__ = ["get_spark", "configure_session", "TABLES", "load_table", "load_all"]
__version__ = "0.1.0"
