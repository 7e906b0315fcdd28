"""headson_spark — a PySpark-native streaming preview/analytics engine with
the query and data-processing capabilities of kantord/headson, re-expressed
Spark-first (DataFrame/SQL + Arrow-vectorized kernels + Structured
Streaming)."""

__version__ = "0.1.0"

from .kernel import summarize, summarize_value  # noqa: F401
