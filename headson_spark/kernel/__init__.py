"""headson_spark.kernel — pure pandas/NumPy/Python re-implementation of the
headson budgeted-preview algorithm (no Spark imports; usable standalone and
inside Arrow-vectorized UDFs)."""

from .api import summarize, summarize_value, summarize_many  # noqa: F401
from .render import RenderConfig, render_top_k  # noqa: F401
from .order import build_order  # noqa: F401
from . import arena  # noqa: F401
