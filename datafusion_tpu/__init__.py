"""datafusion_tpu: a TPU-native vectorized SQL query engine (JAX/XLA/Pallas)
with the capabilities of Apache DataFusion. See README.md and SURVEY.md."""

from .common import types  # noqa: F401
from .common.errors import (DataFusionTpuError, ExecutionError, ParseError,  # noqa: F401
                            PlanError)
from .common.schema import Field, Schema  # noqa: F401
from .context import DataFrame, SessionContext  # noqa: F401
from .data.table import Table  # noqa: F401
from .expr.nodes import col, lit  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "SessionContext", "DataFrame", "Table", "Schema", "Field", "col", "lit",
    "types", "DataFusionTpuError", "ParseError", "PlanError", "ExecutionError",
]
