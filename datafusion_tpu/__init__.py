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


def enable_compilation_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache. Operator kernels compile
    once per (plan shape, capacity); on TPU a single join pipeline can cost
    ~1 minute of XLA compile time, so caching across processes/runs is
    load-bearing for interactive use (bench.py and the CLI call this)."""
    import os

    import jax

    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001 -- no usable backend: nothing to cache
        return
    if backend != "tpu":
        # CPU AOT executables are machine-feature-specific; the cache dir
        # lives on a home filesystem shared across machines, and loading an
        # entry compiled on a different host can SIGILL. TPU executables
        # target the chip, not the host, so only those are safe to share.
        return
    path = path or os.environ.get(
        "DATAFUSION_TPU_CACHE", os.path.expanduser("~/.cache/datafusion_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    # Even in a TPU-default process, cpu-device computations compile CPU AOT
    # executables (e.g. the CPU-backend differential checks); keep those OUT
    # of the shared cache by answering "cache not used" for non-TPU backends.
    try:
        from jax._src import compilation_cache as _cc

        if getattr(_cc.is_cache_used, "__name__", "") != "_tpu_only_cache":
            _orig = _cc.is_cache_used

            def _tpu_only_cache(backend):
                if getattr(backend, "platform", None) != "tpu":
                    return False
                return _orig(backend)

            _cc.is_cache_used = _tpu_only_cache
    except Exception:  # noqa: BLE001 -- private API; cache stays best-effort
        pass

__all__ = [
    "SessionContext", "DataFrame", "Table", "Schema", "Field", "col", "lit",
    "types", "DataFusionTpuError", "ParseError", "PlanError", "ExecutionError",
]
