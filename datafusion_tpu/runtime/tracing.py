"""Execution tracing: operator spans -> chrome://tracing JSON.

Capability analog of the reference's tracing hooks (JoinSetTracer,
datafusion/common-runtime/src/trace_utils.rs:10 and the
execution_monitoring examples): a process-global tracer records operator
execution spans; dump_chrome_trace() writes a file loadable in
chrome://tracing / Perfetto."""
from __future__ import annotations

import json
import threading
import time
from contextlib import contextmanager
from typing import List, Optional


class SpanTracer:
    def __init__(self):
        self._lock = threading.Lock()
        self.events: List[dict] = []
        self.enabled = False
        self._t0 = time.perf_counter()

    def reset(self):
        with self._lock:
            self.events = []
            self._t0 = time.perf_counter()

    @contextmanager
    def span(self, name: str, **args):
        if not self.enabled:
            yield
            return
        start = time.perf_counter()
        try:
            yield
        finally:
            end = time.perf_counter()
            with self._lock:
                self.events.append({
                    "name": name, "ph": "X", "pid": 1,
                    "tid": threading.get_ident() % 100000,
                    "ts": (start - self._t0) * 1e6,
                    "dur": (end - start) * 1e6,
                    "args": args,
                })

    def dump_chrome_trace(self, path: str):
        with self._lock:
            payload = {"traceEvents": self.events, "displayTimeUnit": "ms"}
        with open(path, "w") as f:
            json.dump(payload, f)


TRACER = SpanTracer()


def enable_tracing():
    TRACER.enabled = True
    TRACER.reset()


def disable_tracing():
    TRACER.enabled = False
