"""Utilities: profiling/tracing (GGML_PERF analog), injectable logging."""
from . import logging, profiling
