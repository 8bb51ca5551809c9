"""Columnar function library (noise mechanisms, vector math helpers)."""
from .semistructured import extract_json_fields  # noqa: F401,E402
