"""Columnar function library (noise mechanisms, vector math helpers)."""
