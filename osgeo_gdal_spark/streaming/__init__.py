"""Structured Streaming wrappers (SURVEY §2.N — an extension, not a port:
GDAL is batch-only; our per-row stages are stateless so streaming is thin).
"""
