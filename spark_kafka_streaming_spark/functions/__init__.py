"""Engine function library: exact-decimal math, text, vectors, JSON, Avro."""

from .exact import dec, dsum, dsum_expr  # noqa: F401
