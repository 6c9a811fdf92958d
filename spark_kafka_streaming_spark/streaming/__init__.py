"""Structured Streaming layer: decode, pipelines, monitoring, state."""

from .decode import decode_json, decode_string, explode_tokens  # noqa: F401
from .monitor import ProgressRecorder  # noqa: F401
