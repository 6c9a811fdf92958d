"""Structured Streaming layer: decode, pipelines, monitoring, state."""

from .decode import decode_json, decode_string, explode_tokens  # noqa: F401
from .monitor import ProgressRecorder  # noqa: F401
from .swap import (  # noqa: F401
    expire_snapshots,
    export_snapshot,
    latest_snapshot,
    publish_snapshot,
    serve_read,
    snapshot_manifest,
    snapshot_versions,
)
