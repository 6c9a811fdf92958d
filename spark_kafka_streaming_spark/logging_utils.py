"""Logging control — parity for the reference's ``LoggingUtils``
(``src/main/scala/com/wargaming/dwh/LoggingUtils.scala:10-34``), which
redirects or black-holes stderr so receiver spam doesn't drown app logs.

In the new engine log routing belongs to log4j2 / the session, so this
is a thin, honest equivalent: set the Spark log level, or silence /
redirect Python-side stderr for noisy third-party code.
"""

from __future__ import annotations

import contextlib
import os
import sys
from collections.abc import Iterator

from pyspark.sql import SparkSession


def set_spark_log_level(spark: SparkSession, level: str = "WARN") -> None:
    """The supported path (replaces stderr surgery for JVM logs)."""
    spark.sparkContext.setLogLevel(level)


@contextlib.contextmanager
def stderr_to(path: str | None) -> Iterator[None]:
    """Redirect Python stderr to ``path``; ``None`` black-holes it (the
    ``BlackHoleOutputStream`` analog, ``LoggingUtils.scala:30-34``)."""
    target = open(path, "a") if path else open(os.devnull, "w")
    old = sys.stderr
    sys.stderr = target
    try:
        yield
    finally:
        sys.stderr = old
        target.close()
