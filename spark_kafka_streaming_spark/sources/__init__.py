"""Sources: batch Parquet/CSV/JSON scans, Kafka (stream + batch), rate."""

from .batch import TABLES, load_table, register_views  # noqa: F401
