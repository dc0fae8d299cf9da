from .kafka import read_kafka_stream, read_kafka_batch, write_kafka_stream, kafka_available
from .files import read_json_stream, read_parquet_stream

__all__ = [
    "read_kafka_stream",
    "read_kafka_batch",
    "write_kafka_stream",
    "kafka_available",
    "read_json_stream",
    "read_parquet_stream",
]
