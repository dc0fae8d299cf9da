from .kafka import (
    read_kafka_stream,
    read_kafka_batch,
    write_kafka_stream,
    kafka_available,
    to_wire,
    from_wire,
)
from .files import read_json_stream, read_parquet_stream

__all__ = [
    "read_kafka_stream",
    "read_kafka_batch",
    "write_kafka_stream",
    "kafka_available",
    "to_wire",
    "from_wire",
    "read_json_stream",
    "read_parquet_stream",
]
