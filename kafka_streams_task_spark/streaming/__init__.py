from .topology import weather_rollup_stream, weather_hotels_stream
from .changelog import latest_per_key_stream

__all__ = ["weather_rollup_stream", "weather_hotels_stream", "latest_per_key_stream"]
