from .weather import (
    parse_weather,
    parse_hotels,
    weather_rekey,
    hotels_rekey,
    weather_daily_avg,
    weather_by_geohash,
    enrich_hotels,
    weather_hotels_pipeline,
    latest_per_key,
)

__all__ = [
    "parse_weather",
    "parse_hotels",
    "weather_rekey",
    "hotels_rekey",
    "weather_daily_avg",
    "weather_by_geohash",
    "enrich_hotels",
    "weather_hotels_pipeline",
    "latest_per_key",
]
