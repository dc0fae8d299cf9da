from .geohash import geohash, geohash_encode, geohash_expr, geohash_udf
from .url import (
    extract_host,
    normalize_url,
    registered_domain,
    registered_domain_of_host,
)

__all__ = [
    "geohash",
    "geohash_encode",
    "geohash_expr",
    "geohash_udf",
    "extract_host",
    "normalize_url",
    "registered_domain",
    "registered_domain_of_host",
]
