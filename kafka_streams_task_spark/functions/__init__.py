from .geohash import geohash, geohash_encode, geohash_expr, geohash_udf
from .text import clean_text, html_to_text
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
    "clean_text",
    "html_to_text",
    "extract_host",
    "normalize_url",
    "registered_domain",
    "registered_domain_of_host",
]
