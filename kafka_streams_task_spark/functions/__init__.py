from .geohash import geohash, geohash_encode, geohash_expr, geohash_udf
from .phonetic import soundex_candidates, soundex_expr
from .text import (
    clean_text,
    html_to_text,
    segment_nospace_chars,
    tokens_unicode,
)
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
    "soundex_expr",
    "soundex_candidates",
    "clean_text",
    "html_to_text",
    "segment_nospace_chars",
    "tokens_unicode",
    "extract_host",
    "normalize_url",
    "registered_domain",
    "registered_domain_of_host",
]
