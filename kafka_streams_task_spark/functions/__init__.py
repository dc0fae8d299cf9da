from .geohash import geohash, geohash_encode, geohash_expr, geohash_udf

__all__ = ["geohash", "geohash_encode", "geohash_expr", "geohash_udf"]
