from .pg_dialect import (
    age_micros,
    at_time_zone,
    nullif_,
    pg_to_java_pattern,
    size_pretty,
    size_pretty_int,
    to_char,
)

__all__ = [
    "age_micros",
    "at_time_zone",
    "nullif_",
    "pg_to_java_pattern",
    "size_pretty",
    "size_pretty_int",
    "to_char",
]
