from .checks import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    wholestage_codegen_spans,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filter",
    "has_take_ordered",
    "wholestage_codegen_spans",
]
