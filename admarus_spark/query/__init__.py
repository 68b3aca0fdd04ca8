from .ast import Filter, NAmong, Not, Query, QueryComp, Word
from .parser import ParseError, parse_query

__all__ = [
    "Filter",
    "NAmong",
    "Not",
    "ParseError",
    "Query",
    "QueryComp",
    "Word",
    "parse_query",
]
