from .codec import (
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
)

__all__ = [
    "decode_postings",
    "decode_varint",
    "encode_postings",
    "encode_varint",
]
