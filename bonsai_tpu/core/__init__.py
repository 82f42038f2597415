from .spacer import Spacer, parse_spacing
from .alphabet import Alphabet, InputType, ALPHABET_MAP
from . import bitops, hashes, encode, minimize

__all__ = [
    "Spacer",
    "parse_spacing",
    "Alphabet",
    "InputType",
    "ALPHABET_MAP",
    "bitops",
    "hashes",
    "encode",
    "minimize",
]
