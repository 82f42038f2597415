"""Alphabets and input-type traits.

Equivalent of the reference's alphabet system
(/root/reference/include/bonsai/alphabet.h:17-161) and InputType traits
(/root/reference/include/bonsai/rhtraits.h:7-153), redesigned as host-side
numpy lookup tables that are gathered on device.

An Alphabet maps each of the 256 byte values to a small integer code, or -1
for "ambiguous" (triggers the encoder's window-restart semantics).  Alphabets
are built from comma-grouped strings: "A,C,D,EQ" maps A->0, C->1, D->2,
E->3, Q->3 (both cases).

Note on aliases: the reference declares alias strings like "OU:KC" (map
pyrrolysine->lysine, selenocysteine->cysteine) but its constexpr LUT builder
indexes the table by the *code* of the destination character rather than the
character itself (alphabet.h:51-54), so the aliases resolve to -1 and are
behavioral no-ops.  We reproduce that behavior (aliases ignored) for parity.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum

import numpy as np


@dataclasses.dataclass(frozen=True)
class Alphabet:
    name: str
    setstr: str
    padding: bool = False

    @property
    def lut(self) -> np.ndarray:
        return _build_lut(self.setstr, self.padding)

    @property
    def n_classes(self) -> int:
        if not self.setstr:
            return 256
        return self.setstr.count(",") + 1

    def encode_bytes(self, data: bytes) -> np.ndarray:
        """Translate a byte string to codes (int8, -1 = ambiguous)."""
        arr = np.frombuffer(data, dtype=np.uint8)
        return self.lut[arr]


def _build_lut(setstr: str, padding: bool) -> np.ndarray:
    lut = np.full(256, -1, dtype=np.int8)
    if not setstr:  # BYTES: identity (+ padding offset)
        base = np.arange(256) + int(padding)
        return base.astype(np.int8)
    code = int(padding)
    for group in setstr.split(","):
        for ch in group:
            lut[ord(ch) | 32] = code      # lower case
            lut[ord(ch) & 0xDF] = code    # upper case
        code += 1
    return lut


# --- Named alphabets (groupings from alphabet.h:106-133) -------------------
BYTES = Alphabet("Bytes", "")
AMINO20 = Alphabet("Standard20", "A,C,D,E,F,G,H,I,K,L,M,N,P,Q,R,S,T,V,W,Y")
SEB14 = Alphabet("SE-B(14)", "A,C,D,EQ,FY,G,H,IV,KR,LM,N,P,ST,W")
SEB10 = Alphabet("SE-B(10)", "AST,C,DN,EQ,FY,G,HW,ILMV,KR,P")
SEV10 = Alphabet("SE-V(10)", "AST,C,DEN,FY,G,H,ILMV,KQR,P,W")
SOLISD = Alphabet("Solis-D", "AM,C,DNS,EKQR,F,GP,HT,IV,LY,W")
SOLISG = Alphabet("Solis-G", "AEFIKLMQRVW,C,D,G,H,N,P,S,T,Y")
MURPHY = Alphabet("Murphy", "A,C,DENQ,FWY,G,H,ILMV,KR,P,ST")
LIA10 = Alphabet("Li-A(10)", "AC,DE,FWY,G,HN,IV,KQR,LM,P,ST")
LIB10 = Alphabet("Li-B(10)", "AST,C,DEQ,FWY,G,HN,IV,KR,LM,P")
SEB8 = Alphabet("SE-B(8)", "AST,C,DHN,EKQR,FWY,G,ILMV,P")
SEB6 = Alphabet("SE-B(6)", "AST,CP,DHNEKQR,FWY,G,ILMV")
DAYHOFF = Alphabet("Dayhoff", "AGPST,C,DENQ,FWY,HKR,ILMV")
DNA4 = Alphabet("DNA4", "A,C,G,T")
DNA5 = Alphabet("DNA5", "A,C,G,T,NMRWSYKVHDB")
DNA2KETAMINE = Alphabet("DNA2", "ACM,KGT")
DNA2PYRPUR = Alphabet("DNA2", "AGR,YCT")
DNA2METHYL = Alphabet("DNAMETH", "C,AGT")

ALPHABET_MAP = {
    "BYTES": BYTES,
    "AMINO20": AMINO20,
    "AMINO": AMINO20,
    "PROTEIN": AMINO20,
    "SEB8": SEB8,
    "SEB10": SEB10,
    "SEB14": SEB14,
    "SEV10": SEV10,
    "MURPHY": MURPHY,
    "LIA10": LIA10,
    "LIB10": LIB10,
    "SEB6": SEB6,
    "DAYHOFF": DAYHOFF,
    "DNAMETH": DNA2METHYL,
    "C": DNA2METHYL,
    "KETO": DNA2KETAMINE,
    "PURPYR": DNA2PYRPUR,
    "DNA4": DNA4,
    "DNA": DNA4,
    "DNA5": DNA5,
}


class InputType(IntEnum):
    """Sequence encodings (rhtraits.h:7-20)."""

    DNA = 0
    PROTEIN = 1
    PROTEIN20 = 2
    PROTEIN_3BIT = 3
    PROTEIN_14 = 4
    PROTEIN_6 = 5
    DNA2 = 6
    DNAC = 7


# per-type (alphabet, radix, bits-if-power-of-two, chars-per-u64)
_TRAITS = {
    InputType.DNA: (DNA4, 4, 2, 32),
    InputType.PROTEIN: (BYTES, 256, 8, 8),
    InputType.PROTEIN20: (AMINO20, 20, None, 14),
    InputType.PROTEIN_3BIT: (SEB8, 8, 3, 22),
    InputType.PROTEIN_14: (SEB14, 14, None, 16),
    InputType.PROTEIN_6: (SEB6, 6, None, 24),
    InputType.DNA2: (DNA2PYRPUR, 2, 1, 32),
    InputType.DNAC: (DNA2METHYL, 2, 1, 32),
}


def traits(it: InputType):
    return _TRAITS[InputType(it)]


def alphabet_of(it: InputType) -> Alphabet:
    return _TRAITS[InputType(it)][0]


def radix_of(it: InputType) -> int:
    return _TRAITS[InputType(it)][1]


def bits_of(it: InputType):
    """Bits per char if the radix is a power of two, else None."""
    return _TRAITS[InputType(it)][2]


def nper64(it: InputType) -> int:
    return _TRAITS[InputType(it)][3]


def kmer_mask(it: InputType, k: int) -> int:
    """Valid-kmer mask/modulus (rhtraits.h:51-68).

    Power-of-two radixes use a bit mask (kmer &= mask); other radixes use the
    modulus radix**k (kmer %= mask).
    """
    it = InputType(it)
    b = bits_of(it)
    if b is not None:
        nbits = b * k
        if nbits >= 64:
            return (1 << 64) - 1
        return (1 << nbits) - 1
    return radix_of(it) ** k


def uses_bitmask(it: InputType) -> bool:
    return bits_of(InputType(it)) is not None
