"""Spaced-seed model.

Host-side equivalent of the reference Spacer
(/root/reference/include/bonsai/spacer.h:29-174):

* ``k``: seed weight (number of encoded positions),
* ``spaces``: k-1 gaps between successive included positions,
* ``c``: comb size = k + sum(gaps)  (total genomic span of the seed),
* ``w``: window size = max(w, c)    (minimizer window in bases),
* spacing strings use the mini-language "<gap>[x<count>],...", e.g.
  "1,2,0x28" = gap 1, gap 2, then 28 zero gaps.

Internally ``offsets`` are the per-step advances (gap+1), matching the
reference's in-place increment (spacer.h:66).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def parse_spacing(s: str | None, k: int) -> List[int]:
    """Parse a spacing string into k-1 gaps (spacer.h:29-47)."""
    if not s:
        return [0] * (k - 1)
    out: List[int] = []
    for tok in s.split(","):
        if not tok:
            continue
        if "x" in tok:
            j, n = tok.split("x", 1)
            j, n = int(j), int(n)
            out.append(j)
            out.extend([j] * max(n - 1, 0))
        else:
            out.append(int(tok))
    return out


class Spacer:
    def __init__(self, k: int, w: int = 0, spaces: Sequence[int] | str | None = None):
        if isinstance(spaces, str) or spaces is None:
            spaces = parse_spacing(spaces, k)
        spaces = list(spaces)
        if not spaces:
            spaces = [0] * (k - 1)
        if len(spaces) + 1 != k:
            raise ValueError(
                f"spacing vector must have k-1 entries: k={k}, got {len(spaces)}"
            )
        self.k = int(k)
        self.gaps = [int(g) for g in spaces]
        self.offsets = [g + 1 for g in self.gaps]  # per-step advances
        self.c = self.k + sum(self.gaps)
        self.w = max(int(w), self.c)

    # position offsets of the k included bases relative to the seed start
    @property
    def positions(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.offsets)]).astype(np.int32)

    def unspaced(self) -> bool:
        return all(o == 1 for o in self.offsets)

    def unwindowed(self) -> bool:
        return self.k == self.w

    @property
    def window_kmers(self) -> int:
        """Number of seeds per minimizer window (qmap window size w-c+1)."""
        return self.w - self.c + 1

    def spacing_string(self) -> str:
        """Run-length spacing string (spacer.h:150-171)."""
        if self.unspaced():
            return f"0x{self.k - 1}"
        runs = []
        for g in self.gaps:
            if runs and runs[-1][0] == g:
                runs[-1][1] += 1
            else:
                runs.append([g, 1])
        return ",".join(f"{g}x{n}" for g, n in runs)

    def to_string(self, kmer: int) -> str:
        """Decode a packed k-mer to sequence with '-' gap markers
        (spacer.h:124-136)."""
        out = []
        offset = (self.k - 1) * 2
        out.append("ACGTN"[(int(kmer) >> offset) & 0x3])
        for off in self.offsets:
            offset -= 2
            out.extend("-" * (off - 1))
            out.append("ACGTN"[(int(kmer) >> offset) & 0x3])
        return "".join(out)

    def __repr__(self):
        return f"Spacer(k={self.k}, w={self.w}, c={self.c}, spacing='{self.spacing_string()}')"

    def __eq__(self, other):
        return (
            isinstance(other, Spacer)
            and self.k == other.k
            and self.w == other.w
            and self.gaps == other.gaps
        )
