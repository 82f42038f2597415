"""FlexMap / FMEmitter: scoring and emission of candidate taxonomy nodes.

Equivalent of /root/reference/include/bonsai/flextree.h:16-300.  A
candidate node is a bit PATTERN (subset of a parent's child clades whose
genomes share kmers); its score is

    score = (bc - pc) * n + desc_pts          (get_score, flextree.h:36-38)

with n = #kmers showing the pattern, pc = popcount, bc = #clades in the
subtree, and desc_pts the subsume-transfer term (fnode_t::subsume,
flextree.h:29-33).  run_collapse emits the top-scoring nodes as fresh
taxids until the budget (roundup64(|tax|) - |tax| by default) is spent.

Deviations from the reference, implemented as INTENDED semantics:
  * flextree.h:267-269 marks `(*it)` added after `it++`, flagging the node
    AFTER the emitted one; we mark the emitted node (otherwise the same
    node is emitted every round).
  * condense_subtree is wired in (the reference computes it but comments
    out the call at flextree.h:271).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional, TextIO

import numpy as np

from ..core.spacer import Spacer
from ..taxonomy.tree import TaxTree
from .bitsets import (
    BitCmp,
    KmerGenomeSets,
    bitmap_patterns,
    pairwise_veccmp,
    vec_popcnt,
)


def roundup64(x: int) -> int:
    """Next power of two (util.h roundup64)."""
    return 1 << max(int(x - 1).bit_length(), 0)


@dataclass
class FNode:
    """fnode_t (flextree.h:16-34)."""

    pattern: np.ndarray  # (W,) u64
    n: int  # kmers with this pattern
    pc: int  # popcount
    bc: int  # clades in subtree
    subtree: int  # subtree index
    desc_pts: int = 0
    added: bool = False

    def score(self) -> int:
        return (self.bc - self.pc) * self.n + self.desc_pts

    def subsume(self, other: "FNode"):
        tmp = (self.bc - self.pc) * other.n
        self.desc_pts += tmp
        other.desc_pts -= tmp


class FlexMap:
    """Per-subtree pattern map (flextree.h:47-116)."""

    def __init__(self, parent: int, ntaxes: int, subtree_id: int):
        self.parent = int(parent)
        self.bitcount = int(ntaxes)
        self.id = int(subtree_id)
        self.taxes: List[int] = []
        self.nodes: List[FNode] = []
        self.n = 0

    def fill(
        self,
        tax_to_paths: Dict[int, List[str]],
        sp: Spacer,
        canonicalize: bool = True,
        acceptable=None,
    ):
        self.taxes = [int(t) for t in tax_to_paths]
        kgs = KmerGenomeSets(tax_to_paths, sp, canonicalize, acceptable)
        patterns, counts = bitmap_patterns(kgs)
        pcs = vec_popcnt(patterns) if patterns.size else np.empty(0, np.int64)
        self.nodes = [
            FNode(
                pattern=patterns[i],
                n=int(counts[i]),
                pc=int(pcs[i]),
                bc=self.bitcount,
                subtree=self.id,
            )
            for i in range(patterns.shape[0])
        ]
        self.n = int(counts.sum()) if counts.size else 0

    def condense(self):
        """condense_subtree (flextree.h:196-236): transfer score between
        nested patterns via subsume."""
        if len(self.nodes) < 2:
            return
        pats = np.stack([nd.pattern for nd in self.nodes])
        sup, sub = pairwise_veccmp(pats)
        strict_sup = sup & ~sub
        for i in range(len(self.nodes)):
            if self.nodes[i].added:
                continue
            for j in np.nonzero(strict_sup[i])[0]:
                if j <= i or self.nodes[j].added:
                    continue
                self.nodes[i].subsume(self.nodes[j])


class FMEmitter:
    """Global emitter (flextree.h:118-300)."""

    def __init__(
        self,
        tree: TaxTree,
        tax_to_paths: Dict[int, List[str]],
        canonicalize: bool = True,
        max_heap_size: int = 1 << 8,
        to_add: int = 0,
        condense: bool = True,
    ):
        self.tree = tree
        self.tpm = tax_to_paths
        self.canon = canonicalize
        self.max_heap_size = max_heap_size
        ntax = len(tree)
        self.left_to_add = (to_add if to_add else roundup64(ntax)) - ntax
        if self.left_to_add <= 0:
            self.left_to_add = to_add if to_add else 1
        self.subtrees: List[FlexMap] = []
        self.condense_flag = condense

    def process_subtree(
        self,
        parent: int,
        taxes,
        sp: Spacer,
        acceptable=None,
    ) -> bool:
        """Build a FlexMap over the child taxes of `parent`
        (flextree.h:287-299)."""
        tmp = {t: self.tpm[t] for t in taxes if t in self.tpm and self.tpm[t]}
        if len(tmp) < 2:
            return False  # emplace_subtree skips single-element subtrees
        fm = FlexMap(parent, len(tmp), len(self.subtrees))
        fm.fill(tmp, sp, self.canon, acceptable)
        if self.condense_flag:
            fm.condense()
        self.subtrees.append(fm)
        return True

    def run_collapse(self, maxtax: int, fp: TextIO = sys.stdout) -> List[dict]:
        """Emit the top-scoring candidate nodes as new taxids
        (flextree.h:240-292).  Returns the emitted records."""
        fp.write("#Taxid (inserted)\tScore\tParent\tChildren [comma-separated]\n")
        emitted = []
        while self.left_to_add > 0:
            candidates = [
                nd
                for fm in self.subtrees
                for nd in fm.nodes
                if not nd.added
            ]
            if not candidates:
                break
            candidates.sort(key=lambda nd: nd.score(), reverse=True)
            for nd in candidates[: self.max_heap_size]:
                if self.left_to_add <= 0:
                    break
                maxtax += 1
                nd.added = True
                fm = self.subtrees[nd.subtree]
                children = [
                    fm.taxes[t]
                    for t in range(fm.bitcount)
                    if nd.pattern[t >> 6] >> np.uint64(t & 63) & np.uint64(1)
                ]
                rec = dict(
                    taxid=maxtax,
                    score=nd.score(),
                    parent=fm.parent,
                    children=children,
                )
                emitted.append(rec)
                fp.write(
                    f"{maxtax}\t{nd.score()}\t{fm.parent}\t"
                    + ",".join(str(c) for c in children)
                    + "\n"
                )
                self.left_to_add -= 1
        return emitted
