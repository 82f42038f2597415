"""Metatree: data-driven taxonomy restructuring (SURVEY §2.5).

Equivalents of kgset_t / bitmap_t / veccmp / FlexMap / FMEmitter /
TaxonomyReformation (reference include/bonsai/{kgset,bitmap,bitcmp,
flextree,tx}.h), rebuilt on packed-u64 bit matrices and vectorized
pairwise subset compares instead of khash sets and AVX2 testz loops."""

from .bitsets import (  # noqa: F401
    BitCmp,
    KmerGenomeSets,
    bitmap_patterns,
    pairwise_veccmp,
    veccmp,
    vec_popcnt,
    adjacency,
    score_node_addn,
)
from .flextree import FlexMap, FMEmitter  # noqa: F401
from .tx import TaxonomyReformation  # noqa: F401
