from .table import KmerTable
from .build import lca_map, taxdepth_map, ftct_map, minimized_map, genome_kmer_set
from .formats import Database, save_database, load_database

__all__ = [
    "KmerTable",
    "lca_map",
    "taxdepth_map",
    "ftct_map",
    "minimized_map",
    "genome_kmer_set",
    "Database",
    "save_database",
    "load_database",
]
