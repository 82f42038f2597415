from .tree import TaxTree
from .ncbi import parse_nodes_dmp, parse_nameid_map, accession_from_header

__all__ = ["TaxTree", "parse_nodes_dmp", "parse_nameid_map", "accession_from_header"]
