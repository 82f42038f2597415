from .hll import HyperLogLog, estimate_cardinality

__all__ = ["HyperLogLog", "estimate_cardinality"]
