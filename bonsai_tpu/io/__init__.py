from .fastx import read_fastx, open_maybe_compressed, batch_reads, ReadBatch

__all__ = ["read_fastx", "open_maybe_compressed", "batch_reads", "ReadBatch"]
