from .mesh import make_mesh
from .sharded import ShardedClassifier, sharded_encode_contig

__all__ = ["make_mesh", "ShardedClassifier", "sharded_encode_contig"]
