from .pipeline import Classifier
from .resolve import resolve_batch
from . import output

__all__ = ["Classifier", "resolve_batch", "output"]
