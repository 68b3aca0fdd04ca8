from .incremental import IncrementalIndexer

__all__ = ["IncrementalIndexer"]
