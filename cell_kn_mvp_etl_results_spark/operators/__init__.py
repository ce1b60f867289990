from . import dedup, graph, similarity, textanalysis

__all__ = ["dedup", "graph", "similarity", "textanalysis"]
