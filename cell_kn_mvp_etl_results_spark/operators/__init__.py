from . import (
    dedup,
    graph,
    lookup,
    multimodal,
    rdf,
    scale,
    search,
    similarity,
    textanalysis,
    tuplewriters,
)

__all__ = [
    "dedup",
    "graph",
    "lookup",
    "multimodal",
    "rdf",
    "scale",
    "search",
    "similarity",
    "textanalysis",
    "tuplewriters",
]
