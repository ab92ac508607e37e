from . import (  # noqa: F401
    asof,
    components,
    dedup,
    guards,
    kmeans,
    merge,
    multimodal,
    packing,
    pagerank,
    similarity,
    split,
    stats,
)
