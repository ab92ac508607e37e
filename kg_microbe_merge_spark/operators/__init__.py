from . import asof, components, dedup, guards, merge, multimodal, similarity, split, stats  # noqa: F401
