from . import asof, components, dedup, merge, multimodal, similarity  # noqa: F401
