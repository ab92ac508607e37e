from . import components, dedup, merge, multimodal, similarity  # noqa: F401
