from . import extract, linking, text, triples  # noqa: F401
