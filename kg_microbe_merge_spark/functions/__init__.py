from . import extract, linking, sessions, text, triples  # noqa: F401
