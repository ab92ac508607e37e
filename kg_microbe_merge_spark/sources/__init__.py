from . import corpus, files, jsonl, kgx, rdf  # noqa: F401
