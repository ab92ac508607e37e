from . import (  # noqa: F401
    extract,
    gopher,
    hashing,
    linking,
    links,
    pii,
    quality_model,
    sessions,
    text,
    triples,
    urls,
)
