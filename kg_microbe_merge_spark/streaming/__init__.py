from . import (  # noqa: F401
    curation,
    dedup_index,
    ingest,
    joins,
    maintain,
    politeness,
    sessions,
    stateful,
)
