from . import bgp, cypher, materialize, pipeline, sqlapi  # noqa: F401
