from . import bgp, materialize, pipeline, sqlapi  # noqa: F401
