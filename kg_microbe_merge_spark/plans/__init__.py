from . import materialize, pipeline, sqlapi  # noqa: F401
