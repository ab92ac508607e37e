from . import pipeline, sqlapi  # noqa: F401
