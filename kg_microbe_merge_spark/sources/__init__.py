from . import corpus, kgx  # noqa: F401
