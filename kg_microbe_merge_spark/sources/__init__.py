from . import corpus, files, kgx  # noqa: F401
