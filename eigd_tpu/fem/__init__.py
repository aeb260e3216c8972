from . import quad, assembly, model, filter  # noqa: F401
