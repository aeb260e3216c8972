from . import operators, factor, lanczos, adjoint, autodiff  # noqa: F401
