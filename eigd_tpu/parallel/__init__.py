from .mesh import make_mesh  # noqa: F401
from .sharded import sharded_dense_assembler, sharded_element_matvec  # noqa: F401
