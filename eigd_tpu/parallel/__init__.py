from .grid import GridPartition, make_mesh, make_partition  # noqa: F401
from .sharded import (  # noqa: F401
    GridHaloOperator,
    SchwarzPCGFactor,
    make_sharded_objective,
    sharded_element_matvec,
    sharded_train_step,
)
