from tpugraph.parallel.mesh import make_mesh  # noqa: F401
from tpugraph.parallel.spmd import (  # noqa: F401
    shard_graph_edges,
    sharded_spmm,
    make_sharded_node_train_step,
    make_dp_graph_train_step,
)
