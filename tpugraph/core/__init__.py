from tpugraph.core.graph import (  # noqa: F401
    Graph,
    BatchedGraphs,
    graph_from_dense,
    graph_from_networkx,
    graph_to_dense,
    pad_graph,
)
from tpugraph.core.khop import khop_subgraph, khop_reachability  # noqa: F401
