from tpugraph.nn.layers import GraphConv, SparseAdj  # noqa: F401
from tpugraph.nn.encoders import (  # noqa: F401
    GcnEncoderNode,
    GcnEncoderGraph,
    SoftPoolingGcnEncoder,
)
from tpugraph.nn.losses import (  # noqa: F401
    softmax_cross_entropy,
    node_cross_entropy,
    margin_loss,
    link_prediction_loss,
)
