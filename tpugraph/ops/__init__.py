from tpugraph.ops.message import (  # noqa: F401
    spmm,
    sddmm,
    segment_softmax,
    sym_normalize_weights,
)
from tpugraph.ops.dense import dense_spmm, dense_sddmm  # noqa: F401
