from tpugraph.explain.module import (  # noqa: F401
    ExplainConfig,
    MaskState,
    init_masks,
    masked_edge_weights,
    explain_loss,
    run_mask_optimization,
)
from tpugraph.explain.bcsr_explain import (  # noqa: F401
    BCSRMaskState,
    run_bcsr_mask_optimization,
    tiles_to_edge_weights,
)
from tpugraph.explain.explainer import Explainer  # noqa: F401
from tpugraph.explain.groundtruth import make_pred_real, explanation_auc  # noqa: F401
