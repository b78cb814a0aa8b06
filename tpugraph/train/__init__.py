from tpugraph.train.optim import build_optimizer  # noqa: F401
from tpugraph.train.metrics import eval_node, eval_graph_preds  # noqa: F401
from tpugraph.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    checkpoint_path,
)
from tpugraph.train.loop import (  # noqa: F401
    train_node_classifier,
    train_graph_classifier,
)
