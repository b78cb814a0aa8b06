from tpugraph.data.featgen import (  # noqa: F401
    FeatureGen,
    ConstFeatureGen,
    GaussianFeatureGen,
    GridFeatureGen,
)
from tpugraph.data.shapes import SHAPES, build_graph  # noqa: F401
from tpugraph.data.gengraph import (  # noqa: F401
    gen_syn1,
    gen_syn2,
    gen_syn3,
    gen_syn4,
    gen_syn5,
    perturb,
    join_graph,
    preprocess_input_graph,
)
