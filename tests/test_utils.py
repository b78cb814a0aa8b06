"""Observability utilities: TB event writer (validated against the real
TensorBoard reader) and the timing harness."""

import numpy as np

from tpugraph.utils.profiling import benchmark
from tpugraph.utils.tb_writer import SummaryWriter


def test_tb_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    for i in range(4):
        w.add_scalar("loss", 1.0 / (i + 1), step=i)
    w.add_scalars("acc", {"train": 0.9, "test": 0.8}, step=0)
    w.close()
    from tensorboard.backend.event_processing import event_accumulator

    ea = event_accumulator.EventAccumulator(str(tmp_path))
    ea.Reload()
    tags = sorted(ea.Tags()["scalars"])
    assert tags == ["acc/test", "acc/train", "loss"]
    vals = [v.value for v in ea.Scalars("loss")]
    np.testing.assert_allclose(vals, [1, 0.5, 1 / 3, 0.25], rtol=1e-6)


def test_benchmark_harness():
    import jax.numpy as jnp

    def f(x):
        return x * 2

    out = benchmark(f, jnp.ones(16), iters=3, warmup=1, work_items=100)
    assert out["median_s"] >= 0
    assert out["items_per_s"] > 0
