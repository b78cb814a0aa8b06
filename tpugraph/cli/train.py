"""Training entry point (reference ``train.py:1142-1179``).

Usage:
  python -m tpugraph.cli.train --dataset=syn1 [--epochs N] [--platform cpu]
  python -m tpugraph.cli.train --bmname=Mutagenicity --method=soft-assign
"""

from __future__ import annotations

import json

from tpugraph.cli.config import apply_platform, parse_train_args
from tpugraph.cli.tasks import run_task


def main(argv=None) -> None:
    import os

    from tpugraph.train.checkpoint import gen_prefix
    from tpugraph.utils.tb_writer import SummaryWriter

    cfg = parse_train_args(argv)
    apply_platform(cfg)

    prefix = gen_prefix(cfg.name, cfg.method, cfg.hidden_dim, cfg.output_dim,
                        cfg.bias, cfg.name_suffix)
    writer = SummaryWriter(os.path.join(cfg.logdir, prefix))

    def log_fn(epoch, scalars):
        msg = "; ".join(f"{k}: {v:.4f}" for k, v in scalars.items())
        print(f"epoch {epoch}: {msg}", flush=True)
        for k, v in scalars.items():
            tag = "loss/avg_loss" if k == "loss" else f"acc/{k}"
            writer.add_scalar(tag, v, step=epoch)

    out = run_task(cfg, log_fn=log_fn)
    summary = {
        "dataset": cfg.name,
        "method": cfg.method,
        "ckpt_path": out.get("ckpt_path"),
        "elapsed_s": round(out.get("elapsed", 0.0), 2),
    }
    for key in ("result_train", "result_test", "best_val", "test_result"):
        if key in out and out[key] is not None:
            summary[key] = {
                k: v for k, v in out[key].items() if k != "conf_mat"
            }
    if "result_train" in out:
        print("train conf_mat:\n", out["result_train"]["conf_mat"])
        print("test conf_mat:\n", out["result_test"]["conf_mat"])
    hist = out.get("history") or {}
    if hist.get("train_acc"):
        from tpugraph.viz.graphs import plot_accuracy_curve

        eval_accs = hist.get("test_acc") or hist.get("val_acc")
        path = plot_accuracy_curve(
            hist["train_acc"], eval_accs, name=prefix,
            outdir=os.path.join(cfg.logdir, "results"),
        )
        summary["train_curve"] = path
    writer.close()
    print(json.dumps(summary, indent=2, default=float))


if __name__ == "__main__":
    main()
