"""Training-throughput regression bisection (VERDICT r3 item 1).

bench_train's banded BCSR number halved between r2 (37.5 epochs/s) and
r3 (16.2 epochs/s) while the SpMM microbench was unchanged-or-better;
r3 recorded it as "platform-level" without evidence.  This script
attributes one training epoch's time by bisection on the SAME graph,
model, and kernel configuration as bench_train:

  spmm-only   — scan of 3 chained fwd+bwd BCSR SpMM pairs (the op floor)
  fwd-only    — scan of the 3-layer model forward
  grad-only   — scan of value_and_grad of the training loss
  full-step   — scan of the exact epoch step (grad + optimizer + metrics)
  train-call  — train_node_classifier as bench_train measures it

Each scan is timed device-side (50 chained iterations per call).  The
difference between adjacent rows names the cost; full-step vs
train-call isolates host-loop/dispatch overhead.  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from bench import enable_compile_cache, make_banded_graph

    enable_compile_cache()
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.nn import GcnEncoderNode
    from tpugraph.nn.layers import BCSRAdj
    from tpugraph.nn.losses import node_cross_entropy
    from tpugraph.ops.bcsr import bcsr_from_coo, bcsr_transpose_host
    from tpugraph.train.loop import TrainConfig, train_node_classifier
    from tpugraph.train.optim import OptimizerConfig, build_optimizer

    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"platform: {jax.devices()[0].platform}")
    if on_tpu:
        n, deg, bw, d, hidden, block = 65536, 32, 192, 128, 128, 256
        K, reps = 50, 3
    else:
        n, deg, bw, d, hidden, block = 512, 8, 64, 16, 16, 128
        K, reps = 4, 1

    s, r, w = make_banded_graph(n, deg, bw)
    g = graph_from_edges(s, r, n, edge_weight=w)
    n_pad = g.num_nodes_padded
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((n_pad, d)).astype(np.float32)
    labels = (np.arange(n) * 4 // n).astype(np.int32)

    model = GcnEncoderNode(input_dim=d, hidden_dim=hidden,
                           embedding_dim=hidden, label_dim=4, num_layers=3)

    m = bcsr_from_coo(s, r, w, n_pad, block=block)
    m_t = bcsr_transpose_host(s, r, w, n_pad, block=block)
    sp = BCSRAdj(m, m_t)
    extra = m.num_nodes - n_pad
    if extra:
        feat = np.pad(feat, ((0, extra), (0, 0)))
    x = jnp.asarray(feat)
    y_np = np.zeros((m.num_nodes,), np.int32)
    y_np[:n] = labels
    y = jnp.asarray(y_np)
    mask = jnp.asarray((np.arange(m.num_nodes) < n).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), x, sp)
    cfg = TrainConfig(num_epochs=2 * K, scan_chunk=K, use_bcsr=True,
                      bcsr_block=block)
    tx = build_optimizer(OptimizerConfig(
        opt=cfg.opt, lr=cfg.lr, scheduler=cfg.opt_scheduler,
        weight_decay=cfg.weight_decay, clip=cfg.clip))
    opt_state = tx.init(params)

    from tpugraph.ops.pallas_spmm import bcsr_matvec

    def time_scan(tag, fn, *args):
        t0 = time.perf_counter()
        o = fn(*args)
        jax.block_until_ready(o)
        first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(*args)
            jax.block_until_ready(o)
            times.append(time.perf_counter() - t0)
        per = min(times) / K
        log(f"[{tag}] compile+first {first:.1f}s; {per * 1e3:.2f} ms/epoch "
            f"= {1 / per:.1f} epochs/s")
        return per

    @partial(jax.jit, static_argnames="k")
    def scan_spmm(m, m_t, x, k):
        def body(xc, _):
            h = xc
            for _ in range(3):
                yv = bcsr_matvec(m, m_t, h)
                h = bcsr_matvec(m_t, m, yv)
            return h * jax.lax.rsqrt(jnp.mean(h * h) + 1e-9), ()

        xf, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(xf)

    @partial(jax.jit, static_argnames="k")
    def scan_fwd(p, x, sp, k):
        def body(c, _):
            logits, _ = model.apply(p, x, sp)
            return c + jnp.sum(logits) * 1e-9, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    def loss_fn(p, x, sp):
        logits, _ = model.apply(p, x, sp)
        return node_cross_entropy(logits, y, node_mask=mask), logits

    @partial(jax.jit, static_argnames="k")
    def scan_grad(p, x, sp, k):
        def body(c, _):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, x, sp)
            leaves = jax.tree_util.tree_leaves(grads)
            return c + loss * 1e-9 + leaves[0].ravel()[0] * 1e-12, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return c

    @partial(jax.jit, static_argnames="k")
    def scan_full(p, s_state, x, sp, k):
        def body(carry, _):
            p, s_state = carry
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, x, sp)
            updates, s_state = tx.update(grads, s_state, p)
            p = optax.apply_updates(p, updates)
            pred = jnp.argmax(logits, axis=-1)
            acc = jnp.sum((pred == y) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0)
            return (p, s_state), (loss, acc)

        (p, s_state), hist = jax.lax.scan(body, (p, s_state), None,
                                          length=k)
        return hist[0][-1]

    out = {}
    out["spmm_ms"] = round(
        time_scan("spmm-only(3 pairs)", partial(scan_spmm, k=K),
                  m, m_t, x) * 1e3, 2)
    out["fwd_ms"] = round(
        time_scan("fwd-only", partial(scan_fwd, k=K), params, x, sp)
        * 1e3, 2)
    out["grad_ms"] = round(
        time_scan("grad-only", partial(scan_grad, k=K), params, x, sp)
        * 1e3, 2)
    out["fullstep_ms"] = round(
        time_scan("full-step", partial(scan_full, k=K), params, opt_state,
                  x, sp) * 1e3, 2)

    # the end-to-end call exactly as bench_train measures it
    t0 = time.perf_counter()
    res = train_node_classifier(model, g, feat[:n_pad], labels, cfg, seed=0)
    log(f"[train-call] first (incl pack+compile): "
        f"{time.perf_counter() - t0:.1f}s; loop {res['elapsed']:.2f}s")
    res = train_node_classifier(model, g, feat[:n_pad], labels, cfg, seed=0)
    eps = cfg.num_epochs / res["elapsed"]
    out["train_call_ms"] = round(1e3 * res["elapsed"] / cfg.num_epochs, 2)
    out["train_call_epochs_per_s"] = round(eps, 1)
    log(f"[train-call] steady {res['elapsed']:.2f}s for {cfg.num_epochs} "
        f"epochs = {eps:.1f} epochs/s")

    out.update(metric="train_epoch_attribution_banded",
               value=out["train_call_epochs_per_s"], unit="epochs/s",
               vs_baseline=out["train_call_epochs_per_s"] / 37.5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
