"""Training loops (reference ``train.py:132-484``), redesigned for XLA.

The reference runs one Python-side optimizer step per epoch with host->GPU
transfers every epoch (``train.py:283-342``).  Here the full-batch node
classifier compiles ONE ``lax.scan`` over a chunk of epochs — parameters,
optimizer state and metrics stay on device; the host only sees periodic
metric snapshots.  The graph classifier jits a single batch step reused
across all static-shape batches.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpugraph.core.graph import Graph
from tpugraph.nn.layers import SparseAdj
from tpugraph.nn.losses import (
    link_prediction_loss,
    node_cross_entropy,
    softmax_cross_entropy,
)
from tpugraph.train.metrics import eval_node, eval_graph_preds
from tpugraph.train.optim import OptimizerConfig, build_optimizer


@dataclasses.dataclass
class TrainConfig:
    """Training hyperparameters, defaults matching the reference CLI
    (reference ``configs.py:75-101``)."""

    num_epochs: int = 1000
    lr: float = 0.001
    clip: float = 2.0
    weight_decay: float = 0.005
    train_ratio: float = 0.8
    test_ratio: float = 0.1
    batch_size: int = 20
    opt: str = "adam"
    opt_scheduler: str = "none"
    opt_decay_step: int = 100
    opt_decay_rate: float = 0.1
    opt_restart: int = 200
    eval_every: int = 25
    scan_chunk: int = 25  # epochs fused into one device call
    use_bcsr: bool = False  # Pallas block-sparse aggregation (TPU fast path)
    bcsr_block: int = 128   # BCSR tile size (128 or 256; see bench.py)
    bcsr_k_pack: int = 0    # packed kernel: 0 = off (fastest for f32
                            # tiles), >1 = fixed k, -1 = auto (choose_k_pack)
    packet_geom: Tuple[int, int, int] = (512, 256, 128)
                            # edge-packet (block_r, block_c, K) — the
                            # bench-tuned geometry (bench.py)
    bcsr_format: str = "auto"  # low-locality tile format: "tiles"
                            # (dense BCSR / resident), "packets"
                            # (edge packets: ~4x slower steady-state
                            # but ~30x cheaper pack — wins whenever
                            # pack latency dominates, BENCH_r03), or
                            # "auto" = total-time cost model using
                            # num_epochs and the measured v5e rates
                            # (TPUGRAPH_RATES env overrides — see
                            # resolve_bcsr_format).  Precedence: an
                            # attention model or bcsr_resident="on"
                            # forces "tiles" regardless of this field.
    bcsr_resident: str = "auto"  # VMEM-resident stacked kernel
                            # (ops/pallas_resident): "auto" = use when
                            # x+out fit VMEM (the low-locality fast
                            # path), "on" / "off" to force.  NOTE: on
                            # this path non-integral adjacency weights
                            # (e.g. normalize=True sym-normalization)
                            # are quantized to bf16 tiles — training
                            # numerics differ slightly from the
                            # f32-tile streaming path (a log line is
                            # emitted when that happens)


def _opt_config(cfg: TrainConfig, weight_decay: Optional[float] = None) -> OptimizerConfig:
    return OptimizerConfig(
        opt=cfg.opt,
        lr=cfg.lr,
        scheduler=cfg.opt_scheduler,
        decay_step=cfg.opt_decay_step,
        decay_rate=cfg.opt_decay_rate,
        restart=cfg.opt_restart,
        weight_decay=cfg.weight_decay if weight_decay is None else weight_decay,
        clip=cfg.clip,
    )


# Rates for the pack-latency-aware format rule.  SCOPE: measured on THIS
# container's TPU v5e (BENCH_r03/r04 fwd+bwd SpMM pairs on the 65k/2.1M
# powerlaw bench; pack rate from bench_tunnel_diag r4, 19.0 s / 20736
# 256^2 tiles).  On another TPU generation the auto rule still picks a
# WORKING path, just possibly not the fastest one — override with
#   TPUGRAPH_RATES="res_edges_per_s=1.2e9,pkt_edges_per_s=3e8,
#                   res_pack_s_per_tile=5e-4,pkt_pack_s_per_edge=1e-6"
# (any subset of keys), or pin cfg.bcsr_format explicitly.
_RATE_DEFAULTS = {
    "res_edges_per_s": 9.4e8,        # resident-stacked kernel steady state
    "pkt_edges_per_s": 2.26e8,       # edge-packet kernel steady state
    "res_pack_s_per_tile": 0.92e-3,  # int8 emit + stack + upload, per
                                     # 256^2 tile (the r3 72 s figure was
                                     # stale)
    "pkt_pack_s_per_edge": 1.2e-6,   # no tile materialization
}
_SPMM_PAIRS_PER_EPOCH = 3      # 3-layer encoder: one pair per layer


def _format_rates() -> Dict[str, float]:
    """The v5e-measured defaults, overridden by ``TPUGRAPH_RATES``
    (comma-separated ``key=value`` pairs; unknown keys raise so typos
    don't silently fall back to defaults)."""
    import os

    out = dict(_RATE_DEFAULTS)
    for part in os.environ.get("TPUGRAPH_RATES", "").split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in out:
            raise ValueError(
                f"TPUGRAPH_RATES: unknown key {k!r} "
                f"(valid: {sorted(out)})"
            )
        out[k] = float(v)
    return out


def resolve_bcsr_format(cfg: "TrainConfig", n_live: int, t_probe: int,
                        density: float, low_locality: bool,
                        on_tpu: bool, att: bool = False) -> str:
    """Pick the low-locality tile format by TOTAL time (pack + train).

    The edge-packet kernel is ~4x slower steady-state than the resident
    kernel but its pack is ~30x cheaper (2.5 s vs 72 s measured,
    BENCH_r03) — for short runs the pack dominates and packets win; for
    long runs the kernel rate dominates and dense tiles win.  The
    crossover at the bench scale (2.1M edges, 21k tiles) is ~2,500
    epochs.  Only low-locality graphs (density < 3e-3) are candidates —
    dense-tile graphs stream tiles at full HBM rate and never benefit.

    Precedence (advisor r4): an attention model forces ``"tiles"``
    (PacketAdj has no per-edge score gradients and would raise at trace
    time), and ``cfg.bcsr_resident == "on"`` forces ``"tiles"`` (an
    explicitly requested resident path must not be silently overridden).
    Rate constants are v5e-measured; see ``_RATE_DEFAULTS`` for the
    ``TPUGRAPH_RATES`` override.
    """
    if att or cfg.bcsr_resident == "on":
        return "tiles"
    fmt = cfg.bcsr_format
    if fmt != "auto":
        return fmt
    if not (on_tpu and low_locality and density < 3e-3):
        return "tiles"
    r = _format_rates()
    pairs = _SPMM_PAIRS_PER_EPOCH * cfg.num_epochs
    # pack cost is ~per-byte, so the per-256^2-tile rate scales with the
    # configured block area (advisor r4: t_probe is counted at
    # cfg.bcsr_block, where the same graph has ~ (256/block)^2 more,
    # proportionally cheaper tiles)
    pack_s_per_tile = (r["res_pack_s_per_tile"]
                       * (cfg.bcsr_block / 256.0) ** 2)
    est_tiles = (pack_s_per_tile * t_probe
                 + pairs * n_live / r["res_edges_per_s"])
    est_pkt = (r["pkt_pack_s_per_edge"] * n_live
               + pairs * n_live / r["pkt_edges_per_s"])
    fmt = "packets" if est_pkt < est_tiles else "tiles"
    print(
        f"tpugraph: bcsr_format auto -> {fmt} "
        f"(est total tiles {est_tiles:.1f}s vs packets {est_pkt:.1f}s "
        f"for {cfg.num_epochs} epochs; v5e-measured rates, "
        f"TPUGRAPH_RATES overrides)",
        flush=True,
    )
    return fmt


# Process-level caches for the jitted epoch-chunk runner and the eval
# forward.  Building `jax.jit` INSIDE train_node_classifier made every
# call pay trace + persistent-cache deserialization again — measured as
# the entire r3 "training regression": the identical 50-epoch chunk runs
# at 4.16 ms/epoch when the executable is reused but 51.8 ms/epoch when
# rebuilt per call (bench_train_diag.py, r4).  Keyed by (model, opt
# config, dropout); jax.jit's own cache handles differing adjacency
# pytree structures (SparseAdj / BCSRAdj / StackedAdj / PacketAdj).
_CHUNK_CACHE: Dict[Any, Any] = {}
_APPLY_CACHE: Dict[Any, Any] = {}
# Both caches are small LRUs (advisor r4): long-lived processes sweeping
# model configs (benchmark drivers, notebooks) would otherwise
# accumulate compiled executables + optimizer objects for the process
# lifetime.  Insertion order doubles as recency (dicts are ordered).
_CACHE_MAX = 16


def _cache_put(cache: Dict[Any, Any], key: Any, value: Any) -> None:
    cache[key] = value
    while len(cache) > _CACHE_MAX:
        cache.pop(next(iter(cache)))


def _eval_forward(model):
    fn = _APPLY_CACHE.get(model)
    if fn is None:
        fn = jax.jit(model.apply)
        _cache_put(_APPLY_CACHE, model, fn)
    return fn


def _chunk_runner(model, ocfg: OptimizerConfig, has_dropout: bool):
    import dataclasses as _dc
    from functools import partial

    key = (model, _dc.astuple(ocfg), has_dropout)
    hit = _CHUNK_CACHE.get(key)
    if hit is not None:
        return hit
    tx = build_optimizer(ocfg)

    # graph/features/labels/class weights are jit ARGUMENTS: closing
    # over them would bake them into the HLO as constants
    # (compile-payload + dispatch cost at Enron/PPI scale — see
    # ops/pallas_spmm.bcsr_matvec docstring).
    @partial(jax.jit, static_argnames="length")
    def run_chunk(p, s, key, x, sp, y, train_mask_d, test_mask_d, cw,
                  length):
        def loss_fn(p, key):
            rngs = {"dropout": key} if has_dropout else None
            logits, _ = model.apply(p, x, sp, deterministic=False,
                                    rngs=rngs)
            return (
                node_cross_entropy(
                    logits, y, class_weight=cw, node_mask=train_mask_d
                ),
                logits,
            )

        def epoch_step(carry, _):
            p, s, key = carry
            key, sub = jax.random.split(key)
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, sub)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            pred_lab = jnp.argmax(logits, axis=-1)
            correct = (pred_lab == y).astype(jnp.float32)
            train_acc = jnp.sum(correct * train_mask_d) / jnp.maximum(
                jnp.sum(train_mask_d), 1.0
            )
            test_acc = jnp.sum(correct * test_mask_d) / jnp.maximum(
                jnp.sum(test_mask_d), 1.0
            )
            return (p, s, key), (loss, train_acc, test_acc)

        return jax.lax.scan(epoch_step, (p, s, key), None, length=length)

    _cache_put(_CHUNK_CACHE, key, (run_chunk, tx))
    return run_chunk, tx


def split_nodes(
    num_nodes: int, train_ratio: float, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffled node-level train/test split (reference ``train.py:266-272``)."""
    idx = np.arange(num_nodes)
    rng.shuffle(idx)
    num_train = int(num_nodes * train_ratio)
    return idx[:num_train], idx[num_train:]


def train_node_classifier(
    model,
    g: Graph,
    feat: np.ndarray,
    labels: np.ndarray,
    cfg: TrainConfig,
    class_weight: Optional[np.ndarray] = None,
    seed: int = 0,
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    init_params: Any = None,
    init_opt_state: Any = None,
) -> Dict[str, Any]:
    """Full-batch node classification on one padded sparse graph.

    Equivalent of reference ``train_node_classifier`` (``train.py:264-361``)
    on the sparse TPU path: the hot loop is a jitted ``lax.scan`` over
    ``cfg.scan_chunk`` epochs per device call.

    Args:
      model: a flax module with signature ``apply(params, x, adj) -> (logits,
        att)`` (e.g. :class:`tpugraph.nn.GcnEncoderNode`).
      feat: float32[N_pad, D] node features (padded rows zero).
      labels: int[N_real] node labels.
    Returns dict with params, preds, metrics history and the node split.
    """
    rng = np.random.default_rng(seed)
    n_real = int(g.n_node)
    n_pad = g.num_nodes_padded
    train_idx, test_idx = split_nodes(n_real, cfg.train_ratio, rng)

    labels_pad = np.zeros((n_pad,), dtype=np.int32)
    labels_pad[:n_real] = np.asarray(labels, dtype=np.int32)
    train_mask = np.zeros((n_pad,), dtype=np.float32)
    train_mask[train_idx] = 1.0
    test_mask = np.zeros((n_pad,), dtype=np.float32)
    test_mask[test_idx] = 1.0

    if cfg.use_bcsr:
        # Pallas block-sparse fast path: pack the adjacency (and its
        # transpose, for the custom-VJP backward) into MXU tiles once on
        # the host; node padding may grow to a block multiple.
        from tpugraph.nn.layers import BCSRAdj
        from tpugraph.ops.bcsr import (
            bcsr_from_coo,
            bcsr_transpose_host,
            choose_k_pack_counts,
            coo_tile_counts,
        )

        s_np = np.asarray(g.senders)
        r_np = np.asarray(g.receivers)
        w_np = np.asarray(g.edge_weight)
        # Packed double-buffered kernel is OPT-IN here: it wins on bf16
        # tiles (+19%, bench.py) but measured SLOWER for this f32 training
        # path (33.3 vs 37.5 epochs/s at 65k/256-block) — BlockSpec
        # pipelining already saturates f32 tile bandwidth.
        from tpugraph.nn.layers import StackedAdj
        from tpugraph.ops.pallas_resident import (
            resident_fits,
            stack_bcsr,
            tile_window_bytes_for,
        )

        n_pad_blk = ((n_pad + cfg.bcsr_block - 1)
                     // cfg.bcsr_block) * cfg.bcsr_block
        # the stacked kernel runs at EVERY layer width, not just the input
        # dim — gate on the maximum padded width the model will use
        # (advisor r3: a hidden layer wider than the input could pass the
        # gate yet fail resident_fits at trace time)
        dims = [int(feat.shape[1])]
        for attr in ("hidden_dim", "embedding_dim"):
            v = getattr(model, attr, None)
            if v:
                dims.append(int(v))
        d_est = max(128, ((max(dims) + 127) // 128) * 128)
        on_tpu = jax.devices()[0].platform == "tpu"
        n_live = int((np.asarray(w_np) != 0).sum())
        if on_tpu and (cfg.bcsr_resident == "auto"
                       or cfg.bcsr_format == "auto"):
            # measured crossover (bench_train r3): the streaming kernel
            # wins on locality-rich graphs (banded: 37.5 vs 14.6
            # epochs/s at density 0.031) while the resident kernel wins
            # on scattered ones (powerlaw: 14.8 vs 5.1 at 0.0015) —
            # pick by mean tile occupancy, a host-side O(E) count
            cnt_probe = coo_tile_counts(s_np, r_np, n_pad,
                                        block=cfg.bcsr_block,
                                        weights=w_np)
            t_probe = max(int(cnt_probe.sum()), 1)
            density = n_live / (t_probe * cfg.bcsr_block ** 2)
            low_locality = density < 0.01
        else:
            t_probe, density, low_locality = 1, 1.0, False

        model_att = bool(getattr(model, "att", False))
        fmt = resolve_bcsr_format(cfg, n_live, t_probe, density,
                                  low_locality, on_tpu, att=model_att)
        # int8 tiles need exactly-integer weights; otherwise the resident
        # path quantizes to bf16 tiles — whose streamed window is 2x the
        # int8 one, so the VMEM gate must use the ACTUAL tile itemsize
        # (advisor r4: a hard-coded itemsize 1 underestimated the window
        # in exactly the bf16 case).
        integral = bool(
            np.all(w_np == np.rint(w_np))
            and np.abs(w_np).max(initial=0) <= 127
        )
        tile_itemsize = 1 if integral else 2
        # attention needs tile gradients — StackedAdj/PacketAdj raise at
        # trace time, so an att model always takes the BCSRAdj route
        # (with a transpose plan, below)
        want_res = fmt == "tiles" and not model_att and (
            cfg.bcsr_resident == "on"
            or (cfg.bcsr_resident == "auto" and on_tpu and low_locality
                and resident_fits(
                    n_pad_blk, n_pad_blk, d_est, 4,
                    tile_window_bytes=tile_window_bytes_for(
                        64, 1, cfg.bcsr_block, tile_itemsize
                    ),
                ))
        )
        if fmt == "packets":
            from tpugraph.nn.layers import PacketAdj
            from tpugraph.ops.packets import (
                pack_edges,
                pack_edges_transpose,
            )

            br, bc, kk = cfg.packet_geom
            p = pack_edges(s_np, r_np, w_np, n_pad,
                           block_r=br, block_c=bc, k=kk)
            p_t = pack_edges_transpose(s_np, r_np, w_np, n_pad,
                                       block_r=br, block_c=bc, k=kk)
            sp: Any = PacketAdj(p, p_t)
            new_n = p.num_nodes
        elif want_res:
            # VMEM-resident stacked path: int8 tiles when the weights are
            # exactly integer (unit adjacencies; rank-1 degree
            # normalizations factor into x/y scalings), bf16 otherwise
            # (`integral` computed above, where the VMEM gate needed it)
            tdt = jnp.int8 if integral else jnp.bfloat16
            if not integral:
                print(
                    "tpugraph: resident fast path quantizes non-integral "
                    "adjacency weights to bf16 tiles (use "
                    "bcsr_resident='off' for exact f32-tile aggregation)",
                    flush=True,
                )
            # s1/kp64: the bench-best resident layout (r4 kp sweep:
            # kernel time is kp-invariant, stacking neutral) — and the
            # stack=1 path needs NO host lexsort/scatter, so the pack is
            # seconds cheaper at scale
            kp_res = 64
            m_host = bcsr_from_coo(s_np, r_np, w_np, n_pad,
                                   block=cfg.bcsr_block, tile_dtype=tdt,
                                   device=False)
            m_t_host = bcsr_transpose_host(s_np, r_np, w_np, n_pad,
                                           block=cfg.bcsr_block,
                                           tile_dtype=tdt, device=False)
            sp = StackedAdj(
                st=stack_bcsr(m_host, stack=1, k_pack=kp_res),
                st_t=stack_bcsr(m_t_host, stack=1, k_pack=kp_res),
                k_pack=kp_res,
            )
            new_n = m_host.num_nodes
        elif model_att:
            # GAT on the BCSR path needs tile gradients: attach the
            # transpose plan so GraphConv routes through the
            # differentiable sddmm_dw/bcsr_matvec_dw kernels (the plain
            # m_t static-weights fast path has no score gradients — an
            # att model would raise at trace time; r5 fix)
            from tpugraph.ops.bcsr import bcsr_transpose_plan

            m = bcsr_from_coo(s_np, r_np, w_np, n_pad,
                              block=cfg.bcsr_block)
            sp = BCSRAdj(m, None, tp=bcsr_transpose_plan(m))
            new_n = m.num_nodes
        else:
            if cfg.bcsr_k_pack < 0:
                kp = choose_k_pack_counts(
                    coo_tile_counts(s_np, r_np, n_pad, block=cfg.bcsr_block,
                                    weights=w_np)
                )
            else:
                kp = cfg.bcsr_k_pack
            prt = kp if kp > 1 else None
            m = bcsr_from_coo(s_np, r_np, w_np, n_pad, block=cfg.bcsr_block,
                              pad_rows_to=prt)
            m_t = bcsr_transpose_host(s_np, r_np, w_np, n_pad,
                                      block=cfg.bcsr_block, pad_rows_to=prt)
            sp = BCSRAdj(m, m_t, k_pack=kp if kp > 1 else 0)
            new_n = m.num_nodes
        if new_n > n_pad:
            extra = new_n - n_pad
            feat = np.pad(np.asarray(feat), ((0, extra), (0, 0)))
            labels_pad = np.pad(labels_pad, (0, extra))
            train_mask = np.pad(train_mask, (0, extra))
            test_mask = np.pad(test_mask, (0, extra))
            n_pad = new_n
    else:
        sp = SparseAdj(g.senders, g.receivers, g.edge_weight)
    x = jnp.asarray(feat, dtype=jnp.float32)
    y = jnp.asarray(labels_pad)
    train_mask_d = jnp.asarray(train_mask)
    test_mask_d = jnp.asarray(test_mask)
    cw = None if class_weight is None else jnp.asarray(class_weight, jnp.float32)

    params = (
        init_params
        if init_params is not None
        else model.init(jax.random.PRNGKey(seed), x, sp)
    )
    has_dropout = getattr(model, "dropout", 0.0) > 0.001
    run_chunk, tx = _chunk_runner(model, _opt_config(cfg), has_dropout)
    opt_state = init_opt_state if init_opt_state is not None else tx.init(params)

    history: Dict[str, List[float]] = {"loss": [], "train_acc": [], "test_acc": []}
    begin = time.time()
    done = 0
    drop_key = jax.random.PRNGKey(seed + 1)
    while done < cfg.num_epochs:
        chunk = min(cfg.scan_chunk, cfg.num_epochs - done)
        (params, opt_state, drop_key), (losses, tr_acc, te_acc) = run_chunk(
            params, opt_state, drop_key, x, sp, y, train_mask_d, test_mask_d,
            cw, chunk,
        )
        done += chunk
        history["loss"].extend(np.asarray(losses).tolist())
        history["train_acc"].extend(np.asarray(tr_acc).tolist())
        history["test_acc"].extend(np.asarray(te_acc).tolist())
        if log_fn is not None:
            log_fn(
                done,
                {
                    "loss": history["loss"][-1],
                    "train_acc": history["train_acc"][-1],
                    "test_acc": history["test_acc"][-1],
                },
            )
    elapsed = time.time() - begin

    # Final eval-mode forward producing the cg `pred` (reference
    # train.py:346-358).
    logits, _ = _eval_forward(model)(params, x, sp)
    ypred = np.asarray(logits)[None]  # [1, N_pad, C]
    result_train, result_test = eval_node(
        ypred[:, :n_real], np.asarray(labels)[None], train_idx, test_idx
    )

    return {
        "params": params,
        "opt_state": opt_state,
        "ypred": ypred,
        "train_idx": train_idx,
        "test_idx": test_idx,
        "history": history,
        "result_train": result_train,
        "result_test": result_test,
        "elapsed": elapsed,
    }


def train_node_classifier_halo(
    model,
    g: Graph,
    feat: np.ndarray,
    labels: np.ndarray,
    cfg: TrainConfig,
    n_dev: int,
    axis="data",
    overlap: str = "auto",
    partition: str = "locality",
    class_weight: Optional[np.ndarray] = None,
    seed: int = 0,
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
) -> Dict[str, Any]:
    """Node-partitioned full-batch training over a device mesh — the
    CLI-reachable halo path (VERDICT r4 item 5; ``--halo N`` on the
    train CLI).

    Features, labels and masks stay node-sharded across all layers; each
    GraphConv does one boundary-only ``all_to_all``
    (:func:`tpugraph.nn.layers.halo_exchange`).  ``partition="locality"``
    relabels nodes with the balanced label-propagation min-cut
    partitioner first (``parallel.spmd.locality_partition``);
    ``overlap`` follows :func:`tpugraph.parallel.spmd.resolve_halo_overlap`
    ("auto" = overlap only on real multi-device hardware).  With
    ``cfg.use_bcsr`` the per-shard aggregation runs on the Pallas BCSR
    kernel.  Dropout is not supported on this path (the sharded step
    carries no rng); the reference default is dropout=0.

    Returns the same dict as :func:`train_node_classifier` (params,
    ypred over ORIGINAL node ids, split indices, history, metrics).
    """
    from tpugraph.core.graph import graph_from_edges
    from tpugraph.parallel.mesh import make_mesh
    from tpugraph.parallel.spmd import (
        build_halo,
        locality_partition,
        make_halo_forward,
        make_halo_train_step,
    )

    if getattr(model, "dropout", 0.0) > 0.001:
        raise NotImplementedError(
            "halo training is deterministic (no dropout rng); set "
            "dropout=0 or use the single-device path"
        )
    rng = np.random.default_rng(seed)
    n_real = int(g.n_node)
    old_n = g.num_nodes_padded
    train_idx, test_idx = split_nodes(n_real, cfg.train_ratio, rng)

    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    w = np.asarray(g.edge_weight)
    live = w != 0
    if partition == "locality":
        perm, inv = locality_partition(
            s[live], r[live], old_n, n_dev, weights=w[live]
        )
    elif partition == "none":
        n_pad0 = ((old_n + n_dev - 1) // n_dev) * n_dev
        perm = np.arange(n_pad0)
        inv = perm
    else:
        raise ValueError(f"partition must be 'locality'/'none': {partition}")
    n_pad = len(perm)
    g2 = graph_from_edges(
        inv[s[live]].astype(np.int32), inv[r[live]].astype(np.int32),
        n_pad, edge_weight=w[live],
    )
    # graph_from_edges re-pads nodes; the partitioned graph is already
    # ns*n_dev so no growth is expected
    mesh = make_mesh(n_dev) if isinstance(axis, str) else make_mesh(
        axis_names=axis, shape=(2, n_dev // 2))
    plan = build_halo(
        g2, mesh, bcsr=cfg.use_bcsr, block=cfg.bcsr_block,
        overlap=overlap, axis=axis,
        att=bool(getattr(model, "att", False)),
    )
    n_total = plan.shard_size * n_dev

    def relabel(payload: np.ndarray, fill=0) -> np.ndarray:
        out_shape = (n_total,) + payload.shape[1:]
        padded = np.full(out_shape, fill, payload.dtype)
        src = np.full((n_pad,) + payload.shape[1:], fill, payload.dtype)
        src[: payload.shape[0]] = payload
        padded[: n_pad] = src[perm]
        return padded

    labels_pad = np.zeros((old_n,), np.int32)
    labels_pad[:n_real] = np.asarray(labels, np.int32)
    tr_mask = np.zeros((old_n,), np.float32)
    tr_mask[train_idx] = 1.0
    te_mask = np.zeros((old_n,), np.float32)
    te_mask[test_idx] = 1.0

    x = jnp.asarray(relabel(np.asarray(feat, np.float32)))
    y = jnp.asarray(relabel(labels_pad))
    tr_m = jnp.asarray(relabel(tr_mask))
    te_m = jnp.asarray(relabel(te_mask))
    cw = (None if class_weight is None
          else jnp.asarray(class_weight, jnp.float32))

    params = model.init(
        jax.random.PRNGKey(seed), jnp.asarray(feat, jnp.float32),
        SparseAdj(g.senders, g.receivers, g.edge_weight),
    )
    tx = build_optimizer(_opt_config(cfg))
    opt_state = tx.init(params)
    step = make_halo_train_step(model, tx, mesh, plan, axis=axis,
                                class_weight=cw)
    fwd = make_halo_forward(model, mesh, plan, axis=axis)

    history: Dict[str, List[float]] = {"loss": [], "train_acc": [],
                                       "test_acc": []}
    begin = time.time()

    def accs():
        logits = np.asarray(fwd(params, plan, x))
        pred = logits.argmax(-1)
        corr = (pred == np.asarray(y)).astype(np.float32)
        trm, tem = np.asarray(tr_m), np.asarray(te_m)
        return (float((corr * trm).sum() / max(trm.sum(), 1.0)),
                float((corr * tem).sum() / max(tem.sum(), 1.0)))

    for ep in range(cfg.num_epochs):
        params, opt_state, loss = step(params, opt_state, plan, x, y,
                                       tr_m)
        history["loss"].append(float(loss))
        if (ep + 1) % cfg.eval_every == 0 or ep + 1 == cfg.num_epochs:
            tr_a, te_a = accs()
            history["train_acc"].append(tr_a)
            history["test_acc"].append(te_a)
            if log_fn is not None:
                log_fn(ep + 1, {"loss": history["loss"][-1],
                                "train_acc": tr_a, "test_acc": te_a})
    elapsed = time.time() - begin

    # final forward, un-relabeled to ORIGINAL node ids for the cg bundle
    logits_new = np.asarray(fwd(params, plan, x))
    logits_old = logits_new[inv[:old_n]]
    ypred = logits_old[None]  # [1, N_pad_old, C]
    result_train, result_test = eval_node(
        ypred[:, :n_real], np.asarray(labels)[None], train_idx, test_idx
    )
    return {
        "params": params,
        "opt_state": opt_state,
        "ypred": ypred,
        "train_idx": train_idx,
        "test_idx": test_idx,
        "history": history,
        "result_train": result_train,
        "result_test": result_test,
        "elapsed": elapsed,
        "n_dev": n_dev,
        "halo_size": plan.halo_size,
    }


def train_graph_classifier(
    model,
    train_batcher,
    cfg: TrainConfig,
    val_batcher=None,
    test_batcher=None,
    linkpred: bool = False,
    seed: int = 0,
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    max_eval_examples: Optional[int] = 100,
    mesh=None,
) -> Dict[str, Any]:
    """Minibatch graph classification (reference ``train``,
    ``train.py:132-261``): Adam(lr=0.001) with grad clipping, per-epoch
    train/val/test eval, best-val tracking, and a cg bundle of the first
    training batches.

    ``model.apply(params, x, adj, node_mask=..., [assign_x=...])`` must
    return ``(logits [B, C], aux)`` where aux is the attention list or the
    DiffPool assignment list (when ``linkpred``).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the train step runs
    data-parallel: batch tensors sharded over the mesh axis, parameters
    replicated, gradient psum inserted by XLA
    (``parallel/spmd.make_dp_graph_train_step``).  The loss trajectory is
    identical to single-device because batches are already fixed-size.
    """
    rng = np.random.default_rng(seed)
    first = train_batcher.batch(np.arange(min(len(train_batcher), cfg.batch_size)))
    uses_assign = linkpred or getattr(model, "assign_hidden_dim", None) is not None

    def apply_model(p, batch_adj, batch_x, batch_mask, batch_assign, key=None):
        kwargs = {"node_mask": batch_mask}
        if uses_assign:
            kwargs["assign_x"] = batch_assign
        if key is not None:
            kwargs["deterministic"] = False
            if getattr(model, "dropout", 0.0) > 0.001:
                kwargs["rngs"] = {"dropout": key}
        return model.apply(p, batch_x, batch_adj, **kwargs)

    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(first.feats),
        jnp.asarray(first.adj),
        node_mask=jnp.asarray(first.node_mask),
        **({"assign_x": jnp.asarray(first.assign_feats)} if uses_assign else {}),
    )
    # Reference hardcodes Adam(lr=0.001) for graph classification
    # (train.py:144-146) with clip (train.py:197) and no weight decay.
    tx = build_optimizer(
        OptimizerConfig(opt="adam", lr=0.001, clip=cfg.clip, weight_decay=0.0)
    )
    opt_state = tx.init(params)

    has_dropout = getattr(model, "dropout", 0.0) > 0.001

    if mesh is not None:
        from tpugraph.parallel.spmd import make_dp_graph_train_step

        n_dev = int(np.prod(list(mesh.shape.values())))
        if cfg.batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide by the "
                f"{n_dev}-device mesh for data parallelism"
            )
        step = make_dp_graph_train_step(
            model, tx, mesh, axis=tuple(mesh.shape.keys())[0],
            linkpred=linkpred, uses_assign=uses_assign,
            has_dropout=has_dropout,
        )
    else:
        @jax.jit
        def step(p, s, key, adj, xb, mask, assign, label):
            def loss_fn(p):
                logits, aux = apply_model(p, adj, xb, mask, assign, key)
                loss = softmax_cross_entropy(logits, label)
                if linkpred and isinstance(aux, (list, tuple)) and len(aux) > 0:
                    loss = loss + link_prediction_loss(aux[0], adj, mask)
                return loss, logits
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return p, s, loss, logits

    @jax.jit
    def infer(p, adj, xb, mask, assign):
        logits, _ = apply_model(p, adj, xb, mask, assign)
        return jnp.argmax(logits, axis=-1)

    def evaluate(batcher, max_examples=None) -> Dict[str, float]:
        preds, labs = [], []
        seen = 0
        for batch in batcher.batches(cfg.batch_size, shuffle=False, pad_final=True):
            pred = np.asarray(
                infer(
                    params,
                    jnp.asarray(batch.adj),
                    jnp.asarray(batch.feats),
                    jnp.asarray(batch.node_mask),
                    jnp.asarray(batch.assign_feats),
                )
            )
            preds.append(pred)
            labs.append(batch.label)
            seen += len(batch.label)
            if max_examples is not None and seen >= max_examples:
                break
        return eval_graph_preds(np.concatenate(preds), np.concatenate(labs))

    history: Dict[str, List[float]] = {"loss": [], "train_acc": [], "val_acc": [],
                                       "test_acc": []}
    best_val = {"epoch": 0, "acc": 0.0, "loss": 0.0}
    test_result = {"epoch": 0, "acc": 0.0}
    cg_batches: List[Any] = []
    cg_preds: List[np.ndarray] = []
    begin = time.time()

    for epoch in range(cfg.num_epochs):
        avg_loss, nb = 0.0, 0
        for bi, batch in enumerate(
            train_batcher.batches(cfg.batch_size, shuffle=True, rng=rng)
        ):
            step_key = jax.random.fold_in(jax.random.PRNGKey(seed), epoch * 10000 + bi)
            params, opt_state, loss, logits = step(
                params,
                opt_state,
                step_key,
                jnp.asarray(batch.adj),
                jnp.asarray(batch.feats),
                jnp.asarray(batch.node_mask),
                jnp.asarray(batch.assign_feats),
                jnp.asarray(batch.label),
            )
            avg_loss += float(loss)
            nb += 1
            if epoch == cfg.num_epochs - 1:
                # cg bundle: first-20-batch tensors + first-5-batch preds
                # (reference train.py:166-190, 253-260)
                if bi < 20:
                    cg_batches.append(batch)
                if bi < 5:
                    cg_preds.append(np.asarray(logits))
        avg_loss /= max(nb, 1)
        history["loss"].append(avg_loss)

        if (epoch % cfg.eval_every == 0) or epoch == cfg.num_epochs - 1:
            tr = evaluate(train_batcher, max_eval_examples)
            history["train_acc"].append(tr["acc"])
            scalars = {"loss": avg_loss, "train_acc": tr["acc"]}
            if val_batcher is not None and len(val_batcher) > 0:
                vr = evaluate(val_batcher)
                history["val_acc"].append(vr["acc"])
                scalars["val_acc"] = vr["acc"]
                if vr["acc"] > best_val["acc"] - 1e-7:
                    best_val = {"epoch": epoch, "acc": vr["acc"], "loss": avg_loss}
            if test_batcher is not None and len(test_batcher) > 0:
                te = evaluate(test_batcher)
                history["test_acc"].append(te["acc"])
                test_result = {"epoch": epoch, "acc": te["acc"]}
                scalars["test_acc"] = te["acc"]
            if log_fn is not None:
                log_fn(epoch, scalars)

    elapsed = time.time() - begin
    cg_dict = None
    if cg_batches:
        cg_dict = {
            "adj": np.concatenate([b.adj for b in cg_batches], axis=0),
            "feat": np.concatenate([b.feats for b in cg_batches], axis=0),
            "label": np.concatenate([b.label for b in cg_batches], axis=0),
            "num_nodes": np.concatenate([b.num_nodes for b in cg_batches], axis=0),
            "pred": np.expand_dims(np.concatenate(cg_preds, axis=0), axis=0),
            "train_idx": np.arange(len(train_batcher)),
        }
    return {
        "params": params,
        "history": history,
        "best_val": best_val,
        "test_result": test_result,
        "cg": cg_dict,
        "elapsed": elapsed,
    }
