"""GCN encoders for node and graph classification, plus DiffPool.

Re-designs of the reference model family (reference ``models.py:83-617``):

* :class:`GcnEncoderGraph` — graph classification: first/block/last conv
  stack with ReLU (+optional stateless BN), per-layer max-pool readout and
  concatenated skip connections (``pred_input_dim = hidden*(L-1) + emb``,
  reference ``models.py:126-129``), linear/MLP head.
* :class:`GcnEncoderNode` — node classification: same conv stack, per-node
  concatenated embeddings, per-node linear head (reference
  ``models.py:331-380``).
* :class:`SoftPoolingGcnEncoder` — DiffPool hierarchical graph
  classification (reference ``models.py:383-617``): learned soft cluster
  assignment ``S = softmax(GNN_assign(x, A))``, pooled ``x' = S^T Z``,
  ``A' = S^T A S``, with optional link-prediction auxiliary loss.  The
  reference's version is broken against its own ``gcn_forward`` signature
  (it treats the 2-tuple return as one tensor, ``models.py:523-527``);
  this implementation realizes the intended behavior.

Deviations from the reference, on purpose:
* BN is the reference's *intended* semantics — a stateless normalization
  (the reference re-creates an untrained BatchNorm each call,
  ``models.py:222-228``) — and remains off by default like the reference
  CLI (``--bn`` flag).
* Max-pool readout masks padded nodes (the reference builds
  ``construct_mask`` but forgets to apply it in ``forward``,
  ``models.py:269-316``); set ``mask_pooling=False`` to reproduce the
  unmasked behavior bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpugraph.nn.initializers import torch_linear_kernel, torch_linear_bias
from tpugraph.nn.layers import Adjacency, GraphConv, SparseAdj, fresh_batch_norm


def _torch_dense(features: int, in_dim: int, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel,
        bias_init=torch_linear_bias(in_dim),
        name=name,
    )


class PredHead(nn.Module):
    """Linear or MLP prediction head (reference ``models.py:193-207``)."""

    input_dim: int
    hidden_dims: Sequence[int]
    label_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if len(self.hidden_dims) == 0:
            return _torch_dense(self.label_dim, self.input_dim, "pred")(x)
        d = self.input_dim
        for i, h in enumerate(self.hidden_dims):
            x = _torch_dense(h, d, f"pred_hidden_{i}")(x)
            x = nn.relu(x)
            d = h
        return _torch_dense(self.label_dim, d, "pred")(x)


class ConvStack(nn.Module):
    """conv_first -> (L-2) x conv_block -> conv_last with ReLU/BN between,
    returning the per-layer concatenation (reference ``gcn_forward``,
    ``models.py:230-267``).  ``normalize=True`` L2-normalizes embeddings per
    node as the reference encoders always do (``models.py:120``)."""

    input_dim: int
    hidden_dim: int
    embedding_dim: int
    num_layers: int
    add_self: bool = False
    use_bias: bool = True
    att: bool = False
    bn: bool = False
    dropout: float = 0.0
    concat: bool = True

    @property
    def output_dim(self) -> int:
        if self.concat:
            return self.hidden_dim * (self.num_layers - 1) + self.embedding_dim
        return self.embedding_dim

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        embedding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, list]:
        def conv(i, in_dim, out_dim, name):
            return GraphConv(
                input_dim=in_dim,
                output_dim=out_dim,
                add_self=self.add_self,
                normalize_embedding=True,
                dropout=self.dropout if name.startswith("conv_block") else 0.0,
                use_bias=self.use_bias,
                att=self.att,
                name=name,
            )

        x, adj_att = conv(0, self.input_dim, self.hidden_dim, "conv_first")(
            x, adj, deterministic
        )
        x = nn.relu(x)
        if self.bn:
            x = fresh_batch_norm(x)
        x_all = [x]
        att_all = [adj_att]
        for i in range(self.num_layers - 2):
            x, adj_att = conv(
                i + 1, self.hidden_dim, self.hidden_dim, f"conv_block_{i}"
            )(x, adj, deterministic)
            x = nn.relu(x)
            if self.bn:
                x = fresh_batch_norm(x)
            x_all.append(x)
            att_all.append(adj_att)
        x, adj_att = conv(
            self.num_layers - 1, self.hidden_dim, self.embedding_dim, "conv_last"
        )(x, adj, deterministic)
        x_all.append(x)
        att_all.append(adj_att)

        x_tensor = jnp.concatenate(x_all, axis=-1) if self.concat else x
        if embedding_mask is not None:
            x_tensor = x_tensor * embedding_mask[..., None]
        return x_tensor, att_all


def _masked_max_pool(
    x: jax.Array, node_mask: Optional[jax.Array], mask_pooling: bool
) -> jax.Array:
    """Max over the node axis; padded nodes excluded when masking is on."""
    if node_mask is not None and mask_pooling:
        x = jnp.where(node_mask[..., None] > 0, x, -1e9)
    return jnp.max(x, axis=-2)


class GcnEncoderGraph(nn.Module):
    """Graph classification encoder (reference ``models.py:83-328``).

    Call with dense ``adj [B, N, N]`` and ``x [B, N, D]`` (MXU path; the
    reference's graphs are <=100 nodes so dense batched matmul is optimal on
    TPU), or sparse ``SparseAdj`` with unbatched ``x [N, D]`` under ``vmap``.
    Returns ``(ypred [B, C], att_list)``.
    """

    input_dim: int
    hidden_dim: int
    embedding_dim: int
    label_dim: int
    num_layers: int
    pred_hidden_dims: Sequence[int] = ()
    concat: bool = True
    bn: bool = False
    dropout: float = 0.0
    add_self: bool = False
    use_bias: bool = True
    att: bool = False
    mask_pooling: bool = True

    @property
    def pred_input_dim(self) -> int:
        if self.concat:
            return self.hidden_dim * (self.num_layers - 1) + self.embedding_dim
        return self.embedding_dim

    def _stack(self) -> ConvStack:
        return ConvStack(
            input_dim=self.input_dim,
            hidden_dim=self.hidden_dim,
            embedding_dim=self.embedding_dim,
            num_layers=self.num_layers,
            add_self=self.add_self,
            use_bias=self.use_bias,
            att=self.att,
            bn=self.bn,
            dropout=self.dropout,
            concat=True,
            name="stack",
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        node_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        # Per-layer max-pool readout with concat skip connections
        # (reference models.py:269-316).
        x_tensor, att_all = self._stack()(x, adj, None, deterministic)
        # x_tensor is the concat of per-layer activations; split back to
        # pool each layer's output exactly like the reference.
        sizes = [self.hidden_dim] * (self.num_layers - 1) + [self.embedding_dim]
        outs = []
        offset = 0
        for s in sizes:
            outs.append(
                _masked_max_pool(
                    x_tensor[..., offset : offset + s], node_mask, self.mask_pooling
                )
            )
            offset += s
        output = jnp.concatenate(outs, axis=-1) if self.concat else outs[-1]
        ypred = PredHead(
            self.pred_input_dim, tuple(self.pred_hidden_dims), self.label_dim,
            name="pred_model",
        )(output)
        return ypred, att_all


class GcnEncoderNode(nn.Module):
    """Node classification encoder (reference ``models.py:331-380``):
    concatenated per-layer node embeddings, per-node linear head.

    Sparse path: ``x [N, D]`` + ``SparseAdj`` -> ``ypred [N, C]``.
    Dense path: ``x [B, N, D]`` + ``adj [B, N, N]`` -> ``ypred [B, N, C]``.
    """

    input_dim: int
    hidden_dim: int
    embedding_dim: int
    label_dim: int
    num_layers: int
    pred_hidden_dims: Sequence[int] = ()
    concat: bool = True
    bn: bool = False
    dropout: float = 0.0
    add_self: bool = False
    use_bias: bool = True
    att: bool = False

    @property
    def pred_input_dim(self) -> int:
        if self.concat:
            return self.hidden_dim * (self.num_layers - 1) + self.embedding_dim
        return self.embedding_dim

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        node_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        stack = ConvStack(
            input_dim=self.input_dim,
            hidden_dim=self.hidden_dim,
            embedding_dim=self.embedding_dim,
            num_layers=self.num_layers,
            add_self=self.add_self,
            use_bias=self.use_bias,
            att=self.att,
            bn=self.bn,
            dropout=self.dropout,
            concat=self.concat,
            name="stack",
        )
        embedding, att_all = stack(x, adj, node_mask, deterministic)
        ypred = PredHead(
            self.pred_input_dim, tuple(self.pred_hidden_dims), self.label_dim,
            name="pred_model",
        )(embedding)
        return ypred, att_all


class SoftPoolingGcnEncoder(nn.Module):
    """DiffPool graph classification (reference ``models.py:383-617``),
    with the intended (fixed) dataflow:

    for each pooling stage i:
      Z = ConvStack_embed_i(x, A)                      # concat features
      S = softmax(Linear(ConvStack_assign_i(x_a, A)))  # [N_i, N_{i+1}]
      x <- S^T Z ;  A <- S^T A S ;  x_a <- x
    readout: max-pool of every stage's Z, concatenated -> MLP head.

    Dense-only: pooled graphs are small and dense by construction, so the
    MXU path is the right one throughout.
    """

    max_num_nodes: int
    input_dim: int
    hidden_dim: int
    embedding_dim: int
    label_dim: int
    num_layers: int
    assign_hidden_dim: int
    assign_ratio: float = 0.25
    assign_num_layers: int = -1
    num_pooling: int = 1
    pred_hidden_dims: Sequence[int] = (50,)
    concat: bool = True
    bn: bool = False
    dropout: float = 0.0
    use_bias: bool = True
    att: bool = False
    linkpred: bool = True
    assign_input_dim: int = -1
    mask_pooling: bool = True

    @property
    def pred_input_dim(self) -> int:
        if self.concat:
            return self.hidden_dim * (self.num_layers - 1) + self.embedding_dim
        return self.embedding_dim

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        adj: jax.Array,
        node_mask: Optional[jax.Array] = None,
        assign_x: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        x_a = assign_x if assign_x is not None else x
        add_self = not self.concat
        assign_num_layers = (
            self.assign_num_layers if self.assign_num_layers > 0 else self.num_layers
        )
        assign_input_dim = (
            self.assign_input_dim if self.assign_input_dim > 0 else self.input_dim
        )

        def embed_stack(in_dim, name):
            return ConvStack(
                input_dim=in_dim,
                hidden_dim=self.hidden_dim,
                embedding_dim=self.embedding_dim,
                num_layers=self.num_layers,
                add_self=add_self,
                use_bias=self.use_bias,
                att=self.att,
                bn=self.bn,
                dropout=self.dropout,
                concat=True,
                name=name,
            )

        out_all = []
        assign_tensors = []

        # Stage 0 embedding on the original graph.
        embedding, _ = embed_stack(self.input_dim, "stack")(
            x, adj, node_mask, deterministic
        )
        out_all.append(_masked_max_pool(embedding, node_mask, self.mask_pooling))

        assign_dim = int(self.max_num_nodes * self.assign_ratio)
        cur_mask = node_mask
        for i in range(self.num_pooling):
            assign_stack = ConvStack(
                input_dim=assign_input_dim,
                hidden_dim=self.assign_hidden_dim,
                embedding_dim=assign_dim,
                num_layers=assign_num_layers,
                add_self=add_self,
                use_bias=self.use_bias,
                att=self.att,
                bn=self.bn,
                dropout=0.0,
                concat=True,
                name=f"assign_stack_{i}",
            )
            assign_feat, _ = assign_stack(x_a, adj, cur_mask, deterministic)
            assign_pred_in = (
                self.assign_hidden_dim * (assign_num_layers - 1) + assign_dim
                if self.concat
                else assign_dim
            )
            logits = PredHead(assign_pred_in, (), assign_dim, name=f"assign_pred_{i}")(
                assign_feat
            )
            s = jax.nn.softmax(logits, axis=-1)
            if cur_mask is not None:
                s = s * cur_mask[..., None]
            assign_tensors.append(s)

            # Pool: x' = S^T Z, A' = S^T A S (reference models.py:548-558).
            st = jnp.swapaxes(s, -1, -2)
            x = jnp.matmul(st, embedding, preferred_element_type=jnp.float32)
            adj = jnp.matmul(
                jnp.matmul(st, adj, preferred_element_type=jnp.float32),
                s,
                preferred_element_type=jnp.float32,
            )
            x_a = x
            cur_mask = None  # pooled graphs are fully dense / unpadded

            embedding, _ = embed_stack(self.pred_input_dim, f"after_pool_stack_{i}")(
                x, adj, None, deterministic
            )
            out_all.append(_masked_max_pool(embedding, None, False))

            assign_input_dim = self.embedding_dim
            assign_dim = int(assign_dim * self.assign_ratio)

        output = (
            jnp.concatenate(out_all, axis=-1) if self.concat else out_all[-1]
        )
        ypred = PredHead(
            self.pred_input_dim * (self.num_pooling + 1),
            tuple(self.pred_hidden_dims),
            self.label_dim,
            name="pred_model",
        )(output)
        return ypred, assign_tensors
