"""Dense oracle ops.

Direct dense-adjacency implementations mirroring the reference's math
(``models.py:58-80``) exactly.  Used (a) for parity tests against the sparse
path and (b) as the compute path for small batched graph classification,
where a ``[B, 100, 100] @ [B, 100, D]`` batched matmul maps straight onto
the MXU and beats any sparse format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_spmm(adj: jax.Array, x: jax.Array) -> jax.Array:
    """``adj @ x`` with adjacency convention ``adj[r, s]`` (message from s
    to r), batched over leading dims.  Reference ``models.py:70``."""
    return jnp.matmul(adj, x, preferred_element_type=jnp.float32)


def dense_sddmm(adj_support: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """``(a @ b^T) * support`` — dense attention scores restricted to edge
    support.  Reference ``models.py:62-68`` computes the full product; we
    mask to the support which is all downstream consumers ever use."""
    scores = jnp.matmul(a, jnp.swapaxes(b, -1, -2), preferred_element_type=jnp.float32)
    return scores * (adj_support != 0)
