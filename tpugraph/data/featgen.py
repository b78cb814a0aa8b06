"""Node feature generators (reference ``utils/featgen.py:13-74``).

Same abstract API as the reference, with explicit ``numpy.random.Generator``
seeding for deterministic dataset builds (the reference relies on global
numpy state)."""

from __future__ import annotations

import abc
from typing import Optional

import networkx as nx
import numpy as np


class FeatureGen(metaclass=abc.ABCMeta):
    """Feature generator base class."""

    @abc.abstractmethod
    def gen_node_features(self, G: nx.Graph) -> None:
        """Attach a ``feat`` attribute (np.float32 array) to every node."""


class ConstFeatureGen(FeatureGen):
    """Constant feature vector for every node (reference ``featgen.py:20-29``)."""

    def __init__(self, val):
        self.val = val

    def gen_node_features(self, G: nx.Graph) -> None:
        feat = np.array(self.val, dtype=np.float32)
        nx.set_node_attributes(G, {i: {"feat": feat.copy()} for i in G.nodes()})


class GaussianFeatureGen(FeatureGen):
    """Multivariate-normal features (reference ``featgen.py:32-46``)."""

    def __init__(self, mu, sigma, rng: Optional[np.random.Generator] = None):
        self.mu = np.asarray(mu, dtype=np.float64)
        sigma = np.asarray(sigma, dtype=np.float64)
        self.sigma = np.diag(sigma) if sigma.ndim < 2 else sigma
        self.rng = rng or np.random.default_rng()

    def gen_node_features(self, G: nx.Graph) -> None:
        feat = self.rng.multivariate_normal(
            self.mu, self.sigma, G.number_of_nodes()
        ).astype(np.float32)
        nx.set_node_attributes(
            G, {n: {"feat": feat[i]} for i, n in enumerate(G.nodes())}
        )


class GridFeatureGen(FeatureGen):
    """Community label (by degree threshold) + Gaussian noise feature
    (reference ``featgen.py:49-73``)."""

    def __init__(self, mu, sigma, com_choices, rng: Optional[np.random.Generator] = None):
        self.mu = mu
        self.sigma = sigma
        self.com_choices = com_choices
        self.rng = rng or np.random.default_rng()

    def gen_node_features(self, G: nx.Graph):
        # Community membership: low-degree (< 4) nodes get the first choice,
        # high-degree nodes the second; feature = [community, noise].
        nodes = list(G.nodes())
        degrees = np.array([G.degree(n) for n in nodes])
        communities = np.where(degrees < 4, self.com_choices[0],
                               self.com_choices[1])
        noise = self.rng.normal(self.mu, self.sigma, len(nodes))
        feats = np.stack([communities, noise], axis=1).astype(np.float32)
        nx.set_node_attributes(
            G, {n: {"feat": feats[i]} for i, n in enumerate(nodes)}
        )
        return dict(zip(nodes, communities.tolist()))
