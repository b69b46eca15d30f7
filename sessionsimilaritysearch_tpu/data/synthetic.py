"""Synthetic session generator.

The reference consumes pickled Amazon session lists that are not shipped
(reference: pretrain_filtered_amazon.py:212 loads
``us-filtered-split-train-data.pkl``). This generator produces sessions with
the same action schema (decompose_data.py:5-43) and enough latent structure
(product-type clusters, shared query vocabulary) that all four similarity
labelers (similarity.py) produce a meaningful signal, so the full train /
index / retrieve / evaluate pipeline is exercisable end-to-end.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sessionsimilaritysearch_tpu.data.schema import Action

_ADJ = [
    "red", "blue", "large", "small", "wireless", "portable", "classic",
    "modern", "compact", "premium", "budget", "ergonomic", "vintage", "smart",
]
_NOUN = [
    "lamp", "keyboard", "shoe", "bottle", "camera", "backpack", "speaker",
    "monitor", "chair", "kettle", "router", "jacket", "watch", "blender",
]


class SyntheticSessionGenerator:
    """Generates clustered e-commerce sessions.

    - ``n_types`` product types; each product belongs to one type.
    - Each session draws a small set of "interest" types; searches use
      keywords from those types' vocab; clicks/adds/purchases hit products of
      those types. Sessions sharing interests are similar under every
      labeler.
    """

    def __init__(
        self,
        asin_num: int = 1000,
        n_types: int = 20,
        n_brands: int = 50,
        seed: int = 0,
    ):
        self.asin_num = asin_num
        self.n_types = n_types
        self.rng = np.random.default_rng(seed)
        # catalog: asin -> (type, brand, title)
        self.product_type = self.rng.integers(0, n_types, size=asin_num)
        self.brand = self.rng.integers(0, n_brands, size=asin_num)
        self.type_name = [
            f"{_ADJ[t % len(_ADJ)]} {_NOUN[(t * 7) % len(_NOUN)]}"
            for t in range(n_types)
        ]
        self.titles = [
            f"{self.type_name[self.product_type[a]]} brand{self.brand[a]} model{a % 97}"
            for a in range(asin_num)
        ]
        # products grouped by type for fast sampling
        self.by_type = [
            np.where(self.product_type == t)[0] for t in range(n_types)
        ]

    def _make_action(self, t: float, kind: str, asin: int) -> Action:
        return Action(
            timestamp=t,
            action_type=kind,
            keyword=None,
            asin=f"ASIN{int(asin):07d}",
            product_type=self.type_name[self.product_type[asin]],
            brand=f"brand{self.brand[asin]}",
            title=self.titles[asin],
            asin_id=int(asin),
        )

    def _make_search(self, t: float, typ: int) -> Action:
        words = self.type_name[typ].split()
        k = self.rng.integers(1, len(words) + 1)
        kw = " ".join(
            words[i] for i in sorted(self.rng.choice(len(words), k, replace=False))
        )
        return Action(t, "s", kw, None, None, None, None)

    def session(self, max_len: int = 20, min_len: int = 4) -> List[Action]:
        n = int(self.rng.integers(min_len, max_len + 1))
        n_interests = int(self.rng.integers(1, 4))
        interests = self.rng.choice(self.n_types, n_interests, replace=False)
        actions: List[Action] = []
        t = 0.0
        cur_type = int(self.rng.choice(interests))
        for _ in range(n):
            t += float(self.rng.exponential(10.0))
            r = self.rng.random()
            if r < 0.25:
                cur_type = int(self.rng.choice(interests))
                actions.append(self._make_search(t, cur_type))
            else:
                pool = self.by_type[cur_type]
                if len(pool) == 0:
                    pool = np.arange(self.asin_num)
                asin = int(self.rng.choice(pool))
                kind = "c" if r < 0.85 else ("ca" if r < 0.95 else "p")
                actions.append(self._make_action(t, kind, asin))
        # guarantee at least one product interaction
        if all(a.action_type == "s" for a in actions):
            actions.append(
                self._make_action(t + 1.0, "c", int(self.rng.choice(self.by_type[cur_type])))
            )
        return actions

    def datum(self, max_len: int = 20) -> Tuple[List[Action], List[Action]]:
        """One (prefix, future) pair: generate a session and split it."""
        s = self.session(max_len=max_len)
        if len(s) < 2:
            return s, []
        cut = int(self.rng.integers(1, len(s)))
        return s[:cut], s[cut:]

    def dataset(self, n: int, max_len: int = 20):
        return [self.datum(max_len=max_len) for _ in range(n)]
