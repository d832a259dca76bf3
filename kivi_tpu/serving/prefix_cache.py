"""Multi-prefix snapshot store: longest-prefix reuse + byte-budget LRU.

`Engine.prefill_prefix` gives ONE shared prefix; a real serving tier
holds MANY (system prompts per tenant, multi-turn conversation heads)
and reuses partial overlaps.  This manager stores `PrefixSnapshot`s
keyed by their token ids and answers "give me a snapshot for exactly
these tokens" three ways, cheapest first:

  * exact hit — return the stored snapshot (broadcast-at-generate makes
    sharing safe: snapshots are immutable pytrees);
  * extend hit — the longest stored strict prefix is grown by the
    remaining tokens through `Engine.extend` (one extend forward over
    the tail; the tail attends the quantized prefix, the same accuracy
    class as chunked prefill / decode);
  * miss — full `prefill_prefix` (exact attention).

Eviction is least-recently-used under a device-byte budget (KIVI's 2/4
-bit stores are what make holding many prefixes viable at all: a 4K
Llama-2-7B prefix is ~0.5 GB in fp16 K/V, ~120 MB at 2-bit).  The
reference has no cache reuse of any kind — every `generate()` call
re-prefills from scratch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from kivi_tpu.serving.engine import Engine, PrefixSnapshot


def snapshot_bytes(snap: PrefixSnapshot) -> int:
    """Device bytes held by a snapshot (packed stores + scales + fp
    windows + tokens)."""
    leaves = jax.tree_util.tree_leaves((snap.caches, snap.tokens))
    return int(sum(getattr(a, "nbytes", 0) for a in leaves))


class PrefixCache:
    """LRU store of prefilled prompt prefixes for one Engine.

    max_bytes: device-byte budget over stored snapshots (None =
    unbounded).  A single snapshot larger than the budget is returned
    but not stored.
    """

    def __init__(self, engine: Engine, max_bytes: Optional[int] = None):
        self.engine = engine
        self.max_bytes = max_bytes
        self._store: dict[tuple, PrefixSnapshot] = {}
        self._last_use: dict[tuple, int] = {}
        self._clock = 0
        self.hits = self.extends = self.misses = self.evictions = 0

    # -- introspection ------------------------------------------------------

    def __len__(self) -> int:
        return len(self._store)

    @property
    def nbytes(self) -> int:
        return sum(snapshot_bytes(s) for s in self._store.values())

    # -- lookup / insert ----------------------------------------------------

    @staticmethod
    def _key(tokens) -> tuple:
        return tuple(int(t) for t in np.asarray(tokens).reshape(-1))

    def lookup(self, tokens) -> Tuple[Optional[PrefixSnapshot], int]:
        """Longest stored snapshot whose tokens prefix `tokens` (the
        query itself counts).  Returns (snapshot | None, matched_len);
        does NOT touch the LRU clock or counters."""
        key = self._key(tokens)
        best, blen = None, 0
        for k, snap in self._store.items():
            n = len(k)
            if n > blen and n <= len(key) and key[:n] == k:
                best, blen = snap, n
        return best, blen

    def get(self, tokens) -> PrefixSnapshot:
        """Snapshot covering EXACTLY `tokens`, reusing the longest
        stored prefix (see module docstring for the three paths).  The
        result is stored (subject to the byte budget) and marked
        most-recently-used."""
        key = self._key(tokens)
        if not key:
            raise ValueError("empty prefix")
        snap, n = self.lookup(key)
        if n == len(key):
            self.hits += 1
        elif snap is not None:
            self.extends += 1
            self._touch(self._key(snap.tokens))  # the base stays warm
            snap = self.engine.extend(
                snap, jax.numpy.asarray(key[n:], jax.numpy.int32))
        else:
            self.misses += 1
            snap = self.engine.prefill_prefix(
                jax.numpy.asarray(key, jax.numpy.int32))
        self._insert(key, snap)
        return snap

    def put(self, snap: PrefixSnapshot) -> None:
        """Store an externally-built snapshot (e.g. load_prefix_snapshot
        after a restart)."""
        self._insert(self._key(snap.tokens), snap)

    # -- LRU ----------------------------------------------------------------

    def _touch(self, key: tuple) -> None:
        if key in self._store:
            self._clock += 1
            self._last_use[key] = self._clock

    def _insert(self, key: tuple, snap: PrefixSnapshot) -> None:
        self._store[key] = snap
        self._touch(key)
        if self.max_bytes is None:
            return
        while self.nbytes > self.max_bytes and len(self._store) > 1:
            victim = min((k for k in self._store if k != key),
                         key=self._last_use.__getitem__)
            del self._store[victim], self._last_use[victim]
            self.evictions += 1
        if self.nbytes > self.max_bytes:      # lone oversized snapshot
            self._store.pop(key, None)
            self._last_use.pop(key, None)
