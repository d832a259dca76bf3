"""Multi-prefix cache manager (serving/prefix_cache.py) + per-request
prefixes in the continuous batcher.

Correctness anchors: exact hits return the stored snapshot without
recompute, extend hits grow the longest stored prefix (engine.extend
path — accuracy class documented there), LRU eviction respects the byte
budget, and a batcher request with prefix_tokens is token-equal to the
engine's generate(prefix=) for the same snapshot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.batcher import ContinuousBatcher, Request
from kivi_tpu.serving.engine import Engine
from kivi_tpu.serving.prefix_cache import PrefixCache, snapshot_bytes

CFG = tiny_config()
QCFG = QuantConfig(k_bits=8, v_bits=8, group_size=32, residual_length=32)
PARAMS = modeling.init_params(CFG, jax.random.PRNGKey(0),
                              dtype=jnp.float32)


def _eng(max_seq=256):
    # default (bf16) cache dtype: snapshots must match the batcher's
    # slot-cache dtype to be loadable into slots
    return Engine(cfg=CFG, qcfg=QCFG, params=PARAMS, max_seq_len=max_seq,
                  batch_size=1)


def _ids(seed, n):
    return [int(t) for t in
            np.random.default_rng(seed).integers(1, CFG.vocab_size, n)]


def test_exact_hit_returns_stored_snapshot():
    pc = PrefixCache(_eng())
    a = _ids(0, 40)
    s1 = pc.get(a)
    s2 = pc.get(a)
    assert s1 is s2 and pc.misses == 1 and pc.hits == 1
    assert s1.length == 40 and len(pc) == 1


def test_longest_prefix_extend():
    pc = PrefixCache(_eng())
    a = _ids(1, 32)
    pc.get(a)                       # miss
    pc.get(a[:16] + _ids(2, 8))     # shares only 16 tokens -> no match
    s = pc.get(a + _ids(3, 16))     # extend of the 32-token snapshot
    assert pc.misses == 2 and pc.extends == 1
    assert s.length == 48
    # extended snapshot equals engine.extend of the stored base
    base, n = pc.lookup(a)
    assert n == 32
    want = _eng().extend(base, jnp.asarray(s.tokens[0, 32:]))
    np.testing.assert_array_equal(np.asarray(s.tokens),
                                  np.asarray(want.tokens))


def test_lru_eviction_under_byte_budget():
    eng = _eng()
    pc = PrefixCache(eng)
    one = snapshot_bytes(pc.get(_ids(10, 32)))
    pc = PrefixCache(eng, max_bytes=int(2.5 * one))
    keys = [_ids(11, 32), _ids(12, 32), _ids(13, 32)]
    pc.get(keys[0])
    pc.get(keys[1])
    pc.get(keys[0])        # keys[1] becomes LRU
    pc.get(keys[2])        # budget forces one eviction
    assert pc.evictions == 1 and len(pc) == 2
    assert pc.lookup(keys[1])[0] is None      # the LRU one went
    assert pc.lookup(keys[0])[0] is not None
    assert pc.nbytes <= pc.max_bytes


def test_oversized_snapshot_not_stored():
    eng = _eng()
    probe = PrefixCache(eng)
    one = snapshot_bytes(probe.get(_ids(14, 32)))
    pc = PrefixCache(eng, max_bytes=one // 2)
    s = pc.get(_ids(15, 32))
    assert s.length == 32 and len(pc) == 0


def test_batcher_per_request_prefix_matches_engine():
    eng = _eng()
    pc = PrefixCache(eng)
    pfx = _ids(20, 40)
    prompt = _ids(21, 12)
    bat = ContinuousBatcher(CFG, QCFG, PARAMS, num_slots=2,
                            max_seq_len=256, prefix_cache=pc)
    res = bat.run([Request(uid=0, prompt=prompt, max_new_tokens=8,
                           prefix_tokens=pfx),
                   Request(uid=1, prompt=_ids(22, 9), max_new_tokens=8,
                           prefix_tokens=pfx)])
    assert pc.misses == 1 and pc.hits == 1   # second request reused it
    snap = pc.get(pfx)
    eng2 = Engine(cfg=CFG, qcfg=QCFG, params=PARAMS, max_seq_len=256,
                  batch_size=1)
    want = np.asarray(eng2.generate(jnp.asarray([prompt], jnp.int32), 8,
                                    prefix=snap))
    assert res[0].tokens == list(want[0])


def test_submit_prefix_without_cache_raises():
    bat = ContinuousBatcher(CFG, QCFG, PARAMS, num_slots=1,
                            max_seq_len=128)
    with pytest.raises(ValueError, match="prefix_cache"):
        bat.submit(Request(uid=0, prompt=[1, 2], max_new_tokens=2,
                           prefix_tokens=[3, 4]))
