"""Failure detection + elastic recovery (parallel/elastic.py).

SURVEY.md §5.3: the reference has nothing here; on TPU the failure
signature is a silently hanging collective, so detection is out-of-band
(UDP heartbeats) plus a step deadline, and recovery is rebuild + replay
(weights reload, KV caches re-prefill, emitted tokens replayed as
prompt suffix).

The recovery test uses the fp16 cache at exact matmul precision: under
greedy decoding the resumed stream must be TOKEN-EQUAL to an
uninterrupted run (re-prefilling prompt+emitted is numerically the same
computation as having decoded straight through).
"""

import socket
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.parallel.elastic import (ElasticBatcher, Heartbeat,
                                       StepWatchdog, surviving_mesh)
from kivi_tpu.serving.batcher import ContinuousBatcher, Request

CFG = tiny_config()
FP16 = QuantConfig(k_bits=16, v_bits=16, group_size=32, residual_length=32)
KIVI2 = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=32)
MAX = 256
BUCKETS = (32, 64)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# Heartbeat
# ---------------------------------------------------------------------------

def test_heartbeat_detects_dead_worker():
    addr = f"127.0.0.1:{_free_port()}"
    coord = Heartbeat(addr, num_processes=3, process_id=0,
                      interval=0.05, timeout=0.5).start()
    w1 = Heartbeat(addr, num_processes=3, process_id=1,
                   interval=0.05, timeout=0.5).start()
    w2 = Heartbeat(addr, num_processes=3, process_id=2,
                   interval=0.05, timeout=0.5).start()
    try:
        deadline = time.monotonic() + 3.0
        while coord.dead() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert coord.dead() == set()          # both workers beating
        assert w1.healthy() and w2.healthy()  # acks flowing back

        w2.stop()                             # "host 2 dies"
        deadline = time.monotonic() + 3.0
        while coord.dead() != {2} and time.monotonic() < deadline:
            time.sleep(0.05)
        assert coord.dead() == {2}
        assert w1.healthy()
    finally:
        coord.stop()
        w1.stop()


def test_heartbeat_worker_detects_coordinator_loss():
    addr = f"127.0.0.1:{_free_port()}"
    coord = Heartbeat(addr, num_processes=2, process_id=0,
                      interval=0.05, timeout=0.4).start()
    w = Heartbeat(addr, num_processes=2, process_id=1,
                  interval=0.05, timeout=0.4).start()
    try:
        deadline = time.monotonic() + 3.0
        while not w.healthy() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert w.healthy()
        coord.stop()
        deadline = time.monotonic() + 3.0
        while w.healthy() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert not w.healthy()
    finally:
        w.stop()


def test_heartbeat_never_seen_worker_counts_dead():
    addr = f"127.0.0.1:{_free_port()}"
    coord = Heartbeat(addr, num_processes=2, process_id=0,
                      interval=0.05, timeout=0.3).start()
    try:
        # worker 1 never starts; after the grace window it must be dead
        deadline = time.monotonic() + 3.0
        while coord.dead() != {1} and time.monotonic() < deadline:
            time.sleep(0.05)
        assert coord.dead() == {1}
    finally:
        coord.stop()


# ---------------------------------------------------------------------------
# StepWatchdog
# ---------------------------------------------------------------------------

def test_watchdog_flags_stuck_step():
    fired = []
    with StepWatchdog(0.1, on_stall=lambda: fired.append(1)) as wd:
        time.sleep(0.4)
    assert wd.stalled and fired == [1]


def test_watchdog_quiet_on_fast_step():
    with StepWatchdog(5.0) as wd:
        pass
    time.sleep(0.05)
    assert not wd.stalled


# ---------------------------------------------------------------------------
# surviving_mesh
# ---------------------------------------------------------------------------

def test_surviving_mesh_shapes():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    # "lose" half the chips: 8 -> 4 survivors
    m = surviving_mesh(devs[:4], num_kv_heads=4)
    assert m.devices.size == 4
    assert m.shape["model"] <= 4 and 4 % m.shape["model"] == 0
    m2 = surviving_mesh(devs[:4], num_kv_heads=4, n_model=2)
    assert m2.shape == {"data": 2, "model": 2}


# ---------------------------------------------------------------------------
# ElasticBatcher: fail mid-flight, recover, streams token-equal
# ---------------------------------------------------------------------------

def _uninterrupted(params, qcfg, reqs):
    bat = ContinuousBatcher(CFG, qcfg, params, num_slots=2,
                            max_seq_len=MAX, prompt_buckets=BUCKETS)
    res = bat.run([Request(**vars(r)) for r in reqs])
    return {u: r.tokens for u, r in res.items()}


def test_elastic_recovery_token_equal():
    with jax.default_matmul_precision("highest"):
        params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                      dtype=jnp.float32)
        rng = np.random.RandomState(1)
        reqs = [Request(uid=i,
                        prompt=list(rng.randint(1, CFG.vocab_size, size=n)),
                        max_new_tokens=10)
                for i, n in enumerate((20, 30, 25))]
        want = _uninterrupted(params, FP16, reqs)

        eb = ElasticBatcher(CFG, FP16, params, num_slots=2,
                            max_seq_len=MAX, prompt_buckets=BUCKETS)
        for r in reqs:
            eb.submit(Request(**vars(r)))
        for _ in range(4):          # some requests mid-flight
            eb.step()
        emitted_before = {u: list(t) for u, t in eb._emitted.items() if t}
        assert any(0 < len(t) < 10 for t in emitted_before.values()), \
            "test setup: expected an in-flight request"

        resumed = eb.recover(mesh=None)   # device state lost; rebuild
        assert resumed                     # something was in flight
        while not eb.done:
            eb.step()
        got = eb.results()
        assert sorted(got) == sorted(want)
        for uid in want:
            assert got[uid] == want[uid], (uid, got[uid], want[uid])
            # the pre-failure stream is a prefix of the final stream
            pre = emitted_before.get(uid, [])
            assert got[uid][:len(pre)] == pre


def test_elastic_recovery_on_mesh():
    """Recovery onto an explicit surviving-device mesh (DP slots)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    with jax.default_matmul_precision("highest"):
        params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                      dtype=jnp.float32)
        rng = np.random.RandomState(2)
        reqs = [Request(uid=i,
                        prompt=list(rng.randint(1, CFG.vocab_size, size=24)),
                        max_new_tokens=6)
                for i in range(2)]
        want = _uninterrupted(params, FP16, reqs)

        mesh0 = surviving_mesh(devs[:8], num_kv_heads=CFG.num_kv_heads)
        eb = ElasticBatcher(CFG, FP16, params, num_slots=2,
                            max_seq_len=MAX, mesh=mesh0,
                            prompt_buckets=BUCKETS)
        for r in reqs:
            eb.submit(Request(**vars(r)))
        eb.step()
        eb.recover(surviving_mesh(devs[:4], num_kv_heads=CFG.num_kv_heads))
        while not eb.done:
            eb.step()
        got = eb.results()
        for uid in want:
            assert got[uid] == want[uid]


def test_elastic_quantized_smoke():
    """2-bit cache: resumed streams keep the pre-failure prefix and
    complete (bit-equality is not claimed — the replayed prompt shifts
    quantization-group boundaries)."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(3)
    reqs = [Request(uid=0,
                    prompt=list(rng.randint(1, CFG.vocab_size, size=20)),
                    max_new_tokens=8)]
    eb = ElasticBatcher(CFG, KIVI2, params, num_slots=2, max_seq_len=MAX,
                        prompt_buckets=BUCKETS)
    eb.submit(Request(**vars(reqs[0])))
    for _ in range(3):
        eb.step()
    pre = list(eb._emitted[0])
    assert pre
    eb.recover(mesh=None)
    while not eb.done:
        eb.step()
    got = eb.results()[0]
    assert len(got) == 8
    assert got[:len(pre)] == pre
