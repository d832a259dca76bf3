"""Failure detection + elastic recovery for the serving loop.

The reference has nothing here (SURVEY.md §5.3: "none"; its closest
artifacts are shape asserts in `models/llama_kivi.py:132-160`).  On a
TPU pod this is real territory: a host loss does NOT produce an error
on the survivors — their next collective simply hangs.  Detection
therefore cannot ride the compute path; it needs an out-of-band channel
plus a deadline on the compute path itself.  This module provides the
three TPU-native pieces:

  * `Heartbeat` — out-of-band UDP heartbeats between the serving hosts
    (coordinator = process 0).  The coordinator tracks last-seen times
    and reports `dead()` processes; workers track the coordinator's
    acks and report `healthy()`.  Pure stdlib sockets/threads: the
    channel must stay alive precisely when JAX collectives do not.
  * `StepWatchdog` — a deadline on a device step.  A hung collective
    (the failure signature above) never raises, so the host wraps each
    `step()` in a watchdog that flags the stall and lets the serving
    loop switch to recovery.
  * `surviving_mesh` / `ElasticBatcher` — recovery.  Inference state is
    cheap to rebuild (weights reload from the checkpoint, KV caches
    re-prefill); the recovery recipe is: form a new mesh over the
    surviving devices, re-shard the params, and resume every unfinished
    request by replaying prompt + already-emitted tokens as a longer
    prompt (exact continuation under greedy decoding — the emitted
    stream the client saw stays a prefix of the final result).

Multi-host caveat, stated honestly: a live JAX backend cannot drop
processes from its global device set — after a host loss the surviving
processes must tear down and re-run `multihost.initialize()` with the
new process set before calling `surviving_mesh`.  Measured (round 3,
tests/test_elastic_kill.py): when a peer is SIGKILLed mid-step, the
survivor's in-flight collective HANGS — on CPU gloo exactly as on TPU
ICI — so the surviving process cannot unwind the stack or call
`jax.distributed.shutdown()` from under it.  The only clean teardown is
a process-image restart: persist the resume state out-of-band
(`write_resume_state`, kept current BEFORE each step so a hung step
never blocks it) and `exec_restart()` the survivor, whose fresh runtime
then re-initializes with the new process set.  `recover()`'s
replay-resume recipe (prompt + emitted tokens as a longer prompt) is
what makes the restart token-exact under greedy decoding.
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from jax.sharding import Mesh

from kivi_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, auto_mesh_shape

_MAGIC = 0x4B495649  # "KIVI"
_BEAT = struct.Struct("!IiB")  # magic, process_id, kind (0=beat, 1=ack)


class Heartbeat:
    """Out-of-band liveness: UDP beats worker -> coordinator, acks back.

    One instance per process.  `process_id == 0` is the coordinator: it
    binds `address` and answers every beat with an ack.  Workers send a
    beat every `interval` seconds.  Liveness windows are `timeout`
    seconds of silence.
    """

    def __init__(self, address: str, num_processes: int, process_id: int,
                 interval: float = 0.5, timeout: float = 3.0):
        host, port = address.rsplit(":", 1)
        self.addr = (host, int(port))
        self.n, self.pid = num_processes, process_id
        self.interval, self.timeout = interval, timeout
        self._last_seen: Dict[int, float] = {}
        self._last_ack = time.monotonic()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.settimeout(0.2)
        if self.pid == 0:
            self._sock.bind(self.addr)
        self._threads: List[threading.Thread] = []

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "Heartbeat":
        rx = threading.Thread(target=self._rx_loop, daemon=True)
        self._threads.append(rx)
        rx.start()
        if self.pid != 0:
            tx = threading.Thread(target=self._tx_loop, daemon=True)
            self._threads.append(tx)
            tx.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        self._sock.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- wire loops ---------------------------------------------------------

    def _tx_loop(self):
        msg = _BEAT.pack(_MAGIC, self.pid, 0)
        while not self._stop.is_set():
            try:
                self._sock.sendto(msg, self.addr)
            except OSError:
                pass
            self._stop.wait(self.interval)

    def _rx_loop(self):
        while not self._stop.is_set():
            try:
                data, src = self._sock.recvfrom(64)
            except (socket.timeout, OSError):
                continue
            if len(data) != _BEAT.size:
                continue
            magic, pid, kind = _BEAT.unpack(data)
            if magic != _MAGIC:
                continue
            now = time.monotonic()
            if self.pid == 0 and kind == 0:
                with self._lock:
                    self._last_seen[pid] = now
                try:
                    self._sock.sendto(_BEAT.pack(_MAGIC, 0, 1), src)
                except OSError:
                    pass
            elif self.pid != 0 and kind == 1:
                self._last_ack = now

    # -- queries ------------------------------------------------------------

    def dead(self) -> set:
        """Coordinator view: workers silent past the timeout.  Workers
        never seen at all count as dead only after one full timeout from
        start (grace period for slow bring-up)."""
        assert self.pid == 0, "dead() is a coordinator-side query"
        now = time.monotonic()
        with self._lock:
            out = set()
            for p in range(1, self.n):
                seen = self._last_seen.get(p)
                if seen is None:
                    seen = getattr(self, "_t0", None)
                    if seen is None:
                        self._t0 = seen = now
                if now - seen > self.timeout:
                    out.add(p)
            return out

    def healthy(self) -> bool:
        """Worker view: coordinator acked within the timeout."""
        if self.pid == 0:
            return True
        return time.monotonic() - self._last_ack <= self.timeout


class StepWatchdog:
    """Deadline on a device step: `with StepWatchdog(5.0) as wd: step()`.

    If the body runs past `deadline` seconds, `wd.stalled` flips true
    and `on_stall` (if given) fires from a timer thread — the body
    itself cannot be interrupted (a hung TPU collective does not
    respond to Python signals), so the callback's job is to mark the
    job degraded / alert the elastic layer, not to unwind the stack.
    """

    def __init__(self, deadline: float,
                 on_stall: Optional[Callable[[], None]] = None):
        self.deadline, self.on_stall = deadline, on_stall
        self.stalled = False

    def _fire(self):
        self.stalled = True
        if self.on_stall is not None:
            self.on_stall()

    def __enter__(self):
        self._timer = threading.Timer(self.deadline, self._fire)
        self._timer.daemon = True
        self._timer.start()
        return self

    def __exit__(self, *exc):
        self._timer.cancel()


def write_resume_state(path: str, state: dict) -> None:
    """Persist host-side resume state (emitted tokens, prompts, config
    seeds — plain JSON) atomically.  Called BEFORE each device step: a
    step that hangs on a lost peer can then never block checkpointing,
    and the state on disk is exactly what the restarted process must
    replay."""
    import json
    import os
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def read_resume_state(path: str) -> Optional[dict]:
    import json
    import os
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def exec_restart(argv: Optional[List[str]] = None) -> None:
    """Replace this process image with a fresh interpreter run of
    `argv` (default: sys.argv).  This is the survivor's teardown after
    a peer loss: the hung runtime (stuck collective, wedged threads)
    is discarded wholesale, and the fresh process re-initializes JAX
    with the surviving process set.  Safe to call from a monitor
    thread — the exec replaces every thread in the image."""
    import sys
    args = list(sys.argv if argv is None else argv)
    sys.stdout.flush()
    sys.stderr.flush()
    import os
    os.execv(sys.executable, [sys.executable] + args)


def surviving_mesh(devices: Sequence, num_kv_heads: int,
                   n_model: Optional[int] = None) -> Mesh:
    """A fresh (data, model) mesh over an explicit surviving-device list
    (same axis recipe as `mesh.make_mesh`; `model` bounded by the KV
    head count so the cache head-sharding stays legal)."""
    n = len(devices)
    if n_model is None:
        _, n_model = auto_mesh_shape(n, num_kv_heads)
    assert n % n_model == 0, (n, n_model)
    arr = np.asarray(list(devices)).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


class ElasticBatcher:
    """Continuous batching with failure recovery.

    Wraps `serving.batcher.ContinuousBatcher` and keeps the host-side
    request log (`uid -> (request, tokens emitted so far)`).  On
    `recover(mesh)` it rebuilds the batcher from scratch on the new
    mesh — params re-sharded, caches re-initialised — and resubmits
    every unfinished request with its emitted tokens replayed as prompt
    suffix, so each client stream resumes exactly where it stopped
    (token-identical under greedy decoding; device KV state is the only
    thing lost, and it is reconstructable by definition).
    """

    def __init__(self, cfg, qcfg, params, num_slots: int, max_seq_len: int,
                 mesh: Optional[Mesh] = None, **kw):
        self.cfg, self.qcfg, self.params = cfg, qcfg, params
        self.num_slots, self.T, self.kw = num_slots, max_seq_len, kw
        self._orig: Dict[int, object] = {}   # uid -> original Request
        self._emitted: Dict[int, List[int]] = {}
        self.batcher = None
        self._build(mesh)

    def _build(self, mesh: Optional[Mesh]):
        import jax

        from kivi_tpu.parallel.mesh import shard_params
        from kivi_tpu.serving.batcher import ContinuousBatcher

        self.mesh = mesh
        params = (shard_params(self.params, self.cfg, mesh)
                  if mesh is not None else self.params)
        old = self.batcher
        self.batcher = ContinuousBatcher(
            self.cfg, self.qcfg, params, num_slots=self.num_slots,
            max_seq_len=self.T, **self.kw)
        if old is not None:
            # every uid in old.results is by definition finished (or
            # rejected), so ALL of them carry over; unfinished requests
            # are resubmitted by the recovery path
            self.batcher.results.update(old.results)
        del old
        jax.block_until_ready(self.batcher.cur_tok)

    def _unfinished(self, batcher) -> set:
        done = {u for u, r in batcher.results.items()}
        return {u for u in self._orig if u not in done}

    # -- serving surface ----------------------------------------------------

    def submit(self, req) -> None:
        self._orig[req.uid] = req
        self._emitted.setdefault(req.uid, [])
        self.batcher.submit(req)

    def step(self) -> None:
        self.batcher.step()
        self._harvest()

    def _harvest(self):
        b = self.batcher
        for s in range(b.S):
            req = b.slot_req[s]
            if req is not None and req.uid in self._emitted:
                self._emitted[req.uid] = (
                    self._resume_prefix(req.uid) + list(b.slot_out[s]))
        for uid, res in b.results.items():
            if uid in self._emitted and res.tokens:
                self._emitted[uid] = (
                    self._resume_prefix(uid) + list(res.tokens))

    def _resume_prefix(self, uid: int) -> List[int]:
        """Tokens emitted before the LAST recovery (already delivered to
        the client; replayed inside the resumed prompt)."""
        return self._prefix.get(uid, []) if hasattr(self, "_prefix") else []

    # -- recovery -----------------------------------------------------------

    def recover(self, mesh: Optional[Mesh]) -> List[int]:
        """Rebuild on `mesh` and resume unfinished requests.  Returns the
        resumed uids.  (Multi-host: call `jax.distributed.shutdown()` +
        `multihost.initialize()` with the surviving process set first.)
        """
        from kivi_tpu.serving.batcher import Request

        unfinished = sorted(self._unfinished(self.batcher))
        if not hasattr(self, "_prefix"):
            self._prefix: Dict[int, List[int]] = {}
        for uid in unfinished:
            self._prefix[uid] = list(self._emitted.get(uid, []))
        self._build(mesh)
        for uid in unfinished:
            orig = self._orig[uid]
            emitted = self._prefix[uid]
            if len(emitted) >= orig.max_new_tokens:
                # everything was emitted before the failure; just record
                from kivi_tpu.serving.batcher import Result
                self.batcher.results[uid] = Result(uid, [])
                continue
            self.batcher.submit(Request(
                uid=uid,
                prompt=list(orig.prompt) + emitted,
                max_new_tokens=orig.max_new_tokens - len(emitted),
                eos_token_id=orig.eos_token_id,
                temperature=orig.temperature, top_k=orig.top_k,
                top_p=orig.top_p,
                repetition_penalty=orig.repetition_penalty))
        return unfinished

    def run(self, requests) -> Dict[int, List[int]]:
        """Drive to completion (no failures): full emitted streams."""
        for r in requests:
            self.submit(r)
        while self.batcher.queue or self.batcher.active.any():
            self.step()
        self.batcher._retire()
        self._harvest()
        return self.results()

    def results(self) -> Dict[int, List[int]]:
        """uid -> full emitted token stream (across recoveries)."""
        out = {}
        for uid in self._orig:
            if uid in self.batcher.results:
                pre = self._resume_prefix(uid)
                out[uid] = pre + list(self.batcher.results[uid].tokens)
            elif uid in self._emitted:
                out[uid] = list(self._emitted[uid])
        return out

    @property
    def done(self) -> bool:
        return not (self.batcher.queue or self.batcher.active.any()
                    or self._unfinished(self.batcher))
