"""Flush-schedule arithmetic: static schedule == simulated counters, and
prompt_len canonicalization preserves the schedule (engine.py)."""

import math

from kivi_tpu.config import QuantConfig
from kivi_tpu.serving.engine import Engine


def _simulate(qcfg, prompt_len, steps):
    """Counter-accurate simulation of decode_append's flush conds."""
    W, vf = qcfg.residual_length, qcfg.value_flush
    nkw = prompt_len - (prompt_len // W) * W
    if prompt_len <= W:
        nvw = prompt_len
    else:
        nvw = prompt_len - ((prompt_len - W + vf - 1) // vf) * vf
    events = {}
    for i in range(steps):
        fk = nkw == W
        fv = nvw == W
        if fk:
            nkw = 0
        if fv:
            nvw -= vf
        if fk or fv:
            events[i] = (fk, fv)
        nkw += 1
        nvw += 1
    return events


def test_schedule_matches_counter_simulation():
    for (w, vf) in ((128, 128), (128, 32), (64, 32), (96, 48)):
        qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=16,
                           residual_length=w, v_flush=vf)
        for prompt in (1, 17, w - 1, w, w + 1, 3 * w + 5, 1024):
            got = Engine._flush_schedule(qcfg, prompt, 200)
            want = _simulate(qcfg, prompt, 200)
            assert got == want, (w, vf, prompt)


def test_canonical_prompt_len_same_schedule():
    for (w, vf) in ((128, 128), (128, 32), (96, 48)):
        qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=16,
                           residual_length=w, v_flush=vf)
        L = w * vf // math.gcd(w, vf)
        for prompt in (w + L + 1, 1024, 1280, 4096 + 37):
            canon = w + 1 + (prompt - w - 1) % L if prompt > w + L \
                else prompt
            assert (Engine._flush_schedule(qcfg, prompt, 300)
                    == Engine._flush_schedule(qcfg, canon, 300)), \
                (w, vf, prompt, canon)
