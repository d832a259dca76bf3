"""Re-sweep head_fold / chunk at the bench 4K geometry under the
round-4 scale-rows kernel: deleting the superblock scale scratch + zp
logits + (optionally) the pinned V operands freed ~2 MB of per-program
VMEM, so folds/chunks that previously failed to compile (Hg=32) or
lost end-to-end (C=1024) deserve a re-measure.

Usage: timeout 1800 python scripts/fold_resweep_r4.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_validate_r4 import mk_cache  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.kernels.fused_decode_wide import fused_decode_attention_wide
    from kivi_tpu.utils.timing import bench_fn
    import jax.tree_util as jtu

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    D = 128

    def tile_to(cache, b_from, b_to):
        f = b_to // b_from
        return jtu.tree_map(
            lambda a: (jnp.tile(a, (f,) + (1,) * (a.ndim - 1))
                       if getattr(a, "ndim", 0) >= 1
                       and a.shape[0] == b_from else a), cache)

    # the two bench regimes: serving fill (t_bound) and full cache
    for name, fill, tb in (("serving f=1280 tb=2048", 1280, 2048),
                           ("full f=3968", 3968, None)):
        cache = mk_cache(8, 32, D, 4096, fill, 0, qcfg)
        cache = tile_to(cache, 8, 72)
        q = jax.random.normal(jax.random.PRNGKey(3), (72, 32, 1, D),
                              jnp.float32)
        for hg, C in ((16, 512), (16, 1024), (32, 512), (32, 1024)):
            g = jax.jit(lambda q, c, hg=hg, C=C: fused_decode_attention_wide(
                q.reshape(72, 32, 1, D), c.k_codes, c.k_scale, c.k_mn,
                c.v_codes, c.v_scale, c.v_mn, c.k_win, c.v_win,
                c.n_k_quant, c.n_k_win, c.n_v_quant, group_size=32,
                k_bits=2, v_bits=2, chunk=C, head_fold=hg,
                t_bound=tb, no_pinned_v=True))
            try:
                ms = bench_fn(g, q, cache) * 1e3
                print(f"  {name} Hg={hg} C={C}: {ms:.3f} ms", flush=True)
            except Exception as e:
                print(f"  {name} Hg={hg} C={C}: FAIL "
                      f"({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
