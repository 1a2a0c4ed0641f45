"""Cache-write formulation probe: one-hot where vs batched scatter.

The continuous-batching engines carry the full KV cache through a
`lax.while_loop`; the decode step's per-row cache write
(`decoder._cache_write`, S=1 path) is a one-hot `jnp.where` over the
whole buffer — fast on this chip (the gather / vmapped-dus variants
measured pathological, see _cache_write's docstring) but it REWRITES
the full cache every step, so the loop carry needs src+dst live:
2x cache bytes. That double buffer is the measured long-context
capacity wall (MLA-7B 128 slots needs 2x5.4G + 5.7G weights > 15.75G;
llama3-8B int8-KV 64 slots needs 2x5.0G + 8G — RESULTS.md).

A batched scatter (`buf.at[arange(B), idx].set(rows)`) is the one
untried formulation XLA can alias in place. This probe measures, on
the real chip, for both formulations at serving shapes:

  1. steady-state while-loop step time (is scatter pathological?)
  2. the largest (B, L) that compiles inside a while loop
     (does in-place aliasing actually happen?)

Usage: python tools/cache_write_probe.py [--quick]
Prints one JSON line per arm.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import logging

    logging.disable(logging.WARNING)
    import jax
    import jax.numpy as jnp

    quick = "--quick" in sys.argv

    def run_arm(name, B, L, H, D, steps, write):
        """A while-loop of `steps` single-position writes + a read that
        depends on the cache (so nothing is dead-code-eliminated)."""

        def body(carry):
            cache, idx, acc, i = carry
            val = (acc[:, None, None] + jnp.ones((B, H, D), jnp.bfloat16))
            cache = write(cache, val, idx)
            # depend on the written row so the write is live
            row = jax.lax.dynamic_index_in_dim(cache, 0, axis=0, keepdims=False)
            acc = acc + row.mean(axis=(1, 2))[None].mean() * 0 + 1
            return cache, idx + 1, acc, i + 1

        def cond(c):
            return c[3] < steps

        @jax.jit
        def prog(cache, idx, acc):
            cache, idx, acc, _ = jax.lax.while_loop(
                cond, body, (cache, idx, acc, jnp.asarray(0, jnp.int32))
            )
            return cache[:, 0].sum() + acc.sum()

        cache = jnp.zeros((B, L, H, D), jnp.bfloat16)
        idx = jnp.arange(B, dtype=jnp.int32) % L
        acc = jnp.zeros((B,), jnp.bfloat16)
        try:
            out = prog(cache, idx, acc)
            out.block_until_ready()
            t0 = time.perf_counter()
            out = prog(cache, idx, acc)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            print(json.dumps({
                "arm": name, "B": B, "L": L, "H": H, "D": D,
                "steps": steps, "us_per_step": round(dt / steps * 1e6, 1),
                "cache_gb": round(cache.nbytes / 2**30, 2), "ok": True,
            }))
            return True
        except Exception as e:  # OOM or lowering failure
            print(json.dumps({
                "arm": name, "B": B, "L": L,
                "cache_gb": round(B * L * H * D * 2 / 2**30, 2),
                "ok": False, "error": str(e).split("\n")[0][:160],
            }))
            return False

    def write_onehot(cache, val, idx):
        L = cache.shape[1]
        oh = (jnp.arange(L)[None, :] == idx[:, None])[:, :, None, None]
        return jnp.where(oh, val[:, None].astype(cache.dtype), cache)

    def write_scatter(cache, val, idx):
        B = cache.shape[0]
        return cache.at[jnp.arange(B), idx].set(val.astype(cache.dtype))

    steps = 8 if quick else 64
    # llama2-7B-ish decode shapes (per layer buffer)
    for B, L in [(32, 192), (128, 1152)]:
        run_arm("onehot", B, L, 32, 128, steps, write_onehot)
        run_arm("scatter", B, L, 32, 128, steps, write_scatter)
    # capacity frontier: grow until one formulation dies.
    # 2x double-buffer predicts onehot dies at ~half the HBM budget
    # (minus program overhead); in-place scatter should go further.
    # 15.75G budget: a double-buffered carry dies past ~7.9G cache
    # (B~900 at these shapes), an in-place carry past ~15.7G (B~1790).
    for B in (256, 512, 896, 1152, 1408, 1664):
        ok1 = run_arm("onehot", B, 1152, 32, 128, 8, write_onehot)
        ok2 = run_arm("scatter", B, 1152, 32, 128, 8, write_scatter)
        if not (ok1 or ok2):
            break


if __name__ == "__main__":
    main()
