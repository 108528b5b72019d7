"""Micro-repro: isolate the large-voxel-count sparse-conv backward fault
seen in round 1 (ROUND1_NOTES.md:22-34) on the real TPU chip.

Runs gather+matmul scan (the sparse_conv inner loop) forward and backward
at increasing V, reporting each stage. Usage: python tools/micro_repro.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def run(V, C, K=27, steps=3, backward=True):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(V, C).astype(np.float32))
    keys = jnp.sort(jnp.asarray(rng.permutation(1 << 28)[:V].astype(np.int32)))
    qkeys = jnp.asarray(rng.permutation(1 << 28)[: K * V].astype(np.int32)
                        ).reshape(K, V)
    W = jnp.asarray(rng.randn(K, C, C).astype(np.float32) * 0.01)

    def f(feats, W):
        feats_ext = jnp.concatenate([feats, jnp.zeros((1, C))], 0)

        def step(acc, inp):
            qk, w = inp
            pos = jnp.clip(jnp.searchsorted(keys, qk), 0, V - 1)
            hit = keys[pos] == qk
            idx = jnp.where(hit, pos, V)
            x = feats_ext[idx]
            return acc + x @ w, None

        out, _ = jax.lax.scan(step, jnp.zeros((V, C)), (qkeys, W))
        return (out ** 2).sum()

    if backward:
        g = jax.jit(jax.grad(f, argnums=(0, 1)))
        for i in range(steps):
            t0 = time.time()
            out = g(feats, W)
            jax.block_until_ready(out)
            print(f"  V={V} bwd step {i}: {time.time()-t0:.3f}s "
                  f"|g|={float(jnp.abs(out[0]).sum()):.3e}", flush=True)
    else:
        jf = jax.jit(f)
        for i in range(steps):
            t0 = time.time()
            out = jf(feats, W)
            jax.block_until_ready(out)
            print(f"  V={V} fwd step {i}: {time.time()-t0:.3f}s "
                  f"val={float(out):.3e}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for V in (32768, 65536, 131072):
        for backward in (False, True):
            run(V, 64, backward=backward)
    print("OK", flush=True)
