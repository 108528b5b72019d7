"""Tune trilinear_sample_matmul (chunk size x dtype) on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bias_tune.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    from vdetr_tpu.ops.rpe import log_quantize, trilinear_sample_matmul

    B, nQ, nK, H, n = 1, 1024, 4096, 4, 10
    rng = np.random.RandomState(0)
    key_xyz = jnp.asarray(rng.rand(B, nK, 3).astype(np.float32) * 6)
    corners = jnp.asarray(rng.rand(B, nQ, 8, 3).astype(np.float32) * 6)
    tables = jnp.asarray(rng.rand(8, n, n, n, H).astype(np.float32))

    def all_corners(corners, key_xyz, tables, chunk, dtype):
        kx, ky, kz = (key_xyz[:, None, :, i] for i in range(3))
        acc0 = jnp.zeros((B, H, nQ, nK), jnp.float32)

        def corner_step(acc, inp):
            corner, table = inp
            dx = corner[:, :, 0:1] - kx
            dy = corner[:, :, 1:2] - ky
            dz = corner[:, :, 2:3] - kz
            d0 = log_quantize(dx, 512.0, 4.0)
            d1 = log_quantize(dy, 512.0, 4.0)
            d2 = log_quantize(dz, 512.0, 4.0)
            bias = trilinear_sample_matmul(table, d0, d1, d2,
                                           heads_first=True, chunk=chunk,
                                           compute_dtype=dtype)
            return acc + bias.transpose(1, 0, 2, 3), None

        cf = jnp.moveaxis(corners, 2, 0)
        out, _ = jax.lax.scan(corner_step, acc0, (cf, tables))
        return out.sum()

    ref = None
    for chunk in (16384, 32768, 65536, 131072, 262144):
        for dtype in (None, jnp.bfloat16):
            f = jax.jit(functools.partial(all_corners, chunk=chunk,
                                          dtype=dtype))
            out = f(corners, key_xyz, tables)
            val = float(np.asarray(out))
            if ref is None:
                ref = val
            t0 = time.time()
            for _ in range(6):
                out = f(corners, key_xyz, tables)
            np.asarray(out)
            dt = (time.time() - t0) / 6 * 1000
            dn = "bf16" if dtype is not None else "f32 "
            print(f"chunk={chunk:7d} {dn}: {dt:8.2f} ms  "
                  f"relerr={abs(val - ref) / abs(ref):.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
