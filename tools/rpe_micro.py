"""Micro-bench the RPE cross-attention cost components on the real chip
(published size: B=1, nQ=1024, nK=4096, H=4, 10^3 table), real fences.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/rpe_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(f, args, iters=4, label=""):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:38s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    from vdetr_tpu.ops.rpe import (
        log_quantize, trilinear_sample_split,
    )

    B, nQ, nK, H, n = 1, 1024, 4096, 4, 10
    rng = np.random.RandomState(0)
    key_xyz = jnp.asarray(rng.rand(B, nK, 3).astype(np.float32) * 6)
    corners = jnp.asarray(rng.rand(B, nQ, 8, 3).astype(np.float32) * 6)
    tables = jnp.asarray(rng.rand(8, n, n, n, H).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n ** 3, (B, nQ, nK)).astype(np.int32))
    flat = jnp.asarray(rng.rand(H * n ** 3).astype(np.float32))

    # 0. THE primitive: one gather of (B,nQ,nK) indices from a 4k vector
    @jax.jit
    def raw_gather(flat, idx):
        return flat[idx].sum()

    bench(raw_gather, (flat, idx), label="1x flat-table gather (4M idx)")

    # 0b. same via one-hot matmul on the MXU
    @jax.jit
    def onehot_gather(flat, idx):
        # (B*nQ, nK) -> scan over nQ rows to bound the one-hot size
        tab = flat[:1024]

        def step(acc, i):  # i: (nK,)
            oh = jax.nn.one_hot(i, 1024, dtype=jnp.bfloat16)  # (nK, 1024)
            return acc + jnp.einsum(
                "kt,t->k", oh, tab.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).sum(), None

        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              idx.reshape(-1, nK)[:64])
        return out

    bench(onehot_gather, (flat, idx),
          label="one-hot gather (64 rows only)")

    # 1. deltas + log-quantize, 8 corners
    @jax.jit
    def deltas(corners, key_xyz):
        kx, ky, kz = (key_xyz[:, None, :, i] for i in range(3))
        total = jnp.zeros((), jnp.float32)
        for c in range(8):
            dx = corners[:, :, c, 0:1] - kx
            dy = corners[:, :, c, 1:2] - ky
            dz = corners[:, :, c, 2:3] - kz
            total = total + sum(
                log_quantize(d, 512.0, 4.0).sum() for d in (dx, dy, dz)
            )
        return total

    bench(deltas, (corners, key_xyz), label="8x deltas+logquant")

    # 2. one corner full trilinear bias
    @jax.jit
    def one_corner(corners, key_xyz, tables):
        kx, ky, kz = (key_xyz[:, None, :, i] for i in range(3))
        dx = corners[:, :, 0, 0:1] - kx
        dy = corners[:, :, 0, 1:2] - ky
        dz = corners[:, :, 0, 2:3] - kz
        d0 = log_quantize(dx, 512.0, 4.0)
        d1 = log_quantize(dy, 512.0, 4.0)
        d2 = log_quantize(dz, 512.0, 4.0)
        return trilinear_sample_split(tables[0], d0, d1, d2,
                                      heads_first=True).sum()

    bench(one_corner, (corners, key_xyz, tables),
          label="1 corner trilinear bias")

    # 3. all 8 corners (scan, as production)
    @jax.jit
    def all_corners(corners, key_xyz, tables):
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
            bias = trilinear_sample_split(table, d0, d1, d2,
                                          heads_first=True)
            return acc + bias.transpose(1, 0, 2, 3), None

        cf = jnp.moveaxis(corners, 2, 0)
        out, _ = jax.lax.scan(corner_step, acc0, (cf, tables))
        return out.sum()

    bench(all_corners, (corners, key_xyz, tables),
          label="8-corner bias scan (prod path)")

    # 4. attention matmuls only
    q = jnp.asarray(rng.rand(B, nQ, H, 64).astype(np.float32))
    k = jnp.asarray(rng.rand(B, nK, 64).astype(np.float32))
    v = jnp.asarray(rng.rand(B, nK, 64).astype(np.float32))

    @jax.jit
    def attn_mm(q, k, v):
        a = jnp.einsum("bqhd,bkd->bhqk", q, k)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bhqk,bkd->bqhd", a, v).sum()

    bench(attn_mm, (q, k, v), label="qk+softmax+av matmuls")

    print("DONE", flush=True)


if __name__ == "__main__" and os.environ.get("CM2") != "1" and \
        os.environ.get("CM3") != "1":
    main()

# appended: factorized-matmul trilinear benches (run via CM2=1 env)
def main2():
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

    @jax.jit
    def one_corner_mm(corners, key_xyz, tables):
        kx, ky, kz = (key_xyz[:, None, :, i] for i in range(3))
        dx = corners[:, :, 0, 0:1] - kx
        dy = corners[:, :, 0, 1:2] - ky
        dz = corners[:, :, 0, 2:3] - kz
        d0 = log_quantize(dx, 512.0, 4.0)
        d1 = log_quantize(dy, 512.0, 4.0)
        d2 = log_quantize(dz, 512.0, 4.0)
        return trilinear_sample_matmul(tables[0], d0, d1, d2,
                                       heads_first=True).sum()

    bench(one_corner_mm, (corners, key_xyz, tables),
          label="1 corner trilinear MATMUL bias")

    @jax.jit
    def all_corners_mm(corners, key_xyz, tables):
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
                                           heads_first=True)
            return acc + bias.transpose(1, 0, 2, 3), None

        cf = jnp.moveaxis(corners, 2, 0)
        out, _ = jax.lax.scan(corner_step, acc0, (cf, tables))
        return out.sum()

    bench(all_corners_mm, (corners, key_xyz, tables), iters=8,
          label="8-corner MATMUL bias scan")
    print("DONE2", flush=True)


if __name__ == "__main__" and os.environ.get("CM2") == "1":
    main2()


# appended round 3: fused Pallas kernel f32 vs bf16-MXU (run via CM3=1)
def main3():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    from vdetr_tpu.ops.rpe_attention import rpe_cross_attention_pallas

    B, nQ, nK, H, hd, n = 1, 1024, 4096, 4, 64, 10
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, nQ, H, hd).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32))
    corners = jnp.asarray(rng.rand(B, nQ, 8, 3).astype(np.float32) * 6)
    angles = jnp.zeros((B, nQ), jnp.float32)
    key_xyz = jnp.asarray(rng.rand(B, nK, 3).astype(np.float32) * 6)
    tables = jnp.asarray(rng.randn(8, n, n, n, H).astype(np.float32))

    outs = {}
    for name, tq, tk in (("tq=32 tk=128", 32, 128),
                         ("tq=64 tk=128", 64, 128),
                         ("tq=32 tk=256", 32, 256),
                         ("tq=64 tk=256", 64, 256)):
        fn = jax.jit(functools.partial(
            rpe_cross_attention_pallas, log_scale=512.0, max_value=4.0,
            tq=tq, tk=tk))
        try:
            bench(fn, (q, k, v, corners, angles, key_xyz, tables),
                  iters=8, label=f"fused kernel {name}")
            outs[name] = np.asarray(fn(q, k, v, corners, angles, key_xyz,
                                       tables))
        except Exception as e:  # noqa: BLE001
            print(f"fused kernel {name}: FAIL {str(e).splitlines()[0][:90]}",
                  flush=True)
    ref = outs.get("tq=32 tk=128")
    if ref is not None:
        for name, o in outs.items():
            err = np.max(np.abs(o - ref))
            print(f"  max|out - base| {name}: {err:.3e}", flush=True)
    print("DONE3", flush=True)


if __name__ == "__main__" and os.environ.get("CM3") == "1":
    main3()
