"""Ablate the fused RPE kernel to locate the per-tile cost (round 3).

Variants (cumulative pipeline): flash attention only -> +deltas/quantize
-> +hat build -> +P outer+reshape -> +table matmul -> +fold (full).
Each variant keeps the same memory traffic and grid; the deltas between
steps isolate VPU vs MXU vs relayout cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/rpe_ablate.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(f, args, iters=8, label=""):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:44s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    from vdetr_tpu.ops.rpe_attention import _flatten_tables, _hat, _quantize

    B, nQ, nK, H, hd, n = 1, 1024, 4096, 4, 64, 10
    TQ, TK = 32, 128
    E = TQ * TK
    NEG_INF = -1e9

    def kernel(q_ref, k_ref, v_ref, corners_ref, kxyz_ref, tables_ref,
               out_ref, m_ref, z_ref, acc_ref, *, level):
        ik = pl.program_id(2)
        nk_ = pl.num_programs(2)

        @pl.when(ik == 0)
        def _():
            m_ref[:, :] = jnp.full((H, TQ), NEG_INF, jnp.float32)
            z_ref[:, :] = jnp.zeros((H, TQ), jnp.float32)
            acc_ref[:, :, :] = jnp.zeros((H, TQ, hd), jnp.float32)

        k_tile = k_ref[0]
        v_tile = v_ref[0]
        kx = kxyz_ref[0, 0:1, :]
        ky = kxyz_ref[0, 1:2, :]
        kz = kxyz_ref[0, 2:3, :]
        logits = []
        for h in range(H):
            logits.append(jax.lax.dot_general(
                q_ref[0, h], k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, E), 0).astype(
            jnp.float32)
        bias_heads = jnp.zeros((H, E), jnp.float32)
        if level >= 1:
            for c in range(8):
                cx = corners_ref[0][:, 3 * c + 0].reshape(TQ, 1)
                cy = corners_ref[0][:, 3 * c + 1].reshape(TQ, 1)
                cz = corners_ref[0][:, 3 * c + 2].reshape(TQ, 1)
                dx = cx - kx
                dy = cy - ky
                dz = cz - kz
                if level == 1:  # deltas only, no quantize/reshape
                    bias_heads = bias_heads + (dx + dy + dz).reshape(
                        1, E).astype(jnp.float32)
                    continue
                iw = _quantize(dx, 512.0, 4.0, n).reshape(1, E)
                ih = _quantize(dy, 512.0, 4.0, n).reshape(1, E)
                id_ = _quantize(dz, 512.0, 4.0, n).reshape(1, E)
                if level == 2:  # + quantize + reshape to (1, E)
                    bias_heads = bias_heads + iw + ih + id_
                    continue
                hat_a = _hat(row_iota, id_)
                hat_b = _hat(row_iota, ih)
                hat_w = _hat(row_iota, iw)
                if level == 3:  # + hat build (no P)
                    bias_heads = bias_heads + (
                        hat_a + hat_b + hat_w)[0:1].reshape(1, E)
                    continue
                P = (hat_a[:, None, :] * hat_b[None, :, :]).reshape(n * n, E)
                if level == 4:  # + P outer/reshape (no matmul)
                    bias_heads = bias_heads + P[0:1]
                    continue
                U = jax.lax.dot_general(
                    tables_ref[c], P, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if level == 5:  # + table matmul (no fold)
                    bias_heads = bias_heads + U[0:H]
                    continue
                bias_heads = bias_heads + (
                    U.reshape(n, H, E) * hat_w[:, None, :]).sum(axis=0)
        for h in range(H):
            logits[h] = logits[h] + bias_heads[h].reshape(TQ, TK)

        for h in range(H):
            l = logits[h]
            m_old = m_ref[h].reshape(TQ, 1)
            m_new = jnp.maximum(m_old, jnp.max(l, axis=1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.exp(l - m_new)
            z_new = z_ref[h].reshape(TQ, 1) * alpha + jnp.sum(
                p, axis=1, keepdims=True)
            acc_new = acc_ref[h] * alpha + jax.lax.dot_general(
                p, v_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[h] = m_new.reshape(TQ)
            z_ref[h] = z_new.reshape(TQ)
            acc_ref[h] = acc_new

        @pl.when(ik == nk_ - 1)
        def _():
            for h in range(H):
                z = z_ref[h].reshape(TQ, 1)
                out_ref[0, h] = acc_ref[h] / jnp.maximum(z, 1e-30)

    rng = np.random.RandomState(0)
    q = jnp.asarray(
        rng.randn(B, H, nQ, hd).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32))
    corners = jnp.asarray(rng.rand(B, nQ, 24).astype(np.float32) * 6)
    kxyz = jnp.asarray(rng.rand(B, 3, nK).astype(np.float32) * 6)
    tables = jnp.asarray(rng.randn(8, n * n, n * H).astype(np.float32))

    def run(level):
        return pl.pallas_call(
            functools.partial(kernel, level=level),
            grid=(B, nQ // TQ, nK // TK),
            in_specs=[
                pl.BlockSpec((1, H, TQ, hd), lambda b, iq, ik: (b, 0, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, hd), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, hd), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TQ, 24), lambda b, iq, ik: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, TK), lambda b, iq, ik: (b, 0, ik),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, n * n, n * H), lambda b, iq, ik: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, TQ, hd),
                                   lambda b, iq, ik: (b, 0, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, nQ, hd), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((H, TQ), jnp.float32),
                pltpu.VMEM((H, TQ), jnp.float32),
                pltpu.VMEM((H, TQ, hd), jnp.float32),
            ],
        )(q, k, v, corners, kxyz, tables)

    labels = ["0: flash only", "1: +deltas", "2: +quantize+reshape(1,E)",
              "3: +hat build", "4: +P outer+reshape", "5: +table matmul",
              "6: full (+fold)"]
    for level in range(7):
        fn = jax.jit(functools.partial(run, level))
        try:
            bench(fn, (), label=labels[level])
        except Exception as e:  # noqa: BLE001
            print(f"{labels[level]}: FAIL {str(e).splitlines()[0][:90]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
