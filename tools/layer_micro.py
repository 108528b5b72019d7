"""One-decoder-layer train-cost micro on the real chip.

dec_bisect.py measured 38.8 ms fwd+bwd PER decoder layer (the whole
decoder = 311 of the 571 ms train step) while the eval forward is only
~2.4 ms/layer. This tool isolates which part of the layer's backward
costs that much at the published size (B=1, nQ=1024, nK=4096, H=4,
dim=256, 10^3 tables):

  rpe_fwd       flash kernel forward
  rpe_bwd       flash kernel vjp (bwd kernels a + b, incl. fwd)
  rpe_bwd_drop  same with in-kernel dropout active
  sa_fwd/bwd    self-attention (1024x1024)
  layer_bwd     full GlobalDecoderLayer value_and_grad (train=True)
  layer_bwd_nr  same WITHOUT nn.remat (isolates recompute cost)

Usage: python tools/layer_micro.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(iters: int = 8):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.models.transformer import (GlobalDecoderLayer,
                                              GlobalShareCrossAttention,
                                              MultiHeadSelfAttention)
    from vdetr_tpu.ops import rpe_attention

    def fence(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def bench(label, f, *args):
        out = f(*args)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        dt = (time.time() - t0) / iters * 1000
        print(f"{label:16s} {dt:8.2f} ms", flush=True)
        return dt

    c = VDETRConfig()
    B, nQ, nK, H, n = 1, c.nqueries, c.preenc_npoints, c.dec_nhead, 10
    hd = c.dec_dim // H
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, nQ, H, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32))
    _c = rng.rand(B, nQ, 3).astype(np.float32) * 6
    _s = rng.rand(B, nQ, 3).astype(np.float32) + 0.3
    _offs = np.array([[i, j, l] for l in (-1, 1) for i in (-1, 1)
                      for j in (-1, 1)], np.float32) / 2
    corners = jnp.asarray(
        _c[:, :, None, :] + _offs[None, None] * _s[:, :, None, :])
    angles = jnp.zeros((B, nQ), jnp.float32)
    key_xyz = jnp.asarray(rng.rand(B, nK, 3).astype(np.float32) * 6)
    tables = jnp.asarray(0.1 * rng.randn(8, n, n, n, H).astype(np.float32))
    kv_mask = jnp.ones((B, nK), jnp.float32)
    seed0 = jnp.zeros((), jnp.int32)

    flash = lambda q, k, v, t, rate, seed: rpe_attention.rpe_cross_attention_flash(
        q, k, v, corners, angles, key_xyz, t, kv_mask, seed,
        c.log_scale, 4.0, c.angle_type == "object_coords", rate)

    bench("rpe_fwd", jax.jit(lambda: flash(q, k, v, tables, 0.0, seed0)))

    def loss(q, k, v, t, rate=0.0, seed=seed0):
        return flash(q, k, v, t, rate, seed).sum()

    bench("rpe_bwd", jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))),
          q, k, v, tables)
    bench("rpe_bwd_drop",
          jax.jit(lambda q, k, v, t: jax.grad(
              lambda *a: loss(*a, rate=0.1, seed=jnp.int32(7))
          , argnums=(0, 1, 2, 3))(q, k, v, t)), q, k, v, tables)

    # self-attention at layer size
    x = jnp.asarray(rng.randn(B, nQ, c.dec_dim).astype(np.float32))
    sa = MultiHeadSelfAttention(c.dec_dim, H, c.dec_dropout)
    sav = sa.init(jax.random.PRNGKey(0), x, x, x)

    def sa_loss(p, x):
        return sa.apply(p, x, x, x, True,
                        rngs={"dropout": jax.random.PRNGKey(1)}).sum()

    bench("sa_fwd", jax.jit(lambda p, x: sa_loss(p, x)), sav, x)
    bench("sa_bwd", jax.jit(jax.grad(sa_loss, argnums=(0, 1))), sav, x)

    # full layer
    mem = jnp.asarray(rng.randn(B, nK, c.dec_dim).astype(np.float32))
    qpos = jnp.asarray(rng.randn(B, nQ, c.dec_dim).astype(np.float32))
    kpos = jnp.asarray(rng.randn(B, nK, c.dec_dim).astype(np.float32))
    kval = jnp.ones((B, nK), bool)
    layer = GlobalDecoderLayer(c)
    lv = layer.init(jax.random.PRNGKey(0), x, mem, corners, angles,
                    key_xyz, qpos, kval, kpos, False)

    def layer_loss(p, x, mem):
        out = layer.apply(p, x, mem, corners, angles, key_xyz, qpos,
                          kval, kpos, True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        return out.sum()

    bench("layer_fwd", jax.jit(layer_loss), lv, x, mem)
    bench("layer_bwd", jax.jit(jax.grad(layer_loss, argnums=(0, 1, 2))),
          lv, x, mem)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
