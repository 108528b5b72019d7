"""Diagnose the compiled-mode dropout self-consistency failure.

The smoke test compares grad vs central finite differences; on TPU the
default bf16 matmul precision makes the FD numerator noisy. This tool
does an exact check instead:

1. out is LINEAR in v: out[b,i,h,:] = sum_j W[b,h,i,j] v[b,j,:], where
   W = g * e (dropout scale times normalized probs). Extract W by
   running the compiled forward with v = identity blocks.
2. Extract e the same way with dropout_rate=0. Then g = W / e must be
   exactly {0, 1/(1-rate)} (up to bf16 noise) -> forward mask recovered.
3. Compute analytic dq/dk/dv in f64 from the extracted W, e and compare
   to the flash-backward kernel grads. A fwd/bwd mask mismatch shows up
   as a large dv error; FD noise does not exist in this check.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vdetr_tpu.ops import rpe_attention as ra

rng = np.random.RandomState(0)
B, nQ, nK, H, hd, n = 1, 64, 256, 4, 64, 10
q = jnp.asarray(rng.randn(B, nQ, H, hd).astype(np.float32) * 0.3)
k = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32) * 0.3)
v = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32))
_c = rng.rand(B, nQ, 3).astype(np.float32) * 4
_s = rng.rand(B, nQ, 3).astype(np.float32) + 0.3
_offs = np.array([[i, j, l] for l in (-1, 1) for i in (-1, 1)
                  for j in (-1, 1)], np.float32) / 2
corners = jnp.asarray(_c[:, :, None, :] + _offs[None, None] * _s[:, :, None, :])
angles = jnp.asarray((rng.rand(B, nQ).astype(np.float32) - 0.5) * 2)
key_xyz = jnp.asarray(rng.rand(B, nK, 3).astype(np.float32) * 4)
tables = jnp.asarray(rng.randn(8, n, n, n, H).astype(np.float32) * 0.1)
mask_np = np.ones((B, nK), np.float32)
mask_np[:, 240:] = 0.0
mask = jnp.asarray(mask_np)
seed = jnp.asarray(7, jnp.int32)
rate = 0.3


def fwd(vv, r):
    return ra.rpe_cross_attention_flash(
        q, k, vv, corners, angles, key_xyz, tables, mask, seed,
        512.0, 4.0, False, r)


fwd_j = jax.jit(fwd, static_argnums=1)

# extract W (rate) and E (rate=0) via identity blocks in v
def extract(r):
    Wcols = []
    for off in range(0, nK, hd):
        vv = np.zeros((B, nK, hd), np.float32)
        for d in range(hd):
            vv[:, off + d, d] = 1.0
        o = np.asarray(fwd_j(jnp.asarray(vv), r))  # (B, nQ, H, hd)
        Wcols.append(o)
    return np.concatenate(Wcols, axis=-1)  # (B, nQ, H, nK)


W = extract(rate).astype(np.float64)
E = extract(0.0).astype(np.float64)

# recovered dropout scale
with np.errstate(divide="ignore", invalid="ignore"):
    g = np.where(E > 1e-12, W / np.maximum(E, 1e-12), 0.0)
valid = E > 1e-6
gv = g[valid]
keep = 1.0 / (1.0 - rate)
near0 = np.abs(gv) < 0.05 * keep
near1 = np.abs(gv - keep) < 0.05 * keep
frac_binary = (near0 | near1).mean()
frac_drop = near0.mean()
print(f"extracted g binary-fraction={frac_binary:.4f} "
      f"drop-fraction={frac_drop:.4f} (rate={rate})")

# analytic grads in f64 from extracted W, E
out = np.einsum("bqhj,bjd->bqhd", W, np.asarray(v, np.float64))
dO = 2.0 * out  # loss = sum(out^2)
dv_ref = np.einsum("bqhj,bqhd->bjd", W, dO)
dd = np.sum(dO * out, axis=-1, keepdims=True)        # (B,nQ,H,1)
dp = np.einsum("bqhd,bjd->bqhj", dO, np.asarray(v, np.float64))
ds = E * (g * dp - dd)                               # (B,nQ,H,nK)
dq_ref = np.einsum("bqhj,bjd->bqhd", ds, np.asarray(k, np.float64))
dk_ref = np.einsum("bqhj,bqhd->bjd", ds, np.asarray(q, np.float64))


def loss_d(qq, kk, vv):
    o = ra.rpe_cross_attention_flash(
        qq, kk, vv, corners, angles, key_xyz, tables, mask, seed,
        512.0, 4.0, False, rate)
    return (o * o).sum()


gq, gk, gvv = jax.jit(jax.grad(loss_d, argnums=(0, 1, 2)))(q, k, v)
for name, a, b in (("dq", gq, dq_ref), ("dk", gk, dk_ref),
                   ("dv", gvv, dv_ref)):
    a = np.asarray(a, np.float64)
    e = np.abs(a - b).max() / max(1e-6, np.abs(b).max())
    print(f"{name}: relerr={e:.5f}")
