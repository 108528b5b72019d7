"""On-chip Pallas kernel smoke gate (VERDICT r2 item 7).

Runs the Mosaic-COMPILED kernels (not interpret mode) on the real chip
against their pure-jax references and emits one JSON line of parity
booleans. CI runs the kernels only under interpret=True on CPU, so a
Mosaic lowering regression would otherwise ship silently (this class of
bug burned round 1).

Checks:
  fps_parity        — fps_pallas == fps_jax index-exact (incl. quirks)
  rpe_fwd_parity    — fused flash forward vs materialized reference
  rpe_bwd_parity    — flash backward dQ/dK/dV/dTables vs reference grads
  rpe_dropout_selfconsistent — in-kernel dropout grad vs finite
                      differences of the (deterministic) flash forward

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py
Prints: {"tpu_smoke": {...}, "ok": bool}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_checks():
    import jax
    import jax.numpy as jnp

    from vdetr_tpu.ops import rpe_attention as ra
    from vdetr_tpu.ops.fps import fps_jax, fps_pallas

    results = {}
    rng = np.random.RandomState(0)

    # ---- FPS: exact index parity, incl. start-at-0 and mag<=1e-3 skip
    try:
        pts = rng.rand(2, 4096, 3).astype(np.float32) * 6.0
        pts[0, :17] = 0.0  # near-origin skip quirk rows
        got = np.asarray(fps_pallas(jnp.asarray(pts), 512))
        ref = np.asarray(fps_jax(jnp.asarray(pts), 512))
        results["fps_parity"] = bool((got == ref).all())
    except Exception as e:  # noqa: BLE001
        results["fps_parity"] = f"ERROR: {str(e).splitlines()[0][:120]}"

    # ---- fused RPE forward vs reference
    B, nQ, nK, H, hd, n = 1, 64, 256, 4, 64, 10
    q = jnp.asarray(rng.randn(B, nQ, H, hd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, nK, hd).astype(np.float32))
    corners = jnp.asarray(rng.rand(B, nQ, 8, 3).astype(np.float32) * 4)
    angles = jnp.asarray((rng.rand(B, nQ).astype(np.float32) - 0.5) * 2)
    key_xyz = jnp.asarray(rng.rand(B, nK, 3).astype(np.float32) * 4)
    tables = jnp.asarray(rng.randn(8, n, n, n, H).astype(np.float32) * 0.1)
    mask_np = np.ones((B, nK), np.float32)
    mask_np[:, 240:] = 0.0
    mask = jnp.asarray(mask_np)
    kw = dict(log_scale=512.0, max_value=4.0, rotate=True)
    try:
        ref = np.asarray(ra.rpe_cross_attention_reference(
            q, k, v, corners, angles, key_xyz, tables, mask > 0.5, **kw))
        got = np.asarray(ra.rpe_cross_attention_pallas(
            q, k, v, corners, angles, key_xyz, tables, mask > 0.5, **kw))
        err = float(np.max(np.abs(got - ref)))
        # default TPU matmul precision is bf16-input; tolerance reflects it
        results["rpe_fwd_parity"] = bool(err < 5e-2)
        results["rpe_fwd_maxerr"] = round(err, 5)
    except Exception as e:  # noqa: BLE001
        results["rpe_fwd_parity"] = f"ERROR: {str(e).splitlines()[0][:120]}"

    # ---- flash backward vs reference grads (dropout 0)
    try:
        seed = jnp.zeros((), jnp.int32)

        def loss_flash(q, k, v, tables):
            out = ra.rpe_cross_attention_flash(
                q, k, v, corners, angles, key_xyz, tables, mask, seed,
                512.0, 4.0, True, 0.0)
            return (out * jnp.sin(out)).sum()

        def loss_ref(q, k, v, tables):
            out = ra.rpe_cross_attention_reference(
                q, k, v, corners, angles, key_xyz, tables, mask > 0.5, **kw)
            return (out * jnp.sin(out)).sum()

        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2, 3)))(
            q, k, v, tables)
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(
            q, k, v, tables)
        errs = {}
        ok = True
        for name, a, b in zip(("dq", "dk", "dv", "dtables"), gf, gr):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1e-3, float(np.abs(b).max()))
            e = float(np.abs(a - b).max() / scale)
            errs[name] = round(e, 5)
            ok = ok and e < 5e-2
        results["rpe_bwd_parity"] = bool(ok)
        results["rpe_bwd_relerr"] = errs
    except Exception as e:  # noqa: BLE001
        results["rpe_bwd_parity"] = f"ERROR: {str(e).splitlines()[0][:120]}"

    # ---- dropout path: deterministic + grad == finite difference
    try:
        seed = jnp.asarray(7, jnp.int32)
        rate = 0.3

        @jax.jit
        def loss_d(q):
            out = ra.rpe_cross_attention_flash(
                q, k, v, corners, angles, key_xyz, tables, mask, seed,
                512.0, 4.0, False, rate)
            return (out * out).sum()

        g = jax.jit(jax.grad(loss_d))(q)
        u = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
        eps = 1e-2
        fd = (loss_d(q + eps * u) - loss_d(q - eps * u)) / (2 * eps)
        an = jnp.vdot(g, u)
        rel = float(abs(float(an) - float(fd)) / max(1e-3, abs(float(fd))))
        results["rpe_dropout_selfconsistent"] = bool(rel < 5e-2)
        results["rpe_dropout_relerr"] = round(rel, 5)
    except Exception as e:  # noqa: BLE001
        results["rpe_dropout_selfconsistent"] = (
            f"ERROR: {str(e).splitlines()[0][:120]}")
    return results


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    results = run_checks()
    ok = all(v is True for key, v in results.items()
             if key in ("fps_parity", "rpe_fwd_parity", "rpe_bwd_parity",
                        "rpe_dropout_selfconsistent"))
    print(json.dumps({"tpu_smoke": results, "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
