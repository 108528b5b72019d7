"""Isolate the RPE table-contraction dot cost in a bare Pallas kernel.

Per grid step: NC dots of T(K40=100, M=40)^T @ P(100, E) -> (40, E),
mirroring the fused RPE kernel's inner contraction, with P read from
VMEM input (not built) so ONLY the MXU cost is measured. Variants probe
K/M padding effects.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dot_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(f, args, iters=8, label="", flops=None):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters
    tf = (flops / dt / 1e12) if flops else float("nan")
    print(f"{label:40s} {dt * 1000:9.2f} ms  {tf:7.1f} TF/s", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    NT = 1024   # grid steps (tiles per layer at tq32/tk128)
    NC = 8      # corners

    rng = np.random.RandomState(0)

    variants = (("K=100 M=40 E=4096", 100, 40, 4096),
                ("K=128 M=40 E=4096", 128, 40, 4096),
                ("K=128 M=128 E=4096", 128, 128, 4096),
                ("K=100 M=40 E=8192", 100, 40, 8192),
                ("K=800 M=40 E=4096 x1", 800, 40, 4096))
    only = os.environ.get("DM_ONLY")
    if only is not None:
        variants = tuple(v for i, v in enumerate(variants)
                         if str(i) in only.split(","))
    for label, K, M, E in variants:
        nc = 1 if K == 800 else NC
        nt = NT if E == 4096 else NT // 2
        T = jnp.asarray(rng.rand(nc, K, M).astype(np.float32))
        P = jnp.asarray(rng.rand(K, E).astype(np.float32))

        def kern(t_ref, p_ref, o_ref, *, nc):
            acc = jnp.zeros((t_ref.shape[2], p_ref.shape[1]), jnp.float32)
            for c in range(nc):
                acc = acc + jax.lax.dot_general(
                    t_ref[c], p_ref[:, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:, :] = acc

        def run(T, P):
            return pl.pallas_call(
                functools.partial(kern, nc=nc),
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((nc, K, M), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, E), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, E), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, E), jnp.float32),
            )(T, P)

        flops = 2 * nc * K * M * E * nt
        bench(jax.jit(run), (T, P), label=label, flops=flops)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
