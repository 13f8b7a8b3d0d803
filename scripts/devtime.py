"""Device-time measurement that is immune to the axon tunnel.

Through the tunnel, `block_until_ready` returns without awaiting the device
and execute RPCs serialize at ~24 ms RTT, so naive timing measures either
Python dispatch (too fast) or tunnel latency (too slow) — neither is the
device. The honest measure: run the body R times back-to-back INSIDE one
jitted program (lax.fori_loop with a data-dependent carry so iterations
serialize and nothing is hoisted or replay-cached), fetch one scalar, and
difference two rep counts to cancel the fixed RTT + dispatch cost.

Usage:
    from scripts.devtime import device_ms
    ms = device_ms(lambda img: kernels.prepare_frame(img, cam, cfg)
                   .feat.score.sum(), example_img)
"""
import time

import jax
import jax.numpy as jnp


def device_ms(body, *args, reps_hi: int = 65, reps_lo: int = 5,
              trials: int = 5) -> float:
    """Median device ms per execution of `body(*args) -> scalar`.

    body must reduce to a scalar (used as the serializing carry); its first
    argument is perturbed by carry*1e-6 each iteration so XLA cannot hoist
    the computation out of the loop.
    """

    def mk(reps):
        @jax.jit
        def run(x0, *rest):
            def step(_, carry):
                return jnp.float32(body(x0 + carry * 1e-6, *rest))
            return jax.lax.fori_loop(0, reps, step, jnp.float32(0.0))
        return run

    r_lo, r_hi = mk(reps_lo), mk(reps_hi)
    x0 = jnp.asarray(args[0])
    rest = args[1:]
    jax.device_get(r_lo(x0, *rest))
    jax.device_get(r_hi(x0, *rest))
    samples = []
    for t in range(trials):
        xt = x0 + jnp.float32(t)
        t0 = time.perf_counter()
        jax.device_get(r_lo(xt, *rest))
        d_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(r_hi(xt, *rest))
        d_hi = time.perf_counter() - t0
        samples.append((d_hi - d_lo) / (reps_hi - reps_lo) * 1e3)
    samples.sort()
    return samples[len(samples) // 2]
