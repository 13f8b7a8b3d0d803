import numpy as np, jax, jax.numpy as jnp, time
from orb_slam3_detailed_comments_tpu.ops import extractor, brief
rng = np.random.default_rng(0)
h, w = 480, 752
imgs = [jnp.asarray(rng.uniform(0,255,(h,w)).astype(np.float32)) for _ in range(16)]
cfg = extractor.OrbConfig(n_features=1024)
f = jax.jit(lambda im: extractor.extract(im, cfg))
jax.block_until_ready(f(imgs[0]))
def timeit(name, fn, n=96):
    out = fn(0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n): out = fn(i % 16)
    jax.block_until_ready(out)
    print(name, round((time.perf_counter()-t0)/n*1e3, 3), 'ms')
timeit('extract distinct inputs', lambda i: f(imgs[i]))
timeit('extract same input', lambda i: f(imgs[0]))
# also re-check the isolated take with distinct indices
bufs = jnp.asarray(rng.uniform(0,255,4_800_000).astype(np.float32))
idxs = [jnp.asarray(rng.integers(0, 4_800_000, (1024,512)).astype(np.int32)) for _ in range(16)]
g = jax.jit(lambda i: jnp.take(bufs, i))
jax.block_until_ready(g(idxs[0]))
timeit('take distinct idx', lambda i: g(idxs[i]))
