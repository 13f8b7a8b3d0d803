import numpy as np, jax, jax.numpy as jnp
from orb_slam3_detailed_comments_tpu.ops import brief
rng = np.random.default_rng(1)
H, W = 240, 376
img = jnp.asarray(rng.uniform(0,255,(H,W)).astype(np.float32))
n = 64
yx = jnp.asarray(np.stack([rng.integers(20, H-20, n), rng.integers(20, W-20, n)],1).astype(np.int32))
ang = jnp.asarray(rng.uniform(-np.pi, np.pi, n).astype(np.float32))
d_ref = np.asarray(brief.describe(img, yx, ang))
d_new = np.asarray(brief.describe_flat(img.reshape(-1), yx, ang,
    jnp.zeros(n, jnp.int32), jnp.full(n, W, jnp.int32), jnp.full(n, H, jnp.int32)))
print("equal:", (d_ref == d_new).all())
