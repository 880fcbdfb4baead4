"""Does tunnel fetch time scale with logical bytes or element count?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

N = 512 * 1000
ITERS = 4


@jax.jit
def make(seed):
    k = jax.random.key(seed)
    x = jax.random.normal(k, (N,), dtype=jnp.float32)
    u16 = jnp.clip(jnp.round((x + 6) * 5000), 0, 65535).astype(jnp.uint16)
    u8 = (u16 >> 8).astype(jnp.uint8)
    u32 = (u16[: N // 2].astype(jnp.uint32) << 16) | u16[N // 2 :].astype(
        jnp.uint32
    )
    bf16 = x.astype(jnp.bfloat16)
    return x, u16, u8, u32, bf16


outs = make(0)
for o in outs:
    np.asarray(o[:1])  # sync

seed = [1]


def timed(label, pick):
    best = float("inf")
    for _ in range(ITERS):
        arrs = make(seed[0])
        seed[0] += 1
        a = pick(arrs)
        np.asarray(a[:1])  # ensure computed
        t0 = time.perf_counter()
        np.asarray(jax.device_get(a))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    n = int(a.shape[0])
    nbytes = n * np.dtype(str(a.dtype).replace("bfloat16", "uint16")).itemsize
    print(
        f"{label:>22}: {best * 1e3:8.2f} ms "
        f"({nbytes / 1e6:.2f} MB logical, {nbytes / 1e6 / best:6.1f} MB/s)",
        flush=True,
    )


timed("f32 512k", lambda t: t[0])
timed("u16 512k", lambda t: t[1])
timed("u8 512k", lambda t: t[2])
timed("u32-packed 256k", lambda t: t[3])
timed("bf16 512k", lambda t: t[4])
timed("f32 256k", lambda t: t[0][: N // 2])
print("rc=0", flush=True)
