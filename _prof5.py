import sys, time, numpy as np, jax, jax.numpy as jnp
from jax import lax

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

C = jnp.asarray(np.random.rand(1200, 1200).astype(np.float32))  # 5.8MB
f1 = jax.jit(lambda x: x + C[0, 0])
print("captured 5.8MB const, trivial:", timeit(f1, jnp.ones((8,128)))); sys.stdout.flush()
f2 = jax.jit(lambda x, c: x + c[0, 0])
print("arg 5.8MB const, trivial:     ", timeit(f2, jnp.ones((8,128)), C)); sys.stdout.flush()
f3 = jax.jit(lambda x: jnp.broadcast_to(x, (1200, 1200)) * 1.0)
print("5.8MB output:                 ", timeit(f3, jnp.ones((1,)))); sys.stdout.flush()
