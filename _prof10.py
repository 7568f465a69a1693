import time, numpy as np, jax, jax.numpy as jnp

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

x = jnp.ones((768,128), jnp.float32)
for K in (1, 10, 50, 100, 300):
    def mk(K):
        def f(x):
            outs = []
            for i in range(K):
                outs.append(x * (1.0 + i))
            return sum(outs)
        return jax.jit(f)
    print(f"K={K:4d} ops:", timeit(mk(K), x))
# and pads specifically
def fpad(x):
    return jnp.pad(x, ((0,7),(0,65)))
xm = jnp.ones((24,25,63), jnp.float32)
fp = jax.jit(lambda a: jnp.pad(a, ((0,0),(0,7),(0,65))))
print("single pad (24,25,63)->(24,32,128):", timeit(fp, xm))
