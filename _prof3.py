import time, numpy as np, jax, jax.numpy as jnp
from jax import lax

def loop(n):
    def body(c, _):
        return (c[0]*0.9999+1e-5, c[1]*0.9999+1e-5), ()
    def run(x):
        y, _ = lax.scan(body, x, None, length=n)
        return y
    return jax.jit(run)

x = (jnp.ones((768, 128), jnp.float32), jnp.ones((768, 128), jnp.float32))
for n in (1, 10, 100, 500, 2000):
    f = loop(n)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(f(x)); ts.append(time.perf_counter()-t0)
    print(n, f"{min(ts)*1e3:.3f} ms")
# also: single tiny op
g = jax.jit(lambda a: a[0]+1.0)
jax.block_until_ready(g(x))
ts=[]
for _ in range(5):
    t0=time.perf_counter(); jax.block_until_ready(g(x)); ts.append(time.perf_counter()-t0)
print("single op", f"{min(ts)*1e3:.3f} ms")
