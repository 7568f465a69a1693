import time, gc, jax, jax.numpy as jnp

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

x = jnp.ones((8,128))
f = jax.jit(lambda x: x+1)
print("fresh:", timeit(f, x))
print("live arrays:", len(jax.live_arrays()))

import bench as B
cfg, eng, fa, make_step, tree = B.build_problem()
print("after build:", timeit(f, x), "live:", len(jax.live_arrays()))
del cfg, eng, fa, make_step, tree
gc.collect()
print("after del+gc:", timeit(f, x), "live:", len(jax.live_arrays()))
jax.clear_caches()
gc.collect()
print("after clear_caches:", timeit(jax.jit(lambda x: x+1), x), "live:", len(jax.live_arrays()))
