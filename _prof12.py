import time, jax, jax.numpy as jnp

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

x = jnp.ones((8,128))
f = jax.jit(lambda x: x+1)
print("fresh process trivial jit:", timeit(f, x))

import bench as B
cfg, eng, fa, make_step, tree = B.build_problem()
print("after build_problem, same f:", timeit(f, x))
x2 = jnp.ones((8,128))*2
print("after build_problem, new input:", timeit(f, x2))
