import time, numpy as np, jax, jax.numpy as jnp

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return f"min {min(ts)*1e3:.2f} ms"

big = [jnp.asarray(np.random.rand(768,128).astype(np.float32)) for _ in range(16)]
f1 = jax.jit(lambda xs: xs[0][0,0])
print("16 x 393KB args, tiny out:", timeit(f1, big))
one = jnp.asarray(np.random.rand(1400,1000).astype(np.float32))  # 5.6MB
f2 = jax.jit(lambda x: x[0,0])
print("one 5.6MB arg, tiny out:  ", timeit(f2, one))
f3 = jax.jit(lambda x: x*1.000001)
print("one 5.6MB arg, 5.6MB out: ", timeit(f3, one))
small = jnp.ones((8,128))
f4 = jax.jit(lambda x: x+1)
print("tiny arg, tiny out:       ", timeit(f4, small))
# dict-of-arrays pytree like our step
step = {k: jnp.asarray(np.random.rand(24,32,128).astype(np.float32)) for k in "abcde"}
f5 = jax.jit(lambda s: s["a"][0,0,0])
print("5-dict 393KB args:        ", timeit(f5, step))
