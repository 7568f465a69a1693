import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return f"min {min(ts)*1e3:.3f} ms"

def k_add(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0

x = jnp.ones((768,128), jnp.float32)
call = pl.pallas_call(k_add, out_shape=jax.ShapeDtypeStruct((768,128), jnp.float32))
f = jax.jit(lambda x: call(x))
print("trivial pallas:", timeit(f, x))

def k_loop(x_ref, o_ref):
    def body(i, _):
        o_ref[...] = x_ref[...] * (1.0 + i * 0.0)
        return 0
    lax.fori_loop(0, 500, body, 0)

call2 = pl.pallas_call(k_loop, out_shape=jax.ShapeDtypeStruct((768,128), jnp.float32))
f2 = jax.jit(lambda x: call2(x))
print("500-loop pallas:", timeit(f2, x))

# smem out
def k_smem(x_ref, o_ref, s_ref):
    o_ref[...] = x_ref[...]
    def body(i, _):
        s_ref[i, 0] = jnp.max(x_ref[...])
        return 0
    lax.fori_loop(0, 500, body, 0)
call3 = pl.pallas_call(k_smem,
    out_shape=(jax.ShapeDtypeStruct((768,128), jnp.float32),
               jax.ShapeDtypeStruct((500,1), jnp.float32)),
    out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pltpu.SMEM)))
f3 = jax.jit(lambda x: call3(x))
print("500-smem-store pallas:", timeit(f3, x))
