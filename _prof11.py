import time, numpy as np, jax, jax.numpy as jnp
import bench as B

cfg, eng, fa, make_step, tree = B.build_problem()
step = make_step(cfg.current_x)
def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3
print({k: (type(v).__name__, getattr(v, 'shape', None), str(getattr(v, 'sharding', ''))[:60]) for k, v in step.items()})
f = jax.jit(lambda s: s["x0"][0])
print("identity on step dict:", timeit(f, step))
for k, v in step.items():
    g = jax.jit(lambda a: a.reshape(-1)[0])
    print(f"  {k:10s}", timeit(g, v))
