import time, numpy as np, jax, jax.numpy as jnp
from jax import lax

def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

def loop(n, shp):
    def body(c, _):
        return (c[0]*0.9999+1e-5, c[1]*0.9999+1e-5), ()
    def run(x):
        y, _ = lax.scan(body, x, None, length=n)
        return y
    f = jax.jit(run)
    x = (jnp.ones(shp, jnp.float32), jnp.ones(shp, jnp.float32))
    return timeit(f, x)

print("scan500 (768,128)   ", loop(500, (768,128)))
print("scan500 (24,25,126) ", loop(500, (24,25,126)))
print("scan500 (24,25,128) ", loop(500, (24,25,128)))
print("scan500 (24,32,128) ", loop(500, (24,32,128)))

# pallas marginal cost
import bench as B
from rapidnet_tpu.engine.engine import XS_UPPER
from rapidnet_tpu.ops import pallas_apg
cfg, eng, fa, make_step, tree = B.build_problem()
step = make_step(cfg.current_x)
kwbase = dict(inv_step=1.0/cfg.step_size, step_size=cfg.step_size,
          penalty_state=cfg.penalty_state, penalty_safety=cfg.penalty_safety,
          xs_upper=float(XS_UPPER))
for it in (50, 200, 500):
    run, padf = pallas_apg.make_apg_pallas(fa, max_iterations=it, **kwbase)
    sp = padf(step)
    print(f"pallas {it} iters    ", timeit(run, sp))
