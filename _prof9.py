import time, numpy as np, jax, jax.numpy as jnp
import bench as B
from rapidnet_tpu.engine.engine import XS_UPPER
from rapidnet_tpu.ops import pallas_apg

cfg, eng, fa, make_step, tree = B.build_problem()
step = make_step(cfg.current_x)
kwb = dict(inv_step=1.0/cfg.step_size, step_size=cfg.step_size,
          penalty_state=cfg.penalty_state, penalty_safety=cfg.penalty_safety,
          xs_upper=float(XS_UPPER))
def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

consts = pallas_apg.pad_constants(fa)
dims = consts["dims"]
N, ns, nx, nu, nv, NSP, PX, PU, PV = dims
f_pad = jax.jit(lambda s: pallas_apg.pad_step(s, dims))
print("pad_step jit:", timeit(f_pad, step))
step_p = jax.block_until_ready(f_pad(step))

solve = pallas_apg.make_pallas_solve(consts, max_iterations=50, **kwb)
const_dev = tuple(jnp.asarray(consts[k]) for k in pallas_apg.CONST_NAMES)
f32 = jnp.float32
y0 = (jnp.zeros((N*NSP, PX), f32), jnp.zeros((N*NSP, PX), f32), jnp.zeros((N*NSP, PU), f32))
f_solve = jax.jit(lambda c, s, y: solve(c, s, y))
print("raw pallas_call (50 it):", timeit(f_solve, const_dev, step_p, y0))
