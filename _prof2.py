import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
import bench as B
from rapidnet_tpu.engine.engine import XS_UPPER
from rapidnet_tpu.solver import solve_step as ss

cfg, eng, fa, make_step, tree = B.build_problem()
fd = eng.factor_step()
step = make_step(cfg.current_x)
N, ns = step["beta"].shape[:2]
nx = fa["Bb"].shape[1]; nu = fa["g"].shape[-1]; nv = fa["invWbar"].shape[0]
kw = dict(prefix_stages=fd.prefix_stages)
w_xi = jnp.ones((N, ns, 2*nx), jnp.float32)*0.01
w_psi = jnp.ones((N, ns, nu), jnp.float32)*0.01

def loop(f, n=500):
    def body(c, _):
        o = f(c)
        return o, ()
    def run(x):
        y, _ = lax.scan(body, x, None, length=n)
        return y
    return jax.jit(run)

def t(f, x):
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(x)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

# 1. full solve_step (backward+forward)
f1 = loop(lambda w: (lambda s: (s["prim_xi"], w[1]))(ss.solve_step(fa, w[0], w[1], step["beta"], step["uhat"], step["e"], step["x0"], step["prev_u"], step["prev_uhat"], **kw)))
print("solve_step x500      ", t(f1, (w_xi, w_psi)), "ms")
# 2. backward only
f2 = loop(lambda w: (jnp.concatenate([ss.backward_sweep(fa, w[0], w[1], step["beta"], **kw)[..., :nx], w[0][..., nx:]], -1)*0.999, w[1]))
print("backward  x500       ", t(f2, (w_xi, w_psi)), "ms")
# 3. prox only
def fprox(w):
    a, b, _ = ss.prox_g(fa, w[0], w[1][..., :nu]*0+w[1], w[0], w[1], inv_step=1e4, penalty_state=cfg.penalty_state, penalty_safety=cfg.penalty_safety, xs_upper=float(XS_UPPER))
    return (a*0.999, b*0.999)
f3 = loop(lambda w: fprox((w[0], w[1])))
print("prox      x500       ", t(f3, (w_xi, w_psi)), "ms")
# 4. infeasibility diag only
f4 = loop(lambda w: (w[0]*0.9999 + 1e-6*ss.signed_max_abs(w[0], w[1]), w[1]))
print("infeas    x500       ", t(f4, (w_xi, w_psi)), "ms")
# 5. pure elementwise baseline
f5 = loop(lambda w: (w[0]*0.9999+1e-5, w[1]*0.9999+1e-5))
print("elementwise x500     ", t(f5, (w_xi, w_psi)), "ms")
# 6. five big matmuls, chained
M = jnp.ones((128,128), jnp.float32)*0.001
def fmm(z):
    for _ in range(5):
        z = jnp.matmul(z, M, precision=lax.Precision.HIGHEST)
    return z
f6 = loop(fmm)
print("5x batched mm x500   ", t(f6, jnp.ones((N*ns, 128), jnp.float32)), "ms")
