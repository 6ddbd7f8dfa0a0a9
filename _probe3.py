import time, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
from qrw_tpu.config import Config
from qrw_tpu.core import mpc as mpc_mod
from qrw_tpu.ops import qp
from bench import build_batch

cfg = Config()
rng = np.random.default_rng(0)
B = 4096
xrefs, fsteps = build_batch(cfg, B, rng)
xj, fj = jnp.asarray(xrefs), jnp.asarray(fsteps)

def timed(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0=time.time(); out = f(*a); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f'{name}: {min(ts)*1000:.1f} ms', flush=True)
    return out

# 1. build_qp only
build = jax.jit(jax.vmap(lambda x, f: mpc_mod.build_qp(cfg, x, f)))
H, qlin, l, u, G, h = timed('build_qp', build, xj, fj)
A = jnp.asarray(mpc_mod.cone_matrix(cfg.n_steps, cfg.mu), jnp.float32)

# 2. solve variants
def solve_with(name, s):
    f = jax.jit(lambda H,q,l,u: qp.solve(H,q,A,l,u,s))
    out = timed(name, f, H, qlin, l, u)
    print('   iters mean', float(jnp.mean(out.iters)), 'conv', float(jnp.mean(out.converged)), flush=True)

solve_with('solve default(eps1e-4,500)', qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=500, check_every=25))
solve_with('solve no-adapt', qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=500, check_every=25, adaptive_rho_interval=10000))
solve_with('solve fixed100-nocheck', qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=100, check_every=100, adaptive_rho_interval=10000))
solve_with('solve fixed400-nocheck', qp.QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=400, check_every=400, adaptive_rho_interval=10000))

# 3. isolated pieces
rho0 = jnp.full((B,1), 0.1, jnp.float32)
Kinv = timed('factor(chol+inv)', jax.jit(lambda H: jnp.linalg.inv(H + 0.1*jnp.eye(192))), H)
v = jnp.ones((B,192), jnp.float32)
timed('batched matvec x100', jax.jit(lambda K, v: jax.lax.fori_loop(0, 100, lambda i, vv: jnp.einsum('bab,bb2->ba', K, vv[..., None])[..., 0] if False else jnp.einsum('...ab,...b->...a', K, vv), v)), Kinv, v)
y = jnp.ones((B,624), jnp.float32)
def gemms(_, yy):
    xt = jnp.einsum('...m,mn->...n', yy, A)
    return jnp.einsum('...n,mn->...m', xt, A)
timed('A gemm pair x100', jax.jit(lambda y: jax.lax.fori_loop(0, 100, gemms, y)), y)
