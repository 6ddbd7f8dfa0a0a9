import time, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp

B, n, m = 4096, 192, 512
rng = np.random.default_rng(0)
K = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
A = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
y = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32))
H = jnp.einsum('bij,bkj->bik', K, K) + 10*jnp.eye(n)

def timed(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0=time.time(); out = f(*a); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f'{name}: {min(ts)*1000:.2f} ms', flush=True)

with jax.default_matmul_precision('highest'):
    timed('batched matvec x100', jax.jit(lambda K, v: jax.lax.fori_loop(0, 100, lambda i, vv: jnp.einsum('bij,bj->bi', K, vv), v)), K, v)
    timed('batched matvec dotgen x100', jax.jit(lambda K, v: jax.lax.fori_loop(0, 100, lambda i, vv: jax.lax.dot_general(K, vv, (((2,), (1,)), ((0,), (0,)))), v)), K, v)
    def gemms(i, yy):
        xt = jnp.einsum('bm,mn->bn', yy, A)
        return jnp.einsum('bn,mn->bm', xt, A)
    timed('A gemm pair x100', jax.jit(lambda y: jax.lax.fori_loop(0, 100, gemms, y)), y)
    timed('cholesky', jax.jit(jnp.linalg.cholesky), H)
    timed('chol+inverse', jax.jit(lambda H: jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(H), True), jnp.broadcast_to(jnp.eye(n), H.shape))), H)
    timed('lu inv', jax.jit(jnp.linalg.inv), H)
    timed('AtRA einsum', jax.jit(lambda w: jnp.einsum('mi,bm,mj->bij', A, w, A)), jnp.abs(y))
# elementwise pass over (B,m)
timed('elementwise 10pass', jax.jit(lambda y: jax.lax.fori_loop(0, 10, lambda i, t: jnp.clip(t*1.0001+0.1, -50., 50.), y)), y)
