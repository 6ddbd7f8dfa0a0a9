import time, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
B, n = 4096, 192
rng = np.random.default_rng(0)
K = jnp.asarray((rng.normal(size=(B, n, n)) / 20).astype(np.float32))
v = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

def timed(name, f, *a):
    out = f(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0=time.time(); out = f(*a); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f'{name}: {min(ts)*1000:.2f} ms  (check {float(jnp.sum(out)):.4g})', flush=True)

with jax.default_matmul_precision('highest'):
    def body(i, vv):
        return jnp.einsum('bij,bj->bi', K, vv) + 0.001
    timed('matvec loop x10', jax.jit(lambda v: jax.lax.fori_loop(0, 10, body, v)), v)
    timed('matvec loop x100', jax.jit(lambda v: jax.lax.fori_loop(0, 100, body, v)), v)
