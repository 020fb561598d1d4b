"""TPU probe: fused attention vs XLA einsum path at the fusion-block shape."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from diffusiondrive_tpu.ops.attention_fused import fused_attention, dropout_keep_mask

rng = np.random.default_rng(0)
B, H, T, D = 64, 4, 320, 64
pdrop = 0.1
dt = jnp.bfloat16
q = jnp.asarray(rng.normal(size=(B,H,T,D)).astype(np.float32)*0.3, dt)
k = jnp.asarray(rng.normal(size=(B,H,T,D)).astype(np.float32)*0.3, dt)
v = jnp.asarray(rng.normal(size=(B,H,T,D)).astype(np.float32)*0.3, dt)
mask = dropout_keep_mask(jax.random.PRNGKey(1), (B,H,T,T), pdrop)

def xla_attn(q, k, v, m=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(D)).astype(q.dtype)
    p = jax.nn.softmax(s, axis=-1)
    if m is not None:
        p = jnp.where(m != 0, p / (1.0 - pdrop), jnp.zeros_like(p))
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)

# ---- numerics (eval path, no mask) ----
of = np.asarray(jax.jit(lambda q,k,v: fused_attention(q,k,v,None))(q,k,v), np.float32)
ox = np.asarray(jax.jit(xla_attn)(q,k,v), np.float32)
denom = max(np.abs(ox).max(), 1e-9)
print(f"fwd rel err vs XLA-bf16: {np.abs(of-ox).max()/denom:.2e}")

# grads (with mask)
def lf(q,k,v): return jnp.sum(fused_attention(q,k,v,mask,pdrop).astype(jnp.float32)**2)
def lx(q,k,v): return jnp.sum(xla_attn(q,k,v,mask).astype(jnp.float32)**2)
gf = jax.jit(jax.grad(lf, argnums=(0,1,2)))(q,k,v)
gx = jax.jit(jax.grad(lx, argnums=(0,1,2)))(q,k,v)
for a,b,n in zip(gf,gx,"qkv"):
    a = np.asarray(a,np.float32); b = np.asarray(b,np.float32)
    print(f"grad d{n} rel err: {np.abs(a-b).max()/max(np.abs(b).max(),1e-9):.2e}")

# ---- timing: chained wall, dependency-threaded + final fetch ----
def timeit(name, step, x0):
    xw = step(x0)
    np.asarray(jax.device_get(xw.ravel()[:1]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        xc = x0
        for _ in range(30):
            xc = step(xc)
        np.asarray(jax.device_get(xc.ravel()[:1]))
        best = min(best, (time.perf_counter()-t0)/30)
    print(f"{name}: {best*1e3:.3f} ms/launch")
    return best

# fwd only (eval path: no mask)
@jax.jit
def step_f(qc):
    o = fused_attention(qc, k, v, None)
    return qc + (o.ravel()[:1] * 1e-30).astype(qc.dtype)
@jax.jit
def step_x(qc):
    o = xla_attn(qc, k, v)
    return qc + (o.ravel()[:1] * 1e-30).astype(qc.dtype)
timeit("fwd pallas (nomask)", step_f, q)
timeit("fwd xla    (nomask)", step_x, q)

# fwd+bwd (train path: mask)
@jax.jit
def stepg_f(qc):
    g = jax.grad(lf, argnums=(0,))(qc, k, v)[0]
    return qc + g.ravel()[:1].astype(qc.dtype) * 1e-30
@jax.jit
def stepg_x(qc):
    g = jax.grad(lx, argnums=(0,))(qc, k, v)[0]
    return qc + g.ravel()[:1].astype(qc.dtype) * 1e-30
timeit("fwd+bwd pallas (mask)", stepg_f, q)
timeit("fwd+bwd xla    (mask)", stepg_x, q)

# b16 eval shape too (planner forward)
B2 = 16
q2, k2, v2 = (x[:B2] for x in (q,k,v))
@jax.jit
def step_f16(qc):
    o = fused_attention(qc, k2, v2, None)
    return qc + (o.ravel()[:1] * 1e-30).astype(qc.dtype)
@jax.jit
def step_x16(qc):
    o = xla_attn(qc, k2, v2)
    return qc + (o.ravel()[:1] * 1e-30).astype(qc.dtype)
timeit("fwd pallas b16", step_f16, q2)
timeit("fwd xla    b16", step_x16, q2)
