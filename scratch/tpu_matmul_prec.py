import numpy as np, jax, jax.numpy as jnp, time
rng = np.random.default_rng(0)
A = rng.standard_normal((256, 256)).astype(np.float32)
B = rng.standard_normal((256, 256)).astype(np.float32)
exact = (A.astype(np.float64) @ B.astype(np.float64))

Aj, Bj = jnp.asarray(A), jnp.asarray(B)
for prec in (None, "float32", "highest"):
    if prec is None:
        f = jax.jit(lambda a, b: a @ b)
    else:
        def f(a, b, p=prec):
            with jax.default_matmul_precision(p):
                return a @ b
        f = jax.jit(f)
    out = np.asarray(f(Aj, Bj)).astype(np.float64)
    err = np.abs(out - exact).max() / np.abs(exact).max()
    print(f"precision={prec}: rel err {err:.3e}")
# einsum too
e = jax.jit(lambda a,b: jnp.einsum("ij,jk->ik", a, b))
out = np.asarray(e(Aj,Bj)).astype(np.float64)
print("einsum default:", np.abs(out-exact).max()/np.abs(exact).max())
