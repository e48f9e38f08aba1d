import json, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(f, *a, iters=20, chunk=5):
    o = f(*a); float(jax.device_get(jnp.sum(o).astype(jnp.float32)))
    ts = []
    for _ in range(max(iters//chunk,2)):
        t0 = time.perf_counter()
        for _ in range(chunk): o = f(*a)
        float(jax.device_get(jnp.sum(o).astype(jnp.float32)))
        ts.append((time.perf_counter()-t0)/chunk)
    ts.sort(); return ts[len(ts)//2]

N = 64  # samples per timing run (scale results x6 for 384)
r = np.random.RandomState(0)
x = jnp.asarray(r.randn(N, 229, 690).astype("bfloat16"))
w = jnp.asarray(r.randn(216, 128).astype("bfloat16"))
wl = jnp.asarray(r.randn(24, 9, 128).astype("bfloat16"))

def prep(xr):
    """F (229,690) -> P (6, 115, 229) phase planes."""
    ft = xr.T                      # (690, 229)
    x3 = ft.reshape(115, 6, 229)
    return jnp.stack([x3[:, b, :] for b in range(6)])  # (6,115,229)

# P1: chained K=9 matmuls, no assembly
def k1(x_ref, wl_ref, o_ref):
    p = prep(x_ref[0])
    for i in range(56):
        acc = jnp.zeros((112, 128), jnp.float32)
        t = 0
        for a in range(4):
            for b in range(6):
                acc += jnp.dot(p[b, a:a+112, 4*i:4*i+9], wl_ref[t],
                               preferred_element_type=jnp.float32)
                t += 1
        o_ref[0, i] = acc.astype(o_ref.dtype)

# P2: assemble (112,216) then one matmul
def k2(x_ref, w_ref, o_ref):
    p = prep(x_ref[0])
    for i in range(56):
        blocks = [p[b, a:a+112, 4*i:4*i+9]
                  for a in range(4) for b in range(6)]
        A = jnp.concatenate(blocks, axis=1)  # (112, 216)
        o_ref[0, i] = jnp.dot(A, w_ref[:],
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)

# P0: prep only (cost of transpose+split+extract)
def k0(x_ref, w_ref, o_ref):
    p = prep(x_ref[0])
    o_ref[0] = p[0, :112, :128].astype(o_ref.dtype)

for name, kern, warg, oshape in [
    ("prep_only", k0, w, (N, 112, 128)),
    ("chain_k9", k1, wl, (N, 56, 112, 128)),
    ("assemble_k216", k2, w, (N, 56, 112, 128)),
]:
    try:
        f = jax.jit(lambda a, b, kern=kern, oshape=oshape: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(oshape, jnp.bfloat16),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, 229, 690), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(b.shape, lambda i: tuple([0]*b.ndim),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1,) + oshape[1:],
                                   lambda i: (i,) + (0,)*(len(oshape)-1),
                                   memory_space=pltpu.VMEM),
        )(a, b))
        t = timeit(f, x, warg)
        print(json.dumps({"probe": name, "ms_64": round(t*1e3,3),
                          "ms_384_equiv": round(t*1e3*384/N, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": str(e).split(chr(10))[0][:200]}), flush=True)
