import time, json
import jax, jax.numpy as jnp
import numpy as np
from gvcnn_tf_tpu.utils import setup_compilation_cache
setup_compilation_cache()

def timeit(f, *args, iters=20, chunk=5):
    out = f(*args)
    float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
    ts = []
    for _ in range(max(iters // chunk, 2)):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = f(*args)
        float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / chunk)
    ts.sort()
    return ts[len(ts)//2]

N = 384
r = np.random.RandomState(0)
x32 = jnp.asarray(r.rand(N,224,224,3), jnp.float32)
x16 = x32.astype(jnp.bfloat16)
k7 = jnp.asarray(r.randn(7,7,3,64)*0.05, jnp.bfloat16)

conv7 = jax.jit(lambda x,k: jax.lax.conv_general_dilated(
    x.astype(jnp.bfloat16), k, (2,2), "SAME",
    dimension_numbers=("NHWC","HWIO","NHWC")))
print(json.dumps({"op":"conv7x7s2_from_fp32","ms":timeit(conv7,x32,k7)*1e3}), flush=True)
print(json.dumps({"op":"conv7x7s2_bf16","ms":timeit(conv7,x16,k7)*1e3}), flush=True)

# s2d shuffle alone (bf16)
def s2d(x):
    xp = jnp.pad(x, ((0,0),(2,4),(2,4),(0,0)))
    n,h,w,c = xp.shape
    xs = xp.reshape(n,h//2,2,w//2,2,c)
    return xs.transpose(0,1,3,2,4,5).reshape(n,h//2,w//2,4*c)
s2dj = jax.jit(s2d)
print(json.dumps({"op":"s2d_shuffle_bf16","ms":timeit(s2dj,x16)*1e3}), flush=True)

xs = s2dj(x16)  # (384,115,115,12)
k4 = jnp.asarray(r.randn(4,4,12,64)*0.05, jnp.bfloat16)
conv4 = jax.jit(lambda x,k: jax.lax.conv_general_dilated(
    x, k, (1,1), "VALID", dimension_numbers=("NHWC","HWIO","NHWC")))
print(json.dumps({"op":"conv4x4s1_c12_preshuffled","ms":timeit(conv4,xs,k4)*1e3}), flush=True)

# double s2d: (56,56,48)-ish input, 2x2 kernel  -> same FLOPs again
def s2d2(x):
    return s2d(s2d(x)[:, :112, :112, :])
xs2 = jax.jit(s2d2)(x16)  # (384,56+?,...) -> (384,57,57,48)
k2 = jnp.asarray(r.randn(2,2,48,64)*0.05, jnp.bfloat16)
conv2 = jax.jit(lambda x,k: jax.lax.conv_general_dilated(
    x, k, (1,1), "VALID", dimension_numbers=("NHWC","HWIO","NHWC")))
o = conv2(xs2, k2); print("dbl shape", o.shape, flush=True)
print(json.dumps({"op":"conv2x2s1_c48_preshuffled","ms":timeit(conv2,xs2,k2)*1e3}), flush=True)
