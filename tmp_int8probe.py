import json, time
import jax, jax.numpy as jnp
import numpy as np
from gvcnn_tf_tpu.utils import setup_compilation_cache
setup_compilation_cache()

def timeit(f, *a, iters=20, chunk=5):
    o = f(*a); float(jax.device_get(jnp.sum(o).astype(jnp.float32)))
    ts = []
    for _ in range(max(iters//chunk,2)):
        t0 = time.perf_counter()
        for _ in range(chunk): o = f(*a)
        float(jax.device_get(jnp.sum(o).astype(jnp.float32)))
        ts.append((time.perf_counter()-t0)/chunk)
    ts.sort(); return ts[len(ts)//2]

r = np.random.RandomState(0)
# Representative mid-net conv: 28x28x192 -> 3x3 -> 96ch at serve batch 384
for (hw, cin, cout, k) in [(28, 192, 96, 3), (14, 512, 160, 1), (28, 256, 128, 3)]:
    xs = (384, hw, hw, cin)
    x16 = jnp.asarray(r.randn(*xs), jnp.bfloat16)
    w16 = jnp.asarray(r.randn(k, k, cin, cout)*0.05, jnp.bfloat16)
    x8 = jnp.asarray(r.randint(-127, 127, xs), jnp.int8)
    w8 = jnp.asarray(r.randint(-127, 127, (k, k, cin, cout)), jnp.int8)
    conv16 = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC")))
    conv8 = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"),
        preferred_element_type=jnp.int32))
    try:
        t16 = timeit(conv16, x16, w16)
        t8 = timeit(conv8, x8, w8)
        print(json.dumps({"shape": [hw, cin, cout, k],
                          "bf16_ms": round(t16*1e3,3),
                          "int8_ms": round(t8*1e3,3),
                          "speedup": round(t16/t8, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"shape": [hw,cin,cout,k],
                          "err": str(e).split(chr(10))[0][:150]}), flush=True)
