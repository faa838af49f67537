"""First thing on TPU return: validate the (changed) kernel on real
hardware against the CPU-computed oracle results."""
import os, sys
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_webgpu_raytracing_tpu"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from webgpu_raytracing_tpu.config import F32_MAX
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.ops.cluster_pallas import trace_closest_clustered_pallas

scene = load_scene(
    "/root/reference/assets/raytraced-scene.obj",
    "/root/reference/assets/raytraced-scene.mtl",
)
tables = jax.device_put(scene.tables())
rng_np = np.random.default_rng(3)
n = 4096
o = rng_np.uniform(-3, 3, (n, 3)).astype(np.float32)
d = rng_np.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
tmax = jnp.full((n,), F32_MAX, jnp.float32)

base = trace_closest_clustered_pallas(
    jnp.asarray(o), jnp.asarray(d), tmax, tables, tile=256, tiles_per_step=1
)
f0, t0 = np.asarray(base.face), np.asarray(base.t)
print("hits:", (f0 >= 0).sum(), "/", n, flush=True)
for tps in (4, 8):
    h = trace_closest_clustered_pallas(
        jnp.asarray(o), jnp.asarray(d), tmax, tables, tile=256,
        tiles_per_step=tps,
    )
    ok_f = np.array_equal(np.asarray(h.face), f0)
    ok_t = np.array_equal(np.asarray(h.t), t0)
    print(f"tps={tps}: face identical={ok_f} t identical={ok_t}", flush=True)
h = trace_closest_clustered_pallas(
    jnp.asarray(o), jnp.asarray(d), tmax, tables, tile=256, approx_div=True
)
flips = int((np.asarray(h.face) != f0).sum())
print(f"approx_div: face flips {flips}/{n}", flush=True)
h = trace_closest_clustered_pallas(
    jnp.asarray(o), jnp.asarray(d), tmax, tables, tile=256, any_hit=True
)
print("any_hit flags match closest-hit mask:",
      np.array_equal(np.asarray(h.face) >= 0, f0 >= 0), flush=True)
print("SANITY DONE", flush=True)
