"""ODG drift TPU-f32(GEMM) vs CPU-f64 on program-like material."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import bench as BE
from gstpeaq_tpu import api

refs, tests = BE.make_pairs(4, 10.0, seed=3)
# add amplitude modulation + noise floor so modulation MOVs are exercised
t = np.arange(refs[0].shape[0]) / 48000.0
am = (1.0 + 0.35 * np.sin(2 * np.pi * 4.0 * t) *
      np.sin(2 * np.pi * 0.7 * t)).astype(np.float32)[:, None]
rng = np.random.default_rng(9)
for i in range(len(refs)):
    refs[i] = refs[i] * am + 3e-4 * rng.standard_normal(refs[i].shape).astype(np.float32)
    tests[i] = tests[i] * am + 3e-4 * rng.standard_normal(refs[i].shape).astype(np.float32)

# TPU f32
f32 = [api.peaq(r, x, dtype="float32") for r, x in zip(refs, tests)]
print("TPU f32 ODGs:", [round(r.odg, 5) for r in f32], flush=True)

# CPU f64
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
api._jitted_basic.cache_clear()
f64 = [api.peaq(r, x, dtype="float64") for r, x in zip(refs, tests)]
print("CPU f64 ODGs:", [round(r.odg, 5) for r in f64], flush=True)
print("max |dODG|:", max(abs(a.odg - b.odg) for a, b in zip(f32, f64)))
for k in f32[0].movs:
    d = max(abs(a.movs[k] - b.movs[k]) / (abs(b.movs[k]) + 1e-30)
            for a, b in zip(f32, f64))
    print(f"  {k}: max rel {d:.2e}")
