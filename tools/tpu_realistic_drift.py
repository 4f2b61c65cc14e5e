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

from gstpeaq_tpu.parallel import batch as B
from gstpeaq_tpu import constants as CC

refs8 = refs + refs
tests8 = tests + tests

# TPU f32 via the cached microbatch-8 / bucket-512 program
out32 = B.peaq_batch(refs8, tests8, dtype="float32", microbatch=8)
print("TPU f32 ODGs:", np.round(out32["odg"][:4], 5), flush=True)

# CPU f64
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
B._jitted_basic_batch.cache_clear()
out64 = B.peaq_batch(refs8, tests8, dtype="float64", microbatch=8)
print("CPU f64 ODGs:", np.round(out64["odg"][:4], 5), flush=True)
print("max |dODG|:",
      np.max(np.abs(out32["odg"][:4] - out64["odg"][:4])), flush=True)
for i, k in enumerate(CC.MOV_BASIC_NAMES):
    d = np.max(np.abs(out32["movs"][:4, i] - out64["movs"][:4, i])
               / (np.abs(out64["movs"][:4, i]) + 1e-30))
    print(f"  {k}: max rel {d:.2e}")
