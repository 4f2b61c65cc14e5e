"""Verify full-f64 on TPU matches CPU f64 (exact tier) and measure speed."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import bench as BE
from gstpeaq_tpu.parallel import batch as B
from gstpeaq_tpu import constants as CC

refs, tests = BE.make_pairs(4, 10.0, seed=3)
t = np.arange(refs[0].shape[0]) / 48000.0
am = (1.0 + 0.35 * np.sin(2 * np.pi * 4.0 * t)
      * np.sin(2 * np.pi * 0.7 * t)).astype(np.float32)[:, None]
rng = np.random.default_rng(9)
for i in range(len(refs)):
    refs[i] = (refs[i] * am
               + 3e-4 * rng.standard_normal(refs[i].shape).astype(np.float32))
    tests[i] = (tests[i] * am
                + 3e-4 * rng.standard_normal(refs[i].shape).astype(np.float32))

t0 = time.time()
out = B.peaq_batch(refs + refs, tests + tests, dtype="float64", microbatch=8)
print("compile+run:", round(time.time() - t0, 1), flush=True)
f64_odg = np.array([-0.564452, -0.548305, -0.543873, -0.555635])
print("TPU f64 ODGs:", np.round(out["odg"][:4], 6), flush=True)
print("max |dODG| vs CPU f64:", np.max(np.abs(out["odg"][:4] - f64_odg)),
      flush=True)

arrays = [jax.device_put(a) for a in B.prepare_batch(refs * 2, tests * 2,
                                                     False)]
fn = B._jitted_basic_batch(92.0, CC.DEFAULT_SETTINGS, "float64")
np.asarray(fn(*arrays).odg)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(fn(*arrays).odg)
    times.append(time.perf_counter() - t0)
print(f"f64 mb=8: {min(times)*1000:.0f} ms -> {80/min(times):.0f} audio-s/s",
      flush=True)
