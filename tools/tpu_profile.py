"""Steady-state throughput probes on the TPU: microbatch scaling + stage
ablation for the basic pipeline."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gstpeaq_tpu import constants as C
from gstpeaq_tpu.models import basic
from gstpeaq_tpu.ops import framing
import bench as BE


def run(mb, n_iter=4, seconds=10.0):
    refs, tests = BE.make_pairs(mb, seconds)
    from gstpeaq_tpu.parallel import batch as B
    arrays = [jax.device_put(a) for a in B.prepare_batch(refs, tests, False)]
    fn = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, "float32")
    t0 = time.time()
    fn(*arrays).odg.block_until_ready()
    print(f"mb={mb}: compile+first {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        fn(*arrays).odg.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"mb={mb}: {best*1000:.0f} ms -> {mb*seconds/best:.0f} audio-sec/s",
          flush=True)


for mb in (8, 16, 32):
    run(mb)
