"""Tune microbatch for basic (64) and advanced (16) on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import bench as BE
from gstpeaq_tpu import constants as CC
from gstpeaq_tpu.parallel import batch as B


def run(advanced, mb, iters=3):
    tag = "adv" if advanced else "basic"
    refs, tests = BE.make_pairs(mb, 10.0)
    buckets = B.compute_buckets(refs, tests, advanced)
    arrays = [jax.device_put(a)
              for a in B.prepare_chunk(refs, tests, buckets)]
    if advanced:
        fn = B._jitted_advanced_batch(92.0, CC.DEFAULT_SETTINGS, "float32",
                                      buckets[0], buckets[1])
    else:
        fn = B._jitted_basic_batch(92.0, CC.DEFAULT_SETTINGS, "float32")
    t0 = time.time()
    np.asarray(fn(*arrays).odg)
    print(f"{tag} mb={mb}: compile+first {time.time()-t0:.0f}s", flush=True)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*arrays).odg)
        times.append(time.perf_counter() - t0)
    print(f"{tag} mb={mb}: {min(times)*1000:.0f} ms "
          f"-> {mb*10/min(times):.0f} audio-s/s", flush=True)


run(False, 64)
run(True, 16)
