"""TPU mixed precision with VPU-FFT spectrum: drift + throughput."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
from gstpeaq_tpu.ops import fft_ear as FE
_orig = FE.build_consts
FE.build_consts = lambda p, dtype, use_dft_gemm=None, spectrum_dtype=None: _orig(
    p, dtype, use_dft_gemm=False, spectrum_dtype=spectrum_dtype)
import bench as BE
from gstpeaq_tpu.parallel import batch as B
from gstpeaq_tpu import constants as CC

refs, tests = BE.make_pairs(4, 10.0, seed=3)
t = np.arange(refs[0].shape[0]) / 48000.0
am = (1.0 + 0.35 * np.sin(2*np.pi*4.0*t) * np.sin(2*np.pi*0.7*t)).astype(np.float32)[:, None]
rng = np.random.default_rng(9)
for i in range(len(refs)):
    refs[i] = refs[i] * am + 3e-4 * rng.standard_normal(refs[i].shape).astype(np.float32)
    tests[i] = tests[i] * am + 3e-4 * rng.standard_normal(refs[i].shape).astype(np.float32)

t0 = time.time()
out = B.peaq_batch(refs + refs, tests + tests, dtype="mixed", microbatch=8)
print("compile+run:", round(time.time()-t0, 1), flush=True)
f64_movs = np.load("/tmp/drift_f64.npy")
f64_odg = np.array([-0.564452, -0.548305, -0.543873, -0.555635])
print("TPU mixed-FFT ODGs:", np.round(out["odg"][:4], 6), flush=True)
print("max |dODG| vs f64:", np.max(np.abs(out["odg"][:4] - f64_odg)), flush=True)
for i, k in enumerate(CC.MOV_BASIC_NAMES):
    d = np.max(np.abs(out["movs"][:4, i] - f64_movs[:, i]) / (np.abs(f64_movs[:, i]) + 1e-30))
    print(f"  {k}: max rel {d:.2e}", flush=True)

arrays = [jax.device_put(a) for a in B.prepare_batch(refs*2, tests*2, False)]
fn = B._jitted_basic_batch(92.0, CC.DEFAULT_SETTINGS, "mixed")
fn(*arrays).odg.block_until_ready()
times = []
for _ in range(4):
    t0 = time.perf_counter(); fn(*arrays).odg.block_until_ready()
    times.append(time.perf_counter() - t0)
print(f"mixed-FFT mb=8: {min(times)*1000:.0f} ms -> {80/min(times):.0f} audio-s/s", flush=True)
