"""Compare TPU f32 MOVs (DFT-GEMM at a given precision) vs CPU f64 truth."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gstpeaq_tpu import api, constants as C
from gstpeaq_tpu.ops import fft_ear as FE
from gstpeaq_tpu.utils import testsignals as TS

# CPU f64 truth computed beforehand for saw vs triangle @128*1024 (from the
# validated f64 run; see tests): basic MOVs
F64_BASIC = {
    "BandwidthRefB": 921.0, "BandwidthTestB": 733.0,
    "TotalNMRB": 1.71263066, "WinModDiff1B": 11.04615707,
    "ADBB": 3.39729813, "EHSB": 0.22467387, "AvgModDiff1B": 11.79357699,
    "AvgModDiff2B": 11.29865983, "RmsNoiseLoudB": 1.17844645,
    "MFPDB": 0.99999861, "RelDistFramesB": 1.0,
}

prec = sys.argv[1] if len(sys.argv) > 1 else "HIGHEST"
import dataclasses
orig_build = FE.build_consts


def patched(params, dtype=jnp.float64, use_dft_gemm=None):
    k = orig_build(params, dtype, use_dft_gemm)
    return dataclasses.replace(
        k, dft_precision=getattr(jax.lax.Precision, prec))


FE.build_consts = patched

n = 128 * 1024
sa, tr = TS.saw(n), TS.triangle(n)
res = api.peaq(sa, tr, dtype="float32")
print(f"precision={prec}  ODG {res.odg:.6f} (f64: -2.007457)")
for k2, v in res.movs.items():
    ref = F64_BASIC[k2]
    print(f"  {k2}: {v:.6f} vs {ref:.6f}  rel {abs(v-ref)/(abs(ref)+1e-30):.2e}",
          flush=True)
