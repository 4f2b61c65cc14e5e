"""Batched / sharded evaluation equals single-pair results; training step."""

import numpy as np
import pytest

from gstpeaq_tpu import api
from gstpeaq_tpu.parallel import batch as B
from gstpeaq_tpu.parallel import shard as S
from gstpeaq_tpu.utils import testsignals as TS


@pytest.fixture(scope="module")
def pairs():
    n = 40 * 1024
    return [(TS.saw(n + 3000 * i), TS.triangle(n + 3000 * i))
            for i in range(5)]


@pytest.mark.slow
def test_batch_equals_single(pairs):
    singles = [api.peaq(r, t).odg for r, t in pairs[:2]]
    out = B.peaq_batch([p[0] for p in pairs], [p[1] for p in pairs],
                       granularity=8)
    np.testing.assert_allclose(out["odg"][:2], singles, atol=1e-9)


@pytest.mark.slow
def test_sharded_equals_batch(pairs):
    import jax
    assert len(jax.devices()) == 8  # virtual CPU mesh from conftest
    out = B.peaq_batch([p[0] for p in pairs], [p[1] for p in pairs],
                       granularity=8)
    sh = S.peaq_sharded([p[0] for p in pairs], [p[1] for p in pairs],
                        granularity=8)
    np.testing.assert_allclose(sh["odg"], out["odg"], atol=1e-12)


@pytest.mark.slow
def test_sharded_equals_batch_advanced(pairs):
    """Advanced mode's dual-rate input pytree sharded over the 8-device
    mesh must agree with the single-device batch exactly."""
    import jax
    assert len(jax.devices()) == 8
    refs = [p[0] for p in pairs[:3]]
    tests = [p[1] for p in pairs[:3]]
    out = B.peaq_batch(refs, tests, advanced=True, granularity=8)
    sh = S.peaq_sharded(refs, tests, advanced=True, granularity=8)
    np.testing.assert_allclose(sh["odg"], out["odg"], atol=1e-12)


def test_train_cognitive_sharded_decreases_loss():
    rng = np.random.default_rng(5)
    movs = rng.standard_normal((64, 11)) * 10 + 50
    tgt = rng.standard_normal(64)
    _, losses = S.train_cognitive_sharded(movs, tgt, steps=10)
    assert losses[-1] < losses[0]


def test_dryrun_multichip():
    import __graft_entry__ as G
    G.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_env():
    """Reproduce the DRIVER's invocation: a fresh subprocess with no conftest
    and no pre-set XLA_FLAGS, where the sitecustomize-forced TPU backend is
    registered.  Round 1 failed exactly here (platform switched after the
    backend had initialized), while the in-process test above passed under
    conftest's pre-switched CPU mesh — this test closes that blind spot."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as G; G.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    assert "metric batch 16 pairs OK" in proc.stdout
