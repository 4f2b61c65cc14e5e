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


def test_train_cognitive_sharded_decreases_loss():
    rng = np.random.default_rng(5)
    movs = rng.standard_normal((64, 11)) * 10 + 50
    tgt = rng.standard_normal(64)
    _, losses = S.train_cognitive_sharded(movs, tgt, steps=10)
    assert losses[-1] < losses[0]


def test_dryrun_multichip():
    import __graft_entry__ as G
    G.dryrun_multichip(8)
