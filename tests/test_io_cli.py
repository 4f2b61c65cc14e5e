"""WAV I/O round-trips, resampling, CLI output format."""

import subprocess
import sys

import numpy as np
import pytest

from gstpeaq_tpu.utils import testsignals as TS
from gstpeaq_tpu.utils import wavio


def test_wav_float_roundtrip(tmp_path):
    x = TS.sine(4800)[:, None]
    path = str(tmp_path / "f.wav")
    wavio.write_wav(path, x, 48000)
    y, rate = wavio.read_wav(path)
    assert rate == 48000
    np.testing.assert_array_equal(x, y)


def test_wav_pcm16(tmp_path):
    import struct
    x = (np.array([-32768, -1, 0, 1, 32767], dtype="<i2"))
    payload = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 96000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    path = tmp_path / "i16.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    y, rate = wavio.read_wav(str(path))
    np.testing.assert_allclose(
        y[:, 0], x.astype(np.float64) / 32768.0, atol=1e-7)


def test_resample_identity():
    x = TS.sine(4800)[:, None]
    assert wavio.resample_to_48k(x, 48000) is x


def test_resample_44k1_tone():
    # a 1 kHz tone at 44.1k resampled to 48k stays a 1 kHz tone
    n = 44100
    t = np.arange(n) / 44100.0
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[:, None]
    y = wavio.resample_to_48k(x, 44100)
    assert abs(y.shape[0] - 48000) <= 2
    mid = y[2000:40000, 0]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * 48000.0 / len(mid)
    assert abs(peak_hz - 1000.0) < 5.0


@pytest.mark.slow
def test_cli_matches_reference_format(tmp_path):
    ref = TS.saw(64 * 1024)
    test = TS.triangle(64 * 1024)
    rp, tp = str(tmp_path / "r.wav"), str(tmp_path / "t.wav")
    wavio.write_wav(rp, ref[:, None])
    wavio.write_wav(tp, test[:, None])
    proc = subprocess.run(
        [sys.executable, "-m", "gstpeaq_tpu", rp, tp],
        capture_output=True, text=True, check=True)
    lines = proc.stdout.strip().splitlines()
    assert lines[-2].startswith("Objective Difference Grade: ")
    assert lines[-1].startswith("Distortion Index: ")
    odg = float(lines[-2].split(": ")[1])
    assert -4.0 <= odg <= 0.3


@pytest.mark.slow
def test_cli_precision_mixed_and_totalsnr(tmp_path):
    """--precision mixed is accepted (docs/peaq.md) and --totalsnr prints
    the reference's totalsnr property (src/gstpeaq.c:493-497)."""
    ref = TS.saw(48 * 1024)
    test = TS.triangle(48 * 1024)
    rp, tp = str(tmp_path / "r.wav"), str(tmp_path / "t.wav")
    wavio.write_wav(rp, ref[:, None])
    wavio.write_wav(tp, test[:, None])
    proc = subprocess.run(
        [sys.executable, "-m", "gstpeaq_tpu", "--precision", "mixed",
         "--totalsnr", rp, tp],
        capture_output=True, text=True, check=True)
    lines = proc.stdout.strip().splitlines()
    assert lines[-1].startswith("Total SNR: ")
    assert lines[-1].endswith(" dB")
    snr = float(lines[-1].split(": ")[1].split(" ")[0])
    assert np.isfinite(snr)
