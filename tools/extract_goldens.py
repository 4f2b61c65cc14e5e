"""Extract golden test vectors from the reference's unit tests.

Parses the embedded golden arrays out of /root/reference/src/testpeaq.c
(test *data*, pinned numerical expectations of the standard) and stores them
as tests/golden/testpeaq.npz for our test-suite to consume.

Run:  python tools/extract_goldens.py
"""

from __future__ import annotations

import pathlib
import re

import numpy as np

REF = pathlib.Path("/root/reference/src/testpeaq.c")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests/golden/testpeaq.npz"

ARRAY_RE = re.compile(
    r"static\s+(?:gdouble|double)\s+(\w+)\s*\[\]\s*=\s*\{(.*?)\};", re.DOTALL)

EXPECTED = {
    "fft_ref_data": 1025,
    "weighted_fft_ref_data": 1025,
    "unsmeared_excitation_ref": 109,
    "excitation_ref": 109,
    "spectrally_adapted_ref_patterns1_ref": 109,
    "spectrally_adapted_test_patterns1_ref": 109,
    "spectrally_adapted_ref_patterns2_ref": 109,
    "spectrally_adapted_test_patterns2_ref": 109,
    "modulation1_ref": 109,
    "loudness1_ref": 109,
    "modulation2_ref": 109,
    "loudness2_ref": 109,
}


def main() -> None:
    text = REF.read_text()
    arrays = {}
    for name, body in ARRAY_RE.findall(text):
        values = np.array([float(v) for v in re.split(r"[\s,]+", body.strip())
                           if v], dtype=np.float64)
        arrays[name] = values
    missing = set(EXPECTED) - set(arrays)
    if missing:
        raise SystemExit(f"missing golden arrays: {missing}")
    for name, n in EXPECTED.items():
        if arrays[name].size != n:
            raise SystemExit(
                f"{name}: expected {n} values, got {arrays[name].size}")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(OUT, **{k: arrays[k] for k in EXPECTED})
    print(f"wrote {OUT} with {len(EXPECTED)} arrays")


if __name__ == "__main__":
    main()
