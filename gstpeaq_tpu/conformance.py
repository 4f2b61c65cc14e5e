"""BS.1387 conformance harness.

Mirrors the reference's checkconformanceresults.sh: for each of the 16 ITU
test items in $CONFORMANCEDATADIR ({item}ref.wav vs {item}.wav), compute the
DI and compare against (a) the ITU reference values and (b) the C
implementation's own blessed outputs (doc/conformance_{basic,advanced}_table.xml
— the regression targets; matching those to 1e-3 is the parity gate).

The expected tables below are data extracted from the reference's published
conformance tables (doc/conformance_basic_table.xml:14-66,
doc/conformance_advanced_table.xml:14-66).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# item -> (ITU reference DI, gstpeaq blessed DI)
CONFORMANCE_BASIC = {
    "acodsna": (1.304, 1.297), "bcodtri": (1.949, 1.973),
    "ccodsax": (0.048, 0.074), "ecodsmg": (1.731, 1.811),
    "fcodsb1": (0.677, 0.700), "fcodtr1": (1.419, 1.468),
    "fcodtr2": (-0.045, 0.085), "fcodtr3": (-0.715, -0.564),
    "gcodcla": (1.781, 1.798), "icodsna": (-3.029, -2.961),
    "kcodsme": (3.093, 3.133), "lcodhrp": (1.041, 1.095),
    "lcodpip": (1.973, 2.735), "mcodcla": (-0.436, -0.378),
    "ncodsfe": (3.135, 3.101), "scodclv": (1.689, 1.723),
}

CONFORMANCE_ADVANCED = {
    "acodsna": (1.632, 1.600), "bcodtri": (2.000, 1.978),
    "ccodsax": (0.567, 0.474), "ecodsmg": (1.594, 1.592),
    "fcodsb1": (1.039, 0.819), "fcodtr1": (1.555, 1.506),
    "fcodtr2": (0.162, 0.061), "fcodtr3": (-0.783, -0.282),
    "gcodcla": (1.457, 1.369), "icodsna": (-2.510, -2.430),
    "kcodsme": (2.765, 2.797), "lcodhrp": (1.538, 1.331),
    "lcodpip": (2.149, 2.089), "mcodcla": (0.430, -0.148),
    "ncodsfe": (3.163, 3.125), "scodclv": (1.972, 2.104),
}


@dataclasses.dataclass
class ConformanceRow:
    item: str
    di: float
    odg: float
    itu_di: float
    blessed_di: float

    @property
    def delta_itu(self) -> float:
        return self.di - self.itu_di

    @property
    def delta_blessed(self) -> float:
        return self.di - self.blessed_di


def data_dir() -> str | None:
    d = os.environ.get("CONFORMANCEDATADIR")
    if d and os.path.isdir(d):
        return d
    return None


def run(advanced: bool = False, dtype: str | None = None,
        directory: str | None = None,
        settings=None) -> list[ConformanceRow]:
    """Run all 16 items; raises FileNotFoundError if the dataset is absent."""
    from . import api
    from . import constants as C
    from .utils import native

    d = directory or data_dir()
    if d is None:
        raise FileNotFoundError(
            "CONFORMANCEDATADIR not set or missing (the BS.1387 dataset is "
            "proprietary and not distributed with this repository)")
    settings = settings or C.DEFAULT_SETTINGS
    table = CONFORMANCE_ADVANCED if advanced else CONFORMANCE_BASIC
    rows = []
    for item, (itu_di, blessed_di) in table.items():
        ref = native.load_audio_48k(os.path.join(
            d, item.replace("cod", "ref") + ".wav"))
        test = native.load_audio_48k(os.path.join(d, item + ".wav"))
        res = api.peaq(ref, test, advanced=advanced, dtype=dtype,
                       settings=settings)
        rows.append(ConformanceRow(item=item, di=res.di, odg=res.odg,
                                   itu_di=itu_di, blessed_di=blessed_di))
    return rows


def report(rows: list[ConformanceRow]) -> str:
    lines = [f"{'item':8s} {'DI':>8s} {'blessed':>8s} {'dBlessed':>9s} "
             f"{'ITU':>8s} {'dITU':>8s}"]
    for r in rows:
        lines.append(f"{r.item:8s} {r.di:8.3f} {r.blessed_di:8.3f} "
                     f"{r.delta_blessed:9.4f} {r.itu_di:8.3f} "
                     f"{r.delta_itu:8.3f}")
    d_blessed = np.array([r.delta_blessed for r in rows])
    d_itu = np.array([r.delta_itu for r in rows])
    lines.append(f"max |dBlessed| = {np.abs(d_blessed).max():.4f}   "
                 f"RMSE vs ITU = {np.sqrt((d_itu ** 2).mean()):.4f}")
    return "\n".join(lines)


def main() -> int:
    import argparse
    p = argparse.ArgumentParser(description="BS.1387 conformance check")
    p.add_argument("--advanced", action="store_true")
    p.add_argument("--precision", default=None)
    args = p.parse_args()
    if data_dir() is None:
        print("CONFORMANCEDATADIR not set, conformance test NOT run.")
        return 77
    rows = run(args.advanced, args.precision)
    print(report(rows))
    return 0 if max(abs(r.delta_blessed) for r in rows) < 1e-3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
