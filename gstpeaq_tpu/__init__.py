"""gstpeaq_tpu — TPU-native PEAQ (ITU-R BS.1387-1) in JAX.

A ground-up reimplementation of perceptual audio-quality measurement with the
capabilities of HSU-ANT/gstpeaq: both the Basic (FFT ear model, 11 MOVs) and
Advanced (FFT + 40-band filter-bank ear models, 5 MOVs) versions, a
`peaq(ref, test, advanced=...)` API and CLI reporting ODG/DI, batched and
sharded evaluation across TPU meshes, and chunked streaming for long programs.
"""

__version__ = "0.1.0"

from .constants import Settings, DEFAULT_SETTINGS  # noqa: F401

__all__ = ["Settings", "DEFAULT_SETTINGS", "__version__"]
