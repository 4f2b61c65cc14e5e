"""Long-form streaming benchmark: hour-scale program, O(1) memory.

The BASELINE "Long-form streaming" configuration: a long stereo program
processed through PeaqStream in chunks with carried device state.

  python tools/longform_bench.py [--minutes 60] [--advanced] [--chunk 256]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--minutes", type=float, default=60.0)
    parser.add_argument("--advanced", action="store_true")
    parser.add_argument("--chunk", type=int, default=256,
                        help="chunk size in FFT frames")
    parser.add_argument("--precision", default=None)
    args = parser.parse_args()

    import os

    import jax
    if os.environ.get("GSTPEAQ_PLATFORM"):
        # CPU dry-runs (same hook as the CLI); before first backend use
        jax.config.update("jax_platforms", os.environ["GSTPEAQ_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from gstpeaq_tpu.parallel.stream import PeaqStream, PeaqStreamAdvanced

    cls = PeaqStreamAdvanced if args.advanced else PeaqStream
    stream = cls(channels=2, chunk_frames=args.chunk,
                 dtype=args.precision)

    total = int(args.minutes * 60 * 48000)
    feed = 48000 * 10  # 10 s host chunks
    t = np.arange(feed) / 48000.0
    rng = np.random.default_rng(0)

    t0 = time.time()
    done = 0
    f0 = 331.0
    while done < total:
        n = min(feed, total - done)
        tt = t[:n] + done / 48000.0
        # harmonic-rich program with energy to ~15 kHz: the BandwidthRef
        # MOV only accumulates frames whose reference bandwidth exceeds
        # bin 346 (~8.1 kHz, src/movs.c:775-809); a band-limited tone over
        # a white noise floor never qualifies, the accumulator stays
        # empty, and — faithfully to the reference's 0/0 — the ODG is NaN
        ref1 = np.zeros(n)
        test1 = np.zeros(n)
        k = 1
        while k * f0 < 15000.0:
            tone = np.sin(2 * np.pi * k * f0 * tt + 0.3 * k) / k
            ref1 += tone
            if k * f0 < 10000.0:   # codec-like lowpass on the test signal
                test1 += tone
            k += 1
        am = 1.0 + 0.3 * np.sin(2 * np.pi * 4.0 * tt)
        ref1 = (0.5 * ref1 * am).astype(np.float32)
        test1 = (0.485 * test1 * am
                 + 1e-4 * rng.standard_normal(n)).astype(np.float32)
        ref = np.stack([ref1, ref1], 1)
        test = np.stack([test1, test1], 1)
        stream.feed(ref, test)
        done += n
        if done % (feed * 30) == 0:
            cur = stream.current()
            el = time.time() - t0
            print(f"# {done/48000:.0f}s fed, {done/48000/el:.1f}x realtime, "
                  f"running ODG {cur.odg:.3f}", file=sys.stderr, flush=True)
    res = stream.finalize()
    dt = time.time() - t0
    print(f"processed {total/48000:.0f} audio-sec in {dt:.1f}s "
          f"({total/48000/dt:.1f}x realtime, single stream)")
    print(f"ODG {res.odg:.3f}  DI {res.di:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
