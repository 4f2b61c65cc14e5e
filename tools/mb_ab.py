"""A/B the advanced microbatch size on the real chip.

Hypothesis (r4): at mb16 the advanced pipeline is HOST-DISPATCH-bound,
not device-bound — device ~28.4 ms/iter (per-HLO profile) vs ~35 ms/iter
end-to-end, and the tunnel's per-execute dispatch cost is ~33 ms.  Bigger
microbatches amortize the dispatch: mb32 should land near
320 / max(device_mb32, dispatch) a-s/s.  The r3 "mb32 measured WORSE"
note predates the staged DC cascade and the spectrum-stack drop; this
re-measures on the current pipeline, interleaved A/B/A to ride out
tunnel wobble.

Usage: python tools/mb_ab.py [--mbs 16,32,64] [--rounds 3]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mbs", default="16,32,64")
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--iters", type=int, default=2)
    args = parser.parse_args()
    mbs = [int(x) for x in args.mbs.split(",")]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench

    results = {mb: [] for mb in mbs}
    # warm up each config once (compile + first-execute stall) before
    # any timed round, so cold costs never land inside a measurement
    for mb in mbs:
        t0 = time.time()
        r = bench.bench(advanced=True, batch=64, seconds=10.0,
                        dtype="float32", iters=1, microbatch=mb, repeats=1)
        print(f"# warm mb{mb}: {time.time()-t0:.0f}s (first rate {r[0]:.0f})",
              flush=True)
    for rnd in range(args.rounds):
        for mb in mbs:          # interleaved: each round sees each config
            rates = bench.bench(advanced=True, batch=64, seconds=10.0,
                                dtype="float32", iters=args.iters,
                                microbatch=mb, repeats=2)
            results[mb].extend(rates)
            print(f"# round {rnd} mb{mb}: "
                  + " ".join(f"{r:.0f}" for r in rates), flush=True)
    for mb in mbs:
        rs = sorted(results[mb])
        med = rs[len(rs) // 2]
        print(f"mb{mb}: median {med:.0f} min {rs[0]:.0f} max {rs[-1]:.0f} "
              f"a-s/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
