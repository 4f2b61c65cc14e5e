"""XLA op-level profile of the batched PEAQ program on the real TPU.

Traces one steady-state iteration with jax.profiler and aggregates
device-side op self-times from the xplane via xprof (the ground truth the
stage-substitution tool tools/tpu_stage_cost.py approximates).

Usage: python tools/tpu_opprofile.py [--mode basic|advanced] [--mb N]
                                     [--dtype float32|mixed] [--top N]
"""
import argparse
import glob
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as BE
from gstpeaq_tpu import constants as C
from gstpeaq_tpu.parallel import batch as B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="advanced",
                    choices=["basic", "advanced"])
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/peaq_xprof")
    ap.add_argument("--hlo", action="store_true",
                    help="per-HLO rows with source-line attribution")
    args = ap.parse_args()

    adv = args.mode == "advanced"
    refs, tests = BE.make_pairs(args.mb, args.seconds)
    buckets = B.compute_buckets(refs, tests, adv)
    arrays = [jax.device_put(a)
              for a in B.prepare_chunk(refs, tests, buckets)]
    if adv:
        fn = B._jitted_advanced_batch(92.0, C.DEFAULT_SETTINGS, args.dtype,
                                      buckets[0], buckets[1])
    else:
        fn = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, args.dtype)
    np.asarray(fn(*arrays).odg)   # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(*arrays).odg)
    wall = time.perf_counter() - t0
    print(f"# steady-state: {wall * 1e3:.1f} ms "
          f"({args.mb * args.seconds / wall:.0f} audio-sec/s)", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for _ in range(2):
            np.asarray(fn(*arrays).odg)

    xplanes = sorted(glob.glob(
        os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert xplanes, f"no xplane under {args.logdir}"
    path = xplanes[-1]
    print(f"# xplane: {path}", file=sys.stderr)

    import json

    from xprof.convert import raw_to_tool_data as r2t
    if args.hlo:
        # per-HLO rows with source-line attribution (program_id/source_info)
        data, _ = r2t.xspace_to_tool_data([path], "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        table = json.loads(data)
        ids = [c["id"] for c in table["cols"]]
        rows = []
        for row in table["rows"]:
            rec = {i: (cell or {}).get("v") for i, cell in zip(ids, row["c"])}
            rows.append(rec)
        rows.sort(key=lambda r: -float(r.get("total_self_time") or 0.0))
        total = sum(float(r.get("total_self_time") or 0.0) for r in rows)
        print(f"# hlo_stats: total {total / 1e3:.1f} ms over 2 iters")
        for r in rows[:args.top]:
            t = float(r.get("total_self_time") or 0.0)
            expr = (r.get("hlo_op_expression") or "")
            head = expr.split(" = ")
            shape = head[1].split(" ")[0] if len(head) > 1 else expr[:40]
            src = (r.get("source_info") or "")
            if "repo" in src:  # strip the html wrapper around the path
                src = src[src.rindex("repo") + 4:].rstrip("</div>")
            print(f"{t / 1e3:9.2f} {100 * t / total:5.1f} "
                  f"{(r.get('category') or '')[:14]:14s} "
                  f"{(r.get('bound_by') or ''):8s} {shape[:44]:44s} {src}")
        return
    data, _ = r2t.xspace_to_tool_data([path], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)[0]
    ids = [c["id"] for c in table["cols"]]
    entries = []
    for row in table["rows"]:
        rec = {i: (cell or {}).get("v") for i, cell in zip(ids, row["c"])}
        if rec.get("host_or_device") != "Device":
            continue
        entries.append((rec["operation"], rec["type"],
                        float(rec["total_self_time"]),
                        int(rec["occurrences"]),
                        rec.get("bound_by", "")))
    entries.sort(key=lambda e: -e[2])
    total = sum(e[2] for e in entries)
    print(f"# total device self-time: {total / 1e3:.1f} ms over 2 iters")
    bycat = {}
    for _, cat, us, _, _ in entries:
        bycat[cat] = bycat.get(cat, 0.0) + us
    print("# by category:")
    for cat, us in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"#   {us / 1e3:9.2f} ms {100 * us / total:5.1f}%  {cat}")
    print(f"{'self ms':>9} {'%':>5} {'n':>5} {'bound':>6}  op")
    for name, cat, us, n, bound in entries[:args.top]:
        print(f"{us / 1e3:9.2f} {100 * us / total:5.1f} {n:5d} {bound:>6}"
              f"  [{cat}] {name[:100]}")


if __name__ == "__main__":
    main()
