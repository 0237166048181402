"""Capture a jax.profiler trace of the production windowed driver and print
the top device ops by total self-time — the definitive attribution for the
per-iter cost (ablation stage toggles turned out superadditive on v5e:
gather alone ~3.6 ms, deposit alone ~1.6 ms, both present ~14.6 ms/iter).
"""
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from path_tracer_tpu.engine.wq import _render_wqw_jit
from path_tracer_tpu.scene.presets import build_final_scene

W, H, DEPTH = 800, 600, 50
SPP = int(os.environ.get("SPP", "16"))
C = int(os.environ.get("CHUNK", "8"))
WIN = int(os.environ.get("WIN", "16"))
OUT = "/tmp/pt_trace"


def main():
    scene, cam = build_final_scene(W / H)

    def run():
        img, segs, iters, _ls = _render_wqw_jit(
            scene, cam, W, H, SPP, DEPTH, False, 1e-3, 32, False,
            WIN, C, jnp.uint32(0))
        jax.block_until_ready(img)
        return int(iters)

    iters = run()   # compile
    with jax.profiler.trace(OUT):
        iters = run()
    print(f"iters={iters}", flush=True)

    files = sorted(glob.glob(OUT + "/**/*.trace.json.gz", recursive=True),
                   key=os.path.getmtime)
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep device-lane events only (TensorCore pids have 'args' with
        # device annotations; filter by name heuristics instead: skip
        # python/host threads)
        name = ev.get("name", "")
        tot[name] += ev["dur"]
        cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for name, us in top:
        print(f"{us / 1e3:9.2f} ms  x{cnt[name]:<6} {name[:110]}",
              flush=True)


if __name__ == "__main__":
    main()
