"""Capture a profiler trace of the train step and print top ops by time.

python tools/trace_step.py [--n 40960] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--out", default="/tmp/prof")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step
    from __graft_entry__ import _example_batch

    n, B = args.n, args.scenes
    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=n, num_scenes=B,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        rpe_precision="default", qk_precision="default")
    model = Stratified(cfg)
    b = _example_batch(n, B, 6, seed=0)
    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels}
    schedule = multi_step(0.006, [60, 80], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    step = jax.jit(make_train_step(ignore_label=255, num_classes=13),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    state, stats = step(state, batch, rng)
    jax.block_until_ready(stats["loss"])

    jax.profiler.start_trace(args.out)
    for _ in range(3):
        state, stats = step(state, batch, rng)
    jax.block_until_ready(stats["loss"])
    jax.profiler.stop_trace()

    # parse newest trace
    files = sorted(glob.glob(
        args.out + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # find TPU device pids (ignore host threads)
    dev_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                dev_pids.add(ev["pid"])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            name = ev.get("name", "?")
            tot[name] += ev.get("dur", 0.0)
            cnt[name] += 1
    grand = sum(tot.values())
    print(f"trace: {files[-1]}")
    print(f"device pids: {sorted(dev_pids)}, total device-op us: "
          f"{grand:,.0f} (3 steps)")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{us / 3 / 1e3:9.2f} ms  x{cnt[name] // 3:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
