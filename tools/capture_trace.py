"""Capture a REAL device trace of the fused two-stage inference graph and
print the top ops by device time.

The perf ledger (tools/flops_ledger.py) is built from the XLA cost model and
microbenches; this tool is the ground truth that confirms or refutes it:
one jax.profiler trace of the exact graph bench.py measures, aggregated per
HLO op/fusion from the xplane device plane (parsed with
jax.profiler.ProfileData — no tensorboard needed).

Usage (on the real chip):
    python tools/capture_trace.py [--iters 8] [--top 25] [--stage fused]

Writes the raw trace under outputs/traces/<stage>/ and prints an aggregated
table; paste the table into STATUS.md next to the ledger it validates.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _device_plane_events(profile_data):
    """Yield (plane_name, event) for TPU/device planes only."""
    for plane in profile_data.planes:
        name = plane.name or ""
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "Host" in name:
            continue
        for line in plane.lines:
            for ev in line.events:
                yield name, ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--stage", default="fused",
                    choices=["fused", "rpn_stage", "rcnn_stage"])
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import build_stages

    st = build_stages()
    fn = st[args.stage]
    if args.stage == "fused":
        call = lambda: fn(st["rpn_vars"], st["rcnn_vars"], st["pc"],
                          st["img"], st["p2"])
        sync_key = "final_scores"
    elif args.stage == "rpn_stage":
        call = lambda: fn(st["rpn_vars"], st["pc"], st["img"], st["p2"])
        sync_key = "proposal_scores"
    else:
        rpn_out = st["rpn_stage"](st["rpn_vars"], st["pc"], st["img"], st["p2"])
        call = lambda: fn(st["rcnn_vars"], rpn_out, st["img"], st["p2"])
        sync_key = "final_scores"

    def sync(out):
        # block_until_ready is a no-op on axon — force a host transfer.
        leaf = out[sync_key] if isinstance(out, dict) else out
        return float(np.asarray(leaf).ravel()[0])

    print("warming up (compile)...", flush=True)
    sync(call())
    t0 = time.time()
    sync(call())
    print(f"warm call: {(time.time() - t0) * 1000:.1f} ms "
          "(incl. tunnel sync)", flush=True)

    logdir = args.logdir or os.path.join("outputs", "traces", args.stage)
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        outs = [call() for _ in range(args.iters)]
        sync(outs[-1])

    # Newest xplane file under the logdir.
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb written under {logdir} — the axon "
                         "platform may not export device traces")
    xplane = paths[-1]
    print(f"trace: {xplane}", flush=True)

    pd = jax.profiler.ProfileData.from_file(xplane)
    plane_names = [p.name for p in pd.planes]
    print(f"planes: {plane_names}", flush=True)

    by_op = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for _, ev in _device_plane_events(pd):
        ms = ev.duration_ns / 1e6
        by_op[ev.name] += ms
        counts[ev.name] += 1
        total += ms

    if not by_op:
        raise SystemExit("device planes contained no events — see plane "
                         "list above (host-only trace?)")

    per_iter = total / max(args.iters, 1)
    print(f"\ntotal device time {total:.2f} ms over {args.iters} iters "
          f"(~{per_iter:.2f} ms/iter, may double-count overlapping lines)")
    print(f"{'ms/iter':>9s} {'%':>6s} {'calls':>6s}  op")
    items = sorted(by_op.items(), key=lambda kv: -kv[1])
    for name, ms in items[: args.top]:
        print(f"{ms / args.iters:9.3f} {100 * ms / total:6.2f} "
              f"{counts[name] // max(args.iters, 1):6d}  {name[:110]}")


if __name__ == "__main__":
    main()
