"""Capture a REAL device trace of the fused two-stage inference graph and
print the top ops by device time.

The perf ledger (tools/flops_ledger.py) is built from the XLA cost model and
microbenches; this tool is the ground truth that confirms or refutes it:
one jax.profiler trace of the exact graph bench.py measures, aggregated per
HLO op from the xplane 'XLA Ops' device line (parsed with
jax.profiler.ProfileData — no tensorboard needed).

Only the 'XLA Ops' line is a non-overlapping op timeline; 'XLA Modules'
carries one whole-graph event per call and 'Async XLA Ops' carries DMA
events whose durations span their wait windows — summing across lines
double-counts (the first version of this tool did, burying the signal
under copy-start events).

Usage (on the real chip):
    python tools/capture_trace.py [--iters 8] [--top 25] [--stage fused]
    python tools/capture_trace.py --xplane <file.xplane.pb>   # re-aggregate

Writes the raw trace under outputs/traces/<stage>/ and prints (a) per-op
aggregation (instance names collapsed to their HLO op) and (b) a
shape-family rollup attributing time to pipeline stages; paste both into
STATUS.md next to the ledger they validate.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Ops reported individually even inside the family rollup.
_MOVE_OPS = {
    "copy", "reshape", "dynamic-update-slice", "dynamic-slice", "sort",
    "while", "knn_pallas", "farthest_point_sample_pallas",
    "oriented_nms_pallas",
}


def _xla_ops_events(profile_data):
    for plane in profile_data.planes:
        if "TPU" not in (plane.name or ""):
            continue
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    yield ev


def _op_key(name):
    m = re.match(r"%([A-Za-z0-9_\-]+?)(?:\.\d+)? =", name)
    return m.group(1) if m else name[:40]


def _shape_family(name):
    """Coarse attribution of an HLO result shape to a pipeline stage."""
    m = re.search(r"= [a-z0-9]+\[([0-9,]*)\]", name)
    if not m:
        return "other"
    dims = m.group(1).split(",")
    if any(d in ("1200", "600", "300", "360", "180") for d in dims):
        return "image"
    if "524288" in dims:
        return "pts16k-nbr"  # (B*16384*k) flattened neighbor gathers
    if "16384" in dims:
        return "pts16k"
    if "4096" in dims:
        return "pts4k"
    if dims[0] == "400" or "204800" in dims:
        return "roi"
    return "other"


def aggregate(xplane, iters, top):
    import jax

    pd = jax.profiler.ProfileData.from_file(xplane)
    evs = list(_xla_ops_events(pd))
    if not evs:
        raise SystemExit("no 'XLA Ops' line on a TPU plane — planes: "
                         f"{[p.name for p in pd.planes]}")

    by_op = defaultdict(lambda: [0.0, 0])
    by_fam = defaultdict(lambda: defaultdict(float))
    total = 0.0
    for ev in evs:
        ms = ev.duration_ns / 1e6
        key = _op_key(ev.name)
        by_op[key][0] += ms
        by_op[key][1] += 1
        fam = _shape_family(ev.name)
        by_fam[fam][key if key in _MOVE_OPS else "compute"] += ms
        total += ms

    print(f"\ntotal 'XLA Ops' device time {total:.2f} ms over {iters} iters "
          f"(~{total / iters:.2f} ms/iter)")
    print(f"{'ms/iter':>9s} {'%':>6s} {'calls':>6s}  op")
    for name, (ms, c) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{ms / iters:9.3f} {100 * ms / total:6.2f} "
              f"{c // max(iters, 1):6d}  {name[:90]}")

    print("\nshape-family rollup (ms/iter):")
    fams = sorted(by_fam.items(), key=lambda kv: -sum(kv[1].values()))
    for fam, ops in fams:
        ftot = sum(ops.values())
        detail = ", ".join(
            f"{k} {v / iters:.2f}"
            for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:4]
        )
        print(f"{ftot / iters:9.3f}  {fam:12s} ({detail})")

    # Individual data-movement instances: the per-op table above collapses
    # all copies/reshapes into one line, which is how the round-5 image-copy
    # tail hid. Instance names embed the HLO result shape — enough to find
    # the producing layer.
    by_inst = defaultdict(lambda: [0.0, 0])
    for ev in evs:
        if _op_key(ev.name) in _MOVE_OPS:
            inst = ev.name.split(" = ")[0] if " = " in ev.name else ev.name
            shape = ev.name.split(" = ")[1][:60] if " = " in ev.name else ""
            by_inst[f"{inst} = {shape}"][0] += ev.duration_ns / 1e6
            by_inst[f"{inst} = {shape}"][1] += 1
    print("\ntop data-movement instances (ms/iter):")
    for name, (ms, c) in sorted(by_inst.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"{ms / iters:9.3f} {c // max(iters, 1):6d}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--stage", default="fused",
                    choices=["fused", "rpn_stage", "rcnn_stage"])
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--xplane", default=None,
                    help="re-aggregate an existing .xplane.pb (no capture; "
                         "works off-TPU)")
    args = ap.parse_args()

    if args.xplane:
        aggregate(args.xplane, args.iters, args.top)
        return

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
    aggregate(xplane, args.iters, args.top)


if __name__ == "__main__":
    main()
