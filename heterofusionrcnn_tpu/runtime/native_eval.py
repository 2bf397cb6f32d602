"""Native KITTI AP evaluation driver (parity with hf/core/evaluator_utils.
copy_kitti_native_code/run_kitti_native_script :241-332 and the evaluator's
async subprocess launch, evaluator.py:1152-1192)."""

from __future__ import annotations

import multiprocessing
import os
import re
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "kitti_eval",
)


def ensure_built(native_dir: str = _NATIVE_DIR) -> str:
    """Build the evaluator binary if missing; returns its path."""
    binary = os.path.join(native_dir, "kitti_eval")
    if not os.path.exists(binary):
        subprocess.run(["make"], cwd=native_dir, check=True, capture_output=True)
    return binary


def run_kitti_native_eval(
    gt_dir: str,
    det_dir: str,
    out_dir: Optional[str] = None,
    low_iou: bool = False,
) -> dict:
    """Run the native evaluator; parse AP lines.

    low_iou selects the relaxed BEV/3D thresholds (0.5 car, 0.25 ped/cyc) of
    the reference's second evaluator binary, invoked via
    run_kitti_native_script_with_05_iou (evaluator_utils.py:283-332).

    Returns:
      {"<class>_<metric>": (easy, moderate, hard), ...} in percent.
    """
    binary = ensure_built()
    out_dir = out_dir or det_dir
    os.makedirs(out_dir, exist_ok=True)
    cmd = [binary, gt_dir, det_dir, out_dir]
    if low_iou:
        cmd.append("low_iou")
    result = subprocess.run(
        cmd,
        check=True,
        capture_output=True,
        text=True,
    )
    aps = {}
    for line in result.stdout.splitlines():
        m = re.match(
            r"(\w+) (?:AP|AHS): ([\d.]+) ([\d.]+) ([\d.]+)", line
        )
        if m:
            aps[m.group(1)] = tuple(float(m.group(i)) for i in (2, 3, 4))
    return aps


def run_kitti_native_eval_async(gt_dir: str, det_dir: str, out_dir=None):
    """Fire-and-forget child process (the reference's multiprocessing
    pattern for overlap with training)."""
    proc = multiprocessing.Process(
        target=run_kitti_native_eval, args=(gt_dir, det_dir, out_dir)
    )
    proc.start()
    return proc
