#!/usr/bin/env python
"""End-to-end drive of the serving engine on the real chip: run bench.py's
serving phase (ModernBatchServer, B=32 continuous batching, fused
step_many) so kernel/engine changes are verified through the public API,
not just the kernel microbench.

Usage: python scripts/exp_serving_drive.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def main():
    rtt = bench.with_retries(bench.measure_readback_rtt, "rtt")
    if not isinstance(rtt, float):
        rtt = 0.03
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    out = bench.with_retries(lambda: bench.bench_serving(rtt), "serving")
    print(out, flush=True)


if __name__ == "__main__":
    main()
