#!/usr/bin/env python3
"""Headline benchmark: prints ONE JSON line with scans/sec/chip.

Run on the target TPU; falls back to whatever backend JAX selects.
Baseline: the 1000 scans/sec/chip north-star target (BASELINE.json) --
the reference publishes no throughput numbers (SURVEY.md section 6).
"""

import json
import sys


def main() -> int:
    from groundgrid_tpu.runtime.bench import run_benchmark

    result = run_benchmark(n_scans=int(sys.argv[1]) if len(sys.argv) > 1 else 64)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
