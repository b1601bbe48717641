"""Bench-shape throughput sweep over the train march budget (n_compact,
n_coarse) for the hash headline.

The 256^2 quality gates (quality_r4_log ncompact_gate events) decide which
budgets hold val PSNR; this probe measures what each budget is worth at the
EXACT bench shape (4096 rays, L16F2 brick3, 16-step scan block, occupancy
ball) so the default/headline change is backed by the same measurement the
headline itself uses (bench.measure_ngp_train).

Reference analog: the CUDA marcher's per-ray sample budget is dynamic
(jnerf-myc/.../density_grid_sampler.py:262-267 adapts rays so mean samples
fits 2^18); n_compact is our static-K equivalent.

Usage: python scripts/probe_r4_ncompact.py [K,C ...]   (default sweep)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    combos = [(32, 128), (24, 128), (20, 128), (20, 64), (16, 128)]
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    for n_compact, n_coarse in combos:
        res = bench.measure_ngp_train("brick3", n_compact=n_compact,
                                      n_coarse=n_coarse)
        print(json.dumps({
            "event": "ncompact_bench_probe", "n_compact": n_compact,
            "n_coarse": n_coarse,
            "train_rays_per_s": round(res["train_rays_per_s"], 1),
            "iters_per_s": round(res["iters_per_s"], 2),
            "rays_per_batch": res["rays_per_batch"]}), flush=True)


if __name__ == "__main__":
    main()
