#!/usr/bin/env python
"""Long-sweep driver for the cross-engine differential fuzz harness.

Samples fresh (config, data) seed pairs, runs staged-vs-fused on each, and
appends one JSONL record per case (seeds, ok, descriptors, first mismatches)
so every draw is reproducible. Exit code 1 if any divergence was found —
pin the failing (cfg_seed, data_seed) into tests/test_differential_fuzz.py's
CI_CORPUS alongside the fix.

Run on CPU (engines are backend-agnostic; CPU leaves the TPU free):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        VDETLIB_TPU_FLOW_UNROLL=4 \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
        python scripts/fuzz_differential.py --cases 50 --seed0 1000 \
        --out /tmp/fuzz_corpus.jsonl

Config draws dominate cost (each distinct config compiles both engines), so
the sweep reuses each sampled config across --data_per_cfg data draws.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("VDETLIB_TPU_FLOW_UNROLL", "4")

from vdetlib_tpu.testing import differential as D


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=30, help="total cases to run")
    ap.add_argument("--data_per_cfg", type=int, default=3)
    ap.add_argument("--seed0", type=int, default=1000, help="first seed")
    ap.add_argument("--out", default="/tmp/fuzz_corpus.jsonl")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    models = D.init_models()
    n_bad = 0
    reports = []
    i = 0
    with open(args.out, "a") as f:
        while i < args.cases:
            cfg_seed = args.seed0 + len(reports) // max(args.data_per_cfg, 1)
            cd = D.sample_config(cfg_seed)
            for j in range(args.data_per_cfg):
                if i >= args.cases:
                    break
                data_seed = args.seed0 + i
                dd = D.sample_data(data_seed)
                t0 = time.time()
                rep = D.run_case(models, cd, dd)
                rep["cfg_seed"], rep["data_seed"] = cfg_seed, data_seed
                rep["wall_s"] = round(time.time() - t0, 2)
                reports.append(rep)
                f.write(json.dumps(rep) + "\n")
                f.flush()
                status = "ok" if rep["ok"] else "DIVERGED"
                print(
                    f"[{i + 1}/{args.cases}] cfg={cfg_seed} data={data_seed} "
                    f"{status} {rep['wall_s']}s {rep['descriptors']}",
                    flush=True,
                )
                if not rep["ok"]:
                    n_bad += 1
                    print("  mismatches:", rep["mismatches"][:5], flush=True)
                i += 1

    cov = D.corpus_coverage(reports)
    print("coverage:", json.dumps(cov))
    print(f"{len(reports)} cases, {n_bad} divergences -> {args.out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
