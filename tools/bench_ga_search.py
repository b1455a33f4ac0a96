"""GA direction-search throughput on the current backend (BASELINE config 5:
"GA StyleSpace direction search — vmapped population over TPU mesh").

Runs `ga.search.evolve_directions` at a real population on a config-f-shaped
256² generator with the reference's fitness tower shape (Swin-T features,
GA/feature_extraction.py) and reports candidates/sec for both evaluation
modes:

  * scan     — one candidate per generator pass (the reference's per-item
               loop semantics, lax.map);
  * batched  — the whole population rides one generator batch via
               per-sample style hooks (the TPU-shaped form).

Usage:
    python tools/bench_ga_search.py [--population 32] [--res 256]
                                    [--generations 4] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--population", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--generations", type=int, default=4)
    ap.add_argument("--batch-per-candidate", type=int, default=4)
    ap.add_argument("--modes", default="scan,batched")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_gagan_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gagan_tpu.ga import search as ga_search
    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.models import swin

    g_cfg = sg2.GeneratorConfig(
        img_resolution=args.res,
        mapping=sg2.MappingConfig(num_layers=8),
        synthesis=sg2.SynthesisConfig(channel_base=32768, channel_max=512,
                                      num_fp16_res=4, conv_clamp=256))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)

    # Reference-shaped fitness: Swin-T pooled features (random tower — the
    # fitness VALUES need real weights, the COST is identical), scored as
    # cosine similarity to a fixed target descriptor.
    extract = swin.make_feature_extractor(key=jax.random.PRNGKey(1))
    target = jax.random.normal(jax.random.PRNGKey(2), (768,))
    target = target / jnp.linalg.norm(target)

    def fitness_fn(img_u8):
        feats = extract(img_u8.astype(jnp.float32) / 127.5 - 1.0)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                         + 1e-8)
        return jnp.mean(feats @ target)

    results = {"population": args.population, "res": args.res,
               "batch_per_candidate": args.batch_per_candidate,
               "backend": jax.default_backend(),
               "generations": args.generations}
    for mode in args.modes.split(","):
        cfg = ga_search.GASearchConfig(
            population=args.population, generations=args.generations,
            batch_per_candidate=args.batch_per_candidate, eval_mode=mode)
        # Warm-up run compiles eval + next_generation.
        t_compile = time.perf_counter()
        ga_search.evolve_directions(
            jax.random.PRNGKey(3), g_cfg, g_params, fitness_fn,
            cfg=ga_search.GASearchConfig(
                population=args.population, generations=1,
                batch_per_candidate=args.batch_per_candidate,
                eval_mode=mode))
        compile_s = time.perf_counter() - t_compile

        t0 = time.perf_counter()
        best, history = ga_search.evolve_directions(
            jax.random.PRNGKey(3), g_cfg, g_params, fitness_fn, cfg=cfg)
        dt = time.perf_counter() - t0
        # generations + 1 final scoring pass, population candidates each.
        n_cands = args.population * (args.generations + 1)
        cands_per_sec = n_cands / dt
        results[f"{mode}_candidates_per_sec"] = round(cands_per_sec, 2)
        results[f"{mode}_wall_s"] = round(dt, 2)
        results[f"{mode}_compile_s"] = round(compile_s, 1)
        print(f"[{mode}] {cands_per_sec:.1f} candidates/sec "
              f"({dt:.2f}s for {n_cands}; compile+warm {compile_s:.1f}s; "
              f"best fitness {float(history[-1]):.4f})", flush=True)

    if ("scan_candidates_per_sec" in results
            and "batched_candidates_per_sec" in results):
        speedup = (results["batched_candidates_per_sec"]
                   / results["scan_candidates_per_sec"])
        results["batched_vs_scan_speedup"] = round(speedup, 2)
        print(f"batched vs scan: {speedup:.2f}x", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
