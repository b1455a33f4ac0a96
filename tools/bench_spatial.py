"""Cost/benefit measurement for --spatial-shard-min-res (VERDICT r3 #7).

Compiles the FULL fused train step (none variant, the 12/16 scheduler
weight) at 1024² with ONE image sharded across an 8-device mesh for each
``min_res`` arm, and reports per arm:

  * collective traffic inserted by the SPMD partitioner — op counts and
    bytes moved per step, parsed from the optimized HLO (backend-
    independent: halo-exchange decisions are made by the partitioner);
  * peak activation memory per device from the compiled memory analysis
    (the quantity spatial sharding exists to reduce);
  * wall time per step on the virtual mesh (tagged: an 8-virtual-device
    CPU mesh shares one physical core here, so wall time measures
    partitioning overhead, NOT TPU speedup — collective bytes vs HBM
    traffic is the transferable number).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_spatial.py --res 1024 --arms none,256,128,64

Writes docs/spatial_cost.json; the when-to-use guidance derived from it
lives in docs/train-help.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

_COLLECTIVES = ("collective-permute", "all-gather", "all-to-all",
                "all-reduce", "reduce-scatter")


def parse_collectives(hlo: str):
    """Count collective ops and bytes from optimized-HLO text.

    Matches lines like ``%x = f32[1,64,128,1024]{...} collective-permute(``
    and sums the output-shape bytes per op kind (for halo exchange the
    output is the moved halo, so output bytes == traffic)."""
    out = {}
    shape_re = re.compile(
        r"(\w+)\[([\d,]*)\][^=]*\s(" + "|".join(_COLLECTIVES) + r")\(")
    for m in shape_re.finditer(hlo):
        dtype, dims, kind = m.group(1), m.group(2), m.group(3)
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        e = out.setdefault(kind, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += n * _DTYPE_BYTES[dtype]
    return out


def build_step(res: int, min_res, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.parallel import mesh as mesh_lib
    from gagan_tpu.parallel import spatial
    from gagan_tpu.train import augment as aug_lib
    from gagan_tpu.train import gan_loss, train_step as ts

    g_cfg = sg2.GeneratorConfig(
        img_resolution=res,
        synthesis=sg2.SynthesisConfig(num_fp16_res=4, conv_clamp=256,
                                      packed_last_block=True))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=res, channel_max=512, mbstd_group_size=1,
        num_fp16_res=4, conv_clamp=256)
    cfg = ts.TrainConfig(
        batch_size=1, simultaneous_main=True,
        loss=gan_loss.GANLossConfig(r1_gamma=2.0))
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    augment_fn = aug_lib.make_augment_fn(aug_lib.make_config("bgc"))

    kwargs = {}
    if min_res is not None:
        kwargs["extra_hooks"] = spatial.spatial_sharding_hooks(
            g_cfg.synthesis, mesh, min_res=min_res)
        kwargs["d_constraint"] = spatial.d_spatial_constraint(mesh)
    step = jax.jit(ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx,
                                      augment_fn=augment_fn, **kwargs))

    state = mesh_lib.place_state(mesh, state)
    real = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (1, 3, res, res)),
        NamedSharding(mesh, P(None, None, "data", None)) if min_res
        else mesh_lib.replicated(mesh))
    z = jax.device_put(jax.random.normal(jax.random.PRNGKey(3), (1, 512)),
                       mesh_lib.replicated(mesh))
    return step, (state, real, None, z, None, jax.random.PRNGKey(4))


def run_arm(name: str, res: int, mesh, time_steps: int):
    min_res = None if name == "none" else int(name)
    step, args = build_step(res, min_res, mesh)
    t0 = time.time()
    lowered = step.lower(*args)
    compiled = lowered.compile()
    compile_s = time.time() - t0

    hlo = compiled.as_text()
    colls = parse_collectives(hlo)
    mem = None
    try:
        m = compiled.memory_analysis()
        mem = {"peak_bytes": int(getattr(m, "peak_memory_in_bytes", 0) or 0),
               "temp_bytes": int(getattr(m, "temp_size_in_bytes", 0) or 0),
               "output_bytes":
                   int(getattr(m, "output_size_in_bytes", 0) or 0)}
    except Exception:
        pass

    wall = None
    if time_steps > 0:
        state = args[0]
        out_state, _ = compiled(*args)         # warmup
        jax.block_until_ready(out_state.pl_mean)
        t0 = time.time()
        cur = args
        for _ in range(time_steps):
            out_state, _ = compiled(*cur)
            cur = (out_state,) + cur[1:]
        jax.block_until_ready(out_state.pl_mean)
        wall = (time.time() - t0) / time_steps

    total_bytes = sum(v["bytes"] for v in colls.values())
    rec = {"arm": name, "min_res": min_res,
           "collectives": colls,
           "collective_bytes_per_step": total_bytes,
           "memory": mem, "compile_s": round(compile_s, 1),
           "virtual_mesh_step_s": (round(wall, 3) if wall else None)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--arms", default="none,256,128,64")
    ap.add_argument("--time-steps", type=int, default=2,
                    help="timed steps on the virtual mesh (0 = analysis "
                         "only)")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # Virtual CPU mesh (the axon sitecustomize overrides JAX_PLATFORMS, so
    # force it in-process before backend init).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    globals()["jax"] = jax

    from gagan_tpu.parallel import mesh as mesh_lib

    # NO persistent cache on CPU: XLA:CPU cache entries embed the BUILD
    # host's CPU features and this VM migrates between hosts — loading a
    # stale entry warns/SIGILLs (cpu_aot_loader "machine type doesn't
    # match").  Use a per-boot tmp dir so only same-boot reruns hit.
    if jax.default_backend() == "cpu":
        import uuid

        boot = "unknown"
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                boot = f.read().strip()
        except OSError:
            boot = uuid.getnode()
        jax.config.update("jax_compilation_cache_dir",
                          f"/tmp/jax_cache_spatial_{boot}")
    n = len(jax.devices())
    mesh = mesh_lib.create_mesh(n)
    print(f"devices={n} backend={jax.default_backend()} res={args.res}",
          flush=True)

    results = [run_arm(a.strip(), args.res, mesh, args.time_steps)
               for a in args.arms.split(",")]
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"res": args.res, "n_devices": n,
                       "backend": jax.default_backend(),
                       "note": "wall times are a 1-core virtual mesh — use "
                               "collective bytes + peak memory for TPU "
                               "guidance", "arms": results}, f, indent=1)


if __name__ == "__main__":
    main()
