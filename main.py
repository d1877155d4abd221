"""Training CLI for the nf_tpu normalizing-flows framework.

Usage (parity with /root/reference/main.py:287-355 and its Hydra tree):

    python main.py network=realnvp run.distrib=moons train.steps=1000

Any config field can be overridden with dotted key=value tokens; see
nf_tpu/config.py for the tree.  The run directory is
``logs/<network>_<distrib>_<timestamp>``.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

from nf_tpu.parallel.distributed import init_distributed
from nf_tpu.config import parse_cli, to_dict
from nf_tpu.data import FlowDataLoader
from nf_tpu.models import build_model
from nf_tpu.parallel import make_mesh
from nf_tpu.train import Trainer, load_checkpoint, save_checkpoint
from nf_tpu.train.metrics import MetricWriter
from nf_tpu.train.report import report
from nf_tpu.utils import Logging

logger = Logging(__file__)


def main(argv=None):
    cfg = parse_cli(sys.argv[1:] if argv is None else argv)
    if cfg.run.platform:
        jax.config.update("jax_platforms", cfg.run.platform)
    init_distributed()  # no-op on a single host
    print("***** parameters ****")
    print(json.dumps(to_dict(cfg), indent=2))
    print("*********************\n")

    if cfg.run.debug:
        jax.config.update("jax_debug_nans", True)

    # persistent XLA compilation cache: first-step compiles of deep chains
    # are expensive (minutes via the remote-tunnel backend); cache them.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # preemption recovery: run.resume=auto re-enters the latest matching
    # run dir and picks up from its latest.npz (SURVEY.md §5.3)
    run_dir = None
    resume_ckpt = None
    if cfg.run.resume:
        if cfg.run.resume == "auto":
            import glob
            cands = glob.glob(os.path.join(
                "logs", f"{cfg.network.name}_{cfg.run.distrib}_*",
                "latest.npz"))
            if cands:
                resume_ckpt = max(cands, key=os.path.getmtime)
                run_dir = os.path.dirname(resume_ckpt)
            else:
                logger.warn("run.resume=auto found no prior checkpoint; "
                            "starting fresh")
        else:
            run_dir = cfg.run.resume
            p = os.path.join(run_dir, "latest.npz")
            if os.path.exists(p):
                resume_ckpt = p
            else:
                raise FileNotFoundError(
                    f"run.resume={run_dir!r} has no latest.npz")
    if run_dir is None:
        run_dir = os.path.join(
            "logs", f"{cfg.network.name}_{cfg.run.distrib}_"
            + time.strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)

    dataset = FlowDataLoader(
        cfg.run.distrib,
        batch_size=cfg.train.samples,
        total_steps=cfg.train.steps,
        shuffle=True,
        seed=cfg.run.seed,
        data_root=cfg.run.data_root,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
        dequantize=cfg.run.dequantize,
    )

    model = build_model(cfg.network.name, dataset.dims,
                        datatype=dataset.dtype, cfg=cfg.network)
    if cfg.run.debug:
        # wrap every layer with in-graph NaN/Inf probes (SURVEY.md §5.2)
        from nf_tpu.utils.debug import check_chain
        model.bijector = check_chain(model.bijector)
    mesh = make_mesh() if jax.device_count() > 1 else None
    trainer = Trainer(model, cfg.optimizer, mesh=mesh, seed=cfg.run.seed)

    key = jax.random.PRNGKey(cfg.run.seed)
    ts = trainer.init_state(key, dataset.next_batch())

    start_step = 0
    ckpt = cfg.run.ckpt_path or resume_ckpt
    if ckpt is not None:
        ts, start_step = load_checkpoint(ckpt, ts)
        logger.info(f"resumed from {ckpt} at step {start_step}")

    writer = MetricWriter(run_dir)
    display = cfg.run.display
    step = start_step
    logger.info(f"training {cfg.network.name} on {cfg.run.distrib} "
                f"({jax.device_count()} devices, run dir {run_dir})")

    chunk = max(1, int(cfg.train.chunk))
    data_iter = iter(dataset)
    done = False
    while not done and step < cfg.train.steps:
        t0 = time.perf_counter()
        if chunk == 1:
            try:
                data = next(data_iter)
            except StopIteration:
                break
            ts, loss = trainer.train_step(ts, data)
            step += 1
        else:
            stack = []
            for _ in range(chunk):
                try:
                    stack.append(next(data_iter))
                except StopIteration:
                    done = True
                    break
            if not stack:
                break
            data = stack[-1]
            ts, losses = trainer.train_steps(ts, np.stack(stack))
            loss = losses[-1]
            step += len(stack)

        if step <= start_step + chunk or step % (display * 10) < chunk:
            loss_val = float(loss)  # device sync only on log ticks
            dt = (time.perf_counter() - t0) / chunk
            logger.info(f"[{step}/{cfg.train.steps}] loss={loss_val:.5f} "
                        f"[{dt:.3f} s/it]")

        if step <= start_step + chunk or step % (display * 100) < chunk:
            writer.scalar(f"{dataset.dtype}/train/loss", float(loss), step)
            if dataset.dtype == "image":
                # bits/dim = NLL(nats) / (D ln 2) — the image-flow headline
                # metric (nats-only in the reference, main.py:85)
                d = int(np.prod(dataset.dims))
                bpd = float(loss) / (d * np.log(2.0))
                writer.scalar("image/train/bits_per_dim", bpd, step)
                if cfg.run.dequantize:
                    # discrete 8-bit bits/dim: + log2(256) for the
                    # dequantization change of measure
                    writer.scalar("image/train/bits_per_dim_discrete",
                                  bpd + 8.0, step)
            save_files = (cfg.run.save_all_reports
                          or step % (display * 1000) < chunk
                          or step <= start_step + chunk)
            report(trainer, ts, writer, data, step, run_dir,
                   save_files=save_files, name=cfg.network.name)
            writer.flush()

        if step <= start_step + chunk or step % (display * 1000) < chunk:
            save_checkpoint(os.path.join(run_dir, "latest.npz"), ts, step)

    save_checkpoint(os.path.join(run_dir, "latest.npz"), ts, step)
    writer.close()
    logger.info("done")
    return run_dir


if __name__ == "__main__":
    main()
