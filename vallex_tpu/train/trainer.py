"""Training driver: argparse CLI over the sharded train step.

The end-to-end loop the reference's vestigial training modules imply
(icefall-style: model args from models/__init__.py:18-95, data args from
data/datamodule.py:81-220, 2-stage AR/NAR selection models/vallex.py:266-292,
ScaledAdam/Eden modules/optim.py) but never wire up. Here it is one
functional program:

  python -m vallex_tpu.train.trainer --data-dir data --exp-dir exp \
      --num-epochs 10 --train-stage 1 --dp 4 --tp 2

- mesh: ("dp", "tp") with megatron-style TP param specs (parallel/mesh.py);
  batch enters sharded over "dp".
- optimizer: AdamW or ScaledAdam under an Eden schedule; 2-stage training
  via optax.multi_transform over stage_param_labels (optax.masked alone
  leaks raw grads through unmasked leaves).
- checkpoint/resume: orbax full TrainState (params + optimizer state +
  step) per epoch and every --save-every steps; `--resume` picks up the
  newest checkpoint in --exp-dir.
- observability: loss/grad-norm lines, grad-norm quartiles + dominant
  parameter (scaled_adam.grad_diagnostics) every --diag-interval steps,
  optional per-utterance heatmaps (utils/visualizer.py) on validation.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Optional

import numpy as np

log = logging.getLogger("vallex_tpu.train")


def get_parser() -> argparse.ArgumentParser:
    from ..data.datamodule import TtsDataModule
    from ..models import add_model_arguments

    parser = argparse.ArgumentParser(
        description="Train VALL-E X (TPU, JAX) — AR/NAR stages"
    )
    add_model_arguments(parser)
    TtsDataModule.add_arguments(parser)
    g = parser.add_argument_group("training")
    g.add_argument("--exp-dir", type=str, default="exp")
    g.add_argument("--num-epochs", type=int, default=20)
    g.add_argument(
        "--train-stage", type=int, default=0, choices=(0, 1, 2),
        help="0 = joint, 1 = AR params only, 2 = NAR params only "
             "(reference models/vallex.py:266-292)",
    )
    g.add_argument(
        "--optimizer", type=str, default="scaled_adam",
        choices=("scaled_adam", "adamw", "eve"),
    )
    g.add_argument(
        "--flash-attn", type=str, default="auto",
        choices=("auto", "on", "off"),
        help="route the training forwards through the Pallas flash-"
             "attention kernels (auto = on for TPU backends, off on CPU)",
    )
    g.add_argument("--base-lr", type=float, default=0.05)
    g.add_argument("--warmup-steps", type=int, default=500)
    g.add_argument("--weight-decay", type=float, default=1e-4)
    g.add_argument("--dtype", type=str, default="bfloat16")
    g.add_argument("--dp", type=int, default=0, help="0 = auto")
    g.add_argument("--tp", type=int, default=1)
    g.add_argument("--save-every", type=int, default=2000)
    g.add_argument("--log-interval", type=int, default=50)
    g.add_argument("--diag-interval", type=int, default=500)
    g.add_argument("--valid-interval", type=int, default=2000)
    g.add_argument("--resume", action="store_true")
    g.add_argument(
        "--init-checkpoint", type=str, default=None,
        help="warm-start params from a .npz/.pt checkpoint",
    )
    g.add_argument(
        "--visualize-dir", type=str, default=None,
        help="dump validation heatmap PNGs here",
    )
    g.add_argument(
        "--init-distributed", action="store_true",
        help="call jax.distributed.initialize() (multi-host pods)",
    )
    return parser


def _make_optimizer(args, params):
    import optax

    from .scaled_adam import eden_schedule, eve, scaled_adam
    from .step import make_optimizer as make_adamw

    sched = eden_schedule(args.base_lr, warmup=float(args.warmup_steps))
    if args.optimizer == "scaled_adam":
        base = scaled_adam(sched)
    elif args.optimizer == "eve":
        base = eve(sched, weight_decay=args.weight_decay)
    else:
        base = make_adamw(
            args.base_lr, args.weight_decay,
            warmup=float(args.warmup_steps),
        )

    if args.train_stage in (1, 2):
        from ..models.vallex import stage_param_labels

        labels = stage_param_labels(params, args.train_stage)
        labels = _bool_to_str(labels)
        return optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels
        )
    return base


def _bool_to_str(tree):
    import jax

    return jax.tree.map(lambda b: "train" if b else "freeze", tree)


def _latest_checkpoint(exp_dir: str) -> Optional[str]:
    if not os.path.isdir(exp_dir):
        return None
    cands = [
        os.path.join(exp_dir, d)
        for d in os.listdir(exp_dir)
        if d.startswith("state-")
        and os.path.isdir(os.path.join(exp_dir, d))
    ]
    return max(cands, key=os.path.getmtime) if cands else None


def run(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..data.datamodule import TtsDataModule
    from ..models import get_model, model_config_from_args
    from ..parallel.mesh import make_mesh, shard_params, shard_tree
    from ..utils.checkpoint import load_orbax, save_orbax
    from .loss import total_loss
    from .scaled_adam import format_grad_diagnostics, grad_diagnostics
    from .step import TrainState, init_train_state, train_step

    if args.init_distributed:
        jax.distributed.initialize()

    cfg = model_config_from_args(args)
    rng = jax.random.PRNGKey(args.seed)
    init_fn, _module = get_model(args.model_name, cfg)
    init_params = init_fn(rng, cfg)
    if args.init_checkpoint:
        from ..utils.checkpoint import (
            convert_torch_state_dict, load_native,
        )

        if args.init_checkpoint.endswith(".npz"):
            init_params = load_native(args.init_checkpoint)
        else:  # torch vallex-checkpoint.pt {"model": state_dict}
            import torch

            sd = torch.load(
                args.init_checkpoint, map_location="cpu",
                weights_only=True,
            )["model"]
            init_params = convert_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()}, cfg
            )

    # "auto" defers to total_loss's measured per-bucket crossover (flash
    # wins once the quadratic score tensor dominates, T ≥ ~800 frames)
    use_flash = {
        "on": True,
        "off": False,
        "auto": "auto" if jax.default_backend() != "cpu" else False,
    }[args.flash_attn]
    if getattr(args, "pack", 1) > 1 and cfg.prefix_mode not in (0, 1):
        raise SystemExit(
            "--pack requires prefix_mode 0 or 1 (modes 2/4 prepend prompt "
            "buffers and train unpacked)"
        )
    dp = args.dp or max(1, jax.device_count() // args.tp)
    mesh = make_mesh(
        dp=dp, tp=args.tp, devices=jax.devices()[: dp * args.tp]
    )
    optimizer = _make_optimizer(args, init_params)

    with mesh:
        params = shard_params(init_params, mesh)
        state = shard_tree(init_train_state(params, optimizer), mesh)

    start_epoch, global_step = 0, 0
    if args.resume:
        ck = _latest_checkpoint(args.exp_dir)
        if ck:
            with mesh:
                state = shard_tree(load_orbax(ck, state), mesh)
            meta = json.load(open(ck + ".json"))
            start_epoch, global_step = meta["epoch"], meta["step"]
            log.info("resumed %s (epoch %d step %d)",
                     ck, start_epoch, global_step)

    datamodule = TtsDataModule(args)
    os.makedirs(args.exp_dir, exist_ok=True)

    def save(state: TrainState, epoch: int):
        path = os.path.join(args.exp_dir, f"state-{global_step:08d}")
        save_orbax(path, state)
        json.dump(
            {"epoch": epoch, "step": global_step, "args": vars(args)},
            open(path + ".json", "w"), default=str,
        )
        log.info("saved %s", path)

    eval_loss = jax.jit(
        lambda p, b, r: total_loss(
            p, cfg, b, r, jnp.dtype(args.dtype), cfg.prefix_mode, use_flash
        )[0],
        static_argnums=(),
    )
    # jitted once: the un-jitted jax.grad would re-execute the whole
    # backward op-by-op on the host at every diag interval
    diag_grads = jax.jit(
        lambda p, b, r: jax.grad(
            lambda q: total_loss(
                q, cfg, b, r, jnp.dtype(args.dtype), cfg.prefix_mode,
                use_flash,
            )[0]
        )(p)
    )

    last_metrics = {}
    t0 = time.time()
    for epoch in range(start_epoch, args.num_epochs):
        for batch in datamodule.train_dataloaders(epoch):
            batch.pop("utt_ids", None)
            rng, step_rng = jax.random.split(rng)
            # --pack N batches arrive sequence-packed (p_* per-token
            # arrays); a residual tiny batch may fall back to the plain
            # collate, so dispatch per batch by shape
            packed = "p_text_ids" in batch
            with mesh:
                state, metrics = train_step(
                    state, batch, step_rng,
                    cfg=cfg, optimizer=optimizer, dtype=args.dtype,
                    prefix_mode=cfg.prefix_mode, use_flash=use_flash,
                    packed=packed,
                )
            global_step += 1
            if global_step % args.log_interval == 0:
                last_metrics = {
                    k: float(v) for k, v in metrics.items()
                }
                rate = args.log_interval / (time.time() - t0)
                t0 = time.time()
                log.info(
                    "epoch %d step %d %s (%.2f it/s)",
                    epoch, global_step,
                    " ".join(f"{k}={v:.4f}" for k, v in
                             last_metrics.items()),
                    rate,
                )
            if global_step % args.diag_interval == 0 and not packed:
                # diag_grads is built over the unpacked objective; packed
                # steps simply skip the diagnostic (the next unpacked
                # residual batch provides one)
                with mesh:
                    grads = diag_grads(state.params, batch, step_rng)
                log.info("%s", format_grad_diagnostics(
                    grad_diagnostics(grads)))
            if global_step % args.save_every == 0:
                save(state, epoch)
            if global_step % args.valid_interval == 0:
                losses = []
                for i, vb in enumerate(datamodule.valid_dataloaders()):
                    utt_ids = vb.pop("utt_ids", None)
                    if i >= 20:
                        break
                    with mesh:
                        losses.append(float(eval_loss(
                            state.params, vb, step_rng)))
                    if i == 0 and args.visualize_dir:
                        from ..utils.visualizer import visualize
                        from .loss import debug_activations

                        with mesh:
                            enc, dec = debug_activations(
                                state.params, cfg, vb,
                                jnp.dtype(args.dtype),
                            )
                        visualize(
                            (enc, dec),
                            {**vb, "utt_ids": utt_ids},
                            args.visualize_dir,
                        )
                if losses:
                    log.info("valid loss %.4f (%d batches)",
                             float(np.mean(losses)), len(losses))
        save(state, epoch + 1)
    return {"step": global_step, "metrics": last_metrics, "state": state}


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s [%(name)s] %(message)s",
    )
    args = get_parser().parse_args()
    run(args)


if __name__ == "__main__":
    main()
