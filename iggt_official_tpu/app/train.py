"""Training CLI: dataset expression -> sharded TPU train loop.

The reference ships the full training *data* stack but no released train
script (`README.md:37-42` TODO "Release downstream task scripts"; its
mmengine config hook is `iggt/utils/configs.py:5-59`).  This CLI is the
assembled TPU-native trainer entry point:

    python -m iggt_official_tpu.app.train \
        --dataset "1000 @ Scannet('/data/scannet', resolution=(224,168))" \
        --steps 10000 --batch_size 8 --checkpoint_dir /tmp/ckpt

- dataset expressions use the EasyDataset algebra over the registered
  loader classes (`N @ ds`, `ds1 + ds2`, ref `datasets/__init__.py:42-44`);
- scale-out: a ("data", "seq") mesh over the local chips, or over all
  hosts when launched under a multi-host env (`jax.distributed` rank
  discovery per `parallel/init.py`, replacing `utils/dist.py:19-80`);
- `--fsdp` shards params + optimizer moments over the data axis (ZeRO-3
  equivalent); the default is DDP-style replicated params;
- model scale knobs default to the full ViT-L/14 flagship and can be
  shrunk for debugging.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Sequence


def build_model(args):
    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import IGGT, VGGT

    cfg = ModelConfig()
    if args.embed_dim is not None:
        cfg = cfg.scaled(
            embed_dim=args.embed_dim,
            depth=args.depth or 24,
            num_heads=args.num_heads or max(1, args.embed_dim // 64),
            img_size=args.img_size,
            patch_embed=args.patch_embed,
        )
    if args.model == "vggt":
        cfg = dataclasses.replace(cfg, enable_part=False, name="vggt")
        return VGGT(cfg), cfg
    return IGGT(cfg), cfg


def build_mesh(args):
    """("data", "seq", "model") mesh; joins the multi-host job when one is
    configured in the environment (ranks via env/SLURM discovery)."""
    from iggt_official_tpu.parallel import init as dist_init
    from iggt_official_tpu.parallel.mesh import make_mesh

    env = dist_init.discover_env()
    if env.distributed:
        dist_init.initialize(env)
        mesh = dist_init.make_global_mesh(
            n_seq=args.n_seq, n_model=args.n_model
        )
    else:
        mesh = make_mesh(
            n_data=args.n_data, n_seq=args.n_seq, n_model=args.n_model
        )
    return mesh, dist_init.process_count(), dist_init.process_index()


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(description="IGGT TPU trainer")
    p.add_argument("--dataset", required=True,
                   help="dataset expression over the registered loaders, "
                        "e.g. \"100 @ Scannet('/data/scannet')\"")
    p.add_argument("--steps", type=int, required=True)
    p.add_argument("--batch_size", type=int, default=8,
                   help="images per batch (sampler splits anchors x views)")
    p.add_argument("--seq_min_len", type=int, default=2)
    p.add_argument("--seq_max_len", type=int, default=8)
    p.add_argument("--model", choices=("iggt", "vggt"), default="iggt")
    p.add_argument("--base_lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.9)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--checkpoint_every", type=int, default=1000)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_seq", type=int, default=1,
                   help="sequence-parallel mesh axis size")
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel (Megatron) mesh axis size: shards "
                        "attention heads + MLP column/row-parallel")
    p.add_argument("--n_data", type=int, default=None,
                   help="data-parallel mesh axis size (default: all "
                        "remaining devices; batch anchors must divide it)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params+optimizer over the data axis")
    # debug-scale model knobs (default: full-scale flagship)
    p.add_argument("--embed_dim", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--num_heads", type=int, default=None)
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--patch_embed", default="dinov2_vitl14_reg")
    args = p.parse_args(argv)

    from iggt_official_tpu.data.loader import get_data_loader
    from iggt_official_tpu.train.loop import train

    model, cfg = build_model(args)
    mesh, world_size, rank = build_mesh(args)

    batches = get_data_loader(
        args.dataset,
        seq_min_len=args.seq_min_len,
        seq_max_len=args.seq_max_len,
        batch_size=args.batch_size,
        world_size=world_size,
        rank=rank,
    )
    state = train(
        model,
        batches,
        num_steps=args.steps,
        mesh=mesh,
        base_lr=args.base_lr,
        weight_decay=args.weight_decay,
        layer_decay=args.layer_decay,
        num_layers=cfg.aggregator.depth,
        warmup_steps=args.warmup_steps,
        grad_clip=args.grad_clip,
        fsdp=args.fsdp,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=not args.no_resume,
        log_every=args.log_every,
        rng_seed=args.seed,
    )
    print(f"finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
