"""Checkpoint conversion CLI: PyTorch state_dict <-> native msgpack params.

Usage:
    # torch -> native (requires the model config to rebuild shapes)
    python scripts/convert_checkpoint.py to-native ckpt.pt params.msgpack \
        --embed-dim 192 --depth 24 --num-frames 8 --ckpt-num-frame 8

    # native -> torch (for handing weights back to reference users)
    python scripts/convert_checkpoint.py to-torch params.msgpack ckpt.pt \
        --embed-dim 192 --depth 24 --num-frames 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(args):
    from videomamba_tpu.models import PretrainVideoMamba

    return PretrainVideoMamba(
        img_size=args.img_size,
        patch_size=args.patch_size,
        depth=args.depth,
        embed_dim=args.embed_dim,
        channels=args.channels,
        kernel_size=args.kernel_size,
        num_frames=args.num_frames,
        rms_norm=args.rms_norm,
        fused_add_norm=args.rms_norm,
        add_pool_norm=not args.no_pool_norm,
        rng=0,
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["to-native", "to-torch"])
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--img-size", type=int, default=224)
    parser.add_argument("--patch-size", type=int, default=16)
    parser.add_argument("--depth", type=int, default=24)
    parser.add_argument("--embed-dim", type=int, default=192)
    parser.add_argument("--channels", type=int, default=3)
    parser.add_argument("--kernel-size", type=int, default=1)
    parser.add_argument("--num-frames", type=int, default=8)
    parser.add_argument("--ckpt-num-frame", type=int, default=None,
                        help="frames the torch checkpoint was trained with "
                             "(required for to-native)")
    parser.add_argument("--rms-norm", action="store_true", default=True)
    parser.add_argument("--no-pool-norm", action="store_true")
    args = parser.parse_args()

    from videomamba_tpu import checkpoint as ckpt

    model = _build(args)
    if args.mode == "to-native":
        ckpt_num_frame = args.ckpt_num_frame or args.num_frames
        ckpt.load_state_dict(
            args.src, model, ckpt_num_frame=ckpt_num_frame,
            num_frames=args.num_frames,
        )
        ckpt.save_params(args.dst, model.params)
        print(f"wrote native params: {args.dst}")
    else:
        model.params = ckpt.load_params(args.src, model.params)
        ckpt.save_torch_state_dict(args.dst, model)
        print(f"wrote torch state_dict: {args.dst}")


if __name__ == "__main__":
    main()
