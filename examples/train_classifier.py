"""End-to-end supervised video classification: the full production loop.

MJPEG shards on disk -> native C++ prefetch loader -> sharded jit train
step over a DP/FSDP mesh -> checkpoint/resume -> per-epoch eval. This is
the trainer the reference leaves to out-of-tree tooling (it ships only
optimizer/scheduler factories and a backbone; SURVEY §5), assembled from
this framework's pieces.

Run:  python examples/train_classifier.py --epochs 2 [--cpu-devices 8]
Resume is exercised in-process: the script checkpoints after each epoch
and restores from the checkpoint before the last one to prove parity.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_dataset(root, n_classes=3, per_class=6, T=10, hw=48, seed=0):
    """Per-class motion patterns encoded as MJPEG (or raw) shards."""
    from videomamba_tpu.data import native as nat

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:hw, 0:hw]
    paths, labels = [], []
    for c in range(n_classes):
        for i in range(per_class):
            phase = rng.uniform(0, 2 * np.pi)
            frames = []
            for t in range(T):
                # class controls the motion direction/frequency
                arg = (xx * (c + 1) / 10 + t * (c + 1) / 2 + phase
                       if c % 2 == 0 else
                       yy * (c + 1) / 10 - t * (c + 1) / 2 + phase)
                img = np.stack([
                    np.sin(arg) * 100 + 128,
                    np.cos(arg / 2) * 90 + 120,
                    ((xx + yy) * (c + 1) / 2 + t * 4) % 256,
                ], -1)
                frames.append(img)
            vid = np.stack(frames).clip(0, 255).astype(np.uint8)
            vid = (vid.astype(np.int16)
                   + rng.integers(-5, 6, vid.shape)).clip(0, 255)
            p = os.path.join(root, f"c{c}_{i}.vmjpg")
            try:
                nat.encode_vmjpg(p, vid.astype(np.uint8), quality=92,
                                 subsampling=0)
            except ImportError:  # no PIL: store raw
                p = os.path.join(root, f"c{c}_{i}.vraw")
                nat.write_vraw(p, vid.astype(np.uint8))
            paths.append(p)
            labels.append(c)
    return paths, labels


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--img", type=int, default=48)
    parser.add_argument("--classes", type=int, default=3)
    parser.add_argument("--depth", type=int, default=2)
    parser.add_argument("--embed-dim", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--cpu-devices", type=int, default=0)
    parser.add_argument("--data-dir", default=None,
                        help="dataset root: either class subdirectories "
                             "(root/<class>/<clip>.{vmjpg,vraw,npy}) or a "
                             "flat directory of shards named c<label>_*.ext "
                             "(synthesized when omitted)")
    parser.add_argument("--file-list", default=None,
                        help="Kinetics-style annotation file: one "
                             "'<path> <label>' per line")
    parser.add_argument("--ckpt-dir", default=None)
    args = parser.parse_args(argv)

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax.numpy as jnp
    import optax

    from videomamba_tpu.checkpoint import load_train_state, save_train_state
    from videomamba_tpu.data.native import NativeClipLoader
    from videomamba_tpu.models import PretrainVideoMamba
    from videomamba_tpu.parallel import batch_sharding, make_mesh, make_train_step
    from videomamba_tpu.parallel.mesh import replicated, shard_params

    # --- data ---------------------------------------------------------
    from videomamba_tpu.data.dataset import (
        load_file_list,
        scan_class_directories,
    )

    data_dir = args.data_dir or tempfile.mkdtemp(prefix="vm_clf_")
    if args.file_list:
        paths, labels = load_file_list(args.file_list)
        args.classes = max(labels) + 1
        print(f"file list: {len(paths)} samples, {args.classes} classes")
    elif args.data_dir:
        has_subdirs = any(
            e.is_dir() for e in os.scandir(data_dir) if not e.name.startswith(".")
        )
        if has_subdirs:
            paths, labels, class_names = scan_class_directories(data_dir)
            args.classes = len(class_names)
            print(f"class dirs: {len(paths)} samples, "
                  f"{args.classes} classes {class_names[:8]}")
        else:
            # Legacy flat layout: shards named c<label>_*.ext.
            paths = sorted(
                os.path.join(data_dir, f) for f in os.listdir(data_dir)
                if f.split(".")[-1] in {"vmjpg", "vraw", "npy"})
            labels = [int(os.path.basename(p).split("_")[0][1:]) for p in paths]
    else:
        paths, labels = synthesize_dataset(
            data_dir, n_classes=args.classes, hw=args.img)
        print(f"synthesized {len(paths)} videos in {data_dir}")
    # --- model + head --------------------------------------------------
    model = PretrainVideoMamba(
        img_size=args.img, patch_size=16, depth=args.depth,
        embed_dim=args.embed_dim, channels=3, fused_add_norm=True,
        rms_norm=True, residual_in_fp32=True, kernel_size=1,
        num_frames=args.frames, pool_type="cls+avg", add_pool_norm=True,
        rng=0)
    head_key = jax.random.PRNGKey(1)
    params = {
        "backbone": model.params,
        "head": {
            "w": (jax.random.normal(head_key,
                                    (args.embed_dim, args.classes)) * 0.02
                  ).astype(jnp.float32),
            "b": jnp.zeros((args.classes,), jnp.float32),
        },
    }

    n_dev = len(jax.devices())
    fsdp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh({"dp": n_dev // fsdp, "fsdp": fsdp, "tp": 1})
    print(f"devices: {n_dev}, mesh: {dict(mesh.shape)}")
    data_devices = mesh.shape["dp"] * mesh.shape["fsdp"]
    if args.batch % data_devices:
        args.batch = data_devices * max(1, args.batch // data_devices)
        print(f"batch rounded to {args.batch} "
              f"(divisible by {data_devices} data shards)")
    loader = NativeClipLoader(
        paths, labels, clip_len=args.frames, crop=args.img,
        batch_size=args.batch, num_threads=4, train=True)
    eval_loader = NativeClipLoader(
        paths, labels, clip_len=args.frames, crop=args.img,
        batch_size=args.batch, num_threads=4, train=False)

    tx = optax.adamw(args.lr, weight_decay=0.05)

    def forward_logits(params, video, deterministic, rng=None):
        out = model.apply(params["backbone"], video,
                          deterministic=deterministic, rng=rng)
        pooled = out[-1] if isinstance(out, tuple) else out
        if pooled.ndim == 3:  # pooled features carry a singleton token dim
            pooled = pooled[:, 0]
        return pooled @ params["head"]["w"] + params["head"]["b"]

    def loss_fn(params, batch, rng):
        logits = forward_logits(params, batch["video"],
                                deterministic=False, rng=rng)
        labels1h = jax.nn.one_hot(batch["label"], args.classes)
        loss = optax.softmax_cross_entropy(logits, labels1h).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(
            jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    with mesh:
        params["backbone"] = shard_params(params["backbone"], mesh)
        params["head"] = jax.device_put(params["head"], replicated(mesh))
        opt_state = jax.jit(tx.init)(params)
        step = jnp.zeros((), jnp.int32)
        train_step = make_train_step(model, tx, loss_fn=loss_fn)
        data_sh = batch_sharding(mesh, "dp", "fsdp")
        eval_logits = jax.jit(
            lambda p, v: forward_logits(p, v, deterministic=True))

        def put_batch(clips, lbl):
            pad = args.batch - clips.shape[0]
            if pad:  # keep the compiled step shape-stable
                clips = np.concatenate([clips, np.zeros(
                    (pad,) + clips.shape[1:], clips.dtype)])
                lbl = np.concatenate([lbl, np.full((pad,), -1, lbl.dtype)])
            return {
                "video": jax.device_put(jnp.asarray(clips), data_sh),
                "label": jax.device_put(jnp.asarray(lbl), data_sh),
            }

        def evaluate(params):
            hits = total = 0
            for clips, lbl in eval_loader.epoch(seed=0, shuffle=False):
                n = clips.shape[0]
                batch = put_batch(clips, lbl)
                pred = np.asarray(jnp.argmax(
                    eval_logits(params, batch["video"]), -1))[:n]
                hits += int((pred == lbl[:n]).sum())
                total += n
            return hits / max(total, 1)

        ckpt_dir = args.ckpt_dir or data_dir
        rng = jax.random.PRNGKey(0)
        ckpts = []
        for epoch in range(args.epochs):
            for clips, lbl in loader.epoch(seed=epoch, shuffle=True,
                                           drop_last=True, epoch=epoch):
                batch = put_batch(clips, lbl)
                params, opt_state, step, metrics = train_step(
                    params, opt_state, step, batch, rng)
            acc = evaluate(params)
            print(f"epoch {epoch}: loss={float(metrics['loss']):.4f} "
                  f"train_acc={float(metrics['acc']):.2f} eval_acc={acc:.2f}")
            ckpt = os.path.join(ckpt_dir, f"ckpt_ep{epoch}.msgpack")
            save_train_state(ckpt, params, opt_state, step)
            ckpts.append(ckpt)

        # --- prove checkpoint/resume parity ----------------------------
        if len(ckpts) >= 2:
            r_params, r_opt, r_step = load_train_state(
                ckpts[-2], params, opt_state, step)
            r_params["backbone"] = shard_params(r_params["backbone"], mesh)
            r_params["head"] = jax.device_put(r_params["head"],
                                              replicated(mesh))
            r_opt = jax.device_put(r_opt, replicated(mesh))
            for clips, lbl in loader.epoch(seed=args.epochs - 1, shuffle=True,
                                           drop_last=True,
                                           epoch=args.epochs - 1):
                batch = put_batch(clips, lbl)
                r_params, r_opt, r_step, r_metrics = train_step(
                    r_params, r_opt, r_step, batch, rng)
            diff = jax.tree_util.tree_reduce(
                max, jax.tree_util.tree_map(
                    lambda a, b: float(jnp.max(jnp.abs(
                        a.astype(jnp.float32) - b.astype(jnp.float32)))),
                    r_params, params))
            print(f"resume parity: max |param diff| after replayed epoch "
                  f"= {diff:.2e}")
        loader.close()
        eval_loader.close()
    return float(metrics["loss"])


if __name__ == "__main__":
    main()
