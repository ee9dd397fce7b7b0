"""ShapeNetPart part-segmentation engines.

``test`` mirrors the eval-only reference main_partseg.py:157-213 (model path
under outputs/<exp>/ — reference quirk :166 preserved via ``--model_path``
resolution, falling back to an absolute/relative path when absent);
``train`` provides the single-process training loop whose distributed variant
lives in cli/partseg_dist.py (reference main_partseg_dist.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from dgcnn_tpu.cli.common import (
    MeterAccumulator,
    add_runtime_flags,
    apply_runtime_flags,
    band_arg,
    build_data_parallel_call,
    fast_extract_pin,
    init_output_dir,
    make_tb_logger,
    pick_devices,
    str2bool,
)
from dgcnn_tpu.data import (
    ShapeNetPart,
    ShapeNetPartAugmented,
    device_prefetch,
    make_loader,
)
from dgcnn_tpu.models import DGCNNPartSeg, Net
from dgcnn_tpu.train import (
    TrainState,
    accuracy_score,
    balanced_accuracy_score,
    calculate_shape_IoU,
    load_model,
    load_train_checkpoint,
    make_optimizer,
    make_schedule,
    make_seg_steps,
    save_train_checkpoint,
    train_rng,
)
from dgcnn_tpu.utils import IOStream, enable_compilation_cache
from dgcnn_tpu.utils.visualization import PartSegVisualizer

NUM_CATEGORIES = 16


def build_model(args):
    if args.model == "dgcnn":
        return DGCNNPartSeg(
            emb_dims=getattr(args, "emb_dims", args.emb_dim),
            k=args.k, dropout=args.dropout, seg_num_all=args.nclasses,
        )
    return Net(
        emb_dim=args.emb_dim, k=args.k, n_heads=args.n_heads,
        n_blocks=args.n_blocks, ff_dims=args.ff_dims,
        d_qkv=getattr(args, "d_qkv", 64), dropout=args.dropout,
        nclasses=args.nclasses,
        use_custom_attention=getattr(args, "use_custom_attention", False),
    )


def one_hot_categories(label: np.ndarray) -> np.ndarray:
    out = np.zeros((label.shape[0], NUM_CATEGORIES), np.float32)
    out[np.arange(label.shape[0]), np.ravel(label)] = 1
    return out


def init_state(args, model, steps_per_epoch, rng):
    dummy = jnp.zeros((2, args.num_points, 3), jnp.float32)
    lbl = jnp.zeros((2, NUM_CATEGORIES), jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(0)},
        dummy, lbl, train=False,
    )
    schedule = make_schedule(
        args.scheduler, args.lr, epochs=args.epochs,
        steps_per_epoch=steps_per_epoch, use_sgd=args.use_sgd,
    )
    # torch OneCycleLR also cycles momentum/beta1 (cycle_momentum=True
    # default, reference main_partseg_dist.py:212) — mirror it
    from dgcnn_tpu.train.schedules import make_momentum_schedule

    tx = make_optimizer(use_sgd=args.use_sgd, schedule=schedule,
                        momentum=args.momentum, adamw=True,
                        grad_accum=getattr(args, "grad_accum", 1),
                        momentum_schedule=make_momentum_schedule(
                            args.scheduler, epochs=args.epochs,
                            steps_per_epoch=steps_per_epoch))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


def run_epoch_eval(eval_call, state, loader, seg_start_index, visualizer=None):
    meter = MeterAccumulator()
    for batch in device_prefetch(iter(loader)):
        seg = batch["seg"] - seg_start_index
        lbl1h = one_hot_categories(batch["label"])
        m = eval_call(state, batch["points"], lbl1h, seg, batch["mask"])
        mask = np.asarray(batch["mask"])
        meter.add_seg(m["loss"], np.asarray(m["preds"]), seg,
                      batch["label"], mask)
        if visualizer is not None:
            visualizer(
                np.asarray(batch["points"])[mask],
                np.asarray(m["preds"])[mask],
                np.asarray(seg)[mask],
                np.ravel(np.asarray(batch["label"]))[mask],
            )
    return meter


def train(args, io: IOStream):
    dataset_cls = (ShapeNetPartAugmented if args.dataset == "shapenetpart_aug"
                   else None)
    if dataset_cls is not None:
        train_ds = dataset_cls(partition="trainval", seed=args.seed)
        test_ds = dataset_cls(partition="test", seed=args.seed)
        seg_start_index = 0
    else:
        train_ds = ShapeNetPart(args.num_points, "trainval",
                                args.class_choice, seed=args.seed)
        test_ds = ShapeNetPart(args.num_points, "test",
                               args.class_choice, seed=args.seed)
        seg_start_index = train_ds.seg_start_index
        args.nclasses = (train_ds.seg_num_all
                         if args.class_choice else args.nclasses)
    train_loader = make_loader(train_ds, ["points", "label", "seg"],
                               batch_size=args.batch_size, shuffle=True,
                               drop_last=len(train_ds) >= 100, seed=args.seed)
    test_loader = make_loader(test_ds, ["points", "label", "seg"],
                              batch_size=args.test_batch_size, shuffle=True,
                              seed=args.seed)
    devices = pick_devices(args.no_cuda)
    io.cprint(f"Using {len(devices)} device(s): {devices[0].platform}")

    model = build_model(args)
    state = init_state(args, model, len(train_loader),
                       jax.random.PRNGKey(args.seed))
    use_orbax = getattr(args, "orbax", False)
    if use_orbax:
        from dgcnn_tpu.train import load_orbax, save_orbax
        ckpt_path = f"outputs/{args.exp_name}/checkpoints/ckpt.orbax"
        ckpt_exists = os.path.isdir(ckpt_path)
        load_ckpt, save_ckpt = load_orbax, save_orbax
    else:
        ckpt_path = f"outputs/{args.exp_name}/checkpoints/ckpt.checkpoint"
        ckpt_exists = os.path.isfile(ckpt_path)
        load_ckpt, save_ckpt = load_train_checkpoint, save_train_checkpoint
    start_epoch = 0
    if getattr(args, "resume", False) and ckpt_exists:
        state, start_epoch, _ = load_ckpt(ckpt_path, state)
        io.cprint(f"Resumed from {ckpt_path} at epoch {start_epoch}")

    train_step, eval_step = make_seg_steps(
        model, remat=getattr(args, "remat", False))
    dp_epoch = tr_arrays = None
    if (getattr(args, "device_pipeline", False)
            and len(train_ds) < args.batch_size):
        io.cprint("device pipeline: dataset smaller than one batch — "
                  "falling back to the host loader (which pads)")
        args.device_pipeline = False
    if getattr(args, "device_pipeline", False):
        from dgcnn_tpu.data.device_pipeline import (
            augment_partseg_augmented,
            augment_partseg_plain,
            dataset_to_device,
            resident_train_epoch_fn,
        )

        # Augmented tensors ship pre-cut; plain ShapeNetPart crops to
        # num_points at load (ShapeNetPart.__getitem__ order preserved:
        # crop THEN shuffle)
        tr_arrays = dataset_to_device(
            train_ds, None if dataset_cls is not None else args.num_points)
        aug = (augment_partseg_augmented if dataset_cls is not None
               else augment_partseg_plain)

        def _dp_step(st, batch, rng):
            seg = batch["seg"] - seg_start_index
            lbl1h = jax.nn.one_hot(batch["label"], NUM_CATEGORIES,
                                   dtype=jnp.float32)
            st, met = train_step(st, batch["points"], lbl1h, seg, rng)
            met["seg"] = seg
            met["label"] = batch["label"]
            return st, met

        from dgcnn_tpu.parallel import mesh_if_divisible

        dp_epoch = resident_train_epoch_fn(
            _dp_step, aug,
            mesh=mesh_if_divisible(devices, args.batch_size, io))

        from dgcnn_tpu.data.pipeline import resident_epoch_fn

        ev_arrays, ev_mask = test_loader.device_resident()
        ev_arrays["mask"] = jax.device_put(ev_mask)

        def _dp_eval(batch, st):
            seg = batch["seg"] - seg_start_index
            lbl1h = jax.nn.one_hot(batch["label"].squeeze(-1),
                                   NUM_CATEGORIES, dtype=jnp.float32)
            m = eval_step(st, batch["points"], lbl1h, seg, batch["mask"])
            m["seg"] = seg
            m["label"] = batch["label"].squeeze(-1)
            return m

        dp_eval_fn = resident_epoch_fn(
            _dp_eval, mesh=mesh_if_divisible(devices, args.test_batch_size,
                                             io))
    train_call = build_data_parallel_call(train_step, devices,
                                          args.batch_size, n_sharded=3,
                                          donate=True)
    eval_call = build_data_parallel_call(eval_step, devices,
                                         args.test_batch_size, n_sharded=4)
    key = train_rng(args.seed)

    best_test_iou = 0.0
    tb = make_tb_logger(args)
    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        test_loader.set_epoch(epoch)
        meter = MeterAccumulator()
        if dp_epoch is not None:
            state, mets = dp_epoch(
                state, tr_arrays,
                jax.random.fold_in(train_rng(args.seed), epoch),
                args.batch_size)
            mets = {k: np.asarray(v) for k, v in mets.items()}  # 1 readback
            full = np.ones(args.batch_size, bool)
            for i in range(mets["loss"].shape[0]):
                meter.add_seg(mets["loss"][i], mets["preds"][i],
                              mets["seg"][i], mets["label"][i], full)
        else:
            for batch in device_prefetch(iter(train_loader)):
                seg = batch["seg"] - seg_start_index
                lbl1h = one_hot_categories(batch["label"])
                state, m = train_call(state, batch["points"], lbl1h, seg, key)
                meter.add_seg(m["loss"], np.asarray(m["preds"]), seg,
                              batch["label"], np.asarray(batch["mask"]))
        t, p = meter.concat()
        ts, ps, ls = meter.concat_seg()
        ious = calculate_shape_IoU(ps, ts, ls, args.class_choice)
        io.cprint(
            "Train %d, loss: %.6f, train acc: %.6f, train avg acc: %.6f, "
            "train iou: %.6f"
            % (epoch, meter.mean_loss, accuracy_score(t, p),
               balanced_accuracy_score(t, p), float(np.mean(ious)))
        )
        if tb is not None:
            tb.log_scalars("train", {"loss": meter.mean_loss,
                                     "acc": accuracy_score(t, p),
                                     "iou": float(np.mean(ious))}, epoch)

        if dp_epoch is not None:
            em = {k: np.asarray(v)  # one stacked readback
                  for k, v in dp_eval_fn(ev_arrays, state).items()}
            meter = MeterAccumulator()
            for i in range(ev_mask.shape[0]):
                meter.add_seg(em["loss"][i], em["preds"][i], em["seg"][i],
                              em["label"][i], ev_mask[i])
        else:
            meter = run_epoch_eval(eval_call, state, test_loader,
                                   seg_start_index)
        t, p = meter.concat()
        ts, ps, ls = meter.concat_seg()
        ious = calculate_shape_IoU(ps, ts, ls, args.class_choice)
        io.cprint(
            "Test %d, loss: %.6f, test acc: %.6f, test avg acc: %.6f, "
            "test iou: %.6f"
            % (epoch, meter.mean_loss, accuracy_score(t, p),
               balanced_accuracy_score(t, p), float(np.mean(ious)))
        )
        if tb is not None:
            tb.log_scalars("test", {"loss": meter.mean_loss,
                                    "acc": accuracy_score(t, p),
                                    "iou": float(np.mean(ious))}, epoch)
        if np.mean(ious) >= best_test_iou:
            best_test_iou = float(np.mean(ious))
            # best-model save follows the same format flag as the periodic
            # checkpoint: --orbax routes BOTH through orbax (reference
            # naming models/transformer_<epoch>.checkpoint either way,
            # main_partseg_dist.py:364-380)
            best_ext = "orbax" if use_orbax else "checkpoint"
            save_ckpt(
                f"outputs/{args.exp_name}/models/transformer_{epoch}.{best_ext}",
                state, epoch, meter.mean_loss)
        save_ckpt(ckpt_path, state, epoch, meter.mean_loss)
    if tb is not None:
        tb.close()


def test(args, io: IOStream):
    test_ds = ShapeNetPart(args.num_points, "test", args.class_choice,
                           seed=args.seed)
    loader = make_loader(test_ds, ["points", "label", "seg"],
                         batch_size=args.test_batch_size, shuffle=True,
                         seed=args.seed)
    devices = pick_devices(args.no_cuda)
    model = build_model(args)

    # reference main_partseg.py:166 forces the path under outputs/<exp>/
    model_path = f"outputs/{args.exp_name}/{args.model_path}"
    if not os.path.exists(model_path):
        model_path = args.model_path
    variables = load_variables_any(model_path, args)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(use_sgd=True, schedule=lambda _: 0.0),
    )
    _, eval_step = make_seg_steps(model)
    visualizer = PartSegVisualizer(
        f"outputs/{args.exp_name}", args.visu, args.visu_format,
        test_ds.partseg_colors, args.class_choice,
    )
    if getattr(args, "device_pipeline", False) and args.visu:
        # visualization reads every batch back on the host anyway
        io.cprint("device pipeline: --visu set — using the host loader")
    if getattr(args, "device_pipeline", False) and not args.visu:
        # eval-only resident path (mirrors the train loop): one H2D for
        # the whole test set, one lax.scan epoch, one stacked readback
        from dgcnn_tpu.data.pipeline import resident_epoch_fn

        arrays, mask = loader.device_resident()
        arrays["mask"] = jax.device_put(mask)
        seg_start_index = test_ds.seg_start_index

        def _dp_eval(batch, st):
            seg = batch["seg"] - seg_start_index
            lbl1h = jax.nn.one_hot(batch["label"].squeeze(-1),
                                   NUM_CATEGORIES, dtype=jnp.float32)
            m = eval_step(st, batch["points"], lbl1h, seg, batch["mask"])
            m["seg"] = seg
            m["label"] = batch["label"].squeeze(-1)
            return m

        # shard the scanned batches like the per-batch eval path does —
        # same GSPMD reduction order, bit-identical metrics
        from dgcnn_tpu.parallel import mesh_if_divisible

        mesh = mesh_if_divisible(devices, args.test_batch_size, io)
        em = {k: np.asarray(v)  # one stacked readback
              for k, v in resident_epoch_fn(_dp_eval, mesh=mesh)(
                  arrays, state).items()}
        meter = MeterAccumulator()
        for i in range(mask.shape[0]):
            meter.add_seg(em["loss"][i], em["preds"][i], em["seg"][i],
                          em["label"][i], mask[i])
    else:
        eval_call = build_data_parallel_call(eval_step, devices,
                                             args.test_batch_size, n_sharded=4)
        meter = run_epoch_eval(eval_call, state, loader,
                               test_ds.seg_start_index, visualizer)
    visualizer.warn_if_unmatched()
    t, p = meter.concat()
    ts, ps, ls = meter.concat_seg()
    ious = calculate_shape_IoU(ps, ts, ls, args.class_choice)
    io.cprint(
        "Test: test acc: %.6f, test avg acc: %.6f, test iou: %.6f"
        % (accuracy_score(t, p), balanced_accuracy_score(t, p),
           float(np.mean(ious)))
    )
    if getattr(args, "export_model", ""):
        # AOT serving artifact (see dgcnn_tpu/export.py): forward takes
        # (points, category one-hot) like the reference Net
        from dgcnn_tpu.export import export_from_cli

        export_from_cli(
            args, io, model, state,
            (jnp.zeros((args.test_batch_size, args.num_points, 3),
                       jnp.float32),
             jnp.zeros((args.test_batch_size, NUM_CATEGORIES),
                       jnp.float32)),
            devices)


def load_variables_any(path: str, args):
    if path.endswith(".msgpack"):
        return load_model(path)
    if os.path.isdir(path):
        # --orbax best-model saves are checkpoint directories
        from dgcnn_tpu.train.checkpoint import load_orbax_variables

        return load_orbax_variables(path)
    from dgcnn_tpu.train.checkpoint import (
        is_torch_checkpoint,
        load_train_variables,
    )

    if not is_torch_checkpoint(path):
        # our own epoch checkpoints reuse the reference's
        # transformer_<epoch>.checkpoint naming but are msgpack payloads
        return load_train_variables(path)
    from dgcnn_tpu.convert import (
        convert_dgcnn_partseg,
        convert_net,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    if args.model == "dgcnn":
        return convert_dgcnn_partseg(sd)
    return convert_net(sd, n_blocks=args.n_blocks)


def build_parser(dist: bool = False) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Point Cloud Part Segmentation")
    parser.add_argument("--exp_name", type=str, default="exp", metavar="N")
    parser.add_argument("--model", type=str, default="transformer",
                        metavar="N", choices=["dgcnn", "transformer"])
    parser.add_argument("--dataset", type=str, default="shapenetpart",
                        metavar="N",
                        choices=["shapenetpart", "shapenetpart_aug"])
    parser.add_argument("--class_choice", type=str, default=None, metavar="N",
                        choices=["airplane", "bag", "cap", "car", "chair",
                                 "earphone", "guitar", "knife", "lamp",
                                 "laptop", "motor", "mug", "pistol", "rocket",
                                 "skateboard", "table"])
    parser.add_argument("--batch_size", type=int,
                        default=24 if dist else 32, metavar="batch_size")
    parser.add_argument("--test_batch_size", type=int, default=16,
                        metavar="batch_size")
    parser.add_argument("--epochs", type=int, default=200, metavar="N")
    parser.add_argument("--use_sgd", type=str2bool, default=True)
    parser.add_argument("--lr", type=float, default=0.001, metavar="LR")
    parser.add_argument("--momentum", type=float, default=0.9, metavar="M")
    parser.add_argument("--scheduler", type=str, default="cycle", metavar="N",
                        choices=["cos", "step", "cycle"])
    parser.add_argument("--use_custom_attention", action="store_true")
    parser.add_argument("--no_cuda", type=str2bool, default=False)
    parser.add_argument("--seed", type=int, default=1, metavar="S")
    parser.add_argument("--ff_dims", type=int, default=512)
    parser.add_argument("--n_heads", type=int, default=4 if dist else 1)
    parser.add_argument("--n_blocks", type=int, default=1)
    parser.add_argument("--d_qkv", type=int, default=64)
    parser.add_argument("--eval", type=str2bool, default=False)
    parser.add_argument("--num_points", type=int, default=2048)
    parser.add_argument("--nclasses", type=int, default=50)
    parser.add_argument("--dropout", type=float, default=0.5)
    parser.add_argument("--emb_dim", type=int, default=512, metavar="N")
    # both parsers default k=20 like the reference (main_partseg.py:268,
    # main_partseg_dist.py:550 — the dist run.sh passes --k 32 explicitly)
    parser.add_argument("--k", type=int, default=20, metavar="N")
    parser.add_argument("--model_path", type=str,
                        default="models/transformer.pt", metavar="N")
    parser.add_argument("--visu", type=str, default="")
    parser.add_argument("--visu_format", type=str, default="ply")
    parser.add_argument("--resume", type=str2bool, default=False)
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="gradient accumulation steps (the reference's "
                             "commented accum_iter)")
    parser.add_argument("--export_model", type=str, default="", metavar="PATH",
                        help="TPU-native extension: after --eval, write an "
                             "AOT serving artifact (StableHLO with weights "
                             "baked in) to PATH — loadable without any "
                             "model code via dgcnn_tpu.export.load_exported")
    parser.add_argument("--export_poly_batch", type=str2bool, default=False,
                        help="with --export_model: make the artifact's "
                             "batch axis a symbolic dimension so one "
                             "artifact serves any batch size")
    parser.add_argument("--fast_extract", type=band_arg, default=None,
                        metavar="BAND",
                        help="TPU-native extension (eval forwards, "
                             "INCLUDING a training run's per-epoch "
                             "validation passes): approximate kNN candidate "
                             "pruning to a PC1-sorted band of this width "
                             "(positive multiple of 128; 0 = force exact "
                             "even if DGCNN_TPU_FAST_EXTRACT is set; unset "
                             "= inherit the env).  Measured on chip at "
                             "N=2048/k=32: band=512 is +13%% with argmax "
                             "agreement 1.0 vs exact (tools/parity_drift.py "
                             "gate; ops/pallas_banded.py)")
    parser.add_argument("--device_pipeline", type=str2bool, default=False,
                        help="TPU-native extension: keep the train set "
                             "resident in HBM and run each train epoch as "
                             "one jitted lax.scan (shuffle + gather + "
                             "augment + step on device; drop-last batches)")
    add_runtime_flags(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    enable_compilation_cache()
    apply_runtime_flags(args)
    init_output_dir(args.exp_name, __file__)
    io = IOStream("outputs/" + args.exp_name + "/run.log")
    io.cprint(str(args))
    np.random.seed(args.seed)
    # opt-in approximate eval path (ops/pallas_banded.py); trace-time env,
    # scoped to this entry point (common.fast_extract_pin): an explicit
    # flag — including --fast_extract=0 to force exact — wins for this
    # call; with the flag unset an inherited env stays in effect; the
    # pre-existing env is restored on return either way
    with fast_extract_pin(args.fast_extract, args.num_points):
        if args.eval:
            test(args, io)
        else:
            train(args, io)


if __name__ == "__main__":
    main()
