"""ModelNet40 classification engine (reference main_cls.py semantics on the
TPU-native stack).  Train/test loops, metric strings, and the best-accuracy
checkpoint gate reproduce main_cls.py:44-190; the compute path is jit'd,
batch-sharded over the local device mesh, with device-side metrics."""
from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from dgcnn_tpu.cli.common import (
    MeterAccumulator,
    add_runtime_flags,
    apply_runtime_flags,
    build_data_parallel_call,
    init_output_dir,
    make_tb_logger,
    pick_devices,
    profile_epoch,
    str2bool,
)
from dgcnn_tpu.utils.profiling import ThroughputMeter
from dgcnn_tpu.data import ModelNet40, device_prefetch, make_loader
from dgcnn_tpu.models import DGCNNCls, PointNet
from dgcnn_tpu.train import (
    TrainState,
    accuracy_score,
    balanced_accuracy_score,
    load_model,
    make_cls_steps,
    make_optimizer,
    make_schedule,
    save_model,
    train_rng,
)
from dgcnn_tpu.utils import IOStream, enable_compilation_cache


def build_model(args):
    if args.model == "pointnet":
        return PointNet(emb_dims=args.emb_dims, dropout=args.dropout)
    if args.model == "dgcnn":
        return DGCNNCls(emb_dims=args.emb_dims, k=args.k, dropout=args.dropout)
    raise Exception("Not implemented")


def init_state(args, model, steps_per_epoch: int, rng):
    dummy = jnp.zeros((2, args.num_points, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    schedule = make_schedule(
        args.scheduler, args.lr, epochs=args.epochs,
        steps_per_epoch=steps_per_epoch, use_sgd=args.use_sgd,
    )
    tx = make_optimizer(use_sgd=args.use_sgd, schedule=schedule,
                        momentum=args.momentum)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


def _train_device_pipeline(args, io, state, train_step, eval_step,
                           train_ds, test_ds, steps_per_epoch, devices):
    """Fully on-device training loop (``--device_pipeline=True``): the raw
    train set lives in HBM; per-epoch shuffle, batch gather, augmentation
    and every optimizer step run inside ONE jitted ``lax.scan``
    (data/device_pipeline.py), so each epoch costs a single dispatch and a
    single metrics readback.  On a multi-device host, batches are
    sharding-constrained over the mesh so GSPMD data-parallelism matches
    the host-loader path.  Same metric strings / best-model gate as the
    host path; augmentation matches the reference distributions but draws
    from the JAX RNG stream (documented deviation)."""
    from dgcnn_tpu.data.device_pipeline import (
        augment_cls,
        dataset_to_device,
        resident_train_epoch_fn,
    )
    from dgcnn_tpu.data.pipeline import resident_epoch_fn

    from dgcnn_tpu.parallel import mesh_if_divisible

    tr_arrays = dataset_to_device(train_ds, args.num_points)

    def step(st, batch, rng):
        st, met = train_step(st, batch["points"], batch["label"], rng)
        met["labels"] = batch["label"]
        return st, met

    epoch_fn = resident_train_epoch_fn(
        step, augment_cls,
        mesh=mesh_if_divisible(devices, args.batch_size, io))

    test_loader = make_loader(test_ds, ["points", "label"],
                              batch_size=args.test_batch_size, shuffle=True,
                              seed=args.seed)
    ev_arrays, ev_mask = test_loader.device_resident()
    ev_arrays["mask"] = jax.device_put(ev_mask)

    def ev_batch(batch, st):
        m = eval_step(st, batch["points"], batch["label"].squeeze(-1),
                      batch["mask"])
        m["labels"] = batch["label"].squeeze(-1)
        return m

    ev_fn = resident_epoch_fn(
        ev_batch, mesh=mesh_if_divisible(devices, args.test_batch_size, io))

    best_test_acc = 0.0
    tput = ThroughputMeter()
    tb = make_tb_logger(args)
    for epoch in range(args.epochs):
        tput.start()
        with profile_epoch(args, epoch):
            state, mets = epoch_fn(
                state, tr_arrays,
                jax.random.fold_in(train_rng(args.seed), epoch),
                args.batch_size)
            losses = np.asarray(mets["loss"])  # one readback for the epoch
        rate = tput.tick(steps_per_epoch * args.batch_size)
        t = np.asarray(mets["labels"]).reshape(-1)
        p = np.asarray(mets["preds"]).reshape(-1)
        train_acc = accuracy_score(t, p)
        io.cprint(
            "Train %d, loss: %.6f, train acc: %.6f, train avg acc: %.6f, "
            "throughput: %.1f clouds/sec"
            % (epoch, float(losses.mean()), train_acc,
               balanced_accuracy_score(t, p), rate)
        )
        if tb is not None:
            tb.log_scalars("train", {"loss": float(losses.mean()),
                                     "acc": train_acc}, epoch)

        em = {k: np.asarray(v) for k, v in ev_fn(ev_arrays, state).items()}
        meter = MeterAccumulator()
        for i in range(ev_mask.shape[0]):
            meter.add_cls(em["loss"][i], em["preds"][i], em["labels"][i],
                          ev_mask[i])
        t, p = meter.concat()
        test_acc = accuracy_score(t, p)
        io.cprint(
            "Test %d, loss: %.6f, test acc: %.6f, test avg acc: %.6f"
            % (epoch, meter.mean_loss, test_acc, balanced_accuracy_score(t, p))
        )
        if tb is not None:
            tb.log_scalars("test", {"loss": meter.mean_loss,
                                    "acc": test_acc}, epoch)
        if test_acc >= best_test_acc:
            best_test_acc = test_acc
            save_model(
                f"outputs/{args.exp_name}/models/model.t7.msgpack",
                {"params": state.params, "batch_stats": state.batch_stats},
            )
    if tb is not None:
        tb.close()


def train(args, io: IOStream):
    train_ds = ModelNet40(partition="train", num_points=args.num_points,
                          seed=args.seed)
    test_ds = ModelNet40(partition="test", num_points=args.num_points,
                         seed=args.seed)
    train_loader = make_loader(train_ds, ["points", "label"],
                               batch_size=args.batch_size, shuffle=True,
                               drop_last=True, seed=args.seed)
    test_loader = make_loader(test_ds, ["points", "label"],
                              batch_size=args.test_batch_size, shuffle=True,
                              seed=args.seed)
    devices = pick_devices(args.no_cuda)
    io.cprint(f"Using {len(devices)} device(s): {devices[0].platform}")

    model = build_model(args)
    state = init_state(args, model, len(train_loader),
                       jax.random.PRNGKey(args.seed))
    train_step, eval_step = make_cls_steps(
        model, remat=getattr(args, "remat", False))
    if getattr(args, "device_pipeline", False):
        if len(train_ds) < args.batch_size:
            io.cprint("device pipeline: dataset smaller than one batch — "
                      "falling back to the host loader (which pads)")
        else:
            _train_device_pipeline(args, io, state, train_step, eval_step,
                                   train_ds, test_ds, len(train_loader),
                                   devices)
            return
    train_call = build_data_parallel_call(train_step, devices,
                                          args.batch_size, n_sharded=2,
                                          donate=True)
    eval_call = build_data_parallel_call(eval_step, devices,
                                         args.test_batch_size, n_sharded=3)
    key = train_rng(args.seed)

    best_test_acc = 0.0
    tput = ThroughputMeter()
    tb = make_tb_logger(args)
    for epoch in range(args.epochs):
        train_loader.set_epoch(epoch)
        test_loader.set_epoch(epoch)
        meter = MeterAccumulator()
        tput.start()
        with profile_epoch(args, epoch):
            for batch in device_prefetch(iter(train_loader)):
                state, m = train_call(
                    state, batch["points"], batch["label"].squeeze(-1), key)
                meter.add_cls(m["loss"], np.asarray(m["preds"]),
                              np.asarray(batch["label"]).squeeze(-1),
                              np.asarray(batch["mask"]))
        rate = tput.tick(meter.count)
        t, p = meter.concat()
        train_acc = accuracy_score(t, p)
        io.cprint(
            "Train %d, loss: %.6f, train acc: %.6f, train avg acc: %.6f, "
            "throughput: %.1f clouds/sec"
            % (epoch, meter.mean_loss, train_acc,
               balanced_accuracy_score(t, p), rate)
        )
        if tb is not None:
            tb.log_scalars("train", {"loss": meter.mean_loss,
                                     "acc": train_acc}, epoch)

        meter = MeterAccumulator()
        for batch in device_prefetch(iter(test_loader)):
            m = eval_call(state, batch["points"], batch["label"].squeeze(-1),
                          batch["mask"])
            meter.add_cls(m["loss"], np.asarray(m["preds"]),
                          np.asarray(batch["label"]).squeeze(-1),
                          np.asarray(batch["mask"]))
        t, p = meter.concat()
        test_acc = accuracy_score(t, p)
        io.cprint(
            "Test %d, loss: %.6f, test acc: %.6f, test avg acc: %.6f"
            % (epoch, meter.mean_loss, test_acc, balanced_accuracy_score(t, p))
        )
        if tb is not None:
            tb.log_scalars("test", {"loss": meter.mean_loss,
                                    "acc": test_acc}, epoch)
        if test_acc >= best_test_acc:
            best_test_acc = test_acc
            save_model(
                f"outputs/{args.exp_name}/models/model.t7.msgpack",
                {"params": state.params, "batch_stats": state.batch_stats},
            )
    if tb is not None:
        tb.close()


def load_variables_any(path: str, args):
    """Load either our msgpack or a torch .t7 state dict (converted)."""
    if path.endswith(".msgpack"):
        return load_model(path)
    from dgcnn_tpu.convert import (
        convert_dgcnn_cls,
        convert_pointnet,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path)
    conv = convert_pointnet if args.model == "pointnet" else convert_dgcnn_cls
    return conv(sd)


def test(args, io: IOStream):
    test_ds = ModelNet40(partition="test", num_points=args.num_points,
                         seed=args.seed)
    loader = make_loader(test_ds, ["points", "label"],
                         batch_size=args.test_batch_size, shuffle=True,
                         seed=args.seed)
    devices = pick_devices(args.no_cuda)
    model = build_model(args)
    variables = load_variables_any(args.model_path, args)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(use_sgd=True, schedule=lambda _: 0.0),
    )
    _, eval_step = make_cls_steps(model)
    meter = MeterAccumulator()
    if getattr(args, "device_pipeline", False):
        from dgcnn_tpu.data.pipeline import resident_epoch_fn

        arrays, mask = loader.device_resident()
        arrays["mask"] = jax.device_put(mask)

        def ev_batch(batch, st):
            m = eval_step(st, batch["points"], batch["label"].squeeze(-1),
                          batch["mask"])
            m["labels"] = batch["label"].squeeze(-1)
            return m

        # shard the scanned batches like the per-batch eval path does —
        # same GSPMD reduction order, bit-identical metrics
        from dgcnn_tpu.parallel import mesh_if_divisible

        mesh = mesh_if_divisible(devices, args.test_batch_size, io)
        em = {k: np.asarray(v)  # one stacked readback
              for k, v in resident_epoch_fn(ev_batch, mesh=mesh)(
                  arrays, state).items()}
        for i in range(mask.shape[0]):
            meter.add_cls(em["loss"][i], em["preds"][i], em["labels"][i],
                          mask[i])
    else:
        eval_call = build_data_parallel_call(eval_step, devices,
                                             args.test_batch_size,
                                             n_sharded=3)
        for batch in device_prefetch(iter(loader)):
            m = eval_call(state, batch["points"],
                          batch["label"].squeeze(-1), batch["mask"])
            meter.add_cls(m["loss"], np.asarray(m["preds"]),
                          np.asarray(batch["label"]).squeeze(-1),
                          np.asarray(batch["mask"]))
    t, p = meter.concat()
    io.cprint(
        "Test :: test acc: %.6f, test avg acc: %.6f"
        % (accuracy_score(t, p), balanced_accuracy_score(t, p))
    )
    if getattr(args, "export_model", ""):
        # AOT serving artifact: the eval forward with these weights baked
        # in, serialized StableHLO — self-contained (dgcnn_tpu/export.py)
        from dgcnn_tpu.export import export_from_cli

        export_from_cli(
            args, io, model, state,
            (jnp.zeros((args.test_batch_size, args.num_points, 3),
                       jnp.float32),),
            devices)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Point Cloud Recognition")
    parser.add_argument("--exp_name", type=str, default="exp", metavar="N")
    parser.add_argument("--model", type=str, default="dgcnn", metavar="N",
                        choices=["pointnet", "dgcnn"])
    parser.add_argument("--dataset", type=str, default="modelnet40",
                        metavar="N", choices=["modelnet40"])
    parser.add_argument("--batch_size", type=int, default=32,
                        metavar="batch_size")
    parser.add_argument("--test_batch_size", type=int, default=16,
                        metavar="batch_size")
    parser.add_argument("--epochs", type=int, default=250, metavar="N")
    parser.add_argument("--use_sgd", type=str2bool, default=True)
    parser.add_argument("--lr", type=float, default=0.001, metavar="LR")
    parser.add_argument("--momentum", type=float, default=0.9, metavar="M")
    parser.add_argument("--scheduler", type=str, default="cos", metavar="N",
                        choices=["cos", "step"])
    parser.add_argument("--no_cuda", type=str2bool, default=False,
                        help="force CPU backend")
    parser.add_argument("--seed", type=int, default=1, metavar="S")
    parser.add_argument("--eval", type=str2bool, default=False)
    parser.add_argument("--num_points", type=int, default=1024)
    parser.add_argument("--dropout", type=float, default=0.5)
    parser.add_argument("--emb_dims", type=int, default=1024, metavar="N")
    parser.add_argument("--k", type=int, default=20, metavar="N")
    parser.add_argument("--model_path", type=str, default="", metavar="N")
    parser.add_argument("--export_model", type=str, default="", metavar="PATH",
                        help="TPU-native extension: after --eval, write an "
                             "AOT serving artifact (StableHLO with weights "
                             "baked in) to PATH — loadable without any "
                             "model code via dgcnn_tpu.export.load_exported")
    parser.add_argument("--export_poly_batch", type=str2bool, default=False,
                        help="with --export_model: make the artifact's "
                             "batch axis a symbolic dimension so one "
                             "artifact serves any batch size")
    parser.add_argument("--device_pipeline", type=str2bool, default=False,
                        help="TPU-native extension: keep the dataset "
                             "resident in HBM and run each train epoch as "
                             "one jitted lax.scan (shuffle + gather + "
                             "augment + step on device)")
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
    if not args.eval:
        train(args, io)
    else:
        test(args, io)


if __name__ == "__main__":
    main()
