"""S3DIS semantic-segmentation engine (reference main_semseg.py semantics):
6-fold protocol — train per ``--test_area``, save ``model_<area>``, and
``test`` loops areas 1..6 loading ``model_root/model_<area>`` with per-area +
overall metrics and streaming room visualization."""
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
from dgcnn_tpu.data import S3DIS, data_root, device_prefetch, make_loader
from dgcnn_tpu.models import DGCNNSemSeg
from dgcnn_tpu.train import (
    TrainState,
    accuracy_score,
    balanced_accuracy_score,
    calculate_sem_IoU,
    load_model,
    make_optimizer,
    make_schedule,
    make_seg_steps,
    save_model,
    train_rng,
)
from dgcnn_tpu.utils import IOStream, enable_compilation_cache
from dgcnn_tpu.utils.visualization import SemSegVisualizer


def build_model(args):
    if args.model == "dgcnn":
        return DGCNNSemSeg(emb_dims=args.emb_dims, k=args.k,
                           dropout=args.dropout)
    raise Exception("Not implemented")


def init_state(args, model, steps_per_epoch, rng):
    dummy = jnp.zeros((2, args.num_points, 9), jnp.float32)
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


def train(args, io: IOStream):
    train_ds = S3DIS(args.num_points, "train", args.test_area, seed=args.seed)
    test_ds = S3DIS(args.num_points, "test", args.test_area, seed=args.seed)
    train_loader = make_loader(train_ds, ["points", "seg"],
                               batch_size=args.batch_size, shuffle=True,
                               drop_last=True, seed=args.seed)
    test_loader = make_loader(test_ds, ["points", "seg"],
                              batch_size=args.test_batch_size, shuffle=True,
                              seed=args.seed)
    devices = pick_devices(args.no_cuda)
    io.cprint(f"Using {len(devices)} device(s): {devices[0].platform}")

    model = build_model(args)
    state = init_state(args, model, len(train_loader),
                       jax.random.PRNGKey(args.seed))
    train_step, eval_step = make_seg_steps(
        model, with_label=False, remat=getattr(args, "remat", False))
    dp_epoch = tr_arrays = None
    if (getattr(args, "device_pipeline", False)
            and len(train_ds) < args.batch_size):
        io.cprint("device pipeline: dataset smaller than one batch — "
                  "falling back to the host loader (which pads)")
        args.device_pipeline = False
    if getattr(args, "device_pipeline", False):
        from dgcnn_tpu.data.device_pipeline import (
            augment_partseg_plain,  # S3DIS train = same shuffle-with-seg
            dataset_to_device,
            resident_train_epoch_fn,
        )

        tr_arrays = dataset_to_device(train_ds, args.num_points)

        def _dp_step(st, batch, rng):
            st, met = train_step(st, batch["points"], batch["seg"], rng)
            met["seg"] = batch["seg"]
            return st, met

        from dgcnn_tpu.parallel import mesh_if_divisible

        dp_epoch = resident_train_epoch_fn(
            _dp_step, augment_partseg_plain,
            mesh=mesh_if_divisible(devices, args.batch_size, io))

        from dgcnn_tpu.data.pipeline import resident_epoch_fn

        ev_arrays, ev_mask = test_loader.device_resident()
        ev_arrays["mask"] = jax.device_put(ev_mask)

        def _dp_eval(batch, st):
            m = eval_step(st, batch["points"], batch["seg"], batch["mask"])
            m["seg"] = batch["seg"]
            return m

        dp_eval_fn = resident_epoch_fn(
            _dp_eval, mesh=mesh_if_divisible(devices, args.test_batch_size,
                                             io))
    train_call = build_data_parallel_call(train_step, devices,
                                          args.batch_size, n_sharded=2,
                                          donate=True)
    eval_call = build_data_parallel_call(eval_step, devices,
                                         args.test_batch_size, n_sharded=3)
    key = train_rng(args.seed)

    best_test_iou = 0.0
    tb = make_tb_logger(args)
    for epoch in range(args.epochs):
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
                              mets["seg"][i], None, full)
        else:
            for batch in device_prefetch(iter(train_loader)):
                state, m = train_call(state, batch["points"], batch["seg"],
                                      key)
                meter.add_seg(m["loss"], np.asarray(m["preds"]),
                              batch["seg"], None, np.asarray(batch["mask"]))
        t, p = meter.concat()
        ts, ps, _ = meter.concat_seg()
        ious = calculate_sem_IoU(ps, ts)
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

        meter = MeterAccumulator()
        if dp_epoch is not None:
            em = {k: np.asarray(v)  # one stacked readback
                  for k, v in dp_eval_fn(ev_arrays, state).items()}
            for i in range(ev_mask.shape[0]):
                meter.add_seg(em["loss"][i], em["preds"][i], em["seg"][i],
                              None, ev_mask[i])
        else:
            for batch in device_prefetch(iter(test_loader)):
                m = eval_call(state, batch["points"], batch["seg"],
                              batch["mask"])
                meter.add_seg(m["loss"], np.asarray(m["preds"]),
                              batch["seg"], None, np.asarray(batch["mask"]))
        t, p = meter.concat()
        ts, ps, _ = meter.concat_seg()
        ious = calculate_sem_IoU(ps, ts)
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
            save_model(
                f"outputs/{args.exp_name}/models/model_{args.test_area}.t7.msgpack",
                {"params": state.params, "batch_stats": state.batch_stats},
            )
    if tb is not None:
        tb.close()


def load_variables_any(path: str):
    if path.endswith(".msgpack"):
        return load_model(path)
    from dgcnn_tpu.convert import convert_dgcnn_semseg, load_torch_checkpoint

    return convert_dgcnn_semseg(load_torch_checkpoint(path))


def test(args, io: IOStream):
    all_true, all_pred = [], []
    all_true_seg, all_pred_seg = [], []
    areas = ["1", "2", "3", "4", "5", "6"] if args.test_area == "all" else [
        args.test_area]
    devices = pick_devices(args.no_cuda)
    model = build_model(args)
    if getattr(args, "point_shard", False):
        # sequence parallelism: shard the point axis across the mesh
        # (N past single-chip HBM) instead of the batch axis
        from dgcnn_tpu.parallel import make_mesh
        from dgcnn_tpu.parallel.point_sharded import point_sharded_seg_eval

        assert args.num_points % len(devices) == 0, (
            f"--point_shard needs num_points ({args.num_points}) divisible "
            f"by the device count ({len(devices)})")
        eval_call = point_sharded_seg_eval(model, make_mesh(devices))
    else:
        _, eval_step = make_seg_steps(model, with_label=False)
        eval_call = build_data_parallel_call(eval_step, devices,
                                             args.test_batch_size, n_sharded=3)
    dp_eval_fn = None
    if (getattr(args, "device_pipeline", False) and not args.visu
            and not getattr(args, "point_shard", False)):
        # eval-only resident path (mirrors the train loop): one H2D per
        # area, one lax.scan epoch, one stacked readback.  --visu needs
        # the per-batch host readbacks; --point_shard shards N, not batch.
        from dgcnn_tpu.data.pipeline import resident_epoch_fn

        def _dp_eval(batch, st):
            m = eval_step(st, batch["points"], batch["seg"], batch["mask"])
            m["seg"] = batch["seg"]
            return m

        # shard the scanned batches like the per-batch eval path does —
        # same GSPMD reduction order, bit-identical metrics
        from dgcnn_tpu.parallel import mesh_if_divisible

        dp_eval_fn = resident_epoch_fn(
            _dp_eval,
            mesh=mesh_if_divisible(devices, args.test_batch_size, io))
    for area in areas:
        if args.test_area == "all" or area == args.test_area:
            test_ds = S3DIS(args.num_points, "test", area, seed=args.seed)
            # visualization must follow file order: no shuffle when visu on
            loader = make_loader(test_ds, ["points", "seg"],
                                 batch_size=args.test_batch_size,
                                 shuffle=not args.visu, seed=args.seed)
            candidates = [
                os.path.join(args.model_root, f"model_{area}.t7.msgpack"),
                os.path.join(args.model_root, f"model_{area}.t7"),
            ]
            model_path = next((p for p in candidates if os.path.exists(p)),
                              candidates[0])
            variables = load_variables_any(model_path)
            state = TrainState.create(
                apply_fn=model.apply,
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                tx=make_optimizer(use_sgd=True, schedule=lambda _: 0.0),
            )
            visualizer = None
            if args.visu:
                test_dir = os.path.join(
                    data_root(), "indoor3d_sem_seg_hdf5_data_test")
                with open(os.path.join(test_dir, "room_filelist.txt")) as f:
                    rooms = [ln.rstrip() for ln in f]
                area_rooms = [r for r in rooms if f"Area_{area}" in r]
                # global start of this area in the filelist — raw_data3d
                # files are numbered globally (reference main_semseg.py:286-293)
                offset = 0
                for r in rooms:
                    if r[5] == str(area):
                        break
                    offset += 1
                visualizer = SemSegVisualizer(
                    f"outputs/{args.exp_name}", args.visu, args.visu_format,
                    args.test_area, test_ds.semseg_colors, area_rooms,
                    raw_data_dir=os.path.join(test_dir, "raw_data3d"),
                    index_offset=offset,
                )
            meter = MeterAccumulator()
            if dp_eval_fn is not None:
                arrays, mask2d = loader.device_resident()
                arrays["mask"] = jax.device_put(mask2d)
                em = {k: np.asarray(v)  # one stacked readback
                      for k, v in dp_eval_fn(arrays, state).items()}
                for i in range(mask2d.shape[0]):
                    meter.add_seg(em["loss"][i], em["preds"][i],
                                  em["seg"][i], None, mask2d[i])
            else:
                for batch in device_prefetch(iter(loader)):
                    m = eval_call(state, batch["points"], batch["seg"],
                                  batch["mask"])
                    mask = np.asarray(batch["mask"])
                    meter.add_seg(m["loss"], np.asarray(m["preds"]),
                                  batch["seg"], None, mask)
                    if visualizer is not None:
                        visualizer(np.asarray(batch["points"])[mask],
                                   np.asarray(batch["seg"])[mask],
                                   np.asarray(m["preds"])[mask])
            if visualizer is not None:
                visualizer.warn_if_unmatched()
            t, p = meter.concat()
            ts, ps, _ = meter.concat_seg()
            ious = calculate_sem_IoU(ps, ts)
            io.cprint(
                "Test :: test area: %s, test acc: %.6f, test avg acc: %.6f, "
                "test iou: %.6f"
                % (area, accuracy_score(t, p), balanced_accuracy_score(t, p),
                   float(np.mean(ious)))
            )
            all_true.append(t)
            all_pred.append(p)
            all_true_seg.append(ts)
            all_pred_seg.append(ps)
            if getattr(args, "export_model", ""):
                # AOT serving artifact per area model (dgcnn_tpu/export.py);
                # with --test_area=all the area id lands in the filename
                from dgcnn_tpu.export import export_from_cli

                path = args.export_model
                if args.test_area == "all":
                    root, ext = os.path.splitext(path)
                    path = f"{root}_{area}{ext}"
                export_from_cli(
                    args, io, model, state,
                    (jnp.zeros((args.test_batch_size, args.num_points, 9),
                               jnp.float32),),
                    devices, path=path)
    if args.test_area == "all":
        t = np.concatenate(all_true)
        p = np.concatenate(all_pred)
        ts = np.concatenate(all_true_seg, 0)
        ps = np.concatenate(all_pred_seg, 0)
        ious = calculate_sem_IoU(ps, ts)
        io.cprint(
            "Overall Test :: test acc: %.6f, test avg acc: %.6f, "
            "test iou: %.6f"
            % (accuracy_score(t, p), balanced_accuracy_score(t, p),
               float(np.mean(ious)))
        )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Point Cloud Semantic Segmentation")
    parser.add_argument("--exp_name", type=str, default="exp", metavar="N")
    parser.add_argument("--model", type=str, default="dgcnn", metavar="N",
                        choices=["dgcnn"])
    parser.add_argument("--dataset", type=str, default="S3DIS", metavar="N",
                        choices=["S3DIS"])
    parser.add_argument("--test_area", type=str, default=None, metavar="N",
                        choices=["1", "2", "3", "4", "5", "6", "all"])
    parser.add_argument("--batch_size", type=int, default=32,
                        metavar="batch_size")
    parser.add_argument("--test_batch_size", type=int, default=16,
                        metavar="batch_size")
    parser.add_argument("--epochs", type=int, default=100, metavar="N")
    parser.add_argument("--use_sgd", type=str2bool, default=True)
    parser.add_argument("--lr", type=float, default=0.001, metavar="LR")
    parser.add_argument("--momentum", type=float, default=0.9, metavar="M")
    parser.add_argument("--scheduler", type=str, default="cos", metavar="N",
                        choices=["cos", "step"])
    parser.add_argument("--no_cuda", type=str2bool, default=False)
    parser.add_argument("--seed", type=int, default=1, metavar="S")
    parser.add_argument("--eval", type=str2bool, default=False)
    parser.add_argument("--num_points", type=int, default=4096)
    parser.add_argument("--dropout", type=float, default=0.5)
    parser.add_argument("--emb_dims", type=int, default=1024, metavar="N")
    parser.add_argument("--k", type=int, default=20, metavar="N")
    parser.add_argument("--model_root", type=str, default="", metavar="N")
    parser.add_argument("--visu", type=str, default="")
    parser.add_argument("--visu_format", type=str, default="ply")
    parser.add_argument("--point_shard", type=str2bool, default=False,
                        help="eval with the POINT axis sharded across all "
                             "devices (sequence parallelism; num_points "
                             "must divide by the device count; uses the "
                             "XLA compute path — the fused Pallas kernels "
                             "are shard-local)")
    parser.add_argument("--export_model", type=str, default="", metavar="PATH",
                        help="TPU-native extension: after --eval, write an "
                             "AOT serving artifact per area model "
                             "(StableHLO with weights baked in) — loadable "
                             "without any model code via "
                             "dgcnn_tpu.export.load_exported")
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
                             "= inherit the env).  Gated by "
                             "tools/parity_drift.py >= 99.5%% argmax "
                             "agreement (ops/pallas_banded.py)")
    parser.add_argument("--device_pipeline", type=str2bool, default=False,
                        help="TPU-native extension: keep the train blocks "
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
    # S3DIS blocks are sampled with replacement (ETL prepare/indoor3d.py,
    # like reference indoor3d_util.py:176), so clouds carry duplicated
    # points: pin the packed member-by-member extraction (v2) so
    # neighbourhoods keep the reference's duplicate-filled top-k semantics
    # — bit-equal duplicate scores resolve by lowest index, exactly like
    # torch — instead of v3's class-walk averaging
    # (ops/pallas_knn._pack_keys / _extract_loop_v3 docstrings).  v2 runs
    # at v3's per-iteration cost (one reduce), unlike r2's v1 pin.
    # Read at trace time; explicit user env wins; scoped to this entry
    # point (restored on return) so importing/looping over CLIs in one
    # process does not pin other models' kernels.
    had = "DGCNN_TPU_EXTRACT" in os.environ
    os.environ.setdefault("DGCNN_TPU_EXTRACT", "v2")
    try:
        # opt-in approximate eval path (ops/pallas_banded.py); same
        # trace-time-env scoping as the v2 pin above (an explicit flag —
        # including --fast_extract=0 to force exact — wins for this call;
        # any pre-existing env is restored on return)
        with fast_extract_pin(args.fast_extract, args.num_points):
            if not args.eval:
                train(args, io)
            else:
                test(args, io)
    finally:
        if not had:
            os.environ.pop("DGCNN_TPU_EXTRACT", None)


if __name__ == "__main__":
    main()
