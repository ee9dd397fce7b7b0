"""End-to-end CLI slices on synthetic fixture data (SURVEY.md §7 minimum
slice + engine loops).  Tiny shapes to keep 1-core XLA compiles tolerable."""
import os

import numpy as np
import pytest

from dgcnn_tpu.data import synthetic


@pytest.fixture(scope="module")
def data_env(tmp_path_factory, monkeypatch_module=None):
    root = str(tmp_path_factory.mktemp("data"))
    synthetic.make_all(root)
    old_data = os.environ.get("DGCNN_TPU_DATA")
    old_nd = os.environ.get("DGCNN_TPU_NO_DOWNLOAD")
    os.environ["DGCNN_TPU_DATA"] = root
    os.environ["DGCNN_TPU_NO_DOWNLOAD"] = "1"
    cwd = os.getcwd()
    work = str(tmp_path_factory.mktemp("work"))
    os.chdir(work)
    yield root
    os.chdir(cwd)
    for k, v in [("DGCNN_TPU_DATA", old_data), ("DGCNN_TPU_NO_DOWNLOAD", old_nd)]:
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_cls_train_and_eval_roundtrip(data_env):
    from dgcnn_tpu.cli import cls

    argv = [
        "--exp_name=smoke_cls", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dims=32",
        "--use_sgd=False",
    ]
    cls.main(argv + ["--tensorboard=True"])
    model_path = "outputs/smoke_cls/models/model.t7.msgpack"
    assert os.path.exists(model_path)
    assert os.path.exists("outputs/smoke_cls/run.log")
    log = open("outputs/smoke_cls/run.log").read()
    assert "Train 0" in log and "Test 0" in log

    # --tensorboard wrote TensorBoard-readable per-epoch scalar curves
    # (train/events.TensorboardLogger over utils/tbevents.SummaryWriter)
    import glob

    from dgcnn_tpu.utils.tbevents import read_scalars

    event_files = glob.glob("outputs/smoke_cls/tb/events.out.tfevents.*")
    assert event_files
    scalars = read_scalars(event_files[0])  # (step, tag, value) triples
    tags = {s[1] for s in scalars}
    assert {"train/loss", "train/acc", "test/loss", "test/acc"} <= tags
    # the logged value matches the printed metric line
    test_acc_logged = [s for s in scalars if s[1] == "test/acc"][-1][2]
    import re as _re

    printed = float(_re.search(r"Test 0, .*test acc: ([0-9.]+)", log)[1])
    assert abs(test_acc_logged - printed) < 1e-5

    cls.main(argv + ["--eval=True", f"--model_path={model_path}",
                     "--export_model=smoke_cls.stablehlo"])
    log = open("outputs/smoke_cls/run.log").read()
    assert "Test :: test acc:" in log

    # --export_model wrote a loadable AOT serving artifact
    assert "Exported serving artifact" in log
    from dgcnn_tpu.export import load_exported

    fn = load_exported("smoke_cls.stablehlo")
    out = fn(np.zeros((8, 64, 3), np.float32))
    assert np.asarray(out).shape == (8, 40)


def test_cls_device_pipeline_train_and_eval(data_env):
    """--device_pipeline=True: resident-dataset lax.scan epochs produce the
    same artifacts/metric lines and a loadable best checkpoint."""
    from dgcnn_tpu.cli import cls

    argv = [
        "--exp_name=smoke_cls_dp", "--epochs=2", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dims=32",
        "--use_sgd=False", "--device_pipeline=True",
    ]
    cls.main(argv)
    model_path = "outputs/smoke_cls_dp/models/model.t7.msgpack"
    assert os.path.exists(model_path)
    log = open("outputs/smoke_cls_dp/run.log").read()
    assert "Train 0" in log and "Test 1" in log

    cls.main(argv + ["--eval=True", f"--model_path={model_path}"])
    log = open("outputs/smoke_cls_dp/run.log").read()
    assert "Test :: test acc:" in log
    # resident eval == per-batch eval on the same checkpoint
    cls.main(["--exp_name=smoke_cls_dp", "--eval=True",
              f"--model_path={model_path}", "--test_batch_size=8",
              "--num_points=64", "--k=4", "--emb_dims=32"])
    lines = [l for l in open("outputs/smoke_cls_dp/run.log").read().splitlines()
             if l.startswith("Test :: test acc:")]
    assert len(lines) >= 2 and lines[-1] == lines[-2]


def test_partseg_train_then_eval_with_visu(data_env):
    from dgcnn_tpu.cli import partseg

    argv = [
        "--exp_name=smoke_part", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dim=32",
        "--ff_dims=16", "--n_heads=2", "--n_blocks=1", "--use_sgd=False",
        "--scheduler=cycle",
    ]
    partseg.main(argv)
    # best checkpoint + rolling checkpoint written
    assert os.path.exists("outputs/smoke_part/checkpoints/ckpt.checkpoint")
    log = open("outputs/smoke_part/run.log").read()
    assert "train iou:" in log and "test iou:" in log

    # resume path restores without error
    partseg.main(argv + ["--resume=True"])

    # eval from the CLI's OWN saved epoch checkpoint (msgpack payload
    # behind the reference's transformer_<epoch>.checkpoint naming) —
    # the checkpoint round-trips through the quirk-preserving
    # outputs/<exp>/<model_path> resolution (cli/partseg.py test())
    assert os.path.exists("outputs/smoke_part/models/transformer_0.checkpoint")
    partseg.main(argv + ["--eval=True",
                         "--model_path=models/transformer_0.checkpoint",
                         "--export_model=smoke_part.stablehlo"])
    log = open("outputs/smoke_part/run.log").read()
    assert log.count("test iou:") >= 2

    # --export_model wrote a loadable two-input AOT serving artifact
    from dgcnn_tpu.export import load_exported

    fn = load_exported("smoke_part.stablehlo")
    out = fn(np.zeros((8, 64, 3), np.float32),
             np.eye(16, dtype=np.float32)[:8])
    assert np.asarray(out).shape == (8, 64, 50)


def test_partseg_device_pipeline_train(data_env):
    """--device_pipeline=True on partseg: resident lax.scan train epochs
    (both dataset recipes' augmentations jitted) produce the reference
    metric lines and checkpoints."""
    from dgcnn_tpu.cli import partseg

    argv = [
        "--exp_name=smoke_part_dp", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dim=32",
        "--ff_dims=16", "--n_heads=2", "--n_blocks=1", "--use_sgd=False",
        "--scheduler=cycle", "--device_pipeline=True",
    ]
    partseg.main(argv)
    assert os.path.exists("outputs/smoke_part_dp/checkpoints/ckpt.checkpoint")
    log = open("outputs/smoke_part_dp/run.log").read()
    assert "train iou:" in log and "test iou:" in log

    # eval-only resident path == per-batch eval on the same checkpoint
    eval_argv = ["--eval=True", "--model_path=models/transformer_0.checkpoint"]
    partseg.main(argv + eval_argv)
    partseg.main([a for a in argv if not a.startswith("--device_pipeline")]
                 + eval_argv)
    lines = [ln for ln in
             open("outputs/smoke_part_dp/run.log").read().splitlines()
             if ln.startswith("Test: test acc:")]
    assert len(lines) >= 2 and lines[-1] == lines[-2], lines[-2:]


def test_semseg_device_pipeline_train(data_env):
    """--device_pipeline=True on semseg: resident lax.scan train epoch
    (S3DIS shuffle-with-seg recipe on device)."""
    from dgcnn_tpu.cli import semseg

    argv = [
        "--exp_name=smoke_sem_dp", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dims=32",
        "--test_area=6", "--use_sgd=False", "--device_pipeline=True",
    ]
    semseg.main(argv)
    assert os.path.exists("outputs/smoke_sem_dp/models/model_6.t7.msgpack")
    log = open("outputs/smoke_sem_dp/run.log").read()
    assert "train iou:" in log and "test iou:" in log

    # eval-only resident path == per-batch eval on the same checkpoint
    eval_argv = ["--eval=True", "--model_root=outputs/smoke_sem_dp/models"]
    semseg.main(argv + eval_argv)
    semseg.main([a for a in argv if not a.startswith("--device_pipeline")]
                + eval_argv)
    lines = [ln for ln in
             open("outputs/smoke_sem_dp/run.log").read().splitlines()
             if "test area: 6" in ln]
    assert len(lines) >= 2 and lines[-1] == lines[-2], lines[-2:]


def test_semseg_train_smoke(data_env):
    from dgcnn_tpu.cli import semseg

    argv = [
        "--exp_name=smoke_sem", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dims=32",
        "--test_area=6", "--use_sgd=False",
    ]
    semseg.main(argv)
    assert os.path.exists(
        "outputs/smoke_sem/models/model_6.t7.msgpack")
    log = open("outputs/smoke_sem/run.log").read()
    assert "train iou:" in log

    semseg.main(argv + ["--eval=True", "--model_root=outputs/smoke_sem/models",
                        "--export_model=smoke_sem.stablehlo"])
    log = open("outputs/smoke_sem/run.log").read()
    assert "test area: 6" in log

    # --export_model wrote a loadable 9-channel AOT serving artifact
    from dgcnn_tpu.export import load_exported

    out = load_exported("smoke_sem.stablehlo")(np.zeros((8, 64, 9), np.float32))
    assert np.asarray(out).shape == (8, 64, 13)

    # point-sharded eval (sequence parallelism over the 8-device mesh)
    # reports the same accuracy as the batch-parallel eval above
    semseg.main(argv + ["--eval=True", "--point_shard=True",
                        "--model_root=outputs/smoke_sem/models"])
    lines = [ln for ln in open("outputs/smoke_sem/run.log").read().splitlines()
             if "test area: 6" in ln]
    assert len(lines) >= 2 and lines[-1] == lines[-2], lines[-2:]


def test_partseg_dist_train_smoke(data_env):
    """The distributed trainer entry (DDP replacement) end-to-end on the
    fallback dataset path with dist defaults scaled down."""
    from dgcnn_tpu.cli import partseg_dist

    argv = [
        "--exp_name=smoke_dist", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dim=32",
        "--ff_dims=16", "--n_heads=2", "--n_blocks=1", "--use_sgd=False",
        "--scheduler=cycle", "--grad_accum=2",
    ]
    partseg_dist.main(argv)
    log = open("outputs/smoke_dist/run.log").read()
    assert "train iou:" in log and "test iou:" in log


def test_cls_eval_from_torch_t7(data_env):
    """A torch-format .t7 (upstream DGCNN_cls layout) drops straight into
    main_cls --eval via the on-the-fly converter."""
    torch = pytest.importorskip("torch")
    import numpy as np

    rng = np.random.RandomState(0)
    sd = {}

    def conv(key, co, ci, dims=2):
        sd[f"{key}.weight"] = torch.from_numpy(
            (rng.randn(co, ci, *([1] * dims)) * 0.1).astype(np.float32))

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5)
        sd[f"{prefix}.bias"] = torch.from_numpy(rng.randn(c).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(rng.randn(c).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5)

    def linear(key, co, ci, bias=True):
        sd[f"{key}.weight"] = torch.from_numpy((rng.randn(co, ci) * 0.1).astype(np.float32))
        if bias:
            sd[f"{key}.bias"] = torch.from_numpy(rng.randn(co).astype(np.float32))

    conv("conv1.0", 64, 6); bn("conv1.1", 64)
    conv("conv2.0", 64, 128); bn("conv2.1", 64)
    conv("conv3.0", 128, 128); bn("conv3.1", 128)
    conv("conv4.0", 256, 256); bn("conv4.1", 256)
    conv("conv5.0", 32, 512, dims=1); bn("conv5.1", 32)
    linear("linear1", 512, 64, bias=False); bn("bn6", 512)
    linear("linear2", 256, 512); bn("bn7", 256)
    linear("linear3", 40, 256)
    # DataParallel-style module. prefixes, like main_cls.py:152 checkpoints
    sd = {"module." + k: v for k, v in sd.items()}
    torch.save(sd, "model.cls.t7")

    from dgcnn_tpu.cli import cls

    cls.main([
        "--exp_name=smoke_t7", "--eval=True", "--model_path=model.cls.t7",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dims=32",
    ])
    log = open("outputs/smoke_t7/run.log").read()
    assert "Test :: test acc:" in log


def test_semseg_eval_with_visu(data_env):
    """Streaming room visualization through the real semseg CLI."""
    from dgcnn_tpu.cli import semseg

    train_argv = [
        "--exp_name=smoke_sem", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dims=32",
        "--test_area=6", "--use_sgd=False",
    ]
    if not os.path.exists("outputs/smoke_sem/models/model_6.t7.msgpack"):
        semseg.main(train_argv)
    semseg.main(train_argv + [
        "--eval=True", "--model_root=outputs/smoke_sem/models",
        "--visu=area_6", "--visu_format=txt",
    ])
    visu_root = "outputs/smoke_sem/visualization/area_6"
    assert os.path.isdir(visu_root)
    rooms = os.listdir(visu_root)
    assert rooms, "no rooms written"
    files = os.listdir(os.path.join(visu_root, rooms[0]))
    assert any("_pred_" in f for f in files)
    assert any(f.endswith("_gt.txt") for f in files)
    # the raw_data3d lookup must hit with the GLOBAL file index: area 6
    # is preceded by areas 1-5 in room_filelist (5 areas x 2 rooms x 4
    # blocks = offset 40 in the synthetic fixture), so office_1's first
    # block renders raw file office_1(40).txt (axes permuted [1,2,0]) —
    # NOT the centred block-coordinate fallback
    import numpy as np
    raw = os.path.join(os.environ["DGCNN_TPU_DATA"],
                       "indoor3d_sem_seg_hdf5_data_test", "raw_data3d",
                       "Area_6", "office_1(40).txt")
    assert os.path.exists(raw), "fixture should ship raw_data3d"
    expected = np.loadtxt(raw)[:64][:, [1, 2, 0]]
    pred_txt = [f for f in os.listdir(os.path.join(visu_root, "office_1"))
                if "_pred_" in f][0]
    written = np.loadtxt(os.path.join(visu_root, "office_1", pred_txt))
    np.testing.assert_allclose(written[:64, :3], expected, atol=1e-5)


def test_partseg_orbax_remat_flags(data_env):
    """--orbax and --remat are live CLI options: orbax checkpoint written,
    resume restores from it, remat trains without error."""
    from dgcnn_tpu.cli import partseg

    argv = [
        "--exp_name=smoke_orbax", "--epochs=1", "--batch_size=8",
        "--test_batch_size=8", "--num_points=64", "--k=4", "--emb_dim=32",
        "--ff_dims=16", "--n_heads=2", "--n_blocks=1", "--use_sgd=False",
        "--scheduler=cycle", "--orbax=True", "--remat=True",
    ]
    partseg.main(argv)
    assert os.path.isdir("outputs/smoke_orbax/checkpoints/ckpt.orbax")
    assert not os.path.exists(
        "outputs/smoke_orbax/checkpoints/ckpt.checkpoint")
    # --orbax also routes the best-model save through orbax (a dir, not a
    # msgpack .checkpoint file), and eval can load it back
    best = [f for f in os.listdir("outputs/smoke_orbax/models")
            if f.startswith("transformer_")]
    assert best and all(f.endswith(".orbax") for f in best)
    assert os.path.isdir(f"outputs/smoke_orbax/models/{best[0]}")
    partseg.main(argv + ["--resume=True"])
    log = open("outputs/smoke_orbax/run.log").read()
    assert "Resumed from" in log
    partseg.main(argv + ["--eval=True",
                         f"--model_path=models/{best[0]}"])
    assert "Test: test acc" in open("outputs/smoke_orbax/run.log").read()


def test_eval_loss_invariant_to_padding():
    """Padded eval rows must not contaminate the reported loss (the meters
    already mask accuracy/IoU; the loss mean is masked in the step)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.models import PointNet
    from dgcnn_tpu.train import TrainState, make_cls_steps, make_optimizer

    model = PointNet(emb_dims=32, output_channels=40)
    rng = np.random.RandomState(0)
    pts = rng.randn(4, 16, 3).astype(np.float32)
    labels = rng.randint(0, 40, 4)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pts), train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(use_sgd=True, schedule=lambda _: 0.0))
    _, eval_step = make_cls_steps(model)

    full = eval_step(state, jnp.asarray(pts), jnp.asarray(labels),
                     jnp.ones(4, bool))
    # pad rows 2-3 with duplicates of row 0 (what the loader does) and mask
    padded_pts = np.concatenate([pts[:2], pts[:1], pts[:1]])
    padded_lbl = np.concatenate([labels[:2], labels[:1], labels[:1]])
    mask = jnp.asarray([True, True, False, False])
    padded = eval_step(state, jnp.asarray(padded_pts),
                       jnp.asarray(padded_lbl), mask)
    only2 = eval_step(state, jnp.asarray(pts[:2]), jnp.asarray(labels[:2]),
                      jnp.ones(2, bool))
    np.testing.assert_allclose(float(padded["loss"]), float(only2["loss"]),
                               rtol=1e-6)
    assert abs(float(full["loss"]) - float(padded["loss"])) > 0  # sanity


@pytest.mark.parametrize("cli_name", ["partseg", "partseg_dist", "semseg"])
def test_fast_extract_env_scoping(data_env, monkeypatch, cli_name):
    """--fast_extract pins DGCNN_TPU_FAST_EXTRACT for the entry point's
    duration ONLY (trace-time env: the banded dispatch in models/ reads it
    when the forward traces), and restores it on return so looping over
    CLIs in one process cannot leak the approximate path into other
    models."""
    import importlib

    mod = importlib.import_module(f"dgcnn_tpu.cli.{cli_name}")
    target = mod if cli_name != "partseg_dist" else importlib.import_module(
        "dgcnn_tpu.cli.partseg")
    seen = {}

    def fake_test(args, io):
        seen["band"] = os.environ.get("DGCNN_TPU_FAST_EXTRACT")

    monkeypatch.setattr(target, "test", fake_test)
    monkeypatch.delenv("DGCNN_TPU_FAST_EXTRACT", raising=False)
    mod.main([f"--exp_name=smoke_fast_{cli_name}", "--eval=True",
              "--fast_extract=512"])
    assert seen["band"] == "512"
    assert "DGCNN_TPU_FAST_EXTRACT" not in os.environ
    # an explicit user env survives the entry point (user wins)
    monkeypatch.setenv("DGCNN_TPU_FAST_EXTRACT", "1024")
    mod.main([f"--exp_name=smoke_fast_{cli_name}", "--eval=True",
              "--fast_extract=512"])
    assert seen["band"] == "512"
    assert os.environ["DGCNN_TPU_FAST_EXTRACT"] == "1024"
    # with the flag unset, an inherited env stays in effect for the call
    mod.main([f"--exp_name=smoke_fast_{cli_name}", "--eval=True"])
    assert seen["band"] == "1024"
    # --fast_extract=0 forces the EXACT path for the call even under an
    # inherited env (it used to be falsy = un-overridable, ADVICE r4)
    mod.main([f"--exp_name=smoke_fast_{cli_name}", "--eval=True",
              "--fast_extract=0"])
    assert seen["band"] is None
    assert os.environ["DGCNN_TPU_FAST_EXTRACT"] == "1024"
    # bands the kernels can't honour are rejected at parse time instead of
    # silently running exact (banded_applicable needs a multiple of 128)
    with pytest.raises(SystemExit):
        mod.main([f"--exp_name=smoke_fast_{cli_name}", "--eval=True",
                  "--fast_extract=1000"])


def test_real_data_parity_plumbing(data_env):
    """tools/real_data_parity.py — the one-command README acceptance bridge
    (reference README.md:86/147/285) — runs end-to-end TODAY on the
    synthetic fixtures: trains a tiny checkpoint, then the tool converts,
    evals, parses the metric line, and gates it.  Guarantees the tool can't
    rot while real data is environment-blocked (zero egress)."""
    import json
    import subprocess
    import sys

    from dgcnn_tpu.cli import cls

    cls.main(["--exp_name=smoke_rdp", "--epochs=1", "--batch_size=8",
              "--test_batch_size=8", "--num_points=64", "--k=4",
              "--emb_dims=32", "--use_sgd=False"])
    ckpt = os.path.abspath("outputs/smoke_rdp/models/model.t7.msgpack")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [sys.executable, os.path.join(repo, "tools", "real_data_parity.py"),
            "--family", "cls", "--ckpt", ckpt, "--data_root", data_env,
            "--platform", "cpu", "--batch", "8",
            "--num_points=64", "--k=4", "--emb_dims=32"]

    proc = subprocess.run(base + ["--tol", "1.0"], capture_output=True,
                          text=True)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert proc.returncode == 0, out
    assert out["pass"] and 0.0 <= out["measured"]["overall_acc"] <= 1.0
    assert out["expected"] == {"overall_acc": 0.933, "avg_class_acc": 0.909}

    # a tight gate fails loudly (rc=1, pass=false) — the verdict is real
    proc = subprocess.run(base + ["--tol", "1e-9"], capture_output=True,
                          text=True)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert proc.returncode == 1 and not out["pass"]
