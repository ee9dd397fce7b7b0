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
    cls.main(argv)
    model_path = "outputs/smoke_cls/models/model.t7.msgpack"
    assert os.path.exists(model_path)
    assert os.path.exists("outputs/smoke_cls/run.log")
    log = open("outputs/smoke_cls/run.log").read()
    assert "Train 0" in log and "Test 0" in log

    cls.main(argv + ["--eval=True", f"--model_path={model_path}"])
    log = open("outputs/smoke_cls/run.log").read()
    assert "Test :: test acc:" in log


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

    semseg.main(argv + ["--eval=True", "--model_root=outputs/smoke_sem/models"])
    log = open("outputs/smoke_sem/run.log").read()
    assert "test area: 6" in log


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
