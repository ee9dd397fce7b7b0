"""Serving runtime (dgcnn_tpu/serve.py): bucketed padding over exported
artifacts, the request-coalescing BatchingServer, and the stdlib HTTP
front-end.  All model-code-free: only the artifact is loaded."""
import io
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """One fixed-batch and one polymorphic artifact of the same tiny model,
    plus the reference outputs fn for checking served results."""
    from dgcnn_tpu.export import export_model, save_exported
    from dgcnn_tpu.models import DGCNNCls

    model = DGCNNCls(emb_dims=32, k=4, output_channels=40)
    pts0 = jnp.zeros((4, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts0,
                           train=False)
    d = tmp_path_factory.mktemp("artifacts")
    fixed = str(d / "fixed.shlo")
    save_exported(fixed, export_model(model, variables, (pts0,)))
    poly = str(d / "poly.shlo")
    save_exported(poly, export_model(model, variables, (pts0,),
                                     polymorphic_batch=True))
    ref = jax.jit(lambda p: model.apply(variables, p, train=False))
    return fixed, poly, ref


def test_serving_model_fixed_batch_pads(artifacts):
    from dgcnn_tpu.serve import ServingModel

    fixed, _, ref = artifacts
    m = ServingModel(fixed)
    assert m.max_batch == 4 and m._buckets == [4]
    rng = np.random.RandomState(0)
    for n in (1, 3, 4):
        pts = rng.randn(n, 32, 3).astype(np.float32)
        out = m.predict(pts)
        assert out.shape == (n, 40)
        np.testing.assert_allclose(out, np.asarray(ref(pts)), rtol=1e-5,
                                   atol=1e-5)
    with pytest.raises(ValueError):
        m.predict(rng.randn(5, 32, 3).astype(np.float32))


def test_serving_model_poly_buckets(artifacts):
    from dgcnn_tpu.serve import ServingModel, _bucket_sizes

    assert _bucket_sizes(8) == [1, 2, 4, 8]
    assert _bucket_sizes(6) == [1, 2, 4, 6]
    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=8)
    assert m._poly and m._buckets == [1, 2, 4, 8]
    assert m.bucket_for(3) == 4
    m.warmup()
    rng = np.random.RandomState(1)
    for n in (1, 3, 5, 8):
        pts = rng.randn(n, 32, 3).astype(np.float32)
        out = m.predict(pts)
        assert out.shape == (n, 40)
        np.testing.assert_allclose(out, np.asarray(ref(pts)), rtol=1e-5,
                                   atol=1e-5)


def test_batching_server_coalesces_and_matches(artifacts):
    from dgcnn_tpu.serve import BatchingServer, ServingModel

    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=8)
    m.warmup()
    srv = BatchingServer(m, max_delay_ms=50.0)
    rng = np.random.RandomState(2)
    clouds = [rng.randn(32, 3).astype(np.float32) for _ in range(8)]
    futs = [srv.submit(c) for c in clouds]  # unbatched items: axis added
    outs = [f.result(timeout=60) for f in futs]
    srv.shutdown()
    want = np.asarray(ref(np.stack(clouds)))
    for o, w in zip(outs, want):
        np.testing.assert_allclose(o, w, rtol=1e-5, atol=1e-5)
    # coalescing happened: fewer device batches than requests
    assert sum(srv.batch_log) == 8 and len(srv.batch_log) < 8


def test_submit_rejects_malformed_shapes(artifacts):
    """A bad request must fail at submit(), not poison the worker's
    coalesced batch."""
    from dgcnn_tpu.serve import BatchingServer, ServingModel

    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=4)
    srv = BatchingServer(m, max_delay_ms=20.0)
    with pytest.raises(ValueError, match="signature"):
        srv.submit(np.zeros((16, 3), np.float32))  # wrong point count
    with pytest.raises(ValueError, match="expected 1 inputs"):
        srv.submit(np.zeros((32, 3), np.float32),
                   np.zeros((16,), np.float32))
    # a good request right after still serves
    pts = np.random.RandomState(5).randn(32, 3).astype(np.float32)
    out = srv.submit(pts).result(timeout=60)
    srv.shutdown()
    np.testing.assert_allclose(out, np.asarray(ref(pts[None]))[0],
                               rtol=1e-5, atol=1e-5)


def test_cancelled_future_does_not_poison_batch_or_worker(artifacts):
    """A client cancelling its Future must neither kill the worker thread
    (hanging all later clients) nor corrupt batch-mates' results."""
    from dgcnn_tpu.serve import BatchingServer, ServingModel

    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=4)
    m.warmup()
    srv = BatchingServer(m, max_delay_ms=100.0)
    rng = np.random.RandomState(7)
    a = rng.randn(32, 3).astype(np.float32)
    b = rng.randn(32, 3).astype(np.float32)
    fut_a = srv.submit(a)
    fut_b = srv.submit(b)
    assert fut_a.cancel()  # before the delay window closes
    out_b = fut_b.result(timeout=60)
    np.testing.assert_allclose(out_b, np.asarray(ref(b[None]))[0],
                               rtol=1e-5, atol=1e-5)
    # worker survived: a fresh request still serves
    c = rng.randn(32, 3).astype(np.float32)
    out_c = srv.submit(c).result(timeout=60)
    srv.shutdown()
    np.testing.assert_allclose(out_c, np.asarray(ref(c[None]))[0],
                               rtol=1e-5, atol=1e-5)


def test_submit_coerces_dtypes(artifacts):
    """A float64/int request must not upcast or fail the whole coalesced
    batch — it is cast to the artifact's signature dtype at submit()."""
    from dgcnn_tpu.serve import BatchingServer, ServingModel

    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=4)
    srv = BatchingServer(m, max_delay_ms=20.0)
    pts64 = np.random.RandomState(8).randn(32, 3)  # float64
    out = srv.submit(pts64).result(timeout=60)
    srv.shutdown()
    want = np.asarray(ref(pts64.astype(np.float32)[None]))[0]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_batching_server_propagates_failures(artifacts):
    from dgcnn_tpu.serve import BatchingServer, ServingModel

    fixed, _, _ = artifacts
    m = ServingModel(fixed)

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    m.dispatch = boom
    srv = BatchingServer(m, max_delay_ms=1.0)
    fut = srv.submit(np.zeros((32, 3), np.float32))
    with pytest.raises(RuntimeError, match="injected"):
        fut.result(timeout=30)
    srv.shutdown()


def test_http_endpoint_roundtrip(artifacts):
    from dgcnn_tpu.serve import ServingModel, serve_http

    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=4)
    m.warmup()
    httpd, batcher = serve_http(m, port=0, max_delay_ms=1.0)
    try:
        base = f"http://127.0.0.1:{httpd.server_port}"
        import json

        health = json.loads(urllib.request.urlopen(
            base + "/healthz", timeout=30).read())
        assert health["max_batch"] == 4 and health["buckets"] == [1, 2, 4]

        rng = np.random.RandomState(3)
        pts = rng.randn(32, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, pts)
        resp = urllib.request.urlopen(urllib.request.Request(
            base + "/predict", data=buf.getvalue(), method="POST"),
            timeout=60)
        out = np.load(io.BytesIO(resp.read()))
        want = np.asarray(ref(pts[None]))[0]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

        # malformed request -> 400, not a hung connection
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(urllib.request.Request(
                base + "/predict", data=b"garbage", method="POST"),
                timeout=30)
    finally:
        httpd.shutdown()
        batcher.shutdown()


def test_http_multi_input_npz(tmp_path):
    """Multi-input signatures over HTTP: .npz keys sort in signature order
    (arg0=points, arg1=category one-hot)."""
    from dgcnn_tpu.export import export_model, save_exported
    from dgcnn_tpu.models import Net
    from dgcnn_tpu.serve import ServingModel, serve_http

    model = Net(emb_dim=32, k=4, n_heads=2, n_blocks=1, ff_dims=16,
                d_qkv=8, nclasses=50, dropout=0.0)
    rng = np.random.RandomState(9)
    pts = rng.randn(2, 32, 3).astype(np.float32)
    lbl = np.eye(16, dtype=np.float32)[[3, 7]]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(pts), jnp.asarray(lbl), train=False)
    path = str(tmp_path / "net.shlo")
    save_exported(path, export_model(
        model, variables, (jnp.asarray(pts), jnp.asarray(lbl)),
        polymorphic_batch=True))

    m = ServingModel(path, max_batch=2)
    m.warmup()
    httpd, batcher = serve_http(m, port=0, max_delay_ms=1.0)
    try:
        buf = io.BytesIO()
        np.savez(buf, arg0=pts[0], arg1=lbl[0])
        resp = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_port}/predict",
            data=buf.getvalue(), method="POST"), timeout=120)
        out = np.load(io.BytesIO(resp.read()))
        ref = jax.jit(lambda v, p, l: model.apply(v, p, l, train=False))
        want = np.asarray(ref(variables, jnp.asarray(pts[:1]),
                              jnp.asarray(lbl[:1])))[0]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
    finally:
        httpd.shutdown()
        batcher.shutdown()


def test_stats_telemetry(artifacts):
    """BatchingServer.stats() and the /stats endpoint report request
    counts, batch fill, and latency percentiles."""
    import json

    from dgcnn_tpu.serve import ServingModel, serve_http

    _, poly, ref = artifacts
    m = ServingModel(poly, max_batch=4)
    m.warmup()
    httpd, batcher = serve_http(m, port=0, max_delay_ms=1.0)
    try:
        base = f"http://127.0.0.1:{httpd.server_port}"
        rng = np.random.RandomState(12)
        for _ in range(3):
            buf = io.BytesIO()
            np.save(buf, rng.randn(32, 3).astype(np.float32))
            urllib.request.urlopen(urllib.request.Request(
                base + "/predict", data=buf.getvalue(), method="POST"),
                timeout=60).read()
        stats = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=30).read())
        assert stats["served"] == 3 and stats["failed"] == 0
        assert stats["latency_ms"]["p50"] > 0
        assert stats["mean_batch"] >= 1
    finally:
        httpd.shutdown()
        batcher.shutdown()


def test_data_parallel_serving_over_mesh(artifacts):
    """ServingModel(mesh=...): padded batches shard over the 8-device CPU
    mesh and results match single-device serving exactly."""
    from dgcnn_tpu.parallel import make_mesh
    from dgcnn_tpu.serve import ServingModel

    _, poly, ref = artifacts
    mesh = make_mesh(jax.devices()[:8])
    m = ServingModel(poly, max_batch=16, mesh=mesh)
    assert m._buckets == [8, 16]  # floor bucket = mesh size
    m.warmup()
    rng = np.random.RandomState(11)
    for n in (3, 8, 13):
        pts = rng.randn(n, 32, 3).astype(np.float32)
        out = m.predict(pts)
        assert out.shape == (n, 40)
        np.testing.assert_allclose(out, np.asarray(ref(pts)), rtol=1e-5,
                                   atol=1e-5)
    # mis-sized configs are rejected up front, not at the first request
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        ServingModel(poly, max_batch=12, mesh=mesh)


def test_mesh_if_divisible_rule_and_notice():
    from dgcnn_tpu.parallel import mesh_if_divisible

    devices = jax.devices("cpu")
    assert len(devices) == 8

    class FakeIO:
        lines = []

        def cprint(self, s):
            self.lines.append(s)

    io_ = FakeIO()
    mesh = mesh_if_divisible(devices, 16, io_)
    assert mesh is not None and mesh.devices.size == 8 and not io_.lines
    assert mesh_if_divisible(devices, 12, io_) is None
    assert len(io_.lines) == 1 and "ONE device" in io_.lines[0]
    # single device: no mesh, no notice
    assert mesh_if_divisible(devices[:1], 12, io_) is None
    assert len(io_.lines) == 1
