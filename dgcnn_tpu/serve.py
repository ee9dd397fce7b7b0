"""Production inference serving over exported artifacts.

The reference has no serving story at all — deploying it means shipping the
full model zoo + torch and calling ``model(points)`` under a hand-rolled
loop (reference ``main_partseg.py:157-292`` is an offline eval, the closest
it gets).  The TPU-native serving stack layers three pieces over the AOT
artifacts written by :mod:`dgcnn_tpu.export`:

* :class:`ServingModel` — loads one artifact and serves ANY request batch
  size against it.  Fixed-shape artifacts are padded up to their recorded
  batch; polymorphic artifacts are padded to power-of-two buckets so the
  number of XLA compilations is bounded (log2(max_batch) programs, all
  warmable ahead of traffic) while MXU utilisation stays high.
* :class:`BatchingServer` — the request coalescer: concurrent callers
  submit single clouds (or small batches); a worker thread gathers up to
  ``max_batch`` items within ``max_delay_ms`` and runs them as ONE device
  call, then scatters results.  This is what keeps a serving chip at its
  throughput headline instead of its batch-1 latency floor.
* :func:`serve_http` — a dependency-free (stdlib) HTTP endpoint speaking
  ``.npy`` bytes, for smoke deployments and load tests.  Real deployments
  should put their own transport in front of :class:`BatchingServer`; the
  device-side contract is the same.

Everything here is model-agnostic: artifacts carry their weights and fused
Mosaic kernels, so this module imports NO model code.
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Sequence

import numpy as np

from dgcnn_tpu.export import load_exported_obj


def _bucket_sizes(max_batch: int) -> list:
    """Power-of-two padding buckets up to and including max_batch."""
    sizes = []
    b = 1
    while b < max_batch:
        sizes.append(b)
        b *= 2
    sizes.append(max_batch)
    return sizes


class ServingModel:
    """Serve arbitrary request batch sizes against one exported artifact.

    ``extra_args``: for multi-input signatures (e.g. the partseg ``Net``'s
    category one-hot) every input shares the leading batch axis and is
    padded/sliced together.

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` for DATA-PARALLEL serving —
    each padded batch is sharded over its devices (GSPMD splits the
    forward; per-device work = bucket / n_devices), scaling one serving
    endpoint across a pod slice.  Requires a polymorphic artifact whose
    ``max_batch`` is a mesh-size multiple, or a fixed artifact whose batch
    divides over the mesh.
    """

    def __init__(self, path: str, max_batch: int = 64, mesh=None):
        self._exported = load_exported_obj(path)
        lead = self._exported.in_avals[0].shape[0]
        # symbolic leading axis => polymorphic artifact (the artifact
        # itself is the source of truth; no override — a poly artifact
        # cannot be served fixed nor vice versa)
        self._poly = not isinstance(lead, int)
        self._fixed_batch = lead if isinstance(lead, int) else None
        self.max_batch = (self._fixed_batch if self._fixed_batch is not None
                          else max_batch)
        self.mesh = mesh
        if mesh is None:
            self._fn = self._exported.call
            self._buckets = (_bucket_sizes(self.max_batch) if self._poly
                             else [self._fixed_batch])
        else:
            # data-parallel serving: jit the exported call with the batch
            # axis sharded over the mesh — XLA splits every padded batch
            # across the devices (per-device work = bucket / n_devices).
            # Buckets must divide over the mesh, so the floor bucket is
            # n_devices and the rest are its multiples.
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            data_sh = NamedSharding(mesh, P(axis))
            self._fn = jax.jit(self._exported.call, in_shardings=data_sh)
            n_dev = mesh.devices.size
            if not self._poly:
                if self._fixed_batch % n_dev:
                    raise ValueError(
                        f"fixed artifact batch {self._fixed_batch} does not "
                        f"divide over the {n_dev}-device mesh")
                self._buckets = [self._fixed_batch]
            else:
                if self.max_batch % n_dev:
                    raise ValueError(
                        f"max_batch {self.max_batch} must be a multiple of "
                        f"the mesh size {n_dev}")
                self._buckets = [b * n_dev
                                 for b in _bucket_sizes(self.max_batch
                                                        // n_dev)]
        self._lock = threading.Lock()  # device calls serialized

    @property
    def platforms(self) -> tuple:
        return tuple(self._exported.platforms)

    def bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        raise ValueError(
            f"request batch {n} exceeds max serving batch {self.max_batch}")

    def warmup(self, example_args: Sequence[np.ndarray] | None = None):
        """Pre-compile every padding bucket (first XLA compile is slow —
        never pay it on a live request).  Without ``example_args`` the
        shapes are reconstructed from the artifact's input avals."""
        if example_args is None:
            example_args = tuple(
                np.zeros((1,) + tuple(a.shape[1:]),
                         np.dtype(a.dtype.name))
                for a in self._exported.in_avals)
        for b in self._buckets:
            self.predict(*(a[:1] for a in example_args), _pad_to=b)

    def dispatch(self, *args: np.ndarray, _pad_to: int | None = None):
        """Enqueue a batch on the device WITHOUT waiting for the result.
        Returns an opaque ``(device_outputs, n)`` ticket for
        :meth:`readback`.  JAX dispatch is asynchronous, so a second batch
        can be transferring/computing while the first one's results stream
        back — the pipelining that hides host<->device latency."""
        n = int(args[0].shape[0])
        bucket = _pad_to or self.bucket_for(n)
        padded = tuple(
            np.concatenate(
                [a, np.repeat(a[-1:], bucket - n, axis=0)], axis=0)
            if bucket > n else np.asarray(a)
            for a in args)
        with self._lock:
            out = self._fn(*padded)
        return out, n

    @staticmethod
    def readback(ticket):
        """Block until a :meth:`dispatch` ticket's results are on host;
        returns unpadded outputs."""
        out, n = ticket
        if isinstance(out, (tuple, list)):
            return type(out)(np.asarray(o)[:n] for o in out)
        return np.asarray(out)[:n]

    def predict(self, *args: np.ndarray, _pad_to: int | None = None):
        """Run a batch of any size ≤ max_batch; returns unpadded outputs."""
        return self.readback(self.dispatch(*args, _pad_to=_pad_to))


class BatchingServer:
    """Coalesce concurrent requests into full device batches.

    ``submit(*inputs)`` enqueues one item (leading axis 1 or absent) and
    returns a :class:`concurrent.futures.Future`.  A worker thread drains
    the queue: it waits at most ``max_delay_ms`` for a batch to fill to
    ``model.max_batch``, pads the remainder, runs ONE device call, and
    resolves each future with its row.  Failures resolve every future in
    the batch with the exception (no hung clients).

    Device calls are PIPELINED to depth ``pipeline_depth`` (default 2 =
    double buffering): batch N+1 is dispatched before batch N's results
    are read back, overlapping host<->device transfer with compute —
    through a remote/tunneled device this is the difference between the
    sync round-trip rate and the compute rate.  The coalescing delay is
    only paid while the pipeline is idle; once the device is busy,
    whatever queued during the in-flight batch is taken immediately.
    """

    def __init__(self, model: ServingModel, max_delay_ms: float = 5.0,
                 pipeline_depth: int = 2):
        self.model = model
        self.max_delay = max_delay_ms / 1e3
        self.pipeline_depth = max(1, pipeline_depth)
        self._queue: list = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        # telemetry: served-batch sizes and per-request latencies (seconds,
        # submit -> result delivery), both appended by the worker
        self.batch_log: list = []
        self.latency_log: list = []
        self._served = 0
        self._failed = 0

    def stats(self) -> dict:
        """Serving telemetry snapshot: request counts, device-batch fill,
        and request latency percentiles (over the last 4096 requests)."""
        lats = np.asarray(self.latency_log[-4096:], dtype=np.float64)
        sizes = np.asarray(self.batch_log[-4096:], dtype=np.float64)
        return {
            "served": self._served,
            "failed": self._failed,
            "device_batches": len(self.batch_log),
            "mean_batch": float(sizes.mean()) if sizes.size else None,
            "latency_ms": {
                "p50": float(np.percentile(lats, 50) * 1e3),
                "p95": float(np.percentile(lats, 95) * 1e3),
                "p99": float(np.percentile(lats, 99) * 1e3),
            } if lats.size else None,
            "queue_depth": len(self._queue),
        }

    def submit(self, *inputs: np.ndarray) -> Future:
        avals = self.model._exported.in_avals
        if len(inputs) != len(avals):
            raise ValueError(
                f"expected {len(avals)} inputs, got {len(inputs)}")
        items = tuple(np.asarray(a) for a in inputs)
        items = tuple(a[None] if a.ndim == self._ndim_of(i) else a
                      for i, a in enumerate(items))
        if items[0].shape[0] != 1:
            raise ValueError("submit() takes one item; use model.predict "
                             "for pre-batched requests")
        # reject malformed items HERE — a bad shape inside the worker's
        # concatenate would take down the whole coalesced batch; dtypes
        # are coerced to the signature's (a stray float64/int cloud must
        # not upcast or fail everyone batched with it)
        checked = []
        for i, (a, av) in enumerate(zip(items, avals)):
            if tuple(a.shape[1:]) != tuple(av.shape[1:]):
                raise ValueError(
                    f"input {i} shape {a.shape[1:]} != artifact signature "
                    f"{tuple(av.shape[1:])}")
            checked.append(a.astype(np.dtype(av.dtype.name), copy=False))
        items = tuple(checked)
        fut: Future = Future()
        with self._cv:
            if self._stop:
                raise RuntimeError("server is shut down")
            self._queue.append((items, fut, time.monotonic()))
            self._cv.notify()
        return fut

    def _ndim_of(self, i: int) -> int:
        return len(self.model._exported.in_avals[i].shape) - 1

    def _take_batch(self, pipeline_busy: bool):
        """Pop up to max_batch queued items.  With the pipeline empty,
        block for the first item then coalesce within the delay window.
        With a batch in flight, dispatch early ONLY if a FULL batch is
        already queued — early partial batches would trade away exactly
        the coalescing the server exists for (the in-flight batch gives
        later arrivals a free fill window); otherwise return None so the
        caller drains the pipeline."""
        with self._cv:
            if pipeline_busy:
                if len(self._queue) < self.model.max_batch:
                    return None
            else:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if not self._queue:
                    return None  # stopping
                deadline = time.monotonic() + self.max_delay
                while (len(self._queue) < self.model.max_batch
                       and not self._stop):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
            batch = self._queue[:self.model.max_batch]
            del self._queue[:len(batch)]
            return batch

    def _deliver(self, fut: Future, t0: float, value=None, exc=None) -> None:
        """set_result/set_exception tolerant of client-side cancellation —
        an unguarded set_* on a cancelled future raises InvalidStateError,
        which would either kill the worker thread (hanging every later
        client) or be mis-delivered to the batch's OTHER futures."""
        if fut.done():  # cancelled (or already failed) — nothing to do
            return
        try:
            if exc is not None:
                fut.set_exception(exc)
                self._failed += 1
            else:
                fut.set_result(value)
                self._served += 1
                self.latency_log.append(time.monotonic() - t0)
        except Exception:  # lost the cancel race; result is abandoned
            pass

    def _resolve(self, futs, t0s, result, multi):
        for i, (fut, t0) in enumerate(zip(futs, t0s)):
            self._deliver(
                fut, t0, tuple(o[i] for o in result) if multi else result[i])

    def _run(self):
        from collections import deque

        pending: deque = deque()  # (futs, t0s, ticket) in dispatch order
        while True:
            if not pending:
                with self._cv:
                    if self._stop and not self._queue:
                        return
            batch = self._take_batch(pipeline_busy=bool(pending))
            if batch is not None:
                items, futs, t0s = zip(*batch)
                try:
                    args = tuple(
                        np.concatenate([it[j] for it in items], axis=0)
                        for j in range(len(items[0])))
                    pending.append((futs, t0s, self.model.dispatch(*args)))
                    self.batch_log.append(len(batch))
                except Exception as e:  # resolve, never hang clients
                    for fut, t0 in zip(futs, t0s):
                        self._deliver(fut, t0, exc=e)
            # read back the oldest batch once the pipeline is full, or when
            # there is no new work to overlap with
            while pending and (len(pending) > self.pipeline_depth - 1
                               or batch is None):
                futs, t0s, ticket = pending.popleft()
                try:
                    out = self.model.readback(ticket)
                    self._resolve(futs, t0s, out,
                                  isinstance(out, (tuple, list)))
                except Exception as e:
                    for fut, t0 in zip(futs, t0s):
                        self._deliver(fut, t0, exc=e)
                break  # drain one, then look for new work again

    def shutdown(self, wait: bool = True):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        if wait:
            self._worker.join()


def serve_http(model: ServingModel, host: str = "127.0.0.1", port: int = 0,
               max_delay_ms: float = 5.0):
    """Minimal stdlib HTTP front-end: POST ``.npy`` bytes (one cloud) to
    ``/predict`` → ``.npy`` response.  Multi-input signatures POST ``.npz``
    bytes whose keys SORT in signature order — use positional names
    (``np.savez(arg0=points, arg1=onehot)``); keys are sorted, NOT matched
    to parameter names.  Multi-output models answer with ``.npz``
    (``out0``, ``out1``, ...).  ``GET /healthz`` → platform + bucket info.
    Returns the running ``(HTTPServer, BatchingServer)`` pair; caller owns
    shutdown."""
    import io
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = BatchingServer(model, max_delay_ms=max_delay_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/stats":
                body = json.dumps(batcher.stats()).encode()
            elif self.path == "/healthz":
                body = json.dumps({
                    "platforms": list(model.platforms),
                    "max_batch": model.max_batch,
                    "buckets": model._buckets,
                }).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            try:
                raw = self.rfile.read(int(self.headers["Content-Length"]))
                buf = io.BytesIO(raw)
                if raw[:4] == b"PK\x03\x04":  # npz: multi-input request
                    with np.load(buf) as z:
                        # keys sort in signature order (arg0, arg1, ...)
                        args = tuple(z[k] for k in sorted(z.files))
                else:
                    args = (np.load(buf),)
                result = batcher.submit(*args).result(timeout=60)
                out = io.BytesIO()
                if isinstance(result, tuple):  # multi-output model: .npz
                    np.savez(out, **{f"out{i}": np.asarray(r)
                                     for i, r in enumerate(result)})
                else:
                    np.save(out, np.asarray(result))
                body = out.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
            except Exception as e:
                body = str(e).encode()
                self.send_response(400)
                self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, batcher


def main(argv: Sequence[str] | None = None):
    """``python -m dgcnn_tpu.serve artifact.shlo [--port N]``"""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("artifact")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8470)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over ALL local devices "
                        "(pod-slice serving)")
    args = p.parse_args(argv)
    mesh = None
    if args.data_parallel:
        import jax

        from dgcnn_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices())
    model = ServingModel(args.artifact, max_batch=args.max_batch, mesh=mesh)
    model.warmup()
    httpd, _ = serve_http(model, args.host, args.port,
                          max_delay_ms=args.max_delay_ms)
    print(f"serving {args.artifact} ({model.platforms[0]}, buckets "
          f"{model._buckets}) on http://{args.host}:{httpd.server_port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
