"""Dependency-free TensorBoard event-file writer (scalars).

The reference notebook logs training curves through pytorch-ignite's
``TensorboardLogger`` (test.ipynb cells 49, 59-61).  This module provides
the file format without requiring the ``tensorboard`` package: it writes
``events.out.tfevents.*`` files TensorBoard can load, hand-encoding the
two protobuf messages involved (``Event`` and ``Summary``) and the
TFRecord framing (length + masked CRC32C).

Wire format (stable, documented in tensorboard/compat/proto):
  record   := uint64le(len(data)) crc32c_masked(len bytes)
              data crc32c_masked(data)
  Event    := 1: wall_time (double) | 2: step (int64)
              | 3: file_version (string) | 5: summary (Summary)
  Summary  := repeated 1: Value
  Value    := 1: tag (string) | 2: simple_value (float)
"""
from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven; masked per the TFRecord spec.

_CRC_TABLE = []


def _crc_table():
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Minimal protobuf encoding (varints + the three wire types we need).


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _pb_int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _pb_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _event(wall_time: float, step: Optional[int] = None,
           file_version: Optional[str] = None,
           summary: Optional[bytes] = None) -> bytes:
    msg = _pb_double(1, wall_time)
    if step is not None:
        msg += _pb_int64(2, step)
    if file_version is not None:
        msg += _pb_bytes(3, file_version.encode())
    if summary is not None:
        msg += _pb_bytes(5, summary)
    return msg


def _scalar_summary(tag: str, value: float) -> bytes:
    val = _pb_bytes(1, tag.encode()) + _pb_float(2, float(value))
    return _pb_bytes(1, val)


def _record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (header + struct.pack("<I", _masked_crc(header))
            + data + struct.pack("<I", _masked_crc(data)))


class SummaryWriter:
    """Write TensorBoard scalar summaries to ``log_dir``.

    API-compatible (for the scalar subset) with
    ``torch.utils.tensorboard.SummaryWriter`` so notebook code ports 1:1.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s.%d" % (
            int(time.time()), socket.gethostname(), os.getpid())
        self._path = os.path.join(log_dir, fname)
        self._f = open(self._path, "wb")
        self._f.write(_record(_event(time.time(),
                                     file_version="brain.Event:2")))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, global_step: int = 0,
                   walltime: Optional[float] = None) -> None:
        ev = _event(walltime if walltime is not None else time.time(),
                    step=int(global_step),
                    summary=_scalar_summary(tag, value))
        self._f.write(_record(ev))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Reader (for tests and offline inspection; decodes only what we encode).


def read_scalars(path: str):
    """Decode an events file written by :class:`SummaryWriter`.

    Returns a list of ``(step, tag, value)``; validates record CRCs.
    """
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            if hcrc != _masked_crc(header):
                raise ValueError("header CRC mismatch")
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if dcrc != _masked_crc(data):
                raise ValueError("data CRC mismatch")
            out.extend(_decode_event(data))
    return out


def _read_varint(data: bytes, i: int):
    shift = val = 0
    while True:
        b = data[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(data: bytes):
    i = 0
    while i < len(data):
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(data, i)
        elif wire == 1:
            v, i = data[i:i + 8], i + 8
        elif wire == 2:
            n, i = _read_varint(data, i)
            v, i = data[i:i + n], i + n
        elif wire == 5:
            v, i = data[i:i + 4], i + 4
        else:  # pragma: no cover - we never write groups
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _decode_event(data: bytes):
    step, summary = 0, None
    for field, wire, v in _fields(data):
        if field == 2 and wire == 0:
            step = v
        elif field == 5 and wire == 2:
            summary = v
    if summary is None:
        return []
    out = []
    for field, wire, val in _fields(summary):
        if field == 1 and wire == 2:
            tag, value = None, None
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:
                    tag = v2.decode()
                elif f2 == 2 and w2 == 5:
                    (value,) = struct.unpack("<f", v2)
            if tag is not None:
                out.append((step, tag, value))
    return out
