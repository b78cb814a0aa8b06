"""Dependency-free TensorBoard event writer.

The reference logs scalars/images through ``tensorboardX`` everywhere
(SURVEY §5 — ``train.py:204-227``, ``explain.py:809-819``).  That package
is not available in this environment, so this module writes the
TensorBoard event-file format directly: TFRecord framing (length +
masked-crc32c) around hand-encoded ``Event``/``Summary`` protobufs.
Scalars and PNG images are supported — enough for ``tensorboard
--logdir log`` to render the same dashboards the reference produces.
"""

from __future__ import annotations

import os
import struct
import time
from typing import Optional

# ------------------------------------------------------------- crc32c

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE:
        return _CRC_TABLE
    poly = 0x82F63B78
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    _CRC_TABLE = table
    return table


def _crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ----------------------------------------------------- protobuf encoding


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


def _pb_bytes(field: int, data: bytes) -> bytes:
    return _key(field, 2) + _varint(len(data)) + data


def _pb_string(field: int, s: str) -> bytes:
    return _pb_bytes(field, s.encode("utf-8"))


def _pb_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _pb_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _pb_int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _scalar_summary(tag: str, value: float) -> bytes:
    # Summary.Value { tag = 1; simple_value = 2; }
    val = _pb_string(1, tag) + _pb_float(2, float(value))
    # Summary { value = 1 (repeated); }
    return _pb_bytes(1, val)


def _image_summary(tag: str, png: bytes, height: int, width: int) -> bytes:
    # Summary.Image { height=1; width=2; colorspace=3; encoded_image_string=4 }
    img = (
        _pb_int64(1, height) + _pb_int64(2, width) + _pb_int64(3, 4)
        + _pb_bytes(4, png)
    )
    # Summary.Value { tag = 1; image = 4; }
    val = _pb_string(1, tag) + _pb_bytes(4, img)
    return _pb_bytes(1, val)


def _event(summary: Optional[bytes] = None, step: int = 0,
           wall_time: Optional[float] = None,
           file_version: Optional[str] = None) -> bytes:
    # Event { wall_time=1(double); step=2(int64); file_version=3; summary=5 }
    out = _pb_double(1, wall_time if wall_time is not None else time.time())
    out += _pb_int64(2, step)
    if file_version is not None:
        out += _pb_string(3, file_version)
    if summary is not None:
        out += _pb_bytes(5, summary)
    return out


class SummaryWriter:
    """Minimal tensorboardX-compatible writer (``add_scalar`` /
    ``add_scalars`` / ``add_image`` / ``flush`` / ``close``)."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.tpugraph"
        self._f = open(os.path.join(logdir, fname), "wb")
        self._write_record(_event(file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value, step: int = 0) -> None:
        self._write_record(_event(_scalar_summary(tag, float(value)), step))

    def add_scalars(self, main_tag: str, scalars: dict, step: int = 0) -> None:
        for k, v in scalars.items():
            self.add_scalar(f"{main_tag}/{k}", v, step)

    def add_image_png(self, tag: str, png: bytes, height: int, width: int,
                      step: int = 0) -> None:
        self._write_record(
            _event(_image_summary(tag, png, height, width), step)
        )

    def add_figure(self, tag: str, fig, step: int = 0) -> None:
        """Log a matplotlib figure as a PNG image summary."""
        import io

        buf = io.BytesIO()
        fig.savefig(buf, format="png")
        w, h = fig.canvas.get_width_height()
        self.add_image_png(tag, buf.getvalue(), h, w, step)

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
