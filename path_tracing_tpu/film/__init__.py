"""Film: progressive accumulation, tone mapping, PNG output, checkpointing.

Replaces the reference's OpenCV tonemap/flip/imwrite pipeline
(``main_cli.cpp:221-254``, ``main.cpp:293-375,469-500``) and gives the
checkpoint/resume capability the reference lacks (SURVEY.md §5): the
progressive state ``(radiance_sum, n_iters)`` is an explicit, serializable
value instead of process-lifetime GUI buffers.
"""
from __future__ import annotations

import dataclasses
import struct
import zlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclass
class AccumState:
    """Progressive accumulation state (device-resident between iterations,
    unlike the reference which round-trips frames through host memory each
    iteration, main.cpp:424-452)."""

    radiance_sum: jnp.ndarray  # (H*W, 3) linear radiance sum over iterations
    n_iters: jnp.ndarray       # () int32

    @staticmethod
    def zeros(width: int, height: int) -> "AccumState":
        return AccumState(radiance_sum=jnp.zeros((height * width, 3)),
                          n_iters=jnp.zeros((), jnp.int32))

    def add(self, frame: jnp.ndarray) -> "AccumState":
        return AccumState(radiance_sum=self.radiance_sum + frame,
                          n_iters=self.n_iters + 1)

    def mean(self) -> jnp.ndarray:
        return self.radiance_sum / jnp.maximum(self.n_iters, 1)


def tonemap_u8(linear: np.ndarray, width: int, height: int) -> np.ndarray:
    """avg -> clamp[0,1] -> gamma 1/2.2 -> u8, row-major (H, W, 3).

    Matches main_cli.cpp:225-244 (which writes rows top-to-bottom without the
    GUI's vertical flip).
    """
    img = np.asarray(linear, np.float32).reshape(height, width, 3)
    img = np.clip(img, 0.0, 1.0) ** (1.0 / 2.2)
    return (img * 255.0).astype(np.uint8)


def encode_png(rgb_u8: np.ndarray) -> bytes:
    """Minimal dependency-free PNG encoder (RGB8) -> bytes."""
    h, w, _ = rgb_u8.shape
    raw = b"".join(b"\x00" + rgb_u8[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def write_png(path: str, rgb_u8: np.ndarray) -> None:
    """Minimal dependency-free PNG writer (RGB8)."""
    with open(path, "wb") as f:
        f.write(encode_png(rgb_u8))


def read_png(path: str) -> np.ndarray:
    """PNG reader (RGB8).  Uses PIL when present (external textures often
    use Average/Paeth row filters, which the pure-Python fallback decodes
    pixel-by-pixel); falls back to a dependency-free decoder that covers
    our own writer's output (filter-0 rows) and any RGB8 non-interlaced
    file."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.uint8)
    except ImportError:
        pass
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, color = struct.unpack(">IIBB", body[:10])
            assert bit == 8 and color == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3
    bpp = 3
    out = np.zeros((h, w, 3), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for i in range(h):
        ft = raw[i * (stride + 1)]
        line = np.frombuffer(
            raw[i * (stride + 1) + 1:(i + 1) * (stride + 1)], np.uint8).copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, stride):
                line[j] = (int(line[j]) + int(line[j - bpp])) & 0xFF
        elif ft == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            for j in range(stride):
                a = int(line[j - bpp]) if j >= bpp else 0
                line[j] = (int(line[j]) + (a + int(prev[j])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(stride):
                a = int(line[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                c = int(prev[j - bpp]) if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[j] = (int(line[j]) + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ft}")
        out[i] = line.reshape(w, 3)
        prev = line
    return out


def ansi_preview(rgb_u8: np.ndarray, max_cols: int = 80) -> str:
    """Render an (H, W, 3) u8 image as 24-bit-color Unicode half-blocks.

    Each terminal cell shows two vertically stacked pixels ('▀' with the
    top pixel as foreground and the bottom as background), so a cols-wide
    preview carries cols x 2*rows pixels at roughly square aspect.  The
    image is box-averaged down to fit ``max_cols``.  This is the headless
    stand-in for the reference GUI's live texture view (main.cpp:433-500)
    — watch a progressive render converge over SSH."""
    h, w, _ = rgb_u8.shape
    cols = max(2, min(max_cols, w))
    rows2 = max(2, int(round(h * cols / w)))  # pixel rows in the preview
    rows2 += rows2 % 2

    def bucket(img, n, axis):
        edges = np.linspace(0, img.shape[axis], n + 1).astype(int)
        sums = np.add.reduceat(img.astype(np.float32), edges[:-1], axis=axis)
        cnt = np.maximum(np.diff(edges), 1)
        shape = [1, 1, 1]
        shape[axis] = n
        return sums / cnt.reshape(shape)

    small = bucket(bucket(rgb_u8, rows2, 0), cols, 1)
    small = np.clip(small + 0.5, 0, 255).astype(np.uint8)
    top, bot = small[0::2], small[1::2]
    lines = []
    for r in range(top.shape[0]):
        cells = []
        for c in range(cols):
            tr, tg, tb = (int(v) for v in top[r, c])
            br, bg, bb = (int(v) for v in bot[r, c])
            cells.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                         f"\x1b[48;2;{br};{bg};{bb}m▀")
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


def save_image(path: str, linear: np.ndarray, width: int, height: int) -> None:
    write_png(path, tonemap_u8(linear, width, height))


def save_checkpoint(path: str, state: AccumState, meta: dict | None = None) -> None:
    """Serialize progressive render state (the resume capability the
    reference lacks — killing its GUI loses all accumulation)."""
    np.savez(path,
             radiance_sum=np.asarray(state.radiance_sum),
             n_iters=np.asarray(state.n_iters),
             **{f"meta_{k}": v for k, v in (meta or {}).items()})


def load_checkpoint(path: str) -> tuple[AccumState, dict]:
    z = np.load(path, allow_pickle=False)
    state = AccumState(radiance_sum=jnp.asarray(z["radiance_sum"]),
                       n_iters=jnp.asarray(z["n_iters"]))
    meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return state, meta
