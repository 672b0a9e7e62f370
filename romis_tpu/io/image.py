"""Image output: BMP (reference parity) and PNG, pure Python.

Reference analog: Screen::writeBitmapToFile (src/rendering/screen.cpp:45-56)
— clamp to [0,1], convert to u8, write BMP via stb. We write BMP with the
stdlib only and PNG via zlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_u8(image: np.ndarray) -> np.ndarray:
    """Clamp float RGB [H, W, 3] to [0, 1] and quantize to uint8
    (reference screen.cpp:47-52)."""
    img = np.asarray(image, np.float32)
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def write_bmp(path: str, image: np.ndarray) -> None:
    """Write a 24-bit BMP. ``image`` is float or u8 RGB [H, W, 3], row 0 = top."""
    img = to_u8(image) if image.dtype != np.uint8 else image
    h, w, _ = img.shape
    row_pad = (-(w * 3)) % 4
    row_size = w * 3 + row_pad
    pixel_bytes = row_size * h
    # BMP stores rows bottom-up, BGR.
    bgr = img[::-1, :, ::-1]
    rows = bytearray()
    pad = b"\x00" * row_pad
    for r in range(h):
        rows += bgr[r].tobytes() + pad
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    with open(path, "wb") as f:
        f.write(header + bytes(rows))


def write_png(path: str, image: np.ndarray) -> None:
    """Write an 8-bit RGB PNG using zlib (no external deps)."""
    img = to_u8(image) if image.dtype != np.uint8 else image
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def write_image(path: str, image: np.ndarray) -> None:
    if str(path).lower().endswith(".bmp"):
        write_bmp(path, image)
    elif str(path).lower().endswith(".npy"):
        np.save(path, np.asarray(image, np.float32))
    else:
        write_png(path, image)
