"""Deterministic pure-Python image codecs for the image+caption payload.

The container has no PIL/libjpeg, so the multimodal decode path uses:

- ``png``  — a real, spec-compliant PNG encoder/decoder (zlib + filter 0),
  lossless; round-trips bit-exactly.
- ``jpeg`` — a clearly-marked deterministic STAND-IN for a lossy codec:
  uniform quantization (step=6) of the RGB pixels followed by PNG framing,
  prefixed with magic ``LQ85``. It genuinely destroys information (uniform
  quantization noise, PSNR ≈ 43–44 dB for random pixels) so the
  ``PSNR >= 40 dB`` correctness gate from BASELINE.json is exercised for
  real. On a cluster with codec libs installed, swap `_encode_lossy` /
  `_decode_lossy` for libjpeg calls — every caller goes through
  ``encode_image`` / ``decode_image``.

All functions are numpy-vectorized per image and safe to call from Arrow
pandas UDFs (batch of images per call).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"LQ85"
_QUANT_STEP = 6  # uniform quantization step for the lossy stand-in


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (filter 0, RGB8)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # scanlines, each prefixed with filter byte 0
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level=6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by png_encode (RGB8, filter 0 only)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or color != 2:
                raise ValueError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise ValueError("only filter 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def _encode_lossy(pixels: np.ndarray) -> bytes:
    q = (pixels.astype(np.int32) // _QUANT_STEP) * _QUANT_STEP + _QUANT_STEP // 2
    return _LOSSY_MAGIC + png_encode(np.clip(q, 0, 255).astype(np.uint8))


def _decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _LOSSY_MAGIC:
        raise ValueError("not a lossy-stand-in payload")
    return png_decode(data[4:])


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpeg":
        return _encode_lossy(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by magic sniffing (fmt arg is advisory)."""
    if data[:4] == _LOSSY_MAGIC:
        return _decode_lossy(data)
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    raise ValueError("unrecognized image payload")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def average_phash(pixels: np.ndarray) -> int:
    """64-bit average perceptual hash (8x8 grayscale mean threshold),
    returned as a signed int64 (Spark LongType-compatible)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # box-downsample to 8x8 by block means (pad to multiple of 8)
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    padded = np.zeros((ph, pw))
    padded[:h, :w] = gray
    blocks = padded.reshape(8, ph // 8, 8, pw // 8).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return struct.unpack("<q", struct.pack("<Q", int(val)))[0]


# ------------------------------------------------------- video container
# A deliberately simple frame container (magic + u32 frame count + u32
# lengths + concatenated PNG payloads). This is the declared stand-in for
# mp4/webm — real deployments swap mjpng_* for ffmpeg bindings — but it
# makes the video operators genuinely executable end-to-end: frames really
# decode, sampling really seeks, corrupt bytes really fail.

MJPNG_MAGIC = b"MJPN"


def mjpng_encode(frames: list[np.ndarray]) -> bytes:
    """Pack RGB frames (uint8 HxWx3, PNG-encoded each) into one blob."""
    payloads = [png_encode(f) for f in frames]
    head = MJPNG_MAGIC + struct.pack("<I", len(payloads))
    head += b"".join(struct.pack("<I", len(p)) for p in payloads)
    return head + b"".join(payloads)


def mjpng_frame_count(data: bytes) -> int:
    if data[:4] != MJPNG_MAGIC:
        raise ValueError("not an MJPN container")
    return struct.unpack_from("<I", data, 4)[0]


def mjpng_decode_frame(data: bytes, index: int) -> np.ndarray:
    """Random-access decode of frame `index` (seeks via the length table —
    only the requested frame's PNG bytes are parsed)."""
    n = mjpng_frame_count(data)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range [0, {n})")
    lengths = struct.unpack_from(f"<{n}I", data, 8)
    off = 8 + 4 * n + sum(lengths[:index])
    return decode_image(data[off:off + lengths[index]], "png")
