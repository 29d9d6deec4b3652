"""Minimal WAV I/O (PCM 16/24/32-bit and IEEE float32), numpy-based.

The reference delegates WAV I/O to the AudioDSPTools dependency
(reference: tools/render.cpp:131, SaveWavFloat32 tools/render.cpp:20-60);
this is the self-contained equivalent for the render CLI and tests.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def read_wav(path) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (samples float32 in [-1, 1], sample_rate).

    Mono files return shape (T,); multi-channel (T, C).
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and fmt_body is not None and len(fmt_body) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the subformat GUID's first two bytes carry
        # the real format code (1 = PCM, 3 = IEEE float).
        audio_format = struct.unpack("<H", fmt_body[24:26])[0]
    if audio_format == 3:
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"{path}: unsupported IEEE-float bit depth {bits}")
    elif audio_format == 1 or audio_format == 0xFFFE:
        if bits not in (16, 24, 32):
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
        from .native import decode_pcm  # native codec when built, numpy otherwise

        x = decode_pcm(raw, bits)
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_format}")
    if channels > 1:
        x = x.reshape(-1, channels)
    return x, sample_rate


def write_wav_float32(path, x: np.ndarray, sample_rate: int) -> None:
    """Write float32 IEEE WAV (the reference renderer's output format,
    tools/render.cpp:20-60). x: (T,) or (T, C)."""
    x = np.asarray(x, dtype=np.float32)
    channels = 1 if x.ndim == 1 else x.shape[1]
    raw = x.astype("<f4").tobytes()
    byte_rate = sample_rate * channels * 4
    block_align = channels * 4
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 4 + (8 + 16) + (8 + 4) + (8 + len(raw))))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 3, channels, sample_rate, byte_rate, block_align, 32))
        # fact chunk (required for non-PCM)
        f.write(b"fact")
        f.write(struct.pack("<II", 4, x.shape[0]))
        f.write(b"data")
        f.write(struct.pack("<I", len(raw)))
        f.write(raw)
