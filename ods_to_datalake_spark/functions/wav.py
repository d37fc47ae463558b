"""Minimal pure-stdlib WAV (RIFF/PCM) codec.

Real audio decoding for the multimodal path with zero external
libraries: WAV is a RIFF container with an `fmt ` chunk and raw PCM
frames, all parseable with the stdlib ``wave`` module + numpy. 16-bit
PCM mono/stereo — the layout speech/audio training corpora normalize
to anyway.

The encoder exists for fixtures and deterministic oracle queries.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Encode an int16 sample array (frames,) or (frames, channels)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.shape[1] != channels:
        raise ValueError(f"expected {channels} channels, got {arr.shape[1]}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes to ((frames, channels) int16 array, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
            )
        n, c, rate = w.getnframes(), w.getnchannels(), w.getframerate()
        raw = w.readframes(n)
    arr = np.frombuffer(raw, dtype=np.int16).reshape(n, c)
    return arr, rate
