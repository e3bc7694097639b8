"""Audio ingestion: any-rate/any-width WAV, plus mp3/ogg/flac decode.

The reference's whisper overlay vendors miniaudio + dr_wav/dr_mp3/dr_flac
(~93k LoC) so whisperfile accepts any common container at any sample rate
(SURVEY.md §2.9). The TPU-native equivalents:

- WAV: a native RIFF walker (PCM 8/16/24/32-bit, IEEE float32,
  WAVE_FORMAT_EXTENSIBLE, any channel count, any rate) + a polyphase
  resampler (scipy.signal.resample_poly — windowed-sinc, the same class of
  filter miniaudio's resampler implements).
- mp3/ogg/flac: decoded through SDL_mixer (the baked-in pygame binding),
  which resamples to the requested rate during load; an ffmpeg subprocess
  is the fallback when SDL_mixer lacks a codec.
"""
from __future__ import annotations

import io
import math
import os
import shutil
import struct
import subprocess
import threading

import numpy as np

_SDL_LOCK = threading.Lock()


def _parse_riff(data: bytes):
    """WAV bytes -> (float32 [T, ch] in [-1, 1], sample_rate).

    Handles PCM (tag 1) at 8/16/24/32 bit, IEEE float (tag 3), and
    WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, resolved by SubFormat)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)            # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 0xFFFE and len(fmt) >= 40:    # extensible: first PCM GUID u16
        (tag,) = struct.unpack_from("<H", fmt, 24)
    if ch < 1 or rate < 1:
        raise ValueError(f"bad WAV fmt: channels={ch} rate={rate}")
    if tag == 3 and bits == 32:
        x = np.frombuffer(raw, "<f4").astype(np.float32)
    elif tag == 3 and bits == 64:
        x = np.frombuffer(raw, "<f8").astype(np.float32)
    elif tag == 1 and bits == 8:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif tag == 1 and bits == 16:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif tag == 1 and bits == 24:
        b3 = np.frombuffer(raw[: len(raw) - len(raw) % 3],
                           np.uint8).reshape(-1, 3).astype(np.int32)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        x = v.astype(np.float32) / float(1 << 23)
    elif tag == 1 and bits == 32:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
    n = (len(x) // ch) * ch
    return x[:n].reshape(-1, ch), rate


def resample(x: np.ndarray, rate: int, target: int) -> np.ndarray:
    """Polyphase windowed-sinc resample (1-D float32)."""
    if rate == target:
        return x.astype(np.float32)
    from scipy.signal import resample_poly
    g = math.gcd(int(rate), int(target))
    return resample_poly(x.astype(np.float64), target // g,
                         rate // g).astype(np.float32)


def _decode_sdl(data: bytes, target_sr: int) -> np.ndarray:
    """mp3/ogg/flac via SDL_mixer: decodes AND resamples to target_sr mono."""
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame
    with _SDL_LOCK:
        pygame.mixer.quit()
        pygame.mixer.init(frequency=target_sr, size=-16, channels=1)
        try:
            snd = pygame.mixer.Sound(file=io.BytesIO(data))
            arr = pygame.sndarray.array(snd)
        finally:
            pygame.mixer.quit()
    x = np.asarray(arr, np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    return (x / 32768.0).astype(np.float32)


def _decode_ffmpeg(data: bytes, target_sr: int) -> np.ndarray:
    p = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", "pipe:0", "-f", "f32le",
         "-ac", "1", "-ar", str(target_sr), "pipe:1"],
        input=data, capture_output=True)
    if p.returncode != 0:
        raise ValueError(f"ffmpeg decode failed: {p.stderr[-300:]!r}")
    return np.frombuffer(p.stdout, "<f4").astype(np.float32)


def load_audio(src, target_sr: int = 16000) -> np.ndarray:
    """Audio file path or bytes -> mono float32 at target_sr.

    WAV decodes natively; mp3/ogg/flac go through SDL_mixer, then ffmpeg
    if present. Raises ValueError with the sniffed container on failure."""
    data = src if isinstance(src, (bytes, bytearray)) else open(src, "rb").read()
    data = bytes(data)
    if data[:4] == b"RIFF":
        x, rate = _parse_riff(data)
        mono = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
        return resample(mono, rate, target_sr)
    kind = ("flac" if data[:4] == b"fLaC" else
            "ogg" if data[:4] == b"OggS" else
            "mp3" if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb",
                                                        b"\xff\xf3",
                                                        b"\xff\xf2",
                                                        b"\xff\xfa")
            else "unknown")
    errs = []
    try:
        return _decode_sdl(data, target_sr)
    except Exception as e:                   # SDL missing codec/import
        errs.append(f"SDL_mixer: {e}")
    if shutil.which("ffmpeg"):
        try:
            return _decode_ffmpeg(data, target_sr)
        except Exception as e:
            errs.append(str(e))
    raise ValueError(
        f"cannot decode {kind} audio ({'; '.join(errs)}); supported: WAV "
        "(any rate/width) natively, mp3/ogg/flac via SDL_mixer or ffmpeg")
