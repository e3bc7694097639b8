"""Audio ingestion (utils.audio): any-rate/any-width WAV + compressed
formats — the reference whisperfile accepts these through vendored
miniaudio/dr_wav (whisper.cpp.patches; SURVEY.md §2.9)."""
import io
import os
import struct
import wave

import numpy as np
import pytest

from llamafile_tpu.utils.audio import load_audio, resample


def _tone(sr, secs=0.5, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _wav_bytes(x, sr, width=2, ch=1, tag=1):
    """Hand-rolled RIFF so we control width/tag (wave only writes PCM)."""
    if ch > 1:
        x = np.repeat(x[:, None], ch, axis=1).reshape(-1)
    if tag == 3:
        raw = x.astype("<f4").tobytes()
        bits = 32
    elif width == 2:
        raw = (x * 32767).astype("<i2").tobytes()
        bits = 16
    elif width == 3:
        v = (x * ((1 << 23) - 1)).astype(np.int32)
        b = np.zeros((len(v), 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
        bits = 24
    elif width == 4:
        raw = (x * ((1 << 31) - 1)).astype("<i4").tobytes()
        bits = 32
    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * ch * bits // 8,
                      ch * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


@pytest.mark.parametrize("sr", [8000, 22050, 44100, 48000])
def test_wav_any_rate_resamples(sr):
    x = _tone(sr)
    y = load_audio(_wav_bytes(x, sr), 16000)
    assert abs(len(y) - 8000) <= 4            # 0.5 s at 16 kHz
    # the 440 Hz tone survives: dominant FFT bin maps to ~440 Hz
    f = np.fft.rfft(y * np.hanning(len(y)))
    hz = np.argmax(np.abs(f)) * 16000 / len(y)
    assert abs(hz - 440.0) < 10.0, hz


@pytest.mark.parametrize("width,tag", [(2, 1), (3, 1), (4, 1), (4, 3)])
def test_wav_widths(width, tag):
    x = _tone(16000)
    y = load_audio(_wav_bytes(x, 16000, width=width, tag=tag), 16000)
    assert np.abs(y[:len(x)] - x).max() < 2e-3


def test_wav_stereo_downmix():
    x = _tone(16000)
    y = load_audio(_wav_bytes(x, 16000, ch=2), 16000)
    assert np.abs(y[:len(x)] - x).max() < 2e-3


def test_bad_container_raises():
    with pytest.raises(ValueError):
        load_audio(b"\x00" * 64, 16000)


def test_mp3_via_sdl_mixer():
    """A real mp3 decodes to 16 kHz mono f32 (SDL_mixer path)."""
    import pygame
    mp3 = os.path.join(os.path.dirname(pygame.__file__),
                       "examples", "data", "house_lo.mp3")
    if not os.path.exists(mp3):
        pytest.skip("no mp3 asset in this image")
    y = load_audio(mp3, 16000)
    assert y.dtype == np.float32 and y.ndim == 1
    assert len(y) > 16000                     # > 1 s of audio
    assert 1e-4 < np.abs(y).max() <= 1.001


def test_whisper_read_wav_accepts_441k(tmp_path):
    """models.whisper.read_wav (the whisperfile entry) takes a 44.1 kHz
    stereo file and yields 16 kHz mono."""
    from llamafile_tpu.models.whisper import read_wav, SAMPLE_RATE
    x = _tone(44100, secs=1.0)
    p = tmp_path / "a.wav"
    p.write_bytes(_wav_bytes(x, 44100, ch=2))
    y = read_wav(str(p))
    assert y.dtype == np.float32
    assert abs(len(y) - SAMPLE_RATE) <= 4
