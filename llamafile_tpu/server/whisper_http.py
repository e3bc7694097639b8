"""Whisper HTTP server: the whisperfile `--server` mode.

Reference: whisper.cpp.patches/patches/001-server-llamafile-integration.patch
ships an HTTP server with a POST /inference endpoint taking a WAV upload
(multipart form field `file`) plus decoding knobs, and GET /health. Response
formats mirror the reference server: `json` (default, {"text": ...}),
`verbose_json` (segments with timestamps), `text`, `srt`, `vtt`.
"""
from __future__ import annotations

import asyncio
import io
import json
import wave
from typing import List, Optional

import numpy as np


def _parse_multipart(body: bytes, content_type: str) -> dict:
    """Minimal multipart/form-data parser: {field: bytes}."""
    if "boundary=" not in content_type:
        return {}
    boundary = content_type.split("boundary=", 1)[1].strip().strip('"')
    out = {}
    for part in body.split(b"--" + boundary.encode()):
        if b"\r\n\r\n" not in part:
            continue
        head, _, data = part.partition(b"\r\n\r\n")
        data = data.rstrip(b"\r\n").removesuffix(b"--")
        name = None
        for line in head.split(b"\r\n"):
            low = line.lower()
            if low.startswith(b"content-disposition") and b"name=" in line:
                name = line.split(b"name=", 1)[1].split(b";")[0]
                name = name.strip().strip(b'"').decode()
        if name:
            out[name] = data
    return out


def wav_bytes_to_samples(data: bytes) -> np.ndarray:
    """Uploaded audio bytes -> mono f32 @16k: WAV (any rate/width) natively,
    mp3/ogg/flac via SDL_mixer (utils.audio; the reference's vendored
    miniaudio serves this role in whisper.cpp.patches)."""
    from ..models.whisper import SAMPLE_RATE
    from ..utils.audio import load_audio
    return load_audio(data, SAMPLE_RATE)


def _fmt_ts(sec: float, vtt: bool = False) -> str:
    ms = int(round(sec * 1000))
    h, ms = divmod(ms, 3600000)
    m, ms = divmod(ms, 60000)
    s, ms = divmod(ms, 1000)
    sep = "." if vtt else ","
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


def format_segments(segments: List[dict], fmt: str) -> tuple:
    """-> (body_str, content_type)."""
    text = "".join(s["text"] for s in segments)
    if fmt == "text":
        return text.strip() + "\n", "text/plain; charset=utf-8"
    if fmt == "srt":
        lines = []
        for i, s in enumerate(segments, 1):
            lines += [str(i), f"{_fmt_ts(s['t0'])} --> {_fmt_ts(s['t1'])}",
                      s["text"].strip(), ""]
        return "\n".join(lines), "text/plain; charset=utf-8"
    if fmt == "vtt":
        lines = ["WEBVTT", ""]
        for s in segments:
            lines += [f"{_fmt_ts(s['t0'], True)} --> {_fmt_ts(s['t1'], True)}",
                      s["text"].strip(), ""]
        return "\n".join(lines), "text/vtt"
    if fmt == "verbose_json":
        return json.dumps({
            "task": "transcribe",
            "text": text,
            "segments": [{"id": i, "start": s["t0"], "end": s["t1"],
                          "text": s["text"]} for i, s in enumerate(segments)],
        }), "application/json"
    return json.dumps({"text": text}), "application/json"


class WhisperServer:
    def __init__(self, model):
        self.model = model

    async def handle(self, reader: asyncio.StreamReader,
                     writer: asyncio.StreamWriter):
        try:
            while True:
                line = await reader.readline()
                if not line:
                    return
                try:
                    method, target, _ = line.decode().split()
                except ValueError:
                    return
                headers = {}
                while True:
                    h = await reader.readline()
                    if h in (b"\r\n", b"\n", b""):
                        break
                    k, _, v = h.decode().partition(":")
                    headers[k.strip().lower()] = v.strip()
                n = int(headers.get("content-length", 0) or 0)
                body = await reader.readexactly(n) if n else b""
                await self.dispatch(writer, method, target.split("?")[0],
                                    headers, body)
                await writer.drain()
                if headers.get("connection", "").lower() == "close":
                    return
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    def _write(self, w, status, body, ct):
        data = body.encode() if isinstance(body, str) else body
        reason = {200: "OK", 400: "Bad Request", 404: "Not Found",
                  405: "Method Not Allowed", 500: "Internal Server Error"}
        w.write((f"HTTP/1.1 {status} {reason.get(status, 'OK')}\r\n"
                 f"Content-Type: {ct}\r\n"
                 f"Content-Length: {len(data)}\r\n\r\n").encode())
        w.write(data)

    async def dispatch(self, w, method, path, headers, body):
        if path == "/health":
            return self._write(w, 200, json.dumps({"status": "ok"}),
                               "application/json")
        if path != "/inference":
            return self._write(w, 404, json.dumps({"error": "not found"}),
                               "application/json")
        if method != "POST":
            return self._write(w, 405, json.dumps({"error": "POST required"}),
                               "application/json")
        ct = headers.get("content-type", "")
        fields = {}
        if ct.startswith("multipart/form-data"):
            fields = _parse_multipart(body, ct)
            wav = fields.get("file")
        else:
            wav = body                   # raw wav body
        if not wav:
            return self._write(w, 400,
                               json.dumps({"error": "no audio 'file' field"}),
                               "application/json")
        try:
            samples = wav_bytes_to_samples(wav)
        except Exception as e:
            return self._write(w, 400, json.dumps({"error": f"bad wav: {e}"}),
                               "application/json")
        fmt = fields.get("response_format", b"json")
        fmt = fmt.decode() if isinstance(fmt, bytes) else fmt
        temp = float(fields.get("temperature", b"0") or 0)
        beam = int(fields.get("beam_size", b"0") or 0)
        lang = fields.get("language", b"en")
        lang = lang.decode() if isinstance(lang, bytes) else lang
        loop = asyncio.get_running_loop()
        temps = ((temp,) + (0.2, 0.4, 0.6, 0.8, 1.0) if temp == 0.0
                 else (temp,))
        try:
            segments = await loop.run_in_executor(
                None, lambda: self.model.transcribe_segments(
                    samples, language=lang, temperatures=temps,
                    beam_size=beam))
        except Exception as e:
            return self._write(w, 500, json.dumps({"error": str(e)}),
                               "application/json")
        out, out_ct = format_segments(segments, fmt)
        return self._write(w, 200, out, out_ct)


async def serve(model, host: str, port: int):
    srv = WhisperServer(model)
    s = await asyncio.start_server(srv.handle, host, port)
    async with s:
        await s.serve_forever()


def run_server(model, listen: str = "127.0.0.1:8081"):
    host, _, port = listen.rpartition(":")
    asyncio.run(serve(model, host or "127.0.0.1", int(port)))
