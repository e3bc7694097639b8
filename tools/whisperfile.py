#!/usr/bin/env python3
"""whisperfile: speech-to-text CLI + HTTP server (sibling engine).

Reference: whisper.cpp.patches — patched whisper.cpp main (timestamps, long
audio, temperature fallback) and the llamafile server integration
(001-server-llamafile-integration.patch: POST /inference, GET /health).

Usage: python tools/whisperfile.py -m ggml-base.en.bin -f audio.wav
           [--language en] [--translate] [--no-timestamps] [--srt|--vtt]
       python tools/whisperfile.py -m ggml-base.en.bin --server
           [--listen 127.0.0.1:8081]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", help="wav file")
    ap.add_argument("--language", default="en")
    ap.add_argument("--translate", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=224)
    ap.add_argument("--no-timestamps", action="store_true",
                    dest="no_timestamps")
    ap.add_argument("--srt", action="store_true", help="emit SubRip")
    ap.add_argument("--vtt", action="store_true", help="emit WebVTT")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("-bs", "--beam-size", type=int, dest="beam_size",
                    default=0, help="beam search width at temperature 0")
    ap.add_argument("-bo", "--best-of", type=int, dest="best_of", default=5,
                    help="sampling candidates at temperature > 0")
    ap.add_argument("--server", action="store_true",
                    help="run the /inference HTTP server")
    ap.add_argument("-l", "--listen", default="127.0.0.1:8081")
    args = ap.parse_args()

    from llamafile_tpu.models.whisper import WhisperModel, read_wav

    t0 = time.time()
    model = WhisperModel(args.model)
    print(f"loaded {args.model}: {model.hparams} in {time.time()-t0:.1f}s",
          file=sys.stderr)
    if args.server:
        from llamafile_tpu.server.whisper_http import run_server
        print(f"whisper server on http://{args.listen}/inference",
              file=sys.stderr)
        run_server(model, args.listen)
        return 0
    if not args.file:
        ap.error("-f/--file required unless --server")
    samples = read_wav(args.file)
    print(f"audio: {len(samples)/16000:.1f}s", file=sys.stderr)
    t0 = time.time()
    temps = ((args.temperature,) if args.temperature > 0
             else (0.0, 0.2, 0.4, 0.6, 0.8, 1.0))
    segments = model.transcribe_segments(
        samples, language=args.language, translate=args.translate,
        max_tokens=args.max_tokens, temperatures=temps,
        no_timestamps=args.no_timestamps, beam_size=args.beam_size,
        best_of=args.best_of)
    print(f"transcribed in {time.time()-t0:.1f}s", file=sys.stderr)
    if args.srt or args.vtt:
        from llamafile_tpu.server.whisper_http import format_segments
        body, _ = format_segments(segments, "srt" if args.srt else "vtt")
        print(body)
    elif args.no_timestamps:
        print("".join(s["text"] for s in segments).strip())
    else:
        for s in segments:
            print(f"[{s['t0']:7.2f} --> {s['t1']:7.2f}]  {s['text'].strip()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
