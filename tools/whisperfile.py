#!/usr/bin/env python3
"""whisperfile: speech-to-text CLI (sibling engine, reference whisper.cpp.patches).

Usage: python tools/whisperfile.py -m ggml-base.en.bin -f audio.wav [--language en]
       [--translate]
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
    ap.add_argument("-f", "--file", required=True, help="wav file")
    ap.add_argument("--language", default="en")
    ap.add_argument("--translate", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=224)
    args = ap.parse_args()

    from llamafile_tpu.models.whisper import WhisperModel, read_wav

    t0 = time.time()
    model = WhisperModel(args.model)
    print(f"loaded {args.model}: {model.hparams} in {time.time()-t0:.1f}s",
          file=sys.stderr)
    samples = read_wav(args.file)
    print(f"audio: {len(samples)/16000:.1f}s", file=sys.stderr)
    t0 = time.time()
    text = model.transcribe(samples, language=args.language,
                            translate=args.translate,
                            max_tokens=args.max_tokens)
    print(f"transcribed in {time.time()-t0:.1f}s", file=sys.stderr)
    print(text.strip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
