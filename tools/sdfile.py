#!/usr/bin/env python3
"""sdfile: stable-diffusion txt2img CLI (sibling engine).

Reference: stable-diffusion.cpp.patches llamafile-files/main.cpp (SURVEY.md
§2.9). Loads SD 1.x weights from GGUF (original checkpoint tensor names),
encodes the prompt with the built-in CLIP tokenizer vocabulary when present in
the file (or accepts pre-tokenized ids), runs DDIM with classifier-free
guidance, writes a PNG.

Usage: python tools/sdfile.py -m sd15.gguf -p "a cat" -o out.png
       [--steps 20] [--cfg 7.5] [--seed 0] [-H 512] [-W 512]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simple_clip_tokenize(text: str):
    """Minimal CLIP BPE-less fallback: whitespace/byte tokens are NOT valid
    CLIP ids; real tokenization requires the merges table. When the GGUF
    carries tokenizer metadata we use it; otherwise we accept --token-ids."""
    raise SystemExit("this model file has no tokenizer metadata; "
                     "pass --token-ids (comma-separated CLIP token ids)")


def main():
    from llamafile_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("--negative", default="")
    ap.add_argument("--token-ids", help="comma-separated CLIP ids for --prompt")
    ap.add_argument("-o", "--output", default="out.png")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-i", "--init-img", dest="init_img",
                    help="img2img init image (png/jpg); H,W must be /8")
    ap.add_argument("--strength", type=float, default=0.75,
                    help="img2img denoising strength (0,1]")
    ap.add_argument("-H", "--height", type=int, default=512)
    ap.add_argument("-W", "--width", type=int, default=512)
    from llamafile_tpu.models.sd import SAMPLERS
    ap.add_argument("--sampler", "--sampling-method", dest="sampler",
                    default="ddim", choices=list(SAMPLERS),
                    help="sampling method (reference sdfile --sampling-method"
                         ", main.cpp:196: full k-diffusion set)")
    ap.add_argument("-b", "--batch-count", type=int, default=1,
                    help="number of images to generate (seed increments; "
                         "outputs suffixed _2, _3, ... like the reference)")
    ap.add_argument("--clip-skip", type=int, default=1,
                    help="ignore last CLIP layers; 1 ignores none "
                         "(reference main.cpp:203)")
    ap.add_argument("--vae-tiling", action="store_true",
                    help="process vae decode in tiles to reduce memory "
                         "(reference main.cpp:205)")
    args = ap.parse_args()

    from llamafile_tpu.models.sd import SDPipeline, load_sd
    from llamafile_tpu.gguf.reader import GGUFReader

    params = load_sd(args.model)
    pipe = SDPipeline(params, steps=args.steps, guidance=args.cfg,
                      sampler=args.sampler, clip_skip=max(1, args.clip_skip),
                      vae_tiling=args.vae_tiling)

    if args.token_ids:
        ids = [int(t) for t in args.token_ids.split(",") if t.strip()]
    else:
        r = GGUFReader(args.model)
        if "tokenizer.ggml.tokens" in r.metadata:
            from llamafile_tpu.runtime.tokenizer import Tokenizer
            tok = Tokenizer(r.metadata)
            ids = tok.encode(args.prompt, add_bos=False)
        else:
            simple_clip_tokenize(args.prompt)
    cond = pipe.encode_prompt(ids)
    uncond = pipe.encode_prompt([])
    from PIL import Image
    init = None
    if args.init_img:
        init = np.asarray(Image.open(args.init_img).convert("RGB"), np.uint8)
        if init.shape[0] % 8 or init.shape[1] % 8:
            init = init[: init.shape[0] // 8 * 8, : init.shape[1] // 8 * 8]
    base, ext = os.path.splitext(args.output)
    for i in range(max(1, args.batch_count)):
        seed = args.seed + i
        if init is not None:
            img = pipe.img2img(init, cond, uncond, strength=args.strength,
                               seed=seed)
        else:
            img = pipe.txt2img(cond, uncond, height=args.height,
                               width=args.width, seed=seed)
        out = args.output if i == 0 else f"{base}_{i + 1}{ext}"
        Image.fromarray(img).save(out)
        print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
